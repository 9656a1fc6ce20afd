"""Structured Streaming: the same windowed transforms, run through a real
readStream → memory sink with availableNow, must equal the batch results.

Streaming file sources list directories; the single-file testdata events are
re-materialized into a tmp directory (with ts already converted) first.
"""

from __future__ import annotations

import pytest

from score_spark.io import load_events
from score_spark.streaming.windows import run_stream_once, session_stats, tumbling_counts


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_stream") / "events")
    load_events(spark, sf_dir).write.mode("overwrite").parquet(d)
    return d


def _assert_stream_equals_batch(spark, events_dir, transform, tmp, name):
    batch = transform(spark.read.parquet(events_dir)).collect()
    schema = spark.read.parquet(events_dir).schema
    q = run_stream_once(
        spark, events_dir, transform, schema, checkpoint=str(tmp / name), table_name=name
    )
    q.awaitTermination(120)
    streamed = spark.table(name).collect()
    assert len(streamed) > 0
    assert sorted(map(str, streamed)) == sorted(map(str, batch))


def test_stream_tumbling_equals_batch(spark, events_dir, tmp_path):
    _assert_stream_equals_batch(
        spark,
        events_dir,
        lambda s: tumbling_counts(s, watermark="1 hour"),
        tmp_path,
        "stream_tumbling",
    )


def test_stream_session_windows_equals_batch(spark, events_dir, tmp_path):
    _assert_stream_equals_batch(
        spark,
        events_dir,
        lambda s: session_stats(s, watermark="1 hour"),
        tmp_path,
        "stream_sessions",
    )
