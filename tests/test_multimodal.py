"""Multimodal plumbing: Arrow-batched binary feature extraction is
deterministic and hash-faithful; frame sampling emits the right shape."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from score_spark.operators.multimodal import extract_binary_features, frame_sample_plan


def test_binary_features_match_driver_hashes(spark):
    rows = [(1, b"hello world"), (2, b"\x00\x01\x02" * 100), (3, b"")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in extract_binary_features(df).collect()}
    for doc_id, payload in rows:
        assert got[doc_id].byte_len == len(payload)
        assert got[doc_id].content_sha256 == hashlib.sha256(payload).hexdigest()
        assert got[doc_id].decoder == "fake"
        assert 64 <= got[doc_id].width < 256 and 64 <= got[doc_id].height < 256


def test_binary_features_deterministic_across_runs(spark):
    df = spark.createDataFrame([(i, bytes([i] * 50)) for i in range(20)], "doc_id long, payload binary")
    a = sorted(map(str, extract_binary_features(df).collect()))
    b = sorted(map(str, extract_binary_features(df.repartition(7)).collect()))
    assert a == b  # partitioning must not affect results


def test_frame_sample_plan_shape(spark):
    df = spark.createDataFrame([(1, bytes(250))], "doc_id long, payload binary")
    rows = frame_sample_plan(df, "doc_id", "payload", every_n=1).collect()
    # 250 bytes → 3 fake frames (250//100 + 1)
    assert [r.frame_idx for r in rows] == [0, 1, 2]


def test_null_payload_yields_null_features_not_crash(spark):
    """A NULL binary payload must flow through as null features (matching
    how the SQL oracle aggregates the row), not kill the Arrow task with
    sha256(None) (review r7)."""
    from score_spark.operators.multimodal import extract_binary_features, resize_images

    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, None)], "doc_id long, payload binary"
    )
    feats = {r.doc_id: r for r in extract_binary_features(df).collect()}
    assert feats[1].width is not None and feats[1].decoder == "fake"
    assert feats[2].width is None and feats[2].height is None
    assert feats[2].decoder == "null" and feats[2].byte_len is None
    rs = {r.doc_id: r for r in resize_images(df).collect()}
    assert rs[1].resized_sha is not None
    assert rs[2].resized_sha is None and rs[2].decoder == "null"


def test_binary_operators_accept_non_long_ids(spark):
    """The mapInPandas output schema must type the id from the INPUT schema:
    both operators previously hardcoded LongType, so a string id column
    failed Arrow conversion even though id_col is a parameter (review r8)."""
    from score_spark.operators.multimodal import extract_binary_features, resize_images

    df = spark.createDataFrame(
        [("u/1", b"hello world"), ("u/2", b"payload two")], ["uri", "payload"]
    )
    feats = extract_binary_features(df, id_col="uri").collect()
    assert sorted(r["uri"] for r in feats) == ["u/1", "u/2"]
    resized = resize_images(df, id_col="uri").collect()
    assert sorted(r["uri"] for r in resized) == ["u/1", "u/2"]
    assert all(r["resized_sha"] is not None for r in resized)


def test_frame_sample_plan_carries_columns_without_join(spark):
    """carry_cols ride the explode so callers don't re-join the input to
    recover document attributes (review r8: m01 paid a join-back scan for
    'source' every run)."""
    from score_spark.operators.multimodal import frame_sample_plan

    df = spark.createDataFrame(
        [(1, "web", b"x" * 250), (2, "books", b"y" * 50)],
        ["doc_id", "source", "payload"],
    )
    rows = frame_sample_plan(
        df, "doc_id", "payload", every_n=1, carry_cols=("source",)
    ).collect()
    # doc 1: 3 frames (floor(250/100)+1), doc 2: 1 frame
    assert sorted((r["doc_id"], r["source"], r["frame_idx"]) for r in rows) == [
        (1, "web", 0), (1, "web", 1), (1, "web", 2), (2, "books", 0),
    ]
