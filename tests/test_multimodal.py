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
