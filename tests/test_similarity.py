"""Similarity-search semantics: brute force matches numpy; LSH-ANN recalls
planted neighbors."""

from __future__ import annotations

import numpy as np
import pytest
import pyspark.sql.functions as F

from score_spark.operators.similarity import ann_lsh_topk, cosine_topk


@pytest.fixture(scope="module")
def clustered(spark):
    """5 clusters x 20 vectors: cluster center + small noise — planted
    near-neighbor structure."""
    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for c in range(5):
        center = rng.standard_normal(64)
        for _ in range(20):
            v = center + 0.05 * rng.standard_normal(64)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_bruteforce_matches_numpy(clustered, spark):
    data = {r.vec_id: (np.array(r.embedding), r.label) for r in clustered.collect()}
    got = cosine_topk(clustered, clustered.filter(F.col("vec_id") == 0), k=5).collect()
    q = data[0][0]

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    expected = sorted(
        ((cos(q, v), vid) for vid, (v, _) in data.items() if vid != 0),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    assert [r.neighbor_id for r in got] == [vid for _, vid in expected]
    for r, (sim, _) in zip(got, expected):
        assert abs(r.sim - round(sim, 4)) <= 1e-4


def test_ann_recalls_planted_cluster(clustered):
    queries = clustered.filter(F.col("vec_id").isin([0, 20, 40]))
    exact = cosine_topk(clustered, queries, k=5).collect()
    approx = ann_lsh_topk(clustered, queries, k=5, n_planes=8, multi_probe=1).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q]) for q in exact_sets
    ]
    # same-cluster vectors nearly always share the LSH bucket; multi-probe
    # covers boundary flips
    assert sum(recalls) / len(recalls) >= 0.8
    # ANN must never return a wrong-cluster vector as a planted neighbor here
    labels = {r.vec_id: r.label for r in clustered.collect()}
    for r in approx:
        assert labels[r.neighbor_id] == labels[r.query_id]
