"""Property-based tests (hypothesis) for the custom operators whose
correctness argument is algorithmic rather than a single worked example:
random inputs, independent reference implementations (numpy / pandas /
brute force) as the oracle.

Example counts are kept small (each example runs Spark jobs); the goal is
shrinking counter-examples for boundary bugs (ties, empty groups, exact
rank hits, skewed keys), not statistical volume.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --------------------------------------------------------- exact percentiles

values = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    min_size=1,
    max_size=40,
)
groups_data = st.dictionaries(st.sampled_from(["a", "b", "c"]), values, min_size=1)
percentile = st.floats(min_value=0.0, max_value=1.0, allow_nan=False)


@SETTINGS
@given(data=groups_data, p=percentile, use_bounds=st.booleans())
def test_percentiles_match_numpy_linear(spark, data, p, use_bounds):
    """quantile_cont == numpy's 'linear' interpolation, per group, for any
    data (ties, negatives, single values) and any p — in both the computed
    stats mode and the covering-bounds mode."""
    from score_spark.operators.profiling import exact_percentiles_by_group

    rows = [(g, float(v)) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, ["g", "v"])
    bounds = None
    if use_bounds:
        allv = [v for _, v in rows]
        bounds = (min(allv) - 1.0, max(allv) + 1.0)
    got = {
        r["g"]: r["q"]
        for r in exact_percentiles_by_group(
            df, "g", "v", {"q": p}, round_dp=4, bounds=bounds
        ).collect()
    }
    for g, vs in data.items():
        want = float(np.quantile(np.array(vs, dtype=np.float64), p, method="linear"))
        assert abs(got[g] - want) <= 10**-4 + 1e-9 * abs(want), (g, got[g], want)


values_with_nan = st.lists(
    st.one_of(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        st.just(float("nan")),
    ),
    min_size=1,
    max_size=40,
)
groups_nan_data = st.dictionaries(
    st.sampled_from(["a", "b", "c"]), values_with_nan, min_size=1
)


@SETTINGS
@given(data=groups_nan_data, p=percentile)
def test_percentiles_ignore_nan_like_nanquantile(spark, data, p):
    """NaN values mixed into groups are excluded like quantile_cont /
    numpy's nanquantile (the exact ADVICE r5 failure mode: NaN sorts
    greatest in ORDER BY but poisons the bucket arithmetic, so it must be
    filtered, not ranked — VERDICT r6 #7 asked for this property). A group
    that is ALL NaN produces no percentile row at all."""
    from score_spark.operators.profiling import exact_percentiles_by_group

    rows = [(g, float(v)) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {
        r["g"]: r["q"]
        for r in exact_percentiles_by_group(df, "g", "v", {"q": p}, round_dp=4).collect()
    }
    for g, vs in data.items():
        arr = np.array(vs, dtype=np.float64)
        if np.all(np.isnan(arr)):
            assert g not in got or got[g] is None
        else:
            want = float(np.nanquantile(arr, p, method="linear"))
            assert abs(got[g] - want) <= 10**-4 + 1e-9 * abs(want), (g, got[g], want)


# --------------------------------------------------------------- as-of join

asof_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 1000), st.integers(0, 100)),
    min_size=0,
    max_size=30,
)


@SETTINGS
@given(left=asof_rows, right=asof_rows, buckets=st.sampled_from([None, 4]))
def test_asof_join_matches_pandas_merge_asof(spark, left, right, buckets):
    """asof semantics (most recent right_ts <= left_ts per key) == pandas
    merge_asof(direction='backward') for any key/time layout, with and
    without the skew-escape time_buckets path."""
    from score_spark.operators.asof import asof_join

    # dedup right rows on (k, ts) up front: at a duplicate right timestamp
    # the window last() winner is an unspecified tie (Spark's sort is not
    # guaranteed stable), so the property is only well-defined on unique
    # (k, ts) right rows — keep the max rv as the deterministic survivor
    rdedup: dict = {}
    for k, t, v in right:
        rdedup[(k, t)] = max(v, rdedup.get((k, t), v))
    right = [(k, t, v) for (k, t), v in sorted(rdedup.items())]
    ldf = spark.createDataFrame(
        [(k, t, v) for k, t, v in left] or [(0, 0, 0)], ["k", "ts", "lv"]
    )
    rdf = spark.createDataFrame(
        [(k, t, v) for k, t, v in right] or [(99, 0, 0)], ["k", "ts", "rv"]
    )
    got = (
        asof_join(ldf, rdf, on="k", right_value_cols=["rv"], time_buckets=buckets)
        .select("k", "ts", "lv", "rv_right")
        .toPandas()
        .sort_values(["k", "ts", "lv"])
        .reset_index(drop=True)
    )
    lp = pd.DataFrame([(k, t, v) for k, t, v in left] or [(0, 0, 0)], columns=["k", "ts", "lv"])
    rp = pd.DataFrame(
        [(k, t, v) for k, t, v in right] or [(99, 0, 0)], columns=["k", "ts", "rv"]
    )
    want = (
        pd.merge_asof(
            lp.sort_values("ts", kind="stable"),
            rp.sort_values("ts", kind="stable"),
            on="ts",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        )
        .sort_values(["k", "ts", "lv"])
        .reset_index(drop=True)
    )
    got_rv = [None if pd.isna(x) else int(x) for x in got["rv_right"]]
    want_rv = [None if pd.isna(x) else int(x) for x in want["rv"]]
    assert got_rv == want_rv, (got_rv, want_rv)


# ------------------------------------------------------------- hamming pairs

sigs_strategy = st.lists(
    st.integers(min_value=0, max_value=(1 << 63) - 1), min_size=0, max_size=12, unique=True
)


@SETTINGS
@given(sigs=sigs_strategy, max_h=st.integers(0, 6))
def test_hamming_pairs_equals_brute_force(spark, sigs, max_h):
    """Chunk-blocked candidate generation must return EXACTLY the pairs
    within max_h bits — the pigeonhole bound guarantees full recall, the
    post-filter full precision."""
    from score_spark.operators.dedup import hamming_pairs

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)] or [(0, 0)], ["doc_id", "simhash"]
    )
    got = {
        (r["d1"], r["d2"])
        for r in hamming_pairs(df, max_hamming=max_h).collect()
    }
    data = list(enumerate(sigs)) or [(0, 0)]
    want = {
        (i, j)
        for ii, (i, a) in enumerate(data)
        for (j, b) in data[ii + 1:]
        if bin(a ^ b).count("1") <= max_h
    }
    assert got == want


# ---------------------------------------------------------- session windows

events_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 10_000)),
    min_size=1,
    max_size=25,
)


@SETTINGS
@given(events=events_strategy)
def test_session_windows_match_gaps_and_islands(spark, events):
    """Spark's session_window (30 s gap) == the classic gaps-and-islands
    rewrite computed independently in Python, for any per-user event layout
    incl. exact-boundary gaps (>= gap starts a NEW session)."""
    import datetime as dt

    from score_spark.streaming.windows import session_stats

    base = dt.datetime(2024, 1, 1)
    rows = [(u, base + dt.timedelta(seconds=s), 1.0) for u, s in events]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in session_stats(df, gap="30 seconds").collect()
    }
    want = set()
    by_user: dict[int, list[int]] = {}
    for u, s in events:
        by_user.setdefault(u, []).append(s)
    for u, ts in by_user.items():
        ts.sort()
        start, n, prev = ts[0], 0, None
        for t in ts:
            if prev is not None and t - prev >= 30:
                want.add((u, base + dt.timedelta(seconds=start), n))
                start, n = t, 0
            n += 1
            prev = t
        want.add((u, base + dt.timedelta(seconds=start), n))
    assert got == want


# ------------------------------------------------------------ token packing

chunk_rows = st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 3), st.integers(1, 200)),
    min_size=1,
    max_size=30,
    unique_by=lambda t: (t[0], t[1]),
)


@SETTINGS
@given(rows=chunk_rows, budget=st.integers(8, 512), n_shards=st.sampled_from([1, 3]))
def test_sequence_packing_conserves_tokens_and_respects_offsets(spark, rows, budget, n_shards):
    """Packing invariants for any chunk stream: (a) total tokens conserved
    across packs per shard, (b) pack ids are the exact floor(offset/budget)
    sequence a serial walk of the (id, chunk_idx)-ordered stream produces."""
    from score_spark.operators.pipeline import pack_token_stream

    df = spark.createDataFrame(rows, ["doc_id", "chunk_idx", "n_words"])
    got = {
        (r["shard"], r["pack_id"]): (r["n_chunks"], r["pack_tokens"])
        for r in pack_token_stream(df, budget=budget, n_shards=n_shards).collect()
    }
    want: dict = {}
    for shard in range(n_shards):
        stream = sorted((d, c, n) for d, c, n in rows if d % n_shards == shard)
        off = 0
        for _, _, n in stream:
            pack = off // budget
            k = (shard, pack)
            nc, nt = want.get(k, (0, 0))
            want[k] = (nc + 1, nt + n)
            off += n
    assert got == want


# -------------------------------------------------------------- doc chunking

doc_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),
        st.lists(st.sampled_from(["w%d" % i for i in range(9)]), min_size=1, max_size=25),
    ),
    min_size=1,
    max_size=6,
    unique_by=lambda t: t[0],
)


@SETTINGS
@given(docs=doc_strategy, chunk_size=st.integers(2, 8), overlap=st.integers(0, 3))
def test_chunking_reconstructs_documents(spark, docs, chunk_size, overlap):
    """De-overlapping consecutive chunks must reproduce every document's
    exact word stream — no word lost, duplicated, or reordered, for any
    (chunk_size, overlap) with overlap < chunk_size."""
    if overlap >= chunk_size:
        overlap = chunk_size - 1
    from score_spark.operators.pipeline import chunk_documents

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in docs], ["doc_id", "text"]
    )
    out = (
        chunk_documents(df, chunk_size=chunk_size, overlap=overlap)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    stride = chunk_size - overlap
    by_doc: dict[int, list[str]] = {}
    for r in out:
        words = r["chunk_text"].split(" ")
        keep = words if r["chunk_idx"] == 0 else words[overlap:]
        by_doc.setdefault(r["doc_id"], []).extend(keep)
    want = {i: ws for i, ws in docs}
    assert by_doc == want


@settings(max_examples=8, deadline=None)
@given(
    n_rows=st.integers(min_value=0, max_value=120),
    n_strata=st.integers(min_value=1, max_value=4),
    k=st.integers(min_value=1, max_value=15),
)
def test_stratified_topk_matches_reference_semantics(spark, n_rows, n_strata, k):
    """Property: stratified_topk_sample == 'k smallest (md5(id), id) per
    stratum' computed independently in Python, for any shape — including
    strata smaller than k and the empty frame."""
    import hashlib

    from score_spark.operators.pipeline import stratified_topk_sample

    rows = [(i * 7 + 1, f"s{i % n_strata}") for i in range(n_rows)]
    df = spark.createDataFrame(rows, "doc_id long, source string") if rows else (
        spark.createDataFrame([], "doc_id long, source string")
    )
    got = {(r.source, r.doc_id) for r in stratified_topk_sample(df, ("source",), k=k).collect()}
    expect = set()
    for s in {src for _, src in rows}:
        ranked = sorted(
            (hashlib.md5(str(i).encode()).hexdigest(), i) for i, src in rows if src == s
        )[:k]
        expect |= {(s, i) for _, i in ranked}
    assert got == expect
