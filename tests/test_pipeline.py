"""Training-data pipeline operators: chunk boundaries vs a pure-Python
reference, hash-split determinism/stability, decontamination on planted
overlap."""

from __future__ import annotations

import pyspark.sql.functions as F

from score_spark.operators.pipeline import (
    chunk_documents,
    decontamination_report,
    hash_split,
)


def _ref_chunks(text: str, size: int, overlap: int):
    words = text.split(" ")
    stride = size - overlap
    out = []
    for idx, start in enumerate(range(0, len(words), stride)):
        w = words[start : start + size]
        out.append((idx, " ".join(w), len(w)))
    return out


def test_chunks_match_python_reference(spark):
    docs = [
        (0, "a"),  # shorter than one chunk
        (1, " ".join(f"w{i}" for i in range(10))),  # exactly one chunk
        (2, " ".join(f"w{i}" for i in range(24))),  # exact stride multiple
        (3, " ".join(f"w{i}" for i in range(25))),  # one word past a boundary
        (4, " ".join(f"w{i}" for i in range(100))),  # many chunks
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = chunk_documents(df, chunk_size=10, overlap=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text, r.n_words))
    for doc_id, text in docs:
        expected = _ref_chunks(text, 10, 2)
        assert sorted(by_doc[doc_id]) == expected, f"doc {doc_id}"


def test_chunks_cover_all_words_with_overlap(spark):
    text = " ".join(f"w{i}" for i in range(57))
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_size=16, overlap=4).collect(), key=lambda r: r.chunk_idx
    )
    stride = 12
    seen = set()
    for r in rows:
        words = r.chunk_text.split(" ")
        assert r.n_words == len(words) <= 16
        start = r.chunk_idx * stride
        assert words == [f"w{i}" for i in range(start, min(start + 16, 57))]
        seen.update(words)
    assert seen == {f"w{i}" for i in range(57)}  # full coverage, no gaps


def test_chunking_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(0, "x")], ["doc_id", "text"])
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=8, overlap=8)


def test_hash_split_is_deterministic_and_stable(spark):
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in hash_split(df).collect()}
    b = {r.doc_id: r.split for r in hash_split(df.repartition(7)).collect()}
    assert a == b  # content-stable: survives physical re-layout
    frac = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.75 <= frac <= 0.85  # ~0.8 by hex-threshold construction


def test_decontamination_finds_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    docs = spark.createDataFrame(
        [
            # shares shingles "alpha beta gamma" + "beta gamma delta" -> 2
            (0, "alpha beta gamma delta unrelated tail here"),
            # shares exactly one 3-gram with the benchmark -> below min_shared
            (1, "alpha beta gamma completely different continuation"),
            (2, "nothing in common with anything at all"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.n_shared for r in decontamination_report(docs, bench).collect()}
    assert 0 in got and got[0] >= 2
    assert 1 not in got and 2 not in got


def test_decontamination_broadcasts_benchmark_side(spark):
    """The benchmark shingle set must broadcast — a corpus-sized shuffle on
    the shingle key would defeat the operator's 100 TB shape."""
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i + 1} w{i + 2} w{i + 3}") for i in range(50)], ["doc_id", "text"]
    )
    bench = docs.filter(F.col("doc_id") < 2)
    plan = decontamination_report(docs, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastQueryStage" in plan, plan


def test_pii_scrub_redacts_and_counts(spark):
    from score_spark.operators.pipeline import scrub_pii

    df = spark.createDataFrame(
        [
            (0, "mail me at jo.doe+x@sub.example.org or call +1 (555) 123-4567 now"),
            (1, "server 192.168.10.7 and 10.0.0.1 are up"),
            # an email whose local/domain parts look IP-ish: the email pattern
            # scrubs it FIRST, so the ipv4 counter must not double-count it
            (2, "a1.2.3.4@x.com"),
            (3, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert got[0].n_email == 1 and got[0].n_phone == 1
    assert "[EMAIL]" in got[0].text and "[PHONE]" in got[0].text
    assert "@" not in got[0].text and "555" not in got[0].text
    assert got[1].n_ipv4 == 2 and got[1].text.count("[IP]") == 2
    assert got[2].n_email == 1 and got[2].n_ipv4 == 0  # sequential, no double count
    assert got[3].text == "nothing sensitive here"
    assert (got[3].n_email, got[3].n_ipv4, got[3].n_phone) == (0, 0, 0)


def test_pack_token_stream_matches_reference(spark):
    from score_spark.operators.pipeline import pack_token_stream

    # one shard (all ids even), chunk sizes chosen to straddle the budget:
    # stream offsets 0,30,60,90,... -> pack changes where offset//64 does
    rows = [(2 * i, j, 30) for i in range(3) for j in range(2)]  # 6 chunks x 30 tok
    df = spark.createDataFrame(rows, ["doc_id", "chunk_idx", "n_words"])
    got = sorted(
        pack_token_stream(df, budget=64, n_shards=1).collect(),
        key=lambda r: (r.shard, r.pack_id),
    )
    # offsets 0,30 -> pack0; 60,90 -> pack0? 60//64=0, 90//64=1; 120,150 -> 1,2
    # reference: pack of chunk = offset // 64 for offsets 0,30,60,90,120,150
    expected = {}
    off = 0
    for _ in rows:
        expected.setdefault(off // 64, [0, 0])
        expected[off // 64][0] += 1
        expected[off // 64][1] += 30
        off += 30
    assert [(r.pack_id, r.n_chunks, r.pack_tokens) for r in got] == [
        (k, v[0], v[1]) for k, v in sorted(expected.items())
    ]


def test_pack_token_stream_shards_independently(spark):
    from score_spark.operators.pipeline import pack_token_stream

    rows = [(i, 0, 100) for i in range(16)]  # ids 0..15 spread over 8 shards
    df = spark.createDataFrame(rows, ["doc_id", "chunk_idx", "n_words"])
    got = pack_token_stream(df, budget=128, n_shards=8).collect()
    # each shard gets 2 chunks of 100 tokens: offsets 0 and 100 -> packs 0, 0
    by_shard = {}
    for r in got:
        by_shard.setdefault(r.shard, []).append((r.pack_id, r.n_chunks, r.pack_tokens))
    assert set(by_shard) == set(range(8))
    for shard, packs in by_shard.items():
        assert sorted(packs) == [(0, 2, 200)], (shard, packs)


def test_c01_fused_order_matches_global_sort(spark, sf_dir):
    """c01's ranged_by_id fusion must produce byte-identical row order to a
    true global orderBy over the chunk output."""
    from score_spark.io import load_table
    from score_spark.operators.pipeline import c01_chunking, chunk_documents

    got = c01_chunking(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    want = chunk_documents(d, chunk_size=32, overlap=8).orderBy("doc_id", "chunk_idx")
    assert got.collect() == want.collect()


def test_hash_sample_per_stratum_rates(spark):
    from score_spark.operators.pipeline import hash_sample

    df = spark.createDataFrame([(i, "web" if i % 2 else "wiki") for i in range(400)], ["doc_id", "source"])
    out = hash_sample(df, {"web": "4" * 32, "wiki": "f" * 32}, strata_col="source")
    got = out.groupBy("source").count().collect()
    by = {r["source"]: r["count"] for r in got}
    assert by["wiki"] == 200  # threshold f..f keeps everything
    assert 20 <= by["web"] <= 80  # ~1/4 of 200, binomial spread
    # deterministic: same rows every run
    assert sorted(r.doc_id for r in out.collect()) == sorted(r.doc_id for r in out.collect())
    # map-only: no exchange in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_stratified_topk_sample_exact_k_and_layout_independent(spark):
    from score_spark.operators.pipeline import stratified_topk_sample

    rows = [(i, "s" + str(i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    a = stratified_topk_sample(df, ("source",), k=7)
    got = {(r["source"], r["doc_id"]) for r in a.collect()}
    counts = {}
    for s, _ in got:
        counts[s] = counts.get(s, 0) + 1
    assert counts == {"s0": 7, "s1": 7, "s2": 7}
    # layout independence: a radically different partitioning yields the
    # SAME sampled ids (the partition-local pre-filter is a superset of the
    # global top-k by construction)
    b = stratified_topk_sample(df.repartition(17, "doc_id"), ("source",), k=7)
    assert {(r["source"], r["doc_id"]) for r in b.collect()} == got
    c = stratified_topk_sample(df.coalesce(1), ("source",), k=7)
    assert {(r["source"], r["doc_id"]) for r in c.collect()} == got
    # matches the single-window definition (oracle semantics)
    import hashlib

    def md5(i):
        return hashlib.md5(str(i).encode()).hexdigest()

    expect = set()
    for s in ("s0", "s1", "s2"):
        ids = sorted((md5(i), i) for i, src in rows if src == s)[:7]
        expect |= {(s, i) for _, i in ids}
    assert got == expect


def test_stratified_topk_small_stratum_keeps_all(spark):
    from score_spark.operators.pipeline import stratified_topk_sample

    df = spark.createDataFrame([(1, "tiny"), (2, "tiny")], ["doc_id", "source"])
    got = stratified_topk_sample(df, ("source",), k=10).collect()
    assert sorted(r.doc_id for r in got) == [1, 2]


def test_pack_token_stream_raises_on_unsizeable_input(spark, tmp_path):
    """A file listed by inputFiles() but missing from listStatus (deleted
    between listings, URI drift) must RAISE, not silently derive a partial
    total -> different n_shards -> different pack boundaries (ADVICE r6:
    total == 0 collapsed n_shards to 1 with no error)."""
    import glob
    import os

    import pytest

    from score_spark.operators.pipeline import pack_token_stream

    src = str(tmp_path / "chunks")
    spark.range(100).selectExpr(
        "id AS doc_id", "CAST(id % 4 AS INT) AS chunk_idx", "CAST(10 AS INT) AS n_words"
    ).repartition(4).write.parquet(src)
    df = spark.read.parquet(src)
    df.count()  # pin the file listing before the delete
    victim = sorted(glob.glob(f"{src}/part-*.parquet"))[0]
    os.remove(victim)
    with pytest.raises(RuntimeError, match="n_shards"):
        pack_token_stream(df)  # n_shards=None -> must size the input files


def test_pack_token_stream_rejects_non_integral_ids(spark):
    import pytest

    from score_spark.operators.pipeline import pack_token_stream

    df = spark.createDataFrame(
        [("doc-1", 0, 10)], "doc_id string, chunk_idx int, n_words int"
    )
    with pytest.raises(ValueError, match="integral id"):
        pack_token_stream(df, n_shards=4)


def test_pack_token_stream_rows_frame_on_tied_keys(spark):
    """Duplicate (id, chunk_idx) keys (a unioned / re-epoched chunk stream)
    must pack SEQUENTIALLY: the default RANGE window frame summed all peer
    rows at a tied key, corrupting every offset after the duplicate
    (review r8). With ROWS, two 10-word chunks at the same key under
    budget=8 get offsets 0 and 10 -> packs 0 and 1; RANGE gave both rows
    offset 10 -> both in pack 1."""
    from score_spark.operators.pipeline import pack_token_stream

    df = spark.createDataFrame(
        [(1, 0, 10), (1, 0, 10)], "doc_id long, chunk_idx int, n_words int"
    )
    out = {r.pack_id: (r.n_chunks, r.pack_tokens)
           for r in pack_token_stream(df, budget=8, n_shards=1).collect()}
    assert out == {0: (1, 10), 1: (1, 10)}


def test_pack_token_stream_rejects_nonpositive_budget(spark):
    """budget=0 under non-ANSI SQL made `_off DIV 0` NULL row-wide, silently
    collapsing each shard into one NULL pack (review r8)."""
    import pytest

    from score_spark.operators.pipeline import pack_token_stream

    df = spark.createDataFrame([(1, 0, 10)], "doc_id long, chunk_idx int, n_words int")
    with pytest.raises(ValueError, match="budget"):
        pack_token_stream(df, budget=0, n_shards=1)


def test_pack_token_stream_negative_ids_shard_in_range(spark):
    """xxhash64-derived ids are negative ~half the time; sign-preserving %
    put them in shards (-n, 0), doubling the shard-group count the sizing
    math assumes (review r8). pmod keeps every shard in [0, n)."""
    from score_spark.operators.pipeline import pack_token_stream

    df = spark.createDataFrame(
        [(-9, 0, 4), (-2, 0, 4), (3, 0, 4), (8, 0, 4)],
        "doc_id long, chunk_idx int, n_words int",
    )
    shards = {r.shard for r in pack_token_stream(df, budget=64, n_shards=4).collect()}
    assert shards <= {0, 1, 2, 3} and len(shards) >= 2


def test_hash_split_rejects_malformed_threshold(spark):
    """md5 output is lowercase hex; an uppercase threshold silently skewed
    the split (~62.5% instead of ~80% for 'C'*32) instead of erroring
    (review r8)."""
    import pytest

    from score_spark.operators.pipeline import hash_sample, hash_split

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="LOWERCASE"):
        hash_split(df, train_hex_threshold="C" * 32)
    with pytest.raises(ValueError, match="LOWERCASE"):
        hash_sample(df, {"web": "0X"}, strata_col="doc_id")


def test_scrub_pii_rejects_counter_collision(spark):
    """Re-scrubbing already-annotated data would emit duplicate n_<kind>
    columns (review r8)."""
    import pytest

    from score_spark.operators.pipeline import scrub_pii

    df = spark.createDataFrame([("x", 0)], "text string, n_email int")
    with pytest.raises(ValueError, match="n_email"):
        scrub_pii(df)
    # count_cols=False has no counter outputs, so no collision
    assert scrub_pii(df, count_cols=False).columns == ["n_email", "text"]


def test_percentiles_no_view_leak_on_bad_args(spark):
    """A bad bounds/n_buckets arg previously raised AFTER registering the
    source temp view, leaking _pct_src_<vid> per failed call (review r8)."""
    import pytest

    from score_spark.operators.profiling import exact_percentiles_by_group

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    before = {t.name for t in spark.catalog.listTables()}
    with pytest.raises((TypeError, ValueError)):
        exact_percentiles_by_group(df, "g", "v", {"p50": 0.5}, bounds=("low", "high"))
    with pytest.raises((TypeError, ValueError)):
        exact_percentiles_by_group(df, "g", "v", {"p50": 0.5}, n_buckets="4k")
    after = {t.name for t in spark.catalog.listTables()}
    assert after == before


def test_scrub_pii_guard_catches_case_variant_collisions(spark):
    """Spark resolves column names case-insensitively, so an existing
    N_EMAIL collides with the injected n_email counter just the same — the
    hand-rolled guard compared un-lowercased candidates and missed it
    (review r8; now the shared textstats guard)."""
    import pytest

    from score_spark.operators.pipeline import scrub_pii

    df = spark.createDataFrame([("a@b.co text", 1)], ["text", "N_EMAIL"])
    with pytest.raises(ValueError, match="collide"):
        scrub_pii(df)


def test_chunk_documents_null_text_emits_no_chunks(spark):
    """NULL text previously produced one phantom chunk (chunk_text='',
    n_words=32) via NULL-skipping greatest/least — 32 fake tokens per NULL
    doc flowing into pack totals (review r9, confirmed by execution)."""
    from score_spark.operators.pipeline import chunk_documents

    df = spark.createDataFrame(
        [(1, None), (2, "a b c")], "doc_id bigint, text string"
    )
    out = chunk_documents(df, chunk_size=32, overlap=8).collect()
    assert {r.doc_id for r in out} == {2}, out


def test_stratified_topk_excludes_null_ids(spark):
    """md5(NULL) ranks NULLS FIRST in Spark (always sampled) and NULLS LAST
    in DuckDB (never sampled) — engine-divergent; NULL ids are excluded
    (review r9)."""
    from score_spark.operators.pipeline import stratified_topk_sample

    df = spark.createDataFrame(
        [(None, "s"), (1, "s"), (2, "s"), (3, "s")], "doc_id bigint, source string"
    )
    got = {r.doc_id for r in stratified_topk_sample(df, ("source",), k=2).collect()}
    assert None not in got and len(got) == 2, got


def test_pack_token_stream_validates_before_file_sizing(spark):
    """Schema/argument validation must precede the driver-side n_shards
    file-sizing derivation (review r9): a string id with n_shards=None
    raises immediately."""
    import pytest

    from score_spark.operators.pipeline import pack_token_stream

    chunks = spark.createDataFrame(
        [("a", 0, 5)], "doc_id string, chunk_idx int, n_words int"
    )
    with pytest.raises(ValueError, match="integral id"):
        pack_token_stream(chunks, budget=512, n_shards=None)
