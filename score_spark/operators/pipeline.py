"""Training-data pipeline operators: document chunking, deterministic
train/eval hash splits, and benchmark decontamination.

These are the plumbing every large-scale LLM data pipeline needs between
"raw documents" and "training batches" (reference has no counterpart —
beyond-reference surface per BASELINE.json's north star):

- ``chunk_documents``: token-bounded overlapping windows per document.
  Map-only — split, sequence of chunk starts, explode, slice — all JVM
  built-ins, so at 100 TB it's one codegen'd scan stage with zero shuffle;
  the explode fans out rows only (the word array never crosses a stage
  boundary).
- ``hash_split``: content-stable train/eval assignment from a hash of the
  id, as a lexicographic threshold on the md5 hex string. Deterministic
  across runs/engines (no rand()), no shuffle, and the split survives
  re-partitioning/backfills because it depends only on the row id.
- ``decontamination_report``: documents sharing word n-grams with a
  benchmark/eval set. The benchmark side is small by definition, so its
  distinct shingle set is BROADCAST: the corpus pass stays map-only + one
  small aggregate — never a corpus x corpus join.
- ``hash_sample`` / ``stratified_topk_sample``: deterministic data-mixing
  sampling (r6). Rate mode is a map-only md5-threshold filter with optional
  per-stratum rates; exact-k mode is a two-phase top-k-by-hash (partition-
  local rank, then a global rank over <= k * P survivors) so a handful of
  hot strata never funnel the corpus through single-stratum sort tasks.
  Both are content-stable: no rand(), membership survives repartitioning,
  identical output on any cluster width or engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from score_spark.functions.text import shingles, tokens
from score_spark.io import EXPLODE_BYTES_PER_TASK, fan_out, load_table, presentation_sort

# train share ~0.8 of the md5 hex space: 'c'*32 / 16^32 = 12/16 + 12/256 + ...
_TRAIN_HEX = "c" * 32


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 32,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    ranged_by_id: bool = False,
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_words) overlapping word windows.

    Chunk i covers words [i*stride, i*stride + chunk_size) with
    stride = chunk_size - overlap; every word index < n starts at most one
    chunk, so the final chunk may be short. Pure built-ins: the sequence of
    starts is computed per row and exploded, the slice+concat happen on the
    exploded rows — one whole-stage-codegen scan, no Python, no shuffle.

    ``ranged_by_id=True`` spreads via a range partition on the id instead of
    round-robin fan-out. For a caller that wants id-ordered chunk output
    this halves the work: a global orderBy AFTER chunking would make the
    range sampler re-execute the whole chunk pipeline (split+explode+slice
    run twice), while sampling the raw input only re-reads the cheap scan —
    chunking runs once and the total order is a free sortWithinPartitions
    (c01: 0.47 s -> 0.24 s at sf0.1, one chunk pass at any scale)."""
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}")
    stride = chunk_size - overlap
    words = F.split(F.col(text_col), " ")
    # NULL text -> NO chunk rows: greatest(NULL-1, 0)=0 and least(32, NULL)
    # =32 under Spark's NULL-skipping greatest/least, so a NULL doc emitted
    # one phantom chunk claiming chunk_size words — 32 fake tokens per NULL
    # doc flowing into pack_token_stream (review r9, confirmed by
    # execution; the oracles mirror with WHERE text IS NOT NULL)
    df = df.filter(F.col(text_col).isNotNull())
    spread = (
        df.repartitionByRange(id_col)
        if ranged_by_id
        else fan_out(df, min_bytes_per_task=EXPLODE_BYTES_PER_TASK)  # chunk explode
    )
    base = spread.select(
        F.col(id_col), words.alias("_w"), F.size(words).alias("_n")
    )
    starts = F.sequence(F.lit(0), F.greatest(F.col("_n") - 1, F.lit(0)), F.lit(stride))
    return base.select(F.col(id_col), F.explode(starts).alias("_start"), "_w", "_n").select(
        F.col(id_col),
        (F.col("_start") / stride).cast("int").alias("chunk_idx"),
        F.concat_ws(" ", F.slice("_w", F.col("_start") + 1, chunk_size)).alias("chunk_text"),
        F.least(F.lit(chunk_size), F.col("_n") - F.col("_start")).cast("int").alias("n_words"),
    )


def _check_hex_threshold(thr: str) -> None:
    """md5() yields LOWERCASE hex compared lexicographically; an uppercase
    or malformed threshold doesn't error — it silently skews the split
    ('C' sorts below 'a'-'f' but above digits, so 'C'*32 keeps ~62.5%
    instead of the ~80% the caller intended). Fail loudly (review r8)."""
    import re

    if not isinstance(thr, str) or not re.fullmatch(r"[0-9a-f]{1,32}", thr):
        raise ValueError(
            f"hex threshold must be 1-32 LOWERCASE hex chars (compared "
            f"against lowercase md5 output), got {thr!r}"
        )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_hex_threshold: str = _TRAIN_HEX,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic content-stable split: md5 of the stringified id compared
    lexicographically against a hex threshold (both engines produce identical
    lowercase hex, so the assignment is reproducible anywhere). ~0.8/0.2 at
    the default threshold."""
    _check_hex_threshold(train_hex_threshold)
    h = F.md5(F.col(id_col).cast("string"))
    return df.withColumn(
        split_col,
        F.when(h < F.lit(train_hex_threshold), F.lit("train")).otherwise(F.lit("eval")),
    )


def decontamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_shared: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    ranged_by_id: bool = False,
) -> DataFrame:
    """(id, n_shared) for corpus documents sharing >= min_shared distinct
    word n-grams with ANY benchmark document — the standard pre-training
    decontamination check. The benchmark's distinct shingle set is broadcast
    (eval sets are thousands of rows, not billions), so the corpus side is
    one shingling scan + a broadcast semi-structured join + a small count
    aggregate; nothing corpus-sized shuffles besides the (id, count) rows.

    ``ranged_by_id=True`` spreads the corpus by range-partitioning on the id
    instead of round-robin fan-out. One exchange then serves three needs:
    CPU spread for the shingling, the count aggregate's clustering (the
    broadcast join and explode are narrow, so the partitioning survives to
    the groupBy — no agg exchange), and an id-ordered output via a free
    sortWithinPartitions (the caller adds it; partitions are ordered id
    ranges). CAVEAT, measured: the range sampler re-executes the child plan
    to sample keys — for wide text rows that second scan costs more than
    the two exchanges it saves (fused c03 1.76 s vs 0.98 s at sf0.1), so
    the default stays fan_out; use ranged_by_id only when the input rows
    are narrow or the scan is cheap relative to the aggregate."""
    # split hoisted before shingling on both sides: the shingle slice lambda
    # references the token array once per shingle, and interpreted HOFs
    # re-run an inlined split() per reference (quadratic in doc length
    # without the hoist — see functions/text._tokens_sql)
    bench_sh = (
        benchmark.select(tokens(text_col).alias("_toks"))
        .select(F.explode(shingles(n=n, tokens_col="_toks")).alias("sh"))
        .distinct()
    )
    spread = (
        docs.repartitionByRange(id_col)
        if ranged_by_id
        else fan_out(docs, min_bytes_per_task=EXPLODE_BYTES_PER_TASK)  # shingle explode
    )
    doc_sh = spread.select(F.col(id_col), tokens(text_col).alias("_toks")).select(
        F.col(id_col), F.explode(shingles(n=n, tokens_col="_toks")).alias("sh")
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# backslash-free patterns: identical semantics under Java regex (Spark) and
# RE2 (DuckDB) with no string-literal escaping divergence between engines
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+", "[EMAIL]"),
    ("ipv4", "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}", "[IP]"),
    ("phone", "[+][0-9][0-9 ()-]{7,}[0-9]", "[PHONE]"),
)


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
    count_cols: bool = True,
) -> DataFrame:
    """Redact PII-shaped spans in place, sequentially per pattern (each
    pattern counts against the text the previous one already scrubbed, so a
    span never double-counts). Map-only codegen'd regexp_replace chain — at
    100 TB this fuses into the scan stage with zero shuffle. Returns the
    frame with ``text_col`` scrubbed plus n_<kind> counters."""
    if count_cols:
        # re-scrubbing already-annotated data would emit duplicate n_<kind>
        # columns — ambiguous downstream references or double-persisted
        # columns; ONE audited boundary guard (textstats'), which also
        # lowercases the candidate side — the hand-rolled copy missed
        # case-variant collisions like an existing N_EMAIL (review r8)
        from score_spark.operators.textstats import _check_helper_collisions

        _check_helper_collisions(
            df,
            tuple(f"n_{kind}" for kind, _, _ in patterns),
            op="scrub_pii (or pass count_cols=False)",
        )
    scrubbed = F.col(text_col)
    counters = []
    for kind, pat, token in patterns:
        counters.append(F.regexp_count(scrubbed, F.lit(pat)).alias(f"n_{kind}"))
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    cols = [c for c in df.columns if c != text_col]
    sel = [*cols, scrubbed.alias(text_col)] + (counters if count_cols else [])
    return df.select(*sel)


def pack_token_stream(
    chunks: DataFrame,
    budget: int = 512,
    n_shards: int | None = None,
    id_col: str = "doc_id",
    order_col: str = "chunk_idx",
    size_col: str = "n_words",
) -> DataFrame:
    """GPT-style stream packing: chunks concatenate in (id, chunk_idx) order
    into a token stream per shard, and each chunk lands in the pack holding
    its first token (pack_id = floor(stream_offset / budget)); the training
    slicer cuts exactly at the budget, so chunks may straddle boundaries.
    Sharding by id hash keeps the window (the only shuffle) parallel at
    scale instead of a single global cumsum partition (a fixed low shard
    count would mean a handful of sort tasks over 100 TB — VERDICT r3 #3).

    ``n_shards`` defaults to a pure function of the INPUT — one shard per
    ~64 MB of source file bytes, rounded up to a power of two (driver-side
    file metadata, no Spark job) — so the same data packs identically on any
    cluster width. r4's defaultParallelism default made pack boundaries a
    function of core count (ADVICE r4/VERDICT r5 #5: environment-dependent
    library output). Growing the INPUT still changes the derived count (and
    therefore boundaries), as any data-dependent default must; pass an
    explicit ``n_shards`` to pin packing across dataset versions (the gated
    c05 query pins 8). Inputs with no listable files (in-memory frames) fall
    back to a fixed 16. Per-(shard, pack_id) totals are deterministic either
    way once n_shards is fixed.
    pack_id uses SQL integer division (``DIV`` on longs),
    not a double intermediate, so offsets stay exact past 2^53 tokens per
    shard. Returns per-pack (shard, pack_id, n_chunks, pack_tokens)."""
    from pyspark.sql import Window

    # schema/argument validation FIRST: the n_shards default below runs a
    # driver-side file-sizing loop (minutes at ~800k files) that would be
    # wasted work when the call was always going to raise (review r9)
    id_type = chunks.schema[id_col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        # a non-numeric id makes the shard modulo NULL for every row,
        # silently collapsing the corpus into one null shard — a single
        # window task over everything, the exact scale-killer sharding
        # exists to prevent (review r7). The modulo itself stays
        # (deterministic, mirrored by the c05 oracle); callers with string
        # ids hash them to a long first (e.g. xxhash64), which keeps
        # packing content-stable.
        raise ValueError(
            f"pack_token_stream shards by pmod({id_col!r}, n_shards), which "
            f"needs an integral id column (got {id_type}); derive one first, "
            f"e.g. F.xxhash64({id_col!r})"
        )
    if not isinstance(budget, int) or budget < 1:
        # budget=0 under non-ANSI SQL makes `_off DIV 0` NULL for every row,
        # silently collapsing each shard into one NULL pack (review r8)
        raise ValueError(f"budget must be a positive int, got {budget!r}")

    if n_shards is None:
        # sizes come from the Hadoop FileSystem API, not os.path: input
        # files are URIs of ANY scheme (hdfs://, s3a://, percent-encoded
        # file:); a driver-local stat would silently see 0 bytes off-box
        # and collapse the default to the fixed fallback (review r6).
        # One listStatus per PARENT DIRECTORY, not one RPC per file — at
        # ~800k files a per-file getFileStatus loop is minutes of serial
        # driver latency (review r6 #8).
        try:
            files = chunks.inputFiles()
        except Exception:
            files = []
        if not files:
            n_shards = 16  # non-file input (in-memory frame): documented fallback
        else:
            sc = chunks.sparkSession.sparkContext
            hconf = sc._jsc.hadoopConfiguration()
            jvm = sc._jvm
            wanted = set(files)
            parents = {f.rsplit("/", 1)[0] for f in files}
            total = 0
            matched = 0
            try:
                for d in sorted(parents):
                    jdir = jvm.org.apache.hadoop.fs.Path(d)
                    fs = jdir.getFileSystem(hconf)
                    for st in fs.listStatus(jdir):
                        if st.getPath().toString() in wanted:
                            total += st.getLen()
                            matched += 1
                if matched != len(wanted):
                    # listStatus not string-matching inputFiles (URI
                    # encoding/scheme drift, files deleted between listings)
                    # must fail like a thrown exception: a PARTIAL total
                    # derives a different n_shards than a healthy run — the
                    # silent environment-dependent repacking this guard
                    # exists to prevent (ADVICE r6: total == 0 collapsed
                    # n_shards to 1 with no error at all).
                    raise RuntimeError(
                        f"matched {matched} of {len(wanted)} input files"
                    )
            except Exception as e:
                # a partial size would derive a DIFFERENT shard count than a
                # healthy run over the same data — the exact
                # non-reproducibility this default exists to prevent. Fail
                # loudly instead of silently repacking (review r6 #2).
                raise RuntimeError(
                    "pack_token_stream could not size its input files to derive "
                    "n_shards deterministically; pass n_shards explicitly"
                ) from e
            raw = max(1, -(-total // (64 << 20)))
            n_shards = 1 << (raw - 1).bit_length()
    # pmod, not %: sign-preserving modulo on negative ids (e.g. the
    # xxhash64-derived longs the id-type error above recommends) would emit
    # shards in (-n, n) — up to 2n-1 groups, breaking the ~64MB-per-shard
    # sizing. The oracle mirrors with ((id % n) + n) % n (review r8).
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).alias("shard")
    # ROWS frame, not the default RANGE: RANGE sums ALL peer rows at a tied
    # (id, order) key, corrupting every offset after a duplicate chunk key;
    # ROWS packs sequentially, matching the oracle's explicit ROWS
    # UNBOUNDED PRECEDING (review r8). size_col joins the sort key as the
    # tie-breaker: duplicate (id, order) keys with DIFFERENT sizes would
    # otherwise get engine/run-dependent cumulative offsets near pack
    # boundaries (same-size ties are offset-invariant, so the order is then
    # fully determined for packing purposes); the oracle orders identically.
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col, order_col, size_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offset = (F.sum(size_col).over(w) - F.col(size_col)).cast("long")
    pack_id = F.expr(f"_off DIV {int(budget)}").alias("pack_id")
    return (
        chunks.select(shard, id_col, order_col, size_col)
        .select("*", offset.alias("_off"))
        .select("*", pack_id)
        .groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(size_col).cast("long").alias("pack_tokens"),
        )
    )


# ------------------------------------------------------------------ queries


def c01_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bounded overlapping document chunks (32-word windows, 8-word
    overlap) in chunk order — the encoder-input step of a training pipeline.
    Map-only split+sequence+explode+slice; range-partitioned on doc_id so
    the id-ordered output is a free in-partition sort (see
    chunk_documents)."""
    d = load_table(spark, sf_dir, "documents")
    # one chunk pass: range spread on doc_id + free in-partition total order
    # (see chunk_documents ranged_by_id)
    return chunk_documents(d, chunk_size=32, overlap=8, ranged_by_id=True).sortWithinPartitions(
        "doc_id", "chunk_idx"
    )


# DuckDB: range(0, n, stride) enumerates exactly the starts < n that Spark's
# sequence(0, n-1, stride) does (n >= 1 always: string_split('') = ['']);
# list slicing l[a:b] is 1-based inclusive, mirroring F.slice(l, a, size)
ORACLE_C01 = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
           WHERE text IS NOT NULL),
s AS (SELECT doc_id, w, unnest(range(0, greatest(len(w), 1), 24)) AS start FROM w)
SELECT doc_id,
       CAST(start // 24 AS INT) AS chunk_idx,
       array_to_string(w[start + 1 : start + 32], ' ') AS chunk_text,
       CAST(least(32, len(w) - start) AS INT) AS n_words
FROM s
ORDER BY doc_id, chunk_idx
"""


def hash_sample(
    df: DataFrame,
    hex_threshold: str | dict[str, str],
    id_col: str = "doc_id",
    strata_col: str | None = None,
) -> DataFrame:
    """Deterministic rate sampling: keep a row iff md5(id) falls under a hex
    threshold — the same content-stable mechanism as ``hash_split``, so the
    sample is reproducible across runs, engines, and cluster widths (no
    rand()), and a row's membership never changes under repartitioning or
    backfills. MAP-ONLY: zero shuffle at any scale.

    Pass a dict keyed by ``strata_col`` values for per-stratum rates — the
    data-mixing primitive (downsample web 10x, keep wiki at 1x): the
    threshold resolves per row via a CASE chain over the (small, fixed)
    strata map. Unlisted strata keep everything ('f' * 32)."""
    h = F.md5(F.col(id_col).cast("string"))
    if isinstance(hex_threshold, str):
        _check_hex_threshold(hex_threshold)
        return df.filter(h < F.lit(hex_threshold))
    if strata_col is None:
        raise ValueError("per-stratum thresholds need strata_col")
    for thr in hex_threshold.values():
        _check_hex_threshold(thr)
    expr = F.lit("f" * 32)
    for value, thr in sorted(hex_threshold.items()):
        expr = F.when(F.col(strata_col) == value, F.lit(thr)).otherwise(expr)
    return df.filter(h < expr)


def stratified_topk_sample(
    df: DataFrame,
    strata_cols: tuple[str, ...],
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACTLY-k-per-stratum deterministic sample: rank rows in each stratum
    by (md5(id), id) and keep the k smallest — uniform-without-replacement
    (a cryptographic hash of the id is order-independent of any data
    attribute) yet fully reproducible, unlike sampleBy's rng draw.

    Skew posture: a single window over the stratum key would sort each
    stratum in ONE task — with a handful of strata that is the whole corpus
    through few tasks. Instead the classic two-phase top-k: a partition-local
    rank over (strata, spark_partition_id) — P times more keys, so the
    exchange spreads — keeps at most k rows per (stratum, partition), then
    the global rank runs over <= k * P survivor rows per stratum. The local
    pre-filter can never drop a global top-k row (a stratum's global top-k
    within one partition is a subset of that partition's local top-k), so
    the result is layout-independent."""
    from pyspark.sql import Window

    # the _h/_pid/_rk helper names are injected by name; an input column
    # with one of those names would bind ambiguously (review r8) — shared
    # guard, not a re-implementation
    from score_spark.operators.textstats import _check_helper_collisions

    _check_helper_collisions(df, ("_h", "_pid", "_rk"), op="stratified_topk_sample")
    # NULL ids: md5(NULL) is NULL, which Spark's ascending window ranks
    # FIRST (always sampled) while DuckDB ranks it LAST (never sampled) —
    # engine-divergent and meaningless as a sample member (review r9)
    df = df.filter(F.col(id_col).isNotNull())
    h = F.md5(F.col(id_col).cast("string")).alias("_h")
    base = df.select(*strata_cols, id_col, h, F.spark_partition_id().alias("_pid"))
    w_local = Window.partitionBy(*strata_cols, "_pid").orderBy("_h", id_col)
    survivors = (
        base.withColumn("_rk", F.row_number().over(w_local)).filter(F.col("_rk") <= k).drop("_rk")
    )
    w_global = Window.partitionBy(*strata_cols).orderBy("_h", id_col)
    return (
        survivors.withColumn("_rk", F.row_number().over(w_global))
        .filter(F.col("_rk") <= k)
        .select(*strata_cols, id_col)
    )


# per-source rate thresholds for the gated sampling summary — exercises the
# per-stratum CASE chain INCLUDING the unlisted-strata keep-everything
# default: src0 keeps ~1/4 of the hex space, src1 ~1/2, every other source
# falls through to 'f'*32 (keep all)
_RATE_THRESHOLDS = {"src0": "4" * 32, "src1": "8" * 32}


def c02_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic subset-selection family in one gated row (merged r6):
    the train/eval hash split PLUS the two sampling operators, summarized
    per source so the oracle pins the EXACT selected sets, not just counts —
    sum(doc_id) over the top-k sample changes if even one selected id
    differs, and the rate-sample count pins the threshold arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    split_counts = (
        hash_split(d)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
            .cast("long")
            .alias("n_train"),
        )
    )
    rate = (
        hash_sample(d, _RATE_THRESHOLDS, strata_col="source")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_rate_sampled"))
    )
    topk = (
        stratified_topk_sample(d, ("source",), k=25)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_topk"),
            F.sum("doc_id").alias("topk_id_sum"),  # pins the exact sampled set
        )
    )
    return (
        split_counts.join(F.broadcast(rate), "source")
        .join(F.broadcast(topk), "source")
        .transform(presentation_sort, "source")
    )


ORACLE_C02 = f"""
WITH split AS (
  SELECT source,
         count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         CAST(sum(CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '{_TRAIN_HEX}' THEN 1 ELSE 0 END) AS BIGINT) AS n_train
  FROM documents GROUP BY source
),
rate AS (
  SELECT source, count(*) AS n_rate_sampled
  FROM documents
  WHERE md5(CAST(doc_id AS VARCHAR)) <
        CASE source WHEN 'src0' THEN '{_RATE_THRESHOLDS["src0"]}'
                    WHEN 'src1' THEN '{_RATE_THRESHOLDS["src1"]}'
                    ELSE '{"f" * 32}' END
  GROUP BY source
),
topk AS (
  SELECT source, count(*) AS n_topk, CAST(sum(doc_id) AS BIGINT) AS topk_id_sum
  FROM (
    SELECT source, doc_id,
           row_number() OVER (PARTITION BY source
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
    FROM documents WHERE doc_id IS NOT NULL
  ) WHERE rk <= 25
  GROUP BY source
)
SELECT source, n_docs, total_chars, n_train, n_rate_sampled, n_topk, topk_id_sum
FROM split JOIN rate USING (source) JOIN topk USING (source)
ORDER BY source
"""


def c03_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark set = every 101st document; report corpus docs (benchmark
    excluded) sharing >= 2 distinct 3-gram shingles with it."""
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 101 == 0)
    corpus = d.filter(F.col("doc_id") % 101 != 0)
    # fan_out spread + plain global sort: the ranged_by_id fusion measured
    # SLOWER here (its range sampler re-scans the wide text rows — see
    # decontamination_report docstring), so c03 keeps the two-exchange plan
    return decontamination_report(corpus, bench, n=3, min_shared=2).orderBy("doc_id")


# mirrors functions/text.py::shingles via dedup._SHINGLE_SQL's construction
_SH = (
    "list_distinct(list_transform(range(len(string_split(text,' ')) - 2), "
    "i -> concat_ws(' ', string_split(text,' ')[i+1], string_split(text,' ')[i+2], "
    "string_split(text,' ')[i+3])))"
)

ORACLE_C03 = f"""
WITH bsh AS (
  SELECT DISTINCT unnest({_SH}) AS sh FROM documents WHERE doc_id % 101 = 0
),
dsh AS (
  SELECT doc_id, unnest({_SH}) AS sh FROM documents WHERE doc_id % 101 <> 0
)
SELECT doc_id, count(*) AS n_shared
FROM dsh JOIN bsh USING (sh)
GROUP BY doc_id
HAVING count(*) >= 2
ORDER BY doc_id
"""


def c04_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction proven end-to-end: deterministic PII (email + IP derived
    from doc_id) is planted into every document, scrubbed, and the aggregate
    pins redaction counts AND the scrubbed text itself (min/max md5), so the
    replacement byte-for-byte matches the oracle's."""
    d = load_table(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
        ).alias("text"),
    )
    s = scrub_pii(planted)
    return s.groupBy().agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_email").cast("long").alias("total_email"),
        F.sum("n_ipv4").cast("long").alias("total_ipv4"),
        F.sum("n_phone").cast("long").alias("total_phone"),
        F.min(F.md5("text")).alias("min_fp"),
        F.max(F.md5("text")).alias("max_fp"),
    )


_EMAIL, _IPV4, _PHONE = (p[1] for p in PII_PATTERNS)

ORACLE_C04 = f"""
WITH planted AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com from 10.0.'
              || CAST(doc_id % 256 AS VARCHAR) || '.7' AS text
  FROM documents
),
s1 AS (
  SELECT doc_id, len(regexp_extract_all(text, '{_EMAIL}')) AS n_email,
         regexp_replace(text, '{_EMAIL}', '[EMAIL]', 'g') AS text
  FROM planted
),
s2 AS (
  SELECT doc_id, n_email, len(regexp_extract_all(text, '{_IPV4}')) AS n_ipv4,
         regexp_replace(text, '{_IPV4}', '[IP]', 'g') AS text
  FROM s1
),
s3 AS (
  SELECT doc_id, n_email, n_ipv4, len(regexp_extract_all(text, '{_PHONE}')) AS n_phone,
         regexp_replace(text, '{_PHONE}', '[PHONE]', 'g') AS text
  FROM s2
)
SELECT count(*) AS n_docs,
       CAST(sum(n_email) AS BIGINT) AS total_email,
       CAST(sum(n_ipv4) AS BIGINT) AS total_ipv4,
       CAST(sum(n_phone) AS BIGINT) AS total_phone,
       min(md5(text)) AS min_fp,
       max(md5(text)) AS max_fp
FROM s3
"""


def c05_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing over the chunk stream: chunks concatenate
    in (doc, chunk) order into 512-token packs per shard (8 shards pinned
    for reproducibility), reported as per-pack chunk/token totals. The
    cumsum window is the only shuffle and parallelizes across shards (see
    pack_token_stream)."""
    d = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(d, chunk_size=32, overlap=8)
    return pack_token_stream(chunks, budget=512, n_shards=8).orderBy("shard", "pack_id")


ORACLE_C05 = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
           WHERE text IS NOT NULL),
s AS (SELECT doc_id, w, unnest(range(0, greatest(len(w), 1), 24)) AS start FROM w),
chunks AS (
  SELECT doc_id,
         CAST(start // 24 AS INT) AS chunk_idx,
         CAST(least(32, len(w) - start) AS INT) AS n_words
  FROM s
),
offs AS (
  -- ((x % n) + n) % n == Spark's pmod for negative ids; identical to plain
  -- % on the non-negative gate ids
  SELECT ((doc_id % 8) + 8) % 8 AS shard, doc_id, chunk_idx, n_words,
         sum(n_words) OVER (PARTITION BY ((doc_id % 8) + 8) % 8
                            ORDER BY doc_id, chunk_idx, n_words
                            ROWS UNBOUNDED PRECEDING) - n_words AS off
  FROM chunks
)
SELECT shard, CAST(off // 512 AS BIGINT) AS pack_id,
       count(*) AS n_chunks,
       CAST(sum(n_words) AS BIGINT) AS pack_tokens
FROM offs
GROUP BY shard, CAST(off // 512 AS BIGINT)
ORDER BY shard, pack_id
"""


QUERIES = {
    "c01_chunking": c01_chunking,
    "c02_hash_split": c02_hash_split,
    "c03_decontamination": c03_decontamination,
    "c04_pii_scrub": c04_pii_scrub,
    "c05_sequence_packing": c05_sequence_packing,
}

ORACLE = {
    "c01_chunking": ORACLE_C01,
    "c02_hash_split": ORACLE_C02,
    "c03_decontamination": ORACLE_C03,
    "c04_pii_scrub": ORACLE_C04,
    "c05_sequence_packing": ORACLE_C05,
}
