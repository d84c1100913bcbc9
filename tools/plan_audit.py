"""Physical-plan audit: assert the scale-critical plan properties.

Run: python tools/plan_audit.py [sf_dir]

For each audited query this checks the properties the operator
docstrings claim (broadcast joins for dims, pushed filters, pruned
scans, no cartesian products) against the ACTUAL optimized plan —
if Catalyst stops picking the intended strategy, this fails before a
benchmark regression does.
"""

from __future__ import annotations

import contextlib
import io
import sys


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


CHECKS = {
    # query name -> (must_contain, must_not_contain)
    "q1_pricing_summary": (
        ["PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"],
        ["CartesianProduct"],
    ),
    "q3_shipping_priority": (
        ["BroadcastHashJoin", "TakeOrderedAndProject"],
        ["CartesianProduct"],
    ),
    "q5_local_supplier_volume": (["BroadcastHashJoin"], ["CartesianProduct"]),
    "q4_order_priority": (["LeftSemi"], ["CartesianProduct"]),
    "join_anti": (["LeftAnti"], ["CartesianProduct"]),
    "stream_static_join": (["BroadcastHashJoin"], ["SortMergeJoin"]),
    "join_theta": (["BroadcastHashJoin"], ["CartesianProduct"]),
    "dedup_ngram_jaccard": ([], ["CartesianProduct"]),
    "dedup_minhash_lsh": ([], ["CartesianProduct"]),
    # bucket-capped LSH, drop overflow: over-cap buckets are filtered
    # out BEFORE the band equi-join (no star Union in this policy);
    # the width-tag Window sits behind the cut_lineage checkpoint, so
    # the visible contract is the equi-join with no all-pairs fallback
    "dedup_minhash_capped_drop": (
        [],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # r13 composite: keep-best is ONE cluster-keyed Window over a
    # broadcast component map — never a self-join resolution
    "pipeline_curation_neardup": (
        ["Window", "BroadcastHashJoin"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # r13 monitor: the only nested-loop is the intended 1-row
    # broadcast crossJoin combining the two scalar aggregates
    "lsh_bucket_stats": (
        ["BroadcastNestedLoopJoin", "HashAggregate"],
        ["CartesianProduct"],
    ),
    "similarity_topk_bruteforce": (
        ["BroadcastNestedLoopJoin"],  # intended: broadcast the query side
        [],
    ),
    "topk_per_group": (["Window"], ["CartesianProduct"]),
    # as-of join: one window pass, NEVER an inequality join (BNL)
    "asof_join_last_purchase": (
        ["Window"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # range join: covering-bucket equi-join, precise filter after —
    # the whole point is avoiding the BNL a raw range predicate gets
    "range_join_error_click_5m": (
        [],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # block-pair grid GEMM: distributed shuffle+group, no cartesian
    "dedup_embedding_cosine": (
        ["FlatMapGroupsInPandas"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # IVF: cell equi-join for candidates, no all-pairs anywhere
    "similarity_topk_ivf": ([], ["CartesianProduct"]),
    # PQ: ADC code scan (MapInPandas) + top-K' window + re-rank joins;
    # the raw corpus vectors are only joined for the K' survivors
    "similarity_topk_pq": (["MapInPandas", "Window"], ["CartesianProduct"]),
    # sort-merge kernel replay: mapInPandas after a single exchange,
    # not per-group FlatMapGroupsInPandas
    "stateful_cdc_diff_full": (["MapInPandas"], ["FlatMapGroupsInPandas"]),
    "stateful_fraud_alerts": (["MapInPandas"], ["FlatMapGroupsInPandas"]),
    # Q6: every predicate must reach the scan; no join, no shuffle
    # beyond the 1-row final agg exchange
    "q6_forecast_revenue": (
        [
            "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), "
            "IsNotNull(l_quantity)",
        ],
        ["Join", "CartesianProduct"],
    ),
    # Q10/Q18: dims broadcast, single fact-fact shuffle, top-k via
    # TakeOrderedAndProject (no global sort)
    "q10_returned_items": (
        ["BroadcastHashJoin", "TakeOrderedAndProject"],
        ["CartesianProduct"],
    ),
    "q18_large_volume": (
        ["BroadcastHashJoin", "TakeOrderedAndProject"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # pivot with explicit values = ONE aggregate pair, no extra pass
    "pivot_event_daily": (["HashAggregate"], ["CartesianProduct"]),
    # per-row map stages: narrow, zero exchanges
    "repetition_signals": ([], ["Exchange"]),
    "repetition_removal": ([], ["Exchange"]),
    "scalar_posexplode": (["Generate"], ["Exchange"]),
    "pii_scrub": ([], ["Exchange"]),
    "url_extract": ([], ["Exchange"]),
    "stratified_sample_by_lang": ([], ["Exchange"]),
    "histogram_totalprice": (["HashAggregate"], ["Exchange hashpartitioning(o_"]),
    # funnel: conditional aggs, ONE shuffle on user_id, no self-joins
    "funnel_conversion": (["HashAggregate"], ["Join", "CartesianProduct"]),
    # SCD2: single window pass, never a self-join
    "scd2_orders": (["Window"], ["Join", "CartesianProduct"]),
    "weighted_sample_quality": ([], ["Exchange"]),
    # TPC-H ext: dims ride broadcast, facts shuffle once, no cartesian
    "q7_volume_shipping": (["BroadcastHashJoin"], ["CartesianProduct"]),
    "q8_market_share": (["BroadcastHashJoin"], ["CartesianProduct"]),
    "q9_product_profit": (["BroadcastHashJoin"], ["CartesianProduct"]),
    # quantization/projection are single mapInPandas passes: zero exchanges
    "embedding_quantize_int8": ([], ["Exchange"]),
    "embedding_pca_scores": ([], ["Exchange"]),
    # span removal: dup detection must be the sort-free-shape count
    # window on the hash (one exchange), never an all-pairs product
    "dedup_substring_removal": (["Window"], ["CartesianProduct"]),
    # hashed linear classifier: weight table is a plan literal — one
    # explode + one doc-keyed aggregate, never a weights join
    "quality_classifier_score": (["HashAggregate"], ["CartesianProduct"]),
    # covariance: one d²-keyed reduce; side stats re-join broadcast
    "embedding_covariance": (
        ["HashAggregate", "BroadcastHashJoin"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    "q12_late_shipments": (["HashAggregate"], ["CartesianProduct"]),
    # 1-row max broadcast joins as BNLJ by design; no full cartesian
    "q15_top_supplier": (["BroadcastHashJoin"], ["CartesianProduct"]),
    # correlated EXISTS pair rewritten to one per-order aggregate:
    # dims broadcast, only orderkey-keyed exchanges
    "q21_suppliers_who_kept_waiting": (
        ["BroadcastHashJoin", "HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "q13_customer_distribution": (["HashAggregate"], ["CartesianProduct"]),
    # Q14/Q17/Q19: rare part set must broadcast, never sort-merge
    "q14_promo_effect": (
        ["BroadcastHashJoin"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    "q16_supplier_count": (["BroadcastHashJoin"], ["CartesianProduct"]),
    "q17_small_quantity": (
        ["BroadcastHashJoin"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    "q19_disjunctive_revenue": (
        ["BroadcastHashJoin"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    "q22_global_sales_opportunity": ([], ["CartesianProduct", "SortMergeJoin"]),
    # contamination: benchmark shingle set rides broadcast; the corpus
    # is never self-joined
    "contamination_bench_overlap": (
        ["BroadcastHashJoin"],
        ["CartesianProduct"],
    ),
    # packing: partition-local windows + broadcast offsets; the only
    # unpartitioned window runs on the |partitions|-row totals side
    "sequence_packing": (["Window", "BroadcastHashJoin"], ["CartesianProduct"]),
    # fuzzy dedup: prefix-block equi-join — the inequality and the
    # edit distance must be post-join filters, never a BNL join
    "dedup_fuzzy_levenshtein": (
        [],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # exact percentile: sort-based agg still gets map-side partials
    "percentile_exact": (["ObjectHashAggregate"], ["CartesianProduct"]),
    # chunking: one Arrow-batched narrow pass, zero exchanges
    "doc_chunking_overlap": (["MapInPandas"], ["Exchange"]),
    # both frame specs share one (partition, order) -> ONE Window op
    "window_distribution": (["Window"], ["CartesianProduct", "Join"]),
    # salted join: equi-join on (key, salt), no cartesian from the
    # dim replication (explode stays a generator, not a join)
    "salted_join_events": ([], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # clickstream analytics: window + agg, never a self-join
    "transition_matrix": (["Window"], ["Join", "CartesianProduct"]),
    "cohort_retention": (["Window"], ["Join", "CartesianProduct"]),
    # scalar families: pure projections (+ one window for lead) —
    # never a join
    "scalar_null_semantics": (["Window"], ["Join", "CartesianProduct"]),
    "scalar_datetime_ext": ([], ["Join", "Exchange hashpartitioning"]),
    "setops_all": (["HashAggregate"], ["CartesianProduct"]),
    # global shuffle positions: distributed prefix sum, no global sort
    "dataset_shuffle_positions": (
        ["Window", "BroadcastHashJoin"],
        ["CartesianProduct"],
    ),
    # substring spans: narrow Arrow span generation, a sort-free count
    # window on the hash — never a join back onto the spans
    "dedup_substring_spans": (
        ["MapInPandas", "Window"],
        ["CartesianProduct", "Join"],
    ),
    # upsert compaction: ONE aggregate with map-side partials (string
    # max_by buffers force SortAggregate, but partial_max_by before
    # the exchange is what bounds the shuffle) — never a row_number
    # window over the raw changelog, never a join
    "cdc_upsert_snapshot": (["partial_max_by"], ["Window", "Join"]),
    # quantile binning: boundary frame broadcasts; the fact table is
    # projected in place — no exchange of orders, no single-task ntile
    "quantile_binning_price": (
        ["BroadcastNestedLoopJoin"],
        ["Window", "Exchange hashpartitioning(o_"],
    ),
    # vocab: explode is narrow; the only exchange is the per-token agg
    "vocab_min_max_df": (["HashAggregate"], ["Join", "CartesianProduct"]),
    # pagerank: the rank vector broadcasts every iteration — the edge
    # list must never be sort-merge-shuffled or cross-joined
    "graph_pagerank_copurchase": (
        ["BroadcastHashJoin"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # label propagation: per-round bodies are behind localCheckpoint
    # (the returned plan is a scan over the final round's RDD), so
    # only the no-cartesian invariant is visible here; the iterative
    # behavior is pinned by the shake gate + hypothesis property test
    "graph_label_propagation": ([], ["CartesianProduct"]),
    # rolling MAU: explode-onto-28-days + count-distinct + one equi
    # join of two day-keyed aggregates — no nested-loop joins at all
    # (the review pass removed a dead broadcast bounds trim)
    "mau_rolling_28d": (
        ["HashAggregate", "Generate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # textrank: word-graph pagerank — same invariants as copurchase
    # pagerank (broadcast rank vector, no cartesian/sort-merge); the
    # top-k is a TakeOrderedAndProject, never a global sort
    "textrank_keywords": (
        ["BroadcastHashJoin", "TakeOrderedAndProject"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # z-order key: one 1-row min/max aggregate broadcast back, then a
    # pure codegen bitwise map — no shuffle join, no window, no UDF
    "layout_zorder_part": (
        ["HashAggregate", "BroadcastNestedLoopJoin"],
        [
            "CartesianProduct",
            "SortMergeJoin",
            "Window",
            "ArrowEvalPython",
            "BatchEvalPython",
        ],
    ),
    # bigram LM: count tables ride broadcast back onto the bigram
    # stream — no sort-merge self-join, no cartesian. (The bigram
    # generator itself is behind a localCheckpoint, so it shows as
    # Scan ExistingRDD here, not MapInPandas.)
    "lm_bigram_score": (
        ["BroadcastHashJoin"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # Q2: EU supplier dim broadcasts; the decorrelated per-part min
    # joins back without a cartesian; top-100 via TakeOrderedAndProject
    "q2_min_cost_supplier": (
        ["BroadcastHashJoin", "TakeOrderedAndProject"],
        ["CartesianProduct"],
    ),
    # Q11: the scalar total rides a broadcast (nested-loop on a 1-row
    # side is the correct scalar shape, not a flag)
    "q11_important_stock": (["BroadcastHashJoin"], ["CartesianProduct"]),
    # Q20: semi-join chain — part list broadcast-semi, supplier semi
    "q20_potential_promotion": (["LeftSemi"], ["CartesianProduct"]),
    # heavy hitters: candidates broadcast back for the exact recount;
    # final top-k must be TakeOrderedAndProject, never a global sort
    "heavy_hitter_words": (
        ["MapInPandas", "BroadcastHashJoin", "TakeOrderedAndProject"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # mixture resample: per-group rates broadcast onto the fact table
    "mixture_resample_lang": (
        ["BroadcastHashJoin"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # forward as-of: same single-window shape as backward
    "asof_join_next_purchase": (
        ["Window"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # windowed TopN: rank runs over the windowed AGGREGATE (exchange on
    # the window+user hash), never the raw corpus
    "window_topn_users_hourly": (
        ["HashAggregate", "Window"],
        ["CartesianProduct"],
    ),
    # curation pipeline: per-stage semi joins + broadcast rates; no
    # cartesian anywhere in the 4-stage composition
    "pipeline_curation_end2end": (
        ["LeftSemi", "BroadcastHashJoin"],
        ["CartesianProduct"],
    ),
    # profiler: ONE aggregate pass (fused stats), no join at all
    "profile_lineitem": ([], ["Join", "CartesianProduct"]),
    # HTML extraction: pure higher-order column expressions — a
    # shuffle-free narrow map (scan throughput at 100 TB)
    "html_text_extract": ([], ["Exchange", "Join", "CartesianProduct"]),
    # domain curation: blocklist broadcast; single domain-keyed window
    # exchange; never a sort-merge join against the blocklist
    "domain_quota_curation": (
        ["BroadcastHashJoin", "Window"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # DSIR: the 256-row log-ratio table rides a broadcast back onto
    # the (doc, bucket) stream; the 1-row totals crossJoin broadcasts
    # as BNLJ (the q11 scalar shape); the only sort-merge join is the
    # final doc-keyed left join restoring zero-bigram docs (the
    # quality_classifier shape) — never a cartesian
    "dsir_importance_weights": (
        ["BroadcastHashJoin", "BroadcastNestedLoopJoin"],
        ["CartesianProduct"],
    ),
    # centroids: posexplode (narrow) + ONE (label, dim)-keyed hash
    # aggregate with map-side partials — no join at all
    "embedding_label_centroids": (
        ["Generate", "HashAggregate"],
        ["Join", "CartesianProduct"],
    ),
    # interval overlap: grid-bucket equi-join — the inequality
    # predicates must be post-join filters, never a BNL/cartesian
    "interval_overlap_join": (
        [],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # C4 line cleaning / Gopher rules: higher-order column exprs only,
    # shuffle-free narrow maps (pure scan throughput at 100 TB)
    "c4_line_filter": ([], ["Exchange", "Join", "CartesianProduct"]),
    "gopher_quality_filter": ([], ["Exchange", "Join", "CartesianProduct"]),
    # hybrid RRF: query-term table and df/stats ride broadcasts (the
    # bm25_batch shape); the 1-row stats crossJoin broadcasts as BNLJ;
    # fused lists are query-set-sized — never a cartesian
    "hybrid_search_rrf": (
        ["BroadcastHashJoin", "Window"],
        ["CartesianProduct"],
    ),
    # perceptron: the returned plan is the final-margin pass — hashed
    # features fold in a map-side-combinable aggregate; the trained
    # weight vector is an array literal (parameter-server collect),
    # never a weights join
    "perceptron_quality_train": (["HashAggregate"], ["CartesianProduct"]),
    # URL canonicalization is a narrow map; the dedup is ONE
    # canonical-keyed window exchange (the domain_curation shape)
    "url_canonical_dedup": (["Window"], ["Join", "CartesianProduct"]),
    # random projection: sign matrix is a plan literal — zero
    # exchanges, pure scan throughput
    "embedding_random_projection": ([], ["Exchange", "Join"]),
    # span corruption: seeded strata arithmetic in one narrow map
    "span_corruption_t5": ([], ["Exchange", "Join", "CartesianProduct"]),
    # hard negatives: query set broadcast against the corpus stream
    # (the bruteforce top-k shape) — BNLJ is the intended plan
    "hard_negative_mining": (["BroadcastNestedLoopJoin"], []),
    # DQ report: ONE multi-aggregate scan + constant-width Generate
    # (stack) — never a second scan or a join
    "dq_constraint_report": (
        ["HashAggregate", "Generate"],
        ["Join", "CartesianProduct"],
    ),
    # skew report: key-count aggregate (one shuffle) + bounded
    # second aggregate over distinct keys
    "skew_report_events": (["HashAggregate"], ["Join", "CartesianProduct"]),
    # OHLC resample: both direction windows AND the final aggregate
    # share one (key, bucket) exchange — no join, no second shuffle
    "ohlc_bars_15m": (["Window", "HashAggregate"], ["Join", "CartesianProduct"]),
    # retrieval eval: rank lists are |Q|·k rows; truth side is the
    # broadcast-bruteforce shape, metric joins never touch the corpus
    "retrieval_eval_metrics": (["Window"], ["CartesianProduct"]),
    # PMI: doc-keyed pair self-join (position offset post-filtered),
    # unigram/totals ride broadcasts — never a cartesian
    "pmi_cooccurrence": (["BroadcastHashJoin"], ["CartesianProduct"]),
    # token budget: narrow count + ONE group-keyed running-sum window
    "token_budget_mixture": (["Window"], ["Join", "CartesianProduct"]),
    # keep-longest: inverted-index pairs -> CC -> one cluster window;
    # components broadcast; never an all-pairs product
    "dedup_cluster_keep_longest": (["Window"], ["CartesianProduct"]),
    # resize: payload-hash repartition + ONE Arrow-batched pass
    "multimodal_resize": (["MapInPandas"], ["Join", "CartesianProduct"]),
    # dedup eval: two banded/inverted-index pair pipelines + 1-row
    # metric crossJoins (broadcast) — never an all-pairs product
    "dedup_eval_minhash": ([], ["CartesianProduct"]),
    # health report: three map-side-combinable aggregates over one
    # scan + 1-row broadcast crossJoins
    "corpus_health_report": (["HashAggregate"], ["CartesianProduct"]),
    # CEP pattern: all lead columns share ONE (key, order) window —
    # single exchange, no self-joins
    "cep_pattern_view_click_purchase": (
        ["Window"],
        ["Join", "CartesianProduct"],
    ),
    # FIM: zero-exchange narrow map — pure scan throughput; any
    # Exchange here means the split stopped being per-row
    "fim_transform_psm": ([], ["Exchange", "Join", "CartesianProduct"]),
    # exact-k: ONE group-keyed window exchange, no joins
    "sample_exact_k_per_group": (
        ["Window"],
        ["Join", "CartesianProduct"],
    ),
    # hamming ANN: Hamming prune rides a broadcast of the QUERY words
    # (corpus streams); candidate re-rank joins back by equality
    "similarity_topk_hamming": (
        ["BroadcastNestedLoopJoin"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # matryoshka eval: two broadcast brute-force scans + count joins
    "matryoshka_topk_recall": (
        ["BroadcastNestedLoopJoin"],
        ["CartesianProduct"],
    ),
    # attrition funnel: stage counts assemble via 1-row broadcast
    # crossJoins, never a real cartesian
    "pipeline_attrition_funnel": ([], ["CartesianProduct"]),
    # CDC chunking: boundary detection + chunk slicing are pure JVM
    # array exprs (one Generate for posexplode); the only exchanges
    # are the chunk-hash count and per-doc agg — never an all-pairs
    "cdc_chunk_dedup": (
        ["Generate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "MapInPandas"],
    ),
    # leakage audit: equi-joins on doc ids only — the pair list is
    # already sub-quadratic, the audit must not add a product
    "split_leakage_audit": ([], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # perplexity buckets: LM joins as in lm_bigram_score, bucketing
    # adds exactly one language-keyed window — no self-join
    "perplexity_bucket_filter": (
        ["Window", "BroadcastHashJoin"],
        ["CartesianProduct"],
    ),
    # AUC: corpus collapses to one score-keyed aggregate BEFORE the
    # unpartitioned midrank window (bounded by score cardinality)
    "quality_auc_eval": (
        ["HashAggregate", "Window"],
        ["Join", "CartesianProduct"],
    ),
    # n-gram diversity: JVM gram emission (Generate), one grouped
    # count-distinct aggregate — no Python, no join
    "ngram_diversity_by_source": (
        ["Generate", "HashAggregate"],
        ["Join", "CartesianProduct", "MapInPandas"],
    ),
    # fertility: narrow regexp counts + tiny aggregate, no join
    "tokenizer_fertility_by_lang": (
        ["HashAggregate"],
        ["Join", "CartesianProduct"],
    ),
    # novelty: JVM bigram emission (Generate); the train bigram set is
    # vocabulary-sized, join strategy left to AQE — never a product
    "bigram_novelty_vs_train": (
        ["Generate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "MapInPandas"],
    ),
    # MMR: stage 1 is the intended broadcast brute-force scan (BNLJ);
    # stage 2 greedily re-ranks pool-sized groups in ONE Arrow pass
    "similarity_mmr_rerank": (
        ["BroadcastNestedLoopJoin", "FlatMapGroupsInPandas"],
        ["CartesianProduct"],
    ),
    # EWMA: ONE key-partitioned ROWS-frame window, no join, no
    # unpartitioned window
    "ts_ewma_trailing": (["Window"], ["Join", "CartesianProduct"]),
    # OLS trend: key-partitioned min window + ONE map-side-combinable
    # grouped sum — the classic distributed regression, no join
    "ts_linear_trend": (
        ["Window", "HashAggregate"],
        ["Join", "CartesianProduct"],
    ),
    # lateral top-n: Catalyst must DECORRELATE the per-row LIMIT into
    # a window + hash join — never re-execute per outer row (nested
    # loop / cartesian)
    "sql_lateral_topn": (
        ["Window", "BroadcastHashJoin"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # custom Python DataSource: a real BatchScan of the registered
    # format (partition-planned, executor-side generation) + one agg
    "pysource_event_counts": (
        ["BatchScan synthetic_events", "HashAggregate"],
        ["Join", "CartesianProduct"],
    ),
    # entropy: pure higher-order array exprs — ZERO exchanges
    "token_entropy": ([], ["Exchange", "Join", "CartesianProduct"]),
    # attribution: ONE keyed IGNORE-NULLS window + grouped count —
    # never a purchases×touches self-join
    "attribution_last_touch": (
        ["Window", "HashAggregate"],
        ["Join", "CartesianProduct"],
    ),
    # kNN label eval: broadcast brute-force scan (BNLJ intended) +
    # vote aggregate + query-keyed argmax window — no cartesian
    "knn_label_accuracy": (
        ["BroadcastNestedLoopJoin", "Window", "HashAggregate"],
        ["CartesianProduct"],
    ),
    # RFM: events collapse to ONE user aggregate BEFORE the three
    # user-count-bounded ranking windows; never a raw-event window
    "rfm_user_segments": (
        ["HashAggregate", "Window"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # confusion matrix: pandas-UDF scoring (Arrow-batched) + one
    # grouped count + one class-keyed share window — no join
    "langid_confusion_matrix": (
        ["ArrowEvalPython", "HashAggregate", "Window"],
        ["Join", "CartesianProduct"],
    ),
    # interleave: ONE group-keyed window, no join, no global sort
    "mixture_interleave_schedule": (
        ["Window"],
        ["Join", "CartesianProduct", "Sort [virtual_time"],
    ),
    # snapshot diff: digests join, bodies never shuffle — the only
    # exchange is the id-keyed full outer join
    "corpus_snapshot_diff": ([], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # containment: same inverted-index equi-join as the jaccard finder
    "dedup_containment_pairs": ([], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # winnowing: zero-exchange narrow map of array expressions
    "fingerprint_winnowing": ([], ["Exchange", "Join", "CartesianProduct"]),
    # OOV: vocab is NOT force-broadcast (r5 rule) — size-based
    # planning picks the strategy; never a cartesian
    "oov_rate_by_lang": (["HashAggregate"], ["CartesianProduct"]),
    # MAD: two keyed window passes + 1-row-per-key broadcast joins.
    # (r14: the rank windows moved behind lazy lineage cuts so each
    # sort executes exactly once — like lm_bigram_score they now show
    # as Scan ExistingRDD in the final plan, so Window is no longer a
    # required FINAL-plan node; the broadcast join back remains.)
    "anomaly_mad_hampel": (["BroadcastHashJoin"], ["CartesianProduct"]),
    # discrete quantiles: ONE keyed window + aggregate; customer dim
    # rides a broadcast
    "quantile_disc_by_segment": (
        ["Window", "BroadcastHashJoin"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # PSI drift: edges/count side-tables ride broadcasts; the bin
    # assignment crossJoin is a 1-row broadcast (BNLJ), never a
    # shuffled cartesian
    "drift_psi_report": (["BroadcastNestedLoopJoin"], ["CartesianProduct"]),
    # heavy-change: per-side count tables join (not raw rows); the two
    # 1-row totals ride broadcasts (BNLJ); top-k is
    # TakeOrderedAndProject, never a global Sort+Limit
    "drift_heavy_change": (
        ["TakeOrderedAndProject", "BroadcastNestedLoopJoin"],
        ["CartesianProduct"],
    ),
    # ACF: the per-key-total and lag windows share the partition key
    # (one exchange), final agg map-side combinable; never a join
    "ts_acf": (["Window", "HashAggregate"], ["Join", "CartesianProduct"]),
    # byte entropy: per-row higher-order exprs only — zero exchanges,
    # zero joins, no Python boundary
    "media_byte_entropy": (
        [],
        ["Exchange", "Join", "CartesianProduct", "ArrowEvalPython"],
    ),
    # seasonal backtest: ONE keyed window (both lags), map-side agg
    "ts_seasonal_naive_eval": (
        ["Window", "HashAggregate"],
        ["Join", "CartesianProduct"],
    ),
    # ---- round 7 ----
    # Adamic-Adar: posting-list equi-join on the common neighbor +
    # per-pair hash agg; top-k never a global Sort+Limit
    "graph_adamic_adar": (
        ["HashAggregate", "TakeOrderedAndProject"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # BFS: frontier iteration materializes via localCheckpoint; the
    # assembled result must never degrade to a cartesian
    "graph_bfs_hops": ([], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # PPJoin: rank window + candidate group-agg; the prefix self-join
    # is an equi-join on the shingle, never all-pairs
    "dedup_ppjoin_prefix": (
        ["Window", "HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # readability: three regexp scans per row — zero exchanges, no
    # joins, no Python boundary
    "text_readability": (
        [],
        ["Exchange", "Join", "CartesianProduct", "ArrowEvalPython"],
    ),
    # STL: hourly bucket agg + RANGE-frame window + phase window, all
    # on the key partition; never a join
    "ts_stl_decompose": (
        ["Window", "HashAggregate"],
        ["Join", "CartesianProduct"],
    ),
    # zipf: word-count agg + per-lang top-k window + n_types join
    # (lang-keyed, tiny) — never a cartesian
    "zipf_fit_by_lang": (
        ["Window", "HashAggregate"],
        ["CartesianProduct"],
    ),
    # KL: two word-count aggs joined on word; the corpus total rides
    # a broadcast 1-row crossJoin (BNLJ) so it stays in the lazy plan
    # — never an eager driver-side count, never a cartesian product
    "kl_unigram_by_source": (
        ["HashAggregate", "BroadcastNestedLoopJoin"],
        ["CartesianProduct"],
    ),
    # linkage: two-phase distributed rank (range exchange + Arrow
    # local-rank pass — materialized behind the localCheckpoint, so
    # the visible plan is the ExistingRDD scan) + integer equi-join;
    # the single-partition global Window must never reappear
    "linkage_sorted_neighborhood": (
        ["Scan ExistingRDD", "BroadcastHashJoin"],
        ["CartesianProduct", "Window"],
    ),
    # graph stats: degree aggregates + 1-row reductions; the only
    # crossJoin is the broadcast 1-row n_nodes frame
    "graph_degree_powerlaw": (
        ["HashAggregate"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    "graph_assortativity": (
        ["HashAggregate"],
        ["CartesianProduct"],
    ),
    # systematic sample: checkpointed rank pass + narrow modulo filter
    "sample_systematic_orders": (
        ["Scan ExistingRDD"],
        ["CartesianProduct", "Window"],
    ),
    # calibration: one scan -> one n_bins-row aggregate; never a join
    "quality_calibration_bins": (
        ["HashAggregate"],
        ["Join", "CartesianProduct"],
    ),
    # benford: one count aggregate; with the default single group the
    # constant grp key folds away and the 1-row totals frame rides a
    # broadcast nested loop — never a shuffled cartesian or SMJ
    "dq_benford_prices": (
        ["HashAggregate", "BroadcastNestedLoopJoin"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # chi-square: contingency agg + broadcast marginals; the 1-row
    # total rides a broadcast nested loop, never a shuffled cartesian
    "dq_chi_square_independence": (
        ["HashAggregate"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # burstiness: global top-k must be TakeOrderedAndProject, never a
    # single-partition rank window
    "word_burstiness_top20": (
        ["TakeOrderedAndProject", "HashAggregate"],
        ["Window", "CartesianProduct"],
    ),
    # sketch-residual quantile: band-only rank window; the sketch agg
    # is ObjectHashAggregate (percentile_approx); no cartesian
    "quantile_sketch_residual": (
        ["Window", "ObjectHashAggregate"],
        ["CartesianProduct"],
    ),
    "quality_ece": (["HashAggregate"], ["Join", "CartesianProduct"]),
    # cross-correlation: two broadcast-sized aggregates full-outer
    # aligned on the bucket; never a cartesian
    "ts_cross_correlation": (["HashAggregate"], ["CartesianProduct"]),
    # target encoding: broadcast category stats + 1-row global frame
    # back onto the scan; no shuffle join, no window
    "feature_target_encode_loo": (
        ["BroadcastHashJoin"],
        ["SortMergeJoin", "Window", "CartesianProduct"],
    ),
    # STL residual anomalies: window chain + broadcast med/mad joins.
    # (r14: the MAD rank windows sit behind lazy lineage cuts — see
    # anomaly_mad_hampel — so Window is not a final-plan node here.)
    "anomaly_stl_residual": (
        ["BroadcastHashJoin"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # winsorize: rank window + 1-row-per-key broadcast fences
    "feature_winsorize_events": (
        ["Window", "BroadcastHashJoin"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # funnel latency: ONE user aggregate + keyed rank window
    "funnel_latency_quantiles": (
        ["Window", "HashAggregate"],
        ["Join", "CartesianProduct"],
    ),
    # SQL UDF must inline: the plan is a plain aggregate over the
    # scan — no Python boundary, no UDF node
    "sql_udf_revenue": (
        ["HashAggregate"],
        ["ArrowEvalPython", "BatchEvalPython", "CartesianProduct"],
    ),
}


import os
import re

# sum() over a full-range int64 hash is an order-dependent ANSI
# overflow: whether a partial sum overflows depends on partition/merge
# order, so the query passes locally and crashes on other partitionings
# (graph_pagerank_copurchase, driver r07). Signatures must use bit_xor
# (order-independent, overflow-free) or sum a decimal(38,0) cast.
_SUM_OVER_HASH = re.compile(
    r"""(?:F\.sum\(\s*F\.(?:xxhash64|hash)\(   # F.sum(F.xxhash64(...
        |(?<![\w.])(?<!bit_)sum\s*\(\s*(?:xxhash64|hash)\s*\(  # SQL sum(hash(
        )""",
    re.VERBOSE,
)

# The ONLY sanctioned decimal exemptions put the cast INSIDE the sum
# argument (partial sums then accumulate in decimal(38,0), which
# 64-bit terms cannot overflow). A cast OUTSIDE the sum —
# F.sum(xxhash64(...)).cast("decimal") — casts the already-overflowed
# aggregate and stays banned.
_SAFE_DECIMAL_SUM = re.compile(
    r"""(?:F\.sum\(\s*F\.(?:xxhash64|hash)\([^)]*\)\s*\.cast\(\s*["']decimal
        |(?<![\w.])sum\s*\(\s*cast\s*\(\s*(?:xxhash64|hash)\s*\(
        )""",
    re.VERBOSE | re.IGNORECASE,
)


# Indirect variant: a full-range hash aliased/bound to a column name
# on one line, F.sum over that NAME later in the same file. The
# binding patterns are ANCHORED to the hash call itself (an alias
# elsewhere on the same line must not bind, and `canonical_hash(`-
# style identifiers must not trigger) — narrow by design; false
# negatives are acceptable for a defense-in-depth lint, false
# positives would block CI.
_HASH_BINDING = re.compile(
    r"""(?:F\.(?:xxhash64|hash)\(.*?\)\s*\.alias\(\s*["'](\w+)["']\s*\)
        |withColumn\(\s*["'](\w+)["']\s*,\s*F\.(?:xxhash64|hash)\(
        )""",
    re.VERBOSE,
)
_IS_HASH_LINE = re.compile(r"F\.(?:xxhash64|hash)\s*\(")


def srclint_sum_over_hash(root: str = "demo_flink_spark") -> list[str]:
    """Return 'file:lineno: line' for every sum-over-int64-hash site
    that lacks a decimal cast on the same line — both the inline form
    (sum(xxhash64(...))) and the indirect form (hash bound to a column
    name, F.sum over that name later in the same file)."""
    hits = []
    for dirpath, _dirs, files in os.walk(root):
        if "__pycache__" in dirpath:
            continue
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            with open(path, encoding="utf-8") as fh:
                lines = fh.readlines()
            hash_cols: set[str] = set()
            for line in lines:
                if _IS_HASH_LINE.search(line):
                    for m in _HASH_BINDING.finditer(line):
                        name = next(g for g in m.groups() if g)
                        hash_cols.add(name)
            for i, line in enumerate(lines, 1):
                if _SUM_OVER_HASH.search(line) and not _SAFE_DECIMAL_SUM.search(
                    line
                ):
                    hits.append(f"{path}:{i}: {line.strip()}")
                    continue
                for name in hash_cols:
                    if re.search(
                        rf"""F\.sum\(\s*(?:F\.col\(\s*)?["']{name}["']""", line
                    ) and not re.search(
                        rf"""F\.sum\(\s*F\.col\(\s*["']{name}["']\s*\)\s*
                             \.cast\(\s*["']decimal""",
                        line,
                        re.VERBOSE,
                    ):
                        hits.append(
                            f"{path}:{i}: {line.strip()}  "
                            f"[{name!r} bound to a full-range hash above]"
                        )
                        break
    return hits


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    sys.path.insert(0, _REPO_ROOT)

    # srclint root from __file__, NOT os.chdir: a chdir would silently
    # re-anchor a caller's relative sf_dir argument
    hits = srclint_sum_over_hash(os.path.join(_REPO_ROOT, "demo_flink_spark"))
    if hits:
        print("FAIL  srclint sum-over-hash (order-dependent ANSI overflow):")
        for h in hits:
            print("  " + h)
        return 1
    print("OK    srclint sum-over-hash (0 violations)")
    if "--srclint" in sys.argv:
        return 0
    import __spark_entry__ as e
    from demo_flink_spark.session import get_spark

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()

    def resolve(name):
        if name in qs:
            return qs[name]
        # pytest-only operators (demoted from the declared registry in
        # r4) keep their plan-shape audits: resolve the plan callables
        # directly from the plan modules.
        from demo_flink_spark.plans.dedup import q_semantic_cells
        from demo_flink_spark.plans.features import q_pca_scores
        from demo_flink_spark.plans.similarity import q_mmr_rerank, q_topk_pq

        return {
            "similarity_topk_pq": q_topk_pq,
            "embedding_pca_scores": q_pca_scores,
            "dedup_semantic_cells": q_semantic_cells,
            "similarity_mmr_rerank": q_mmr_rerank,
        }[name]

    failures = 0
    for name, (need, forbid) in CHECKS.items():
        plan = plan_of(resolve(name)(spark, sf_dir))
        problems = [f"missing: {frag}" for frag in need if frag not in plan]
        problems += [f"forbidden: {frag}" for frag in forbid if frag in plan]
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"OK    {name}")
    print(f"\n{len(CHECKS) - failures} ok, {failures} failed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
