"""Query registry: every implemented operator declared as a named,
oracle-checked query.

Each plan module exposes ``SPECS: list[QuerySpec]``; ``all_specs()``
aggregates them into the dict that ``__spark_entry__.py`` publishes to
the driver. Keeping the Spark callable and its DuckDB oracle SQL side
by side in one spec is what keeps column names/aliases in sync — the
driver's compare sorts columns by name before hashing values.
"""

from __future__ import annotations

from demo_flink_spark.plans.spec import QuerySpec  # noqa: F401


def all_specs() -> dict[str, "QuerySpec"]:
    # Imports live inside the function so a broken plan module surfaces
    # at driver time with a clear traceback instead of at package import.
    from demo_flink_spark.plans import (
        dedup,
        features,
        graph,
        modern,
        multimodal,
        pipeline,
        quality,
        relational,
        similarity,
        stateful,
        temporal,
        text,
        timeseries,
        tpch_ext,
        webtext,
        windows,
    )

    collected: dict[str, QuerySpec] = {}
    for mod in (
        timeseries,
        modern,
        features,
        graph,
        pipeline,
        quality,
        tpch_ext,
        temporal,
        dedup,
        similarity,
        multimodal,
        relational,
        windows,
        stateful,
        text,
        webtext,
    ):
        for spec in mod.SPECS:
            if spec.name in collected:
                raise ValueError(f"duplicate query name: {spec.name}")
            collected[spec.name] = spec

    # The driver samples ~50 queries per round in registry order, so the
    # registry front must rotate toward whatever has the least driver
    # evidence. These 40 names are the queries absent from every
    # CORRECTNESS_r* file through round 3 (r01 ∪ r03 = 99 of 139);
    # emitting them first makes round 4's sample cover them
    # (VERDICT.md round 3, item 3).
    never_driver_checked = (
        "cep_pattern_view_click_purchase",  # new in r4
        "corpus_health_report",  # new in r4
        "dedup_eval_minhash",  # new in r4
        "multimodal_resize",  # new in r4
        "dedup_cluster_keep_longest",  # new in r4
        "token_budget_mixture",  # new in r4
        "pmi_cooccurrence",  # new in r4
        "retrieval_eval_metrics",  # new in r4
        "ohlc_bars_15m",  # new in r4
        "dq_constraint_report",  # new in r4
        "skew_report_events",  # new in r4
        "span_corruption_t5",  # new in r4
        "hard_negative_mining",  # new in r4
        "url_canonical_dedup",  # new in r4
        "embedding_random_projection",  # new in r4
        "perceptron_quality_train",  # new in r4
        "c4_line_filter",  # new in r4
        "gopher_quality_filter",  # new in r4
        "hybrid_search_rrf",  # new in r4
        "html_text_extract",  # new in r4
        "domain_quota_curation",  # new in r4
        "dsir_importance_weights",  # new in r4
        "embedding_label_centroids",  # new in r4
        "interval_overlap_join",  # new in r4
        "dedup_substring_removal",  # new in r4
        "quality_classifier_score",  # new in r4
        "similarity_topk_bruteforce",
        "similarity_topk_srp_lsh",
        "similarity_topk_ivf",
        "multimodal_decode_meta",
        "multimodal_decode_stats",
        "multimodal_frame_sample",
        "profile_lineitem",
        "setops_all",
        "scalar_null_semantics",
        "scalar_datetime_ext",
        "window_distribution",
        "percentile_exact",
        "q6_forecast_revenue",
        "q10_returned_items",
        "q18_large_volume",
        "pivot_event_daily",
        "unpivot_measures",
        "agg_corr_covar",
        "salted_agg_events",
        "salted_join_events",
        "histogram_totalprice",
        "quantile_binning_price",
        "window_topn_users_hourly",
        "window_processing_time_10s",
        "cdc_upsert_snapshot",
        "heavy_hitter_words",
        "scalar_posexplode",
        "lm_bigram_score",
        "vocab_min_max_df",
        "token_count_bpe",
        "repetition_signals",
        "pii_scrub",
        "url_extract",
        "stratified_sample_by_lang",
        "mixture_resample_lang",
        "weighted_sample_quality",
        "pipeline_curation_end2end",
        "dataset_split_assign",
        "bm25_hash_join_vector",
    )
    out: dict[str, QuerySpec] = {}
    for name in never_driver_checked:
        if name in collected:  # tolerate renames/demotions in later rounds
            out[name] = collected.pop(name)
    out.update(collected)
    return out
