"""Operator/query library (SURVEY.md §2.B surface).

Each submodule exposes two parallel dicts:

- ``QUERIES``: name -> fn(spark, sf_dir) -> DataFrame   (the Spark impl)
- ``ORACLE``:  name -> ANSI SQL string for DuckDB        (the oracle)

Names registered here are exactly the names the driver sees through
``__spark_entry__.queries()`` / ``oracle_sql()``. A query with no
ORACLE entry gets the driver's weaker rows-only check (documented per
query).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def collect_registry() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Aggregate QUERIES/ORACLE from every operator module."""
    from etl_data_pipeline_spark.operators import (
        aggregates,
        analytics,
        asof,
        graph,
        joins,
        reshape,
        scalars,
        scans,
        setops,
        subqueries,
        tpch,
        udfs,
        windows,
    )
    from etl_data_pipeline_spark.streaming import batch_analogs
    from etl_data_pipeline_spark.llm import (
        curation,
        dedup,
        features,
        multimodal,
        similarity,
        text_analysis,
    )

    # Registry order is load-bearing: external verification harnesses
    # may check a prefix of the registry, so families whose queries do
    # not yet have a hard correctness record are listed FIRST and
    # families fully verified in earlier rounds come last. Within that
    # constraint the order is stable (dict insertion order).
    modules = [
        # -- families holding this round's hoisted entries --
        graph,  # NEW in r7: zero driver evidence yet -> checked first
        tpch,  # NEW in r5: zero driver evidence yet -> checked first
        subqueries, features, batch_analogs, reshape, curation, text_analysis,
        multimodal,
        # -- verified green in earlier rounds; cheap families first so
        #    the checked prefix stays fast --
        scalars, setops, windows, scans, aggregates, udfs,
        joins, asof, analytics,
        # -- verified green and most expensive at the gate; last --
        dedup, similarity,
    ]
    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    for m in modules:
        dup = set(queries) & set(m.QUERIES)
        if dup:
            raise ValueError(f"duplicate query names: {dup} in {m.__name__}")
        queries.update(m.QUERIES)
        oracle.update(getattr(m, "ORACLE", {}))
    unknown = set(oracle) - set(queries)
    if unknown:
        raise ValueError(f"oracle entries without queries: {unknown}")
    # Individual queries whose latest verification row is OLDEST get
    # hoisted to the very front regardless of family (the harness
    # checks only a ~50-entry prefix per round, so the hoist rotates
    # stale evidence back into the check window).
    # Round-7 rotation (per round-6 VERDICT "Next round" #1): the
    # brand-new r7 queries lead (no driver evidence yet — 26 from the
    # first continuation + 9 from the second: pareto/interpolate/CMS/
    # PQ/IVFPQ/UDTF/overlap/pattern-match/ivfpq-recall + 16 from the
    # third: weighted-sample/interleave/autocorr/RFM/fuzzy-contam/
    # PCA×2/interval-overlap/Holt/basket/attribution/PSI-drift/AB-test/BPE×2/peak-concurrency),
    # the two r3-stale dedup queries, then the r4-stale relational
    # core in CORRECTNESS_r04 key order. With a ~50-entry check window
    # the 47 brand-new + 2 r3-stale fill it; the r4-stale set leads
    # the r8 rotation (every one of those queries also re-passed this
    # session's local full gate + the sf1 answer gate).
    hoist = [
        # -- BRAND NEW (r7): no driver evidence at all -- first priority
        "pareto_frontier",
        "asof_interpolate",
        "sketch_cms_topk_bounds",
        "sim_ann_pq_adc",
        "sim_ann_ivfpq",
        "udtf_doc_tokens",
        "sketch_overlap_bounds",
        "events_pattern_match",
        "sim_ann_ivfpq_recall",
        "agg_robust_stats",
        "graph_triangle_count",
        "dedup_semantic",
        "timeseries_ewma",
        "agg_hll_rollup_bounds",
        "text_bigram_logprob",
        "corpus_dsir_weights",
        "pipeline_corpus_curation_v3",
        "graph_triangle_doulion",
        "join_asof_nearest",
        "graph_pagerank",
        "graph_bfs_levels",
        "join_bloom_pruned",
        "events_user_streaks",
        "text_gopher_rules",
        "text_quality_classifier",
        "multimodal_decode_gif",
        "text_char_entropy",
        "corpus_token_budget",
        "text_unigram_logprob",
        "embedding_covariance",
        "multimodal_sniff_dispatch",
        "multimodal_decode_jpeg",
        "multimodal_decode_png",
        "multimodal_decode_wav",
        "dedup_substring_scrub",
        "sim_ann_recall",
        # -- BRAND NEW (r7 third continuation): no driver evidence yet
        "sample_weighted",
        "corpus_interleave",
        "timeseries_autocorr",
        "events_rfm",
        "text_contamination_fuzzy",
        "embedding_pca_power",
        "join_interval_overlap",
        "embedding_pca_project",
        "timeseries_holt",
        "basket_affinity",
        "events_attribution",
        "profile_drift_psi",
        "events_ab_test",
        "text_bpe_pairs",
        "text_bpe_round2",
        "events_peak_concurrency",
        # -- r3-stale (oldest remaining evidence)
        "dedup_embedding_cosine",
        "dedup_levenshtein",
        # -- r4-stale relational core (CORRECTNESS_r04 key order)
        "scan_full",
        "scan_incremental_id",
        "scan_incremental_ts",
        "watermark_advance",
        "project_columns",
        "filter_predicates",
        "pipeline_incremental",
        "sample_hash",
        "sample_stratified",
        "sql_passthrough_q6",
        "profile_key_skew",
        "export_shuffle",
        "join_inner_hash",
        "join_broadcast",
        "join_left_outer",
        "join_full_outer",
        "join_semi",
        "join_anti",
        "join_theta_range",
        "join_skew_salted",
        "join_multiway",
        "tpch_q3ish",
        "tpch_q5ish",
        "join_range_binned",
        "join_cross",
        "join_asof",
        "join_asof_tolerance",
        "agg_groupby",
        "agg_distinct",
        "agg_approx_distinct",
        "agg_rollup",
        "agg_cube",
        "agg_having",
        "agg_percentile",
        "agg_approx_percentile",
        "agg_time_rollup",
        "subquery_scalar",
        "agg_stats",
        "agg_grouping_sets",
        "agg_mode",
        "agg_boolean",
        "agg_histogram",
        "events_funnel",
        "events_retention",
        "events_resample_ffill",
        "events_transition_matrix",
        "events_anomaly_zscore",
        "profile_table_quality",
        "timeseries_user_sim",
        "agg_collect",
    ]
    ordered = {name: queries[name] for name in hoist if name in queries}
    ordered.update(queries)
    return {name: _pinned_utc(fn) for name, fn in ordered.items()}, oracle


def _pinned_utc(fn: QueryFn) -> QueryFn:
    """Pin the session timezone to UTC while ``fn`` builds its
    DataFrame, restoring the caller's setting afterward. The DuckDB
    oracles format naive timestamps as stored, so Spark's
    session-TZ-dependent expressions (date_format/to_date/date_trunc)
    only agree with them under UTC. Restoring is safe because
    timezone-aware expressions capture their zone at ANALYSIS time
    (DataFrame creation) — the returned frame keeps UTC semantics when
    executed later, and the caller's own queries keep their TZ. Both
    registry consumers (__spark_entry__ and EtlEngine) inherit this."""
    import functools

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        key = "spark.sql.session.timeZone"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "UTC")
        try:
            return fn(spark, sf_dir)
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)

    return wrapped
