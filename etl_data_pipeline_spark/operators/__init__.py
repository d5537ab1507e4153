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
        joins,
        reshape,
        scalars,
        scans,
        setops,
        subqueries,
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
    # Individual queries whose latest verification row was red or
    # missing get hoisted to the very front regardless of family.
    # Round-3 rotation: the 3 round-2 red rows (oracle HUGEINT casts,
    # now fixed) plus the 21 entries that have never had a driver row
    # (the harness checks only a ~50-entry prefix per round).
    hoist = [
        # red in round 2 — oracle-side casts fixed this round
        "corpus_mix_weights",
        "corpus_pack_sequences",
        "events_sessionize",
        # new round-3 family (decision-support subqueries) — no rows yet
        "subq_exists_lateship",
        "subq_not_exists_quiet_parts",
        "subq_corr_scalar_avgqty",
        "subq_in_heavy_orders",
        "subq_nested_max_revenue",
        "agg_promo_share",
        "subq_q22ish",
        "join_count_distribution",
        "events_session_funnel",
        # new round-3 grouped-map twin (few-big-groups applyInPandas)
        "udaf_segment_trend",
        # new round-3 feature-engineering family — no rows yet
        "recsys_negative_samples",
        "events_decayed_value",
        "corpus_quality_resample",
        # reimplemented round-3 (mapInPandas amortization) — re-verify
        "udaf_grouped",
        # semantics changed post-r2 rows (bounded linkage output; staged
        # embedding-LSH verify) — their old green rows verified the OLD
        # contract, so re-verify
        "dedup_levenshtein",
        "dedup_embedding_cosine",
        # never driver-checked through round 2
        "stream_sliding",
        "stream_session",
        "stream_watermark_late",
        "stream_dedup",
        "stream_join_attribution",
        "agg_pivot",
        "unpivot_metrics",
        "pipeline_corpus_curation",
        "text_stats",
        "text_tokens",
        "text_lang_id",
        "text_quality",
        "text_fingerprint",
        "text_top_tokens",
        "text_normalize",
        "text_chunks",
        "text_tfidf",
        "multimodal_binary_meta",
        "multimodal_resize_plan",
        "multimodal_frame_sample",
        "multimodal_decode_stub",
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
