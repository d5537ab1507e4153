"""Physical-plan assertions (the 100 TB posture checks): predicate
pushdown reaches the parquet scan, column pruning narrows ReadSchema,
explicit broadcasts stay broadcast, top-k compiles to TakeOrdered."""

from pyspark.sql import functions as F

from etl_data_pipeline_spark.operators import joins, scans, setops
from etl_data_pipeline_spark.plans import plan_str as _plan
from etl_data_pipeline_spark.plans import join_operators, scan_count
from etl_data_pipeline_spark.session import load_table


def test_watermark_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(scans.scan_incremental_id(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "GreaterThan(o_orderkey" in plan


def test_column_pruning_in_read_schema(spark, sf_dir):
    plan = _plan(scans.project_columns(spark, sf_dir))
    assert "o_orderkey" in plan and "o_totalprice" in plan
    # pruned: the other four orders columns never reach the scan
    assert "o_orderpriority" not in plan
    assert "o_orderdate" not in plan


def test_broadcast_join_is_broadcast(spark, sf_dir):
    plan = _plan(joins.join_broadcast(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sort_limit_is_take_ordered(spark, sf_dir):
    plan = _plan(setops.sort_limit(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # never a global sort


def test_flagship_no_cartesian_no_global_sort(spark, sf_dir):
    plan = _plan(scans.pipeline_incremental(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "GlobalSort" not in plan
    assert "BroadcastHashJoin" in plan


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Both sides bucketed on the join key: the join plan must contain
    NO exchange — the write-once/join-many co-location contract."""
    from etl_data_pipeline_spark.sinks import write_bucketed

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    write_bucketed(
        load_table(spark, sf_dir, "orders"), "b_orders", "o_custkey", 8,
        sort_col="o_custkey",
    )
    write_bucketed(
        load_table(spark, sf_dir, "customer"), "b_customer", "c_custkey", 8,
        sort_col="c_custkey",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_partitioned_layout_prunes_at_read(spark, sf_dir, tmp_path):
    """write_partitioned: a filter on the partition column must become
    a PartitionFilter (directory pruning), not a data filter."""
    from etl_data_pipeline_spark.sinks import write_partitioned

    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    write_partitioned(ev, "events", {"dir": str(tmp_path)}, ["event_date"])
    back = spark.read.parquet(str(tmp_path / "events"))
    q = back.filter(F.col("event_date") == "2024-01-02")
    plan = _plan(q)
    assert "PartitionFilters" in plan
    # the partition predicate must appear in PartitionFilters, and the
    # row-level PushedFilters must NOT carry event_date (it's pruned
    # before IO, not filtered per row)
    pf_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "event_date" in pf_line
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert all("event_date" not in l for l in pushed)
    # correctness of the pruned read
    expected = ev.filter(F.col("event_date") == "2024-01-02").count()
    assert q.count() == expected


def test_salted_join_plan_spreads_key(spark, sf_dir):
    """Salted join: shuffle keys must include the salt (the whole
    point), and the forced shuffle-hash join must not broadcast."""
    from etl_data_pipeline_spark.operators.joins import join_skew_salted

    plan = _plan(join_skew_salted(spark, sf_dir))
    assert "salt" in plan
    assert "ShuffledHashJoin" in plan


def test_asof_join_single_window_pass(spark, sf_dir):
    """As-of join must be the union+window shape: no join operator of
    any kind in the plan, exactly one exchange for the window."""
    from etl_data_pipeline_spark.operators.asof import join_asof

    assert join_operators(_plan(join_asof(spark, sf_dir))) == set()


def test_curation_single_scan(spark, sf_dir):
    """Corpus curation composes 3 stages but must scan documents ONCE
    (stage expressions fused into one projection)."""
    from etl_data_pipeline_spark.llm.curation import pipeline_corpus_curation

    assert scan_count(_plan(pipeline_corpus_curation(spark, sf_dir))) == 1


def test_whole_stage_codegen_active(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = li.filter(F.col("l_quantity") > 10).groupBy("l_returnflag").agg(
        F.sum("l_extendedprice")
    )
    # AQE wraps the plan pre-execution and hides codegen subtrees from
    # explain; toggle it off just to inspect the static plan.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out = _plan(q, mode="codegen")
        n = int(out.split("Found ")[1].split(" ")[0])
        assert n >= 1, out[:500]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_sessionize_single_exchange(spark, sf_dir):
    """Both windows (lag + running sum) hash by user_id — the plan
    must reuse ONE exchange, not shuffle per window."""
    from etl_data_pipeline_spark.streaming import batch_analogs
    from etl_data_pipeline_spark.plans import exchange_count

    plan = _plan(batch_analogs.events_sessionize(spark, sf_dir))
    assert exchange_count(plan) == 1


def test_subquery_scalar_stays_broadcast(spark, sf_dir):
    """The per-segment average is a tiny aggregate; joining it back
    must broadcast, never sort-merge."""
    from etl_data_pipeline_spark.operators import aggregates

    plan = _plan(aggregates.subquery_scalar(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_top_tokens_is_take_ordered(spark, sf_dir):
    """Global top-k after explode+count compiles to
    TakeOrderedAndProject (K rows cross to the driver, never a
    global sort of the token dictionary)."""
    from etl_data_pipeline_spark.llm import text_analysis

    plan = _plan(text_analysis.text_top_tokens(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_sample_hash_prunes_columns(spark, sf_dir):
    """The md5-bucket sample projects 4 columns; the scan must not
    read the rest of orders."""
    from etl_data_pipeline_spark.operators import scans

    plan = _plan(scans.sample_hash(spark, sf_dir))
    assert "o_orderpriority" not in plan
    assert "o_orderdate" not in plan


def test_range_binned_is_equi_join(spark, sf_dir):
    """The whole point of binning: the interval join must compile to a
    hash/sort-merge EQUI join on (user, bucket) — never a nested-loop
    or cartesian plan."""
    from etl_data_pipeline_spark.operators import joins

    plan = _plan(joins.join_range_binned(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # equi-join family: broadcast-hash at toy scale, shuffled
    # hash/sort-merge once both sides are big
    assert any(
        j in plan
        for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    )


def test_contamination_broadcasts_eval_side(spark, sf_dir):
    """The tiny eval side must broadcast: the training corpus streams
    through one scan with no shuffle of its n-grams."""
    from etl_data_pipeline_spark.llm import text_analysis as ta

    plan = _plan(ta.text_contamination(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pii_and_repetition_are_map_only(spark, sf_dir):
    """Per-doc quality/scrub transforms: zero Python; PII is pure scan
    (no exchange at all), repetition's ONLY exchange is the explicit
    spread() round-robin (CPU fan-out, not a key shuffle)."""
    from etl_data_pipeline_spark.llm import text_analysis as ta

    plan = _plan(ta.text_pii_scrub(spark, sf_dir))
    assert "Exchange" not in plan
    rep_plan = _plan(ta.text_repetition(spark, sf_dir))
    assert "Exchange hashpartitioning" not in rep_plan  # no key shuffle
    # one exchange NODE (formatted plans print each node twice:
    # tree line "+- Exchange (n)" and detail line "(n) Exchange")
    assert rep_plan.count("Exchange (") == 1  # the spread() fan-out only
    for p in (plan, rep_plan):
        for py_node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert py_node not in p


def test_decode_header_is_jvm_only(spark, sf_dir):
    """The byte-level header decode must stay inside codegen: no
    Python eval nodes, no exchange (map-only parse)."""
    from etl_data_pipeline_spark.llm.multimodal import multimodal_decode_header

    plan = _plan(multimodal_decode_header(spark, sf_dir))
    assert "Exchange" not in plan
    for py_node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_node not in plan
    # '* ' prefix in the formatted plan = inside a WholeStageCodegen stage
    assert "* Project" in plan


def test_embedding_cosine_has_no_cartesian(spark, sf_dir):
    """The multi-table LSH candidate join must plan as a hash join on
    (table, bucket) — never a cartesian/nested-loop pair explosion."""
    from etl_data_pipeline_spark.llm import dedup

    plan = _plan(dedup.dedup_embedding_cosine(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_negative_sampling_never_enumerates_items(spark, sf_dir):
    """Candidate generation must be hash arithmetic, not a user x item
    product: the part table appears ONLY as the 1-row max-key
    aggregate (broadcast), and the only join with real cardinality is
    the single anti-join removing true interactions."""
    from etl_data_pipeline_spark.llm import features

    plan = _plan(features.recsys_negative_samples(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    # part's contribution is a scalar: max(p_partkey), nothing wider
    assert "max(p_partkey" in plan
    assert "Generate" in plan  # K slots per user expanded map-side


def test_decayed_value_single_shuffle(spark, sf_dir):
    """Recency-decayed aggregate: the reference timestamp rides in as
    a broadcast; the ONLY key shuffle is the final per-user agg."""
    from etl_data_pipeline_spark.llm import features

    from etl_data_pipeline_spark.plans import exchange_count

    plan = _plan(features.events_decayed_value(spark, sf_dir))
    # two shuffle exchanges total: the 1-row max(ts) SinglePartition
    # reduction and the per-user hash agg — no join shuffle anywhere
    assert exchange_count(plan) <= 2
    assert "SortMergeJoin" not in plan


def test_quality_resample_is_map_only(spark, sf_dir):
    """Keep-decision = integer compare on a hash bucket: pure scan,
    no exchange, no Python."""
    from etl_data_pipeline_spark.llm import features

    plan = _plan(features.corpus_quality_resample(spark, sf_dir))
    assert "Exchange" not in plan
    for py_node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_node not in plan


def test_exists_subquery_is_semi_join(spark, sf_dir):
    """EXISTS compiles to one LeftSemi join (each order emitted at most
    once — no DISTINCT pass), with the non-equi date residual inside
    the join condition, not a post-join filter over a product."""
    from etl_data_pipeline_spark.operators import subqueries

    plan = _plan(subqueries.subq_exists_lateship(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_promo_share_single_pass(spark, sf_dir):
    """Conditional-aggregation ratio: part broadcasts; numerator and
    denominator come out of ONE aggregate over one lineitem scan."""
    from etl_data_pipeline_spark.operators import subqueries

    plan = _plan(subqueries.agg_promo_share(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert scan_count(plan) == 2  # one lineitem scan + one part scan


def test_grouped_map_regimes_use_right_operator(spark, sf_dir):
    """The two grouped-map regimes compile to their intended physical
    operators: many-tiny-groups -> MapInPandas after a key
    repartition; few-big-groups -> FlatMapGroupsInPandas."""
    from etl_data_pipeline_spark.operators import udfs

    many = _plan(udfs.udaf_grouped(spark, sf_dir))
    assert "MapInPandas" in many
    assert "FlatMapGroupsInPandas" not in many
    few = _plan(udfs.udaf_segment_trend(spark, sf_dir))
    assert "FlatMapGroupsInPandas" in few


def test_canonical_antijoin_broadcasts_losers(spark, sf_dir):
    """The kept-set anti-join must broadcast the small losers relation
    (cluster members), never shuffle the whole corpus by doc_id: the
    corpus side streams map-side through a BroadcastHashJoin."""
    from etl_data_pipeline_spark.llm import dedup
    from etl_data_pipeline_spark.plans import exchange_count

    # assert the COLD plan: a cache left by an earlier test swaps scans
    # for InMemoryTableScan and shifts the exchange count
    spark.catalog.clearCache()
    plan = _plan(dedup.dedup_canonical(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # corpus scan -> broadcast anti-join -> project: no data exchange
    # beyond the broadcast itself
    assert exchange_count(plan) == 0


def test_embedding_cosine_exchange_budget(spark, sf_dir):
    """Pin the scale shape, not just the absence of a cartesian: the
    8-table OR-construction self-join runs on bare (table, bucket)
    rows with a bounded exchange budget."""
    from etl_data_pipeline_spark.llm import dedup
    from etl_data_pipeline_spark.plans import exchange_count

    spark.catalog.clearCache()  # cold plan (see canonical test note)
    plan = _plan(dedup.dedup_embedding_cosine(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert exchange_count(plan) <= 2


def test_negative_sampling_exchange_budget(spark, sf_dir):
    """recsys_negative_samples: the only nested-loop allowed is the
    1-row scalar max(p_partkey) broadcast (a scalar-subquery shape —
    O(n), not a product); the pair-generating joins stay hash joins
    within a bounded exchange budget."""
    from etl_data_pipeline_spark.llm import features
    from etl_data_pipeline_spark.plans import exchange_count

    import re

    spark.catalog.clearCache()  # cold plan (see canonical test note)
    plan = _plan(features.recsys_negative_samples(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the single BNLJ operator joins against the 1-row max aggregate,
    # nothing wider (formatted explain prints each operator twice —
    # tree + details — so count operator-detail headers)
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) == 1
    assert "max(p_partkey" in plan
    assert exchange_count(plan) <= 4


def test_tpch_q21_single_fact_scan_no_self_rejoin(spark, sf_dir):
    """q21ish must compute per-order counts via a window over the
    aggregated relation, not a groupBy+rejoin — the naive formulation
    makes Catalyst evaluate the per-pair chain twice (two lineitem
    scans, a sort-merge self-join). Pin: one lineitem scan, one orders
    scan, no SMJ, and the window exchange moves post-agg data only."""
    from etl_data_pipeline_spark.operators import tpch
    from etl_data_pipeline_spark.plans import exchange_count

    spark.catalog.clearCache()
    plan = _plan(tpch.tpch_q21ish(spark, sf_dir))
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("orders.parquet") == 1
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # agg shuffle + window repartition + final s_name agg; broadcasts
    # are not exchanges of table data
    assert exchange_count(plan) <= 3


def test_tpch_q2_argmin_over_aggregated_relation(spark, sf_dir):
    """q2ish's row_number ARGMIN must run over the per-(part,supp)
    aggregate, never the raw fact rows: the Window's child contains the
    HashAggregate. Also: dims broadcast, top-100 is TakeOrdered."""
    from etl_data_pipeline_spark.operators import tpch

    spark.catalog.clearCache()
    plan = _plan(tpch.tpch_q2ish(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    # Window appears after (above) the aggregate in the formatted tree
    assert "Window" in plan and "HashAggregate" in plan


def test_tpch_star_queries_broadcast_all_dims(spark, sf_dir):
    """Every r5 star-shape query joins its dimensions as broadcasts —
    no sort-merge join anywhere, no nested loop, exactly one fact scan
    of lineitem."""
    from etl_data_pipeline_spark.operators import tpch

    for name in ("tpch_q7ish", "tpch_q8ish", "tpch_q9ish", "tpch_q10ish",
                 "tpch_q19ish"):
        spark.catalog.clearCache()
        plan = _plan(tpch.QUERIES[name](spark, sf_dir))
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert plan.count("lineitem.parquet") == 1, name


def test_tpch_q10_pushes_date_and_flag_filters(spark, sf_dir):
    """q10ish's o_orderdate window and l_returnflag='R' both reach
    their parquet scans as pushed filters."""
    from etl_data_pipeline_spark.operators import tpch
    from etl_data_pipeline_spark.plans import has_pushed_filter

    spark.catalog.clearCache()
    plan = _plan(tpch.tpch_q10ish(spark, sf_dir))
    assert has_pushed_filter(plan, "EqualTo(l_returnflag,R)")
    assert has_pushed_filter(plan, "o_orderdate")


def test_duplicate_spans_single_scan_take_ordered(spark, sf_dir):
    """text_duplicate_spans: one documents scan, the span aggregate's
    single exchange, and a TakeOrdered top-k — never a global sort or
    a second corpus pass."""
    from etl_data_pipeline_spark.llm import text_analysis
    from etl_data_pipeline_spark.plans import exchange_count

    spark.catalog.clearCache()
    plan = _plan(text_analysis.text_duplicate_spans(spark, sf_dir))
    assert plan.count("documents.parquet") == 1
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert exchange_count(plan) <= 2  # span agg (+ AQE artifacts at most)


def test_png_wav_decode_are_jvm_only(spark, sf_dir):
    """The real-format header decodes (PNG big-endian + CRC32, WAV
    little-endian RIFF) must stay map-only inside codegen: no Python
    eval nodes, no exchange, one scan of documents — the 100 TB shape
    where header analytics read ~45 bytes per row JVM-side."""
    from etl_data_pipeline_spark.llm.multimodal import (
        multimodal_decode_png,
        multimodal_decode_wav,
    )
    from etl_data_pipeline_spark.plans import scan_count

    for q in (multimodal_decode_png, multimodal_decode_wav):
        plan = _plan(q(spark, sf_dir))
        assert "Exchange" not in plan
        for py_node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert py_node not in plan
        assert "* Project" in plan
        assert scan_count(plan) == 1


def test_substring_scrub_exchange_budget(spark, sf_dir):
    """dedup_substring_scrub: <= 5 shuffles (span agg, span join,
    coverage agg, rebuild join), no Python nodes, no cartesian — the
    rewrite must stay a bounded-shuffle relational pipeline."""
    from etl_data_pipeline_spark.llm.text_analysis import dedup_substring_scrub
    from etl_data_pipeline_spark.plans import exchange_count

    plan = _plan(dedup_substring_scrub(spark, sf_dir))
    assert exchange_count(plan) <= 5
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                "BroadcastNestedLoop"):
        assert bad not in plan


def test_jpeg_and_dispatch_decode_are_jvm_only(spark, sf_dir):
    """The segment-walk JPEG decode and the format-sniffing dispatcher
    must stay map-only inside codegen — the aggregate-fold walk and
    the three gated parsers all compile into one projection over one
    scan: no Python nodes, no exchange."""
    from etl_data_pipeline_spark.llm.multimodal import (
        multimodal_decode_jpeg,
        multimodal_sniff_dispatch,
    )
    from etl_data_pipeline_spark.plans import scan_count

    for q in (multimodal_decode_jpeg, multimodal_sniff_dispatch):
        plan = _plan(q(spark, sf_dir))
        assert "Exchange" not in plan
        for py_node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert py_node not in plan
        assert scan_count(plan) == 1


def test_sim_ann_recall_shares_work_and_broadcasts(spark, sf_dir):
    """sim_ann_recall: every join must broadcast its small side —
    cell candidates hash-join against broadcast probe cells, the tiny
    approx/exact intersection must NOT fall back to a sort-merge join,
    and the only nested-loop joins are the INTENDED brute-force /
    assignment broadcasts (corpus x small-broadcast, the sim_topk
    shape). The per-depth expansion is a map-side explode, not a join
    against the depth list."""
    from etl_data_pipeline_spark.llm.similarity import sim_ann_recall
    from etl_data_pipeline_spark.plans import join_operators

    plan = _plan(sim_ann_recall(spark, sf_dir))
    ops = join_operators(plan)
    assert "CartesianProduct" not in ops
    assert "SortMergeJoin" not in ops
    assert "BroadcastHashJoin" in ops
    # nested-loop joins are all broadcast-bounded (brute-force truth,
    # centroid assignment, the 1-row totals join) — never unbounded
    assert "ShuffledHashJoin" not in ops
    for py_node in ("BatchEvalPython", "ArrowEvalPython"):
        assert py_node not in plan


def test_round7_signal_ops_exchange_budgets(spark, sf_dir):
    """Shuffle budgets for the round-7 signal operators: unigram LM
    scoring <= 5 exchanges (counts, scoring join, per-doc agg, totals),
    char entropy <= 3, covariance <= 3 (pair products, means), token
    budget <= 4 (bucket agg, tiny-window, rebroadcast join) — and no
    Python nodes or cartesian products anywhere."""
    from etl_data_pipeline_spark.llm.curation import corpus_token_budget
    from etl_data_pipeline_spark.llm.similarity import embedding_covariance
    from etl_data_pipeline_spark.llm.text_analysis import (
        text_char_entropy,
        text_unigram_logprob,
    )
    from etl_data_pipeline_spark.plans import exchange_count

    budgets = [
        # unigram: spread + vocab agg + scoring join + per-doc agg +
        # the persisted-frame reads (vocab and per_doc persists cut
        # this from a measured 15 to 6)
        (text_unigram_logprob, 6),
        (text_char_entropy, 3),
        (embedding_covariance, 4),
        (corpus_token_budget, 4),
    ]
    for q, budget in budgets:
        plan = _plan(q(spark, sf_dir))
        assert exchange_count(plan) <= budget, (q.__name__, plan)
        for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
            assert bad not in plan, q.__name__


def test_third_continuation_ops_exchange_budgets(spark, sf_dir):
    """Shuffle budgets for the third-continuation operators (the
    numbers live in the ``budgets`` list below, one comment per
    non-obvious entry) — and no Python nodes or cartesian products
    anywhere (the 1-row crossJoins plan as broadcast nested loops of
    singletons, not CartesianProduct)."""
    from etl_data_pipeline_spark.llm.curation import corpus_interleave
    from etl_data_pipeline_spark.llm.text_analysis import text_contamination_fuzzy
    from etl_data_pipeline_spark.operators.analytics import (
        basket_affinity,
        events_ab_test,
        events_peak_concurrency,
        events_rfm,
        profile_drift_psi,
        timeseries_autocorr,
        timeseries_holt,
    )
    from etl_data_pipeline_spark.operators.scans import sample_weighted
    from etl_data_pipeline_spark.plans import exchange_count

    budgets = [
        (sample_weighted, 1),
        # 0 in the VISIBLE plan: the stride sort + zipWithIndex run in
        # the RDD lineage behind createDataFrame (r11 swap of the
        # single-partition global row_number); the per-lang rank
        # window's exchange is inside that lineage too
        (corpus_interleave, 0),
        (timeseries_autocorr, 1),
        # 7: the per-user groupBy (cached subtree, printed per
        # reference) + three user_id joins assembling the r/f/m
        # quartile frames — each quartile's distributed sort +
        # zipWithIndex is RDD-lineage (r11 swap of three global ntile
        # windows; the old plan's 3 exchanges INCLUDED three
        # Exchange SinglePartition, which is what the swap removed)
        (events_rfm, 7),
        # 6: eval-distinct + train-size + train-hits groupBys, each
        # over an unpersisted (deliberately — pipelined re-scan beats
        # caching the shingle stream) explode subtree, + the final
        # doc-keyed join's two sides
        (text_contamination_fuzzy, 6),
        # 8: the items distinct subtree repeats per consumer
        # (measured A/B: re-scanning beats caching, see the operator)
        (basket_affinity, 8),
        (timeseries_holt, 1),
        # 7: per column, the bin groupBy + its totals reference (the
        # counts relation is persisted but explain prints the cached
        # subtree per reference) + the final 1-row folds
        (profile_drift_psi, 7),
        (events_ab_test, 2),
        # 2 + exactly ONE events scan: the sweep deltas come from one
        # explode, not a unionAll re-planning the sessionize subtree
        (events_peak_concurrency, 2),
    ]
    for q, budget in budgets:
        plan = _plan(q(spark, sf_dir))
        assert exchange_count(plan) <= budget, (q.__name__, plan)
        for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
            assert bad not in plan, q.__name__


# ------------------------------------------ registry-wide plan gate


# The ONLY plans allowed to contain Python evaluation nodes: the four
# Python-extension tiers, the mandated multimodal stub, and
# dedup_simhash's vectorized bit-majority vote (token hashing JVM-side).
# A new operator that plans a Python node must either go JVM-side or be
# added here WITH the documentation that makes it a deliberate exhibit.
PYTHON_EXHIBITS = {
    "udf_scalar",
    "udf_pandas",
    "udaf_grouped",
    "udaf_segment_trend",
    "udtf_doc_tokens",
    "multimodal_decode_stub",
    "dedup_simhash",
}
PY_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "PythonDataSource",
)


def test_registry_wide_plan_posture(spark, sf_dir):
    """Every registered query's physical plan: zero CartesianProduct,
    and Python evaluation nodes only in the documented exhibits — the
    CI-shaped version of PLANS.md's repo-wide invariants, so a future
    operator cannot silently regress plan posture (round-7 verdict
    item 8). Builds plans only; never executes the queries."""
    from etl_data_pipeline_spark.functions.caching import release_tracked
    from etl_data_pipeline_spark.operators import collect_registry

    queries, _ = collect_registry()
    cartesian, stray_python, failures = [], [], []
    for name, fn in queries.items():
        try:
            plan = _plan(fn(spark, sf_dir))
        except Exception as e:
            failures.append((name, str(e)[:120]))
            continue
        finally:
            # iterative operators persist/checkpoint during construction
            spark.catalog.clearCache()
            release_tracked(spark)
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if name not in PYTHON_EXHIBITS and any(n in plan for n in PY_NODES):
            stray_python.append(name)
    assert not failures, failures
    assert not cartesian, f"CartesianProduct plans: {cartesian}"
    assert not stray_python, (
        f"Python evaluation outside the documented exhibits: {stray_python}"
    )
