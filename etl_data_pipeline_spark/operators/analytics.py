"""Event-analytics operators over the ``events`` table: conversion
funnel and cohort retention — the aggregate shapes a product-analytics
workload runs on the same event stream the streaming operators ingest.

New surface relative to the reference (which has no aggregations at
all, SURVEY.md §2.A negative space); both are classic multi-stage
aggregations a user of a general engine expects.

Scale posture: every stage reduces events to per-user scalars FIRST
(groupBy user — one shuffle on a high-cardinality, well-distributed
key), then operates on the small per-user relation. Nothing ever
self-joins raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_data_pipeline_spark.functions.hashing import sql_md5_long60
from etl_data_pipeline_spark.functions.rounding import hround, sql_round
from etl_data_pipeline_spark.functions.sessions import sql_session_seq_cte
from etl_data_pipeline_spark.session import load_table

_SQL_SESSION_CTE = sql_session_seq_cte()

FUNNEL_STAGES = ("view", "click", "purchase")


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: a user
    reaches stage k only with a stage-k event strictly after their
    stage-(k-1) entry time.

    Each stage is a per-user min-timestamp aggregate joined to the
    previous stage's entry times — the stage relations are |users|
    rows, so the chain is three cheap hash aggregates + broadcastable
    joins, never an event-level self-join.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[1])
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[2])
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = [s.agg(F.count("*").alias("n_users")) for s in (s1, s2, s3)]
    staged = [
        c.select(F.lit(i + 1).alias("stage"), F.lit(name).alias("event_type"), "n_users")
        for i, (c, name) in enumerate(zip(counts, FUNNEL_STAGES))
    ]
    out = staged[0]
    for s in staged[1:]:
        out = out.unionByName(s)
    return out


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity date; for
    each (cohort_date, day_offset), how many of that cohort were
    active that day.

    Two aggregates over events (first-activity per user; distinct
    active days per user) joined on user — both per-user-sized. The
    classic retention-triangle query.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort_date"),
            F.datediff("d", "cohort_date").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + forward-fill: per-user hourly value
    totals on a dense hourly grid between the user's first and last
    activity, gaps carrying the last observed hour's value.

    The hypertable/time-series gap-fill operator. Grid generation is
    per-key sequence+explode (map-side, proportional to output, no
    shuffle); the fill is ONE ordered window per user using
    last(ignorenulls). Everything hashes by user_id, so the hourly
    agg, the grid join, and the window reuse one exchange layout.
    """
    from pyspark.sql.window import Window

    from etl_data_pipeline_spark.functions.rounding import hround

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(hround(F.sum("value"), 2).alias("v"))
    span = hourly.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("h"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(hourly, ["user_id", "h"], "left")
        .select(
            "user_id",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.last("v", ignorenulls=True).over(w).alias("value_filled"),
            F.col("v").isNull().alias("is_gap"),
        )
    )


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix: for each ordered pair
    of consecutive events per user, the transition count and
    probability — sequence analytics (next-action prediction, anomaly
    baselines) over the same stream.

    One lead() window per user (single hash exchange on user_id), then
    two tiny aggregates over the |types|² pair space; the per-source
    totals come back via broadcast, so the events table shuffles
    exactly once.
    """
    from pyspark.sql.window import Window

    from etl_data_pipeline_spark.functions.rounding import hround

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
    )
    totals = pairs.groupBy("src").agg(F.sum("n").alias("total"))
    return pairs.join(F.broadcast(totals), "src").select(
        "src",
        "dst",
        "n",
        hround(F.col("n") / F.col("total"), 6).alias("prob"),
    )


ZSCORE_FLAG = 3.0


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score anomaly detection: events whose value deviates
    ≥ 3σ from their event_type's mean — the standing data-quality
    monitor over an ingest stream.

    The per-type stats are a tiny aggregate broadcast back onto the
    fact scan (same decorrelated-subquery shape as subquery_scalar):
    one full scan, one broadcast, no second pass. Stats are rounded
    before the z-score so the oracle comparison doesn't ride on
    moment-algorithm float noise.
    """
    from etl_data_pipeline_spark.functions.rounding import hround

    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        hround(F.avg("value"), 6).alias("mean_v"),
        hround(F.stddev_samp("value"), 6).alias("std_v"),
    )
    z = (F.col("value") - F.col("mean_v")) / F.col("std_v")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            hround(z, 4).alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) >= ZSCORE_FLAG)
    )


def expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations evaluated in one pass
    (expectations.py:violation_counts — the registry-facing face of
    the pipeline's quality gate): per-rule violation counts over
    lineitem as a single 1-row aggregate. Rules cover all five
    built-in shapes: not_null, in_range, in_set, regex match, and
    composite-key uniqueness (the one rule that shuffles — its window
    shares the same pass). Exact SQL oracle: each rule is a SUM of a
    CASE in DuckDB, uniqueness via a windowed count."""
    from etl_data_pipeline_spark.expectations import Expectation, violation_counts

    li = load_table(spark, sf_dir, "lineitem")
    rules = (
        Expectation("flag_not_null", lambda: F.col("l_returnflag").isNotNull()),
        Expectation(
            "qty_in_range",
            lambda: F.col("l_quantity").isNull()
            | F.col("l_quantity").between(1, 40),
        ),
        Expectation(
            "status_in_set",
            lambda: F.col("l_linestatus").isNull()
            | F.col("l_linestatus").isin("O", "F"),
        ),
        Expectation(
            "flag_matches",
            lambda: F.col("l_returnflag").isNull()
            | F.col("l_returnflag").rlike("^[ANR]$"),
        ),
        Expectation.unique("l_orderkey", "l_linenumber"),
    )
    return violation_counts(li, rules).withColumnRenamed(
        "unique(l_orderkey,l_linenumber)", "line_unique"
    )


def expectations_fk_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative REFERENTIAL expectations (Expectation.foreign_key)
    mixed with Column rules in the same one-pass report: each FK rule
    broadcasts the dimension's distinct key set and tags the batch via
    ONE broadcast left join (no fact-side shuffle), then folds into
    the same _violated projection as the row rules. The FK dimension
    is deliberately RESTRICTED (nations < 20) so orphans exist and the
    orphan count is a real number the DuckDB oracle must reproduce."""
    from etl_data_pipeline_spark.expectations import Expectation, violation_counts

    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rules = (
        Expectation.foreign_key(
            "c_nationkey",
            lambda: nation.filter(F.col("n_nationkey") < 20),
            dim_col="n_nationkey",
            name="fk_nation",
        ),
        Expectation(
            "acctbal_nonneg",
            lambda: F.col("c_acctbal").isNull() | (F.col("c_acctbal") >= 0),
        ),
        Expectation.not_null("c_mktsegment"),
    )
    return violation_counts(cust, rules).toDF(
        "total_rows",
        "violating_rows",
        "fk_nation",
        "acctbal_nonneg",
        "mktsegment_not_null",
    )


PROFILE_COLS = ("o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority")


def profile_table_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data-quality profile of orders: rows, nulls,
    distinct count, min/max (as strings) per profiled column — the
    pre-load audit every config-driven pipeline wants per table.

    ONE scan computes every column's metrics in a single aggregate
    row (count/countDistinct/min/max are all partial-aggregable);
    the row is then unpivoted driver-free into (column, metric...)
    long form. Profiling 100 TB costs exactly one pass.
    """
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in PROFILE_COLS:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    row = orders.agg(F.count("*").alias("n_rows"), *aggs)
    per_col = [
        row.select(
            F.lit(c).alias("column"),
            F.col("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_str"),
            F.col(f"{c}__max").alias("max_str"),
        )
        for c in PROFILE_COLS
    ]
    out = per_col[0]
    for p in per_col[1:]:
        out = out.unionByName(p)
    return out


TS_SIM_QUERY_MOD = 50
TS_SIM_TOP_K = 3


def timeseries_user_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search: for each query user
    (user_id % 50 == 0), the 3 users with the most similar hourly
    activity profile by cosine over hourly value totals (distributed
    time-series top-k similarity in the spirit of the EDBT'19 streaming
    time-series search line of work — relational formulation).

    The key scale idea: NO dense per-user vectors are ever built —
    cosine over sparse series is Σ u_h·v_h on the hours both users
    were active, so the dot products come from an equi-join of the
    hourly relation with the (small, broadcast) query users' hours,
    and norms are per-user scalars. Everything is hash joins +
    aggregates; missing hours contribute 0 implicitly.
    """
    from pyspark.sql.window import Window

    from etl_data_pipeline_spark.functions.rounding import hround

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum("value").alias("v"))
    norms = hourly.groupBy("user_id").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("norm")
    )
    q_hours = hourly.filter(F.col("user_id") % TS_SIM_QUERY_MOD == 0).select(
        F.col("user_id").alias("q_user"), "h", F.col("v").alias("qv")
    )
    dots = (
        hourly.join(F.broadcast(q_hours), "h")
        .filter(F.col("user_id") != F.col("q_user"))
        .groupBy("q_user", "user_id")
        .agg(F.sum(F.col("v") * F.col("qv")).alias("dot"))
    )
    q_norms = norms.select(
        F.col("user_id").alias("q_user"), F.col("norm").alias("q_norm")
    )
    scored = (
        dots.join(F.broadcast(q_norms), "q_user")
        .join(norms, "user_id")
        .select(
            "q_user",
            "user_id",
            hround(F.col("dot") / (F.col("q_norm") * F.col("norm")), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("q_user").orderBy(F.desc("cosine"), F.asc("user_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TS_SIM_TOP_K)
        .select("q_user", "rank", "user_id", "cosine")
    )


def cdc_compact_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction: collapse a change stream to current state —
    one row per entity (the latest by (ts, event_id)), with entities
    whose latest change is a tombstone dropped entirely. This is the
    materialize-state step of any CDC ingest (Debezium→warehouse,
    Kafka compacted topics); events stands in for the change log with
    user_id as the entity key and 'error' as the tombstone marker.

    Plan: one shuffle on the entity key, per-key top-1 via the
    row_number window (WindowGroupLimit pushes the limit below the
    sort at scale), tombstones filtered AFTER taking the latest — a
    delete only wins if it IS the latest change. Deterministic
    tie-break on event_id.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    latest = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter(F.col("event_type") != "error")  # tombstone compaction
    )
    return latest.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
    )


def events_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel depth WITHIN sessions: sessionize (shared 30-min-gap
    helper, functions/sessions.py) and classify every session by how
    far its ORDERED view → click → purchase progression got — the
    same strictly-after semantics as events_funnel, per session:

    - 1 = viewed;
    - 2 = first click strictly after the session's first view;
    - 3 = first purchase strictly after THAT click;
    - 0 = session with no view.

    Emits session counts and mean session size per depth. The
    composition the per-user funnel cannot express: conversion is
    credited only when the whole progression happens inside ONE
    session.

    One exchange total: the sessionizing windows hash by user_id, and
    every following per-(user, session) window and groupBy is
    satisfied by that same user_id clustering (a session never spans
    users), so the chained stage minima add only local sorts."""
    from etl_data_pipeline_spark.functions.sessions import with_session_seq

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    sess = with_session_seq(ev)
    us = F.unix_micros("ts")
    ws = Window.partitionBy("user_id", "session_seq")
    staged = (
        sess.withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", us)).over(ws),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (us > F.col("t_view")), us
                )
            ).over(ws),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (us > F.col("t_click")),
                    us,
                )
            ).over(ws),
        )
    )
    per_session = staged.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    depth = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        per_session.select(depth.alias("funnel_depth"), "n_events")
        .groupBy("funnel_depth")
        .agg(
            F.count("*").alias("n_sessions"),
            hround(F.avg("n_events"), 4).alias("avg_session_events"),
        )
    )


def events_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity streaks per user — the gaps-and-islands pattern: a
    streak is a maximal run of CONSECUTIVE calendar days with ≥ 1
    event. Island key = day − row_number (constant within a
    consecutive run, the classic trick), so the whole computation is
    one window + two aggregations, all keyed by user_id — one shuffle
    lineage on a high-cardinality key, no self-join, no per-day
    calendar enumeration.

    Output per user: streak count, active-day total, longest streak,
    last active day."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    islands = ev.withColumn(
        "anchor", F.date_sub("day", F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "anchor").agg(
        F.count("*").alias("len"), F.max("day").alias("streak_end")
    )
    return streaks.groupBy("user_id").agg(
        F.count("*").alias("n_streaks"),
        F.sum("len").alias("n_active_days"),
        F.max("len").alias("longest_streak"),
        F.date_format(F.max("streak_end"), "yyyy-MM-dd").alias(
            "last_active_day"
        ),
    )


EWMA_ALPHA = 0.2


def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event values —
    the RECURSIVE operator (s_t = (1-α)·s_{t-1} + α·x_t, seeded with
    the first observation) no window frame can express, run as a
    JVM-side left fold: collect the user's values in (ts, event_id)
    order and ``F.aggregate`` the tail onto the head.

    Exactness: the fold is the SAME IEEE double sequence in both
    engines (DuckDB ``list_reduce`` seeds with the first element and
    folds left, identical literals 0.8/0.2), so the result is
    bit-reproducible — the 8 dp rounding is belt-and-braces, not a
    tolerance.

    Scale posture: ONE shuffle (groupBy user_id, a high-cardinality
    well-distributed key); per-user state is that user's value list,
    bounded by per-entity history length — the same boundedness
    contract as every sessionizer here. For entities with unbounded
    history the streaming twin ``streaming.jobs.running_user_ewma``
    is the scale path: O(1) state per user, and the parity test
    proves its replay is BIT-IDENTICAL to this fold.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    xs = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s.value,
    )
    series = ev.groupBy("user_id").agg(xs.alias("xs"))
    ewma = F.aggregate(
        F.slice("xs", F.lit(2), F.size("xs") - 1),
        F.element_at("xs", 1),
        lambda acc, x: F.lit(1.0 - EWMA_ALPHA) * acc + F.lit(EWMA_ALPHA) * x,
    )
    return series.select(
        "user_id",
        F.size("xs").cast("long").alias("n_events"),
        hround(ewma, 8).alias("ewma"),
    )


PARETO_BUCKET_WIDTH = 10.0  # price-range bucket for the parallel frontier
# (the generator's p_retailprice domain is [900, 1000) — width 10 gives
# ~10 populated buckets so the per-bucket windows actually parallelize;
# a width swallowing the whole domain would degenerate to one global
# window and dead guard machinery)


def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline) over parts, minimizing
    (p_retailprice, p_size): the points no other part dominates on
    both axes — multi-objective shortlist queries (cheapest-AND-
    smallest tradeoff curves) that OLAP engines ship as SKYLINE.

    Scale design — NO global-order window and NO all-pairs NOT
    EXISTS (the textbook formulations; the first serializes onto one
    partition, the second is O(n²)):
      1. collapse to one row per price with min(size) — map-side
         combinable, the only full-data shuffle;
      2. range-bucket the price axis; the frontier test against
         SMALLER-price points splits exactly into (a) points in
         earlier buckets — summarized by a running min over the tiny
         per-bucket-min relation (broadcast back), and (b) same-bucket
         preceding points — a window PARTITIONED BY bucket, so every
         bucket sorts in parallel.
    A point survives iff its size beats the least of both guards.
    Equivalent to the quadratic skyline definition, which is exactly
    what the oracle runs (an independent NOT-EXISTS formulation).

    Reference parity: none (reference is scan-only); §2.B extension
    surface alongside topk_per_group/window_rank."""
    pts = (
        load_table(spark, sf_dir, "part")
        .groupBy(F.col("p_retailprice").alias("price"))
        .agg(F.min("p_size").alias("size"))
        .withColumn(
            "bucket", F.floor(F.col("price") / F.lit(PARETO_BUCKET_WIDTH))
        )
    )
    # Tiny relation: one row per bucket; its prefix-min summarizes every
    # point in all earlier buckets.
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bucket_guard = (
        pts.groupBy("bucket")
        .agg(F.min("size").alias("bmin"))
        .select("bucket", F.min("bmin").over(wb).alias("earlier_min"))
    )
    # Parallel per-bucket running min over strictly-smaller prices.
    wl = (
        Window.partitionBy("bucket")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    guarded = pts.withColumn("local_min", F.min("size").over(wl)).join(
        F.broadcast(bucket_guard), "bucket"
    )
    guard = F.least("local_min", "earlier_min")  # least() skips NULLs
    return (
        guarded.filter(guard.isNull() | (F.col("size") < guard))
        .select("price", "size")
        .orderBy("price")
    )


PATTERN_STRICT = "vcp"  # view -> click -> purchase, CONSECUTIVE
PATTERN_FUNNEL = "v[^p]*p"  # view ... purchase with any non-purchase gap


def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style row-sequence pattern detection: per user,
    count occurrences of (a) the strict consecutive path
    view→click→purchase and (b) the gap-tolerant funnel
    view→…→purchase — the Oracle/Flink `MATCH_RECOGNIZE` workload,
    which Spark has no native operator for.

    Spark-first rendering: the per-user event-initial sequence is ONE
    ordered fold into a string (array_sort(collect_list) — the same
    bounded-per-entity-history contract as timeseries_ewma), and the
    pattern automaton is the JVM regex engine via regexp_count —
    non-overlapping leftmost-first in both Java regex and DuckDB RE2
    for these character-class patterns, so counts hash-compare
    exactly. One user-keyed shuffle; no self-joins, no per-step
    window chains (an L-step pattern as lead() chains costs L windows
    and breaks on gaps)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.substring("event_type", 1, 1).alias("i"),
    )
    seq = F.concat_ws(
        "",
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "i"))),
            lambda s: s.i,
        ),
    )
    return (
        ev.groupBy("user_id")
        .agg(seq.alias("seq"))
        .select(
            "user_id",
            F.length("seq").alias("n_events"),
            F.regexp_count("seq", F.lit(PATTERN_STRICT)).alias("n_strict_paths"),
            F.regexp_count("seq", F.lit(PATTERN_FUNNEL)).alias("n_funnel_paths"),
        )
    )


DAY_US = 86400 * 1_000_000  # one day of exact integer micros


def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the capacity-planning
    number (license seats, connection pools, autoscaling floors) —
    by the classic sweep line: every session contributes (+1 at
    start, −1 at end), the running sum over time is the number of
    sessions open, and its daily maximum is the answer.

    A global sweep needs a total order; the distributed form bounds
    each sweep to a DAY partition by clipping sessions at midnight
    (exact integer `div`/modulo on micros — no double division), so
    every window hashes on day_start and days sweep in parallel.
    Tie semantics: at an instant where sessions both start and end,
    +1 sorts before −1 (delta DESC), making closed-interval overlap
    count; the per-day MAX is invariant to ordering WITHIN the +1
    (or −1) group at one timestamp — each engine may interleave ties
    differently but the peak after all +1s is the same value, which
    is what makes this oracle-exact despite the nondeterministic
    intermediate sweep states.
    """
    from pyspark.sql.window import Window

    from etl_data_pipeline_spark.functions.sessions import with_session_seq

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    sess = (
        with_session_seq(ev)
        .groupBy("user_id", "session_seq")
        .agg(
            F.min(F.unix_micros("ts")).alias("s_start"),
            F.max(F.unix_micros("ts")).alias("s_end"),
        )
    )
    clipped = sess.select(
        F.explode(
            F.sequence(
                F.expr(f"s_start div {DAY_US}"), F.expr(f"s_end div {DAY_US}")
            )
        ).alias("d"),
        "s_start",
        "s_end",
    ).select(
        (F.col("d") * DAY_US).alias("day_start"),
        F.greatest(F.col("s_start"), F.col("d") * DAY_US).alias("c_start"),
        F.least(F.col("s_end"), (F.col("d") + 1) * DAY_US - 1).alias("c_end"),
    )
    # one explode, not a unionAll of two selects: each union branch
    # would re-plan the whole sessionize subtree (double events scan)
    deltas = clipped.select(
        "day_start",
        F.explode(
            F.array(
                F.struct(F.col("c_start").alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col("c_end").alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("x"),
    ).select("day_start", "x.t", "x.delta")
    sweep_w = (
        Window.partitionBy("day_start")
        .orderBy(F.asc("t"), F.desc("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sweep = deltas.select(
        "day_start", F.sum("delta").over(sweep_w).alias("open_now")
    )
    return (
        sweep.groupBy("day_start")
        .agg(
            F.max("open_now").alias("peak_concurrency"),
            (F.count("*") / 2).cast("long").alias("n_session_slices"),
        )
        .select(
            F.date_format(F.timestamp_micros(F.col("day_start")), "yyyy-MM-dd").alias(
                "day"
            ),
            "peak_concurrency",
            "n_session_slices",
        )
    )


AB_SALT = ":ab"        # hash-domain separator for variant assignment
AB_Z_CRITICAL = 1.96   # two-sided 5% significance
AB_CONV_MIN_PURCHASES = 14  # "heavy purchaser" conversion bar: this
# data model averages ~13 purchases/user at EVERY tier (users scale
# with events), so a ≥1-purchase metric saturates at 100% — the bar
# sits at the distribution's center so both variants get a real rate


def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users deterministically hash-assigned
    to control/treatment (the replayable assignment an experiment
    platform must guarantee — same user, same variant, every run and
    every engine), per-variant conversion to 'purchase' measured, and
    the two-proportion z-statistic for the rate difference with the
    5% significance flag — the full experiment-analysis query, one
    row.

    z = (p_t − p_c) / sqrt(p̂(1−p̂)(1/n_c + 1/n_t)) with p̂ the pooled
    rate; all inputs are exact integer counts so the statistic is the
    identical IEEE expression on both engines (only the output is
    rounded). Scale posture: one groupBy(user) reduction of the event
    log, then a single conditional aggregate over per-user scalar
    rows into ONE row — no shuffle after the user reduction; the hash
    assignment is a map-side expression, never a join against an
    assignment table.
    """
    from etl_data_pipeline_spark.functions.hashing import md5_bucket

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= AB_CONV_MIN_PURCHASES,
            1,
        )
        .otherwise(0)
        .alias("converted")
    )
    assigned = per_user.select(
        "converted",
        (
            md5_bucket(
                F.concat(F.col("user_id").cast("string"), F.lit(AB_SALT)), 2
            )
            == 1
        ).alias("is_treatment"),
    )
    n_c = F.sum(F.when(~F.col("is_treatment"), 1).otherwise(0))
    n_t = F.sum(F.when(F.col("is_treatment"), 1).otherwise(0))
    x_c = F.sum(F.when(~F.col("is_treatment"), F.col("converted")).otherwise(0))
    x_t = F.sum(F.when(F.col("is_treatment"), F.col("converted")).otherwise(0))
    agg = assigned.agg(
        n_c.alias("n_control"),
        n_t.alias("n_treatment"),
        x_c.alias("conv_control"),
        x_t.alias("conv_treatment"),
    )
    p_c = F.col("conv_control") / F.col("n_control")
    p_t = F.col("conv_treatment") / F.col("n_treatment")
    pool = (F.col("conv_control") + F.col("conv_treatment")) / (
        F.col("n_control") + F.col("n_treatment")
    )
    denom2 = pool * (1 - pool) * (
        1 / F.col("n_control") + 1 / F.col("n_treatment")
    )
    # a saturated metric (pooled rate 0 or 1) has no variance — the
    # z-test is undefined, reported as NULL rather than a div-by-zero
    z = F.when(denom2 > 0, (p_t - p_c) / F.sqrt(denom2))
    return agg.select(
        "n_control",
        "n_treatment",
        "conv_control",
        "conv_treatment",
        hround(p_c, 6).alias("rate_control"),
        hround(p_t, 6).alias("rate_treatment"),
        hround(z, 6).alias("z_score"),
        F.when(F.abs(z) >= AB_Z_CRITICAL, 1).otherwise(0).alias("significant"),
    )


PSI_SPLIT_DATE = "1999-01-01"  # reference period < split <= current
PSI_PRICE_BINS = 10            # fixed-width bins for the numeric column
PSI_DRIFT_MIN = 0.1            # the standard PSI "investigate" threshold


def profile_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift report between two periods of
    the orders stream — the data-quality gate a production pipeline
    runs before retraining/redeploying on new data: PSI =
    Σ_bins (p−q)·ln(p/q) with Laplace smoothing, for a numeric column
    (o_totalprice, fixed-width bins over the global domain) and a
    categorical one (o_orderpriority, categories as bins). PSI ≥ 0.1
    flags the column as drifted (the industry rule of thumb; ≥ 0.25
    is "act now").

    Cross-engine exactness: bin assignment is the identical IEEE
    expression (floor((x−lo)/w) on the same doubles), counts are
    exact integers, and the smoothed log term is computed from those
    integers identically on both engines — only the FINAL psi is
    rounded. Scale shape: two map-side-combinable groupBys (one per
    column) over one scan each, with the global min/max and period
    totals as 1-row broadcasts; the PSI fold runs over ≤ max(bins,
    categories) rows. Nothing shuffles more than (bin, two counts).
    """
    # NULL o_orderdate is filtered explicitly (and identically in the
    # oracle CTEs): without the filter Spark's when(~is_ref,...) would
    # count a NULL-date row in NEITHER period while a naive CASE WHEN
    # counts it as current — an engine divergence waiting for a fixture
    # change, even though this data model has no NULL dates.
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select(
            "o_totalprice",
            "o_orderpriority",
            (F.col("o_orderdate") < F.lit(PSI_SPLIT_DATE).cast("timestamp")).alias(
                "is_ref"
            ),
        )
    )

    from etl_data_pipeline_spark.functions.caching import tracked_persist

    def psi_of(binned: DataFrame, colname: str) -> DataFrame:
        # persist: the ≤ max(bins, categories)-row counts relation
        # feeds BOTH the totals aggregate and the PSI fold — without
        # it each reference re-runs the full column scan + groupBy
        counts = tracked_persist(
            binned.groupBy("bin").agg(
                F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("c_ref"),
                F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("c_cur"),
            )
        )
        tot = counts.agg(
            F.sum("c_ref").alias("n_ref"),
            F.sum("c_cur").alias("n_cur"),
            # count("bin"), not count("*"): a NULL bin (NULL column
            # value) must not inflate the smoothing denominator — the
            # oracle's count(DISTINCT bin) skips NULLs too
            F.count("bin").alias("n_bins"),
        )
        p = (F.col("c_ref") + 1) / (F.col("n_ref") + F.col("n_bins"))
        q = (F.col("c_cur") + 1) / (F.col("n_cur") + F.col("n_bins"))
        return (
            counts.crossJoin(F.broadcast(tot))
            .select(((p - q) * F.log(p / q)).alias("term"), "n_bins")
            .groupBy("n_bins")
            .agg(hround(F.sum("term"), 6).alias("psi"))
            .select(
                F.lit(colname).alias("column_name"),
                "n_bins",
                "psi",
                F.when(F.col("psi") >= PSI_DRIFT_MIN, 1).otherwise(0).alias(
                    "drifted"
                ),
            )
        )

    mm = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / PSI_PRICE_BINS
    # Degenerate-domain guard (hi == lo, e.g. a constant price column):
    # width 0 would make the bin expression NaN on both engines; collapse
    # to a single bin 0 instead. Mirrored verbatim in the oracle CTE.
    price_bins = o.crossJoin(F.broadcast(mm)).select(
        "is_ref",
        F.when(
            F.col("hi") > F.col("lo"),
            F.least(
                F.floor((F.col("o_totalprice") - F.col("lo")) / width),
                F.lit(PSI_PRICE_BINS - 1),
            ),
        ).otherwise(F.lit(0).cast("long")).alias("bin"),
    )
    prio_bins = o.select("is_ref", F.col("o_orderpriority").alias("bin"))
    return psi_of(price_bins, "o_totalprice").unionAll(
        psi_of(prio_bins, "o_orderpriority")
    )


ATTR_LOOKBACK_US = 24 * 3600 * 1_000_000  # 24-h attribution window
ATTR_TOUCHES = ("view", "click", "signup")  # credit-eligible channels


def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution: for every purchase, credit
    the user's touch events (view/click/signup) inside a 24-h
    lookback under THREE industry models at once — last-touch
    (conversions + full value to the latest touch), first-touch
    (conversion counts), and linear (value split evenly across the
    window's touches) — the marketing-analytics report that decides
    channel budgets.

    Scale design — NO conversion×touch join (the oracle's lateral
    formulation; pair volume = conversions × touches-in-window): one
    user-partitioned sort feeds ALL the signals as window functions —
    last-touch, first-touch and per-channel counts all via RANGE
    frames spanning exactly [conv_us − LOOKBACK, conv_us) in integer
    micros, so the frame IS the oracle's window predicate (a
    same-instant touch is excluded on both engines by construction).
    The shuffle is ONE exchange (every window hashes by user_id); the
    three tiny per-channel aggregates then join broadcast-sized
    relations. Precondition: within-user timestamps are unique at
    micro precision (true of this data model, verified at 1×/10×/30×)
    — RANGE frames order by the single time key, so equal-timestamp
    touches WITHIN one frame would make the first/last pick
    tie-ambiguous in any engine. Enforced, not assumed: a zero-width
    RANGE frame (same partitioning+sort — no extra exchange, the second
    Window pass reuses the first's sort) flags touches that share a
    microsecond, a max over the attribution frame lands the flag on
    each conversion row, and an ``assert_true`` fails the job with a
    clear message iff a tied touch sits INSIDE some conversion's
    lookback — the exact condition under which the first/last pick
    could silently diverge from the oracle's event_id-tiebroken answer.
    Ties that no conversion frame observes are harmless and ignored.
    """
    from pyspark.sql.window import Window

    us = F.unix_micros("ts")
    is_touch = F.col("event_type").isin(*ATTR_TOUCHES)
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value", us.alias("us"),
        is_touch.alias("is_touch"),
    )
    w_range = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-ATTR_LOOKBACK_US, -1)
    )
    touch_channel = F.when(F.col("is_touch"), F.col("event_type"))
    chan_cnt = {
        c: F.sum(
            F.when(F.col("is_touch") & (F.col("event_type") == c), 1).otherwise(0)
        ).over(w_range)
        for c in ATTR_TOUCHES
    }
    # Zero-width RANGE frame on the same (partitionBy, orderBy): counts
    # touch rows sharing this row's exact micro timestamp within the
    # user. A touch with >1 peer is a tie — nondeterministic only if
    # some conversion's frame contains it, which the max-over-w_range
    # below detects on the conversion row itself (where the post-filter
    # Project actually evaluates, unlike a per-touch-row assert that
    # the purchase filter would skip right past).
    w_self = Window.partitionBy("user_id").orderBy("us").rangeBetween(0, 0)
    e = e.select(
        "*",
        (
            F.col("is_touch")
            & (F.sum(F.col("is_touch").cast("int")).over(w_self) > 1)
        ).alias("tied_touch"),
    )
    scored = e.select(
        "*",
        F.last(touch_channel, ignorenulls=True).over(w_range).alias(
            "last_channel_w"
        ),
        F.max(F.col("tied_touch").cast("int")).over(w_range).alias(
            "ties_in_frame"
        ),
        F.first(touch_channel, ignorenulls=True).over(w_range).alias(
            "first_channel"
        ),
        *[chan_cnt[c].alias(f"cnt_{c}") for c in ATTR_TOUCHES],
    )
    from etl_data_pipeline_spark.functions.caching import tracked_persist

    total_cnt = sum(F.col(f"cnt_{c}") for c in ATTR_TOUCHES)
    # persist the per-conversion relation: three consumers (last/
    # first/linear aggregates) would each re-run the full-events sort
    # behind the windows, and the cached frame is purchases-only —
    # the opposite tradeoff from basket_affinity's re-scan choice
    # assert_true yields NULL when the predicate holds; coalescing it
    # under the consumed value column forces per-conversion evaluation
    # without changing any value (and column pruning can't drop it)
    ties_guard = F.assert_true(
        F.coalesce(F.col("ties_in_frame"), F.lit(0)) == 0,
        F.lit(
            "events_attribution precondition violated: duplicate "
            "(user_id, ts) touch pair at microsecond precision inside "
            "a conversion's lookback frame — RANGE-frame first/last "
            "attribution would be nondeterministic"
        ),
    )
    conv = tracked_persist(scored.filter(F.col("event_type") == "purchase").select(
        F.coalesce(ties_guard.cast("double"), F.col("value")).alias("value"),
        F.col("last_channel_w").alias("last_channel"),
        "first_channel",
        total_cnt.alias("cnt_total"),
        *[F.col(f"cnt_{c}") for c in ATTR_TOUCHES],
    ))
    lastagg = (
        conv.filter(F.col("last_channel").isNotNull())
        .groupBy(F.col("last_channel").alias("channel"))
        .agg(
            F.count("*").alias("conv_last"),
            hround(F.sum("value"), 2).alias("value_last"),
        )
    )
    firstagg = (
        conv.filter(F.col("first_channel").isNotNull())
        .groupBy(F.col("first_channel").alias("channel"))
        .agg(F.count("*").alias("conv_first"))
    )
    credits = conv.filter(F.col("cnt_total") > 0).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("channel"),
                        (F.col("value") * F.col(f"cnt_{c}") / F.col("cnt_total")).alias(
                            "credit"
                        ),
                    )
                    for c in ATTR_TOUCHES
                ]
            )
        ).alias("x")
    )
    linear = (
        credits.select("x.channel", "x.credit")
        .groupBy("channel")
        .agg(hround(F.sum("credit"), 2).alias("value_linear"))
    )
    # FULL outer + zero-fill: a channel can appear in one model but
    # not another (e.g. always a mid-path touch, never the last) — an
    # inner join would silently drop its row from the budget report
    return (
        lastagg.join(firstagg, "channel", "full_outer")
        .join(linear, "channel", "full_outer")
        .select(
            "channel",
            F.coalesce("conv_last", F.lit(0)).alias("conv_last"),
            F.coalesce("value_last", F.lit(0.0)).alias("value_last"),
            F.coalesce("conv_first", F.lit(0)).alias("conv_first"),
            F.coalesce("value_linear", F.lit(0.0)).alias("value_linear"),
        )
    )


def basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over orders: for every pair of
    part types co-purchased in one order, the support, both
    directional confidences, and the lift — the retail-analytics
    co-occurrence primitive (Apriori's k=2 stage; higher k = the same
    pair-expansion repeated on surviving itemsets).

    Scale design — NO corpus self-join: baskets collapse to one
    sorted distinct-item array per order (items-per-basket is
    bounded; the array is the basket), and the pair relation explodes
    from each array with an index-aware transform — per-basket cost
    k(k-1)/2 with k ≤ the catalog's type count, combined map-side
    into at most |types|² groups. Item counts and the basket total
    are two more tiny aggregates broadcast back; no join ever carries
    basket-level rows on both sides.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    # deliberately NOT persisted: the three consumers (basket total,
    # item counts, pair expansion) re-run this pipelined
    # scan+broadcast-join+distinct, which a measured A/B showed beats
    # caching the distinct relation (write+read of a lineitem-sized
    # cache costs more than two extra columnar scans — 1.6 s vs 2.2 s
    # at sf0.1)
    items = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_type")
        .distinct()
    )
    tot = items.agg(F.count_distinct("l_orderkey").alias("n_baskets"))
    item_cnt = items.groupBy("p_type").agg(F.count("*").alias("c"))
    arr = F.array_sort(F.collect_set("p_type"))
    pairs = (
        items.groupBy("l_orderkey")
        .agg(arr.alias("basket"))
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        "basket",
                        lambda x, i: F.transform(
                            F.slice(
                                "basket", i + 2, F.size("basket")
                            ),
                            lambda y: F.struct(
                                x.alias("item_a"), y.alias("item_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_pair"))
    )
    ca = item_cnt.select(F.col("p_type").alias("item_a"), F.col("c").alias("n_a"))
    cb = item_cnt.select(F.col("p_type").alias("item_b"), F.col("c").alias("n_b"))
    return (
        pairs.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "item_a",
            "item_b",
            "n_pair",
            "n_a",
            "n_b",
            "n_baskets",
            hround(F.col("n_pair") / F.col("n_baskets"), 6).alias("support"),
            hround(F.col("n_pair") / F.col("n_a"), 6).alias("conf_a_b"),
            hround(F.col("n_pair") / F.col("n_b"), 6).alias("conf_b_a"),
            hround(
                F.col("n_pair") * F.col("n_baskets") / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


HOLT_ALPHA = 0.5   # level smoothing — exact dyadic doubles: the fold
HOLT_BETA = 0.25   # trend smoothing — is pure double arithmetic (no
#                    mid-fold quantization), so bit-parity needs only
#                    identical literals + identical op order


def timeseries_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Holt double-exponential smoothing (level + linear
    trend) with one-step-ahead forecast — the trend-aware upgrade of
    timeseries_ewma, and like it an order-dependent RECURRENCE no
    window frame expresses:

        l_t = α·x_t + (1-α)·(l_{t-1} + b_{t-1})
        b_t = β·(l_t - l_{t-1}) + (1-β)·b_{t-1}

    seeded l_2 = x_2, b_2 = x_2 − x_1 (Hyndman & Athanasopoulos §8.2
    init). Run as a JVM-side left fold: ordered collect per user,
    F.aggregate with a (level, trend) STRUCT accumulator over the
    tail. The fold is the SAME IEEE double sequence DuckDB's
    recursive CTE replays (l_t appears twice in b_t's expression on
    BOTH engines), so the comparison is bit-exact; the 8 dp rounding
    is belt-and-braces — the timeseries_ewma contract, extended to a
    2-component state.

    Scale posture: identical to timeseries_ewma — ONE groupBy(user)
    shuffle, per-user state bounded by per-entity history; for
    unbounded histories the streaming twin
    ``streaming.jobs.running_user_holt`` keeps O(1) (level, trend, n)
    state per user, and its parity test proves the replay is
    BIT-IDENTICAL to this fold (including a micro-batch boundary
    between the two seed observations).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    xs = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s.value,
    )
    series = ev.groupBy("user_id").agg(xs.alias("xs")).filter(F.size("xs") >= 2)
    x1, x2 = F.element_at("xs", 1), F.element_at("xs", 2)
    init = F.struct(x2.alias("level"), (x2 - x1).alias("trend"))

    def step(acc, x):
        new_level = (
            F.lit(HOLT_ALPHA) * x
            + F.lit(1 - HOLT_ALPHA) * (acc.level + acc.trend)
        )
        new_trend = (
            F.lit(HOLT_BETA) * (new_level - acc.level)
            + F.lit(1 - HOLT_BETA) * acc.trend
        )
        return F.struct(new_level.alias("level"), new_trend.alias("trend"))

    fold = F.aggregate(F.slice("xs", F.lit(3), F.size("xs") - 2), init, step)
    return series.select(
        "user_id",
        F.size("xs").cast("long").alias("n_events"),
        hround(fold.level, 8).alias("level"),
        hround(fold.trend, 8).alias("trend"),
        hround(fold.level + fold.trend, 8).alias("forecast_next"),
    )


AUTOCORR_MIN_PAIRS = 10  # below this a lag-1 estimate is noise


def timeseries_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag-1 autocorrelation of event values in (ts, event_id)
    order — the serial-dependence diagnostic that decides whether a
    metric series can be modeled i.i.d. (A/B testing, anomaly
    thresholds) or needs an AR term. Pearson correlation of (x_t,
    x_{t-1}) computed from the five raw sums, NOT corr(): the sum-form
    is the identical IEEE expression in both engines, while built-in
    corr kernels differ in centering strategy across engines.

    Scale posture: one window (partitioned by the high-cardinality
    user_id — no global sort) to pair each value with its predecessor,
    then one map-side-combinable groupBy of scalar sums. Per-user
    state never materializes the series; the shuffle carries six
    doubles per user. Degenerate series (constant values → zero
    variance) and short series (< AUTOCORR_MIN_PAIRS pairs) are
    filtered, mirroring the oracle's guards.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", F.col("value").alias("x"), F.lag("value").over(w).alias("xl"))
        .filter(F.col("xl").isNotNull())
    )
    s = pairs.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("xl").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("xl") * F.col("xl")).alias("syy"),
        F.sum(F.col("x") * F.col("xl")).alias("sxy"),
    )
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov_xy = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    # the zero-variance guard tests the 6 dp-QUANTIZED variance: a
    # constant-valued series gives a raw variance of ±1e-13 float-sum
    # noise whose SIGN is engine-dependent — an unrounded `> 0` would
    # make row membership itself disagree with the oracle
    return (
        s.filter(
            (F.col("n") >= AUTOCORR_MIN_PAIRS)
            & (hround(var_x, 6) > 0)
            & (hround(var_y, 6) > 0)
        )
        .select(
            "user_id",
            F.col("n").alias("n_pairs"),
            hround(cov_xy / F.sqrt(var_x * var_y), 6).alias("autocorr_lag1"),
        )
    )


RFM_QUANTILES = 4  # quartile scoring: the classic 1..4 RFM grid


def events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary) — the
    marketing-analytics staple: per-user days-since-last-event,
    event count and value sum, each scored into quartiles by ntile,
    concatenated into the classic 3-digit segment label.

    Determinism contract: every quartile ORDER BY carries a user_id
    tiebreak so the assignment is a total order (ntile's bucket split
    is value-order-dependent; without the tiebreak two engines could
    legally disagree on equal keys). Recency diffs on DATE precision
    (datediff), matching the oracle's ::DATE cast.

    Scale posture: one groupBy(user_id) shuffle reduces events to one
    scalar row per user; each quartile score is then a *distributed*
    range-partitioned sort of (user_id, key) pairs + per-partition
    cumulative offsets (the export_shuffle recipe, pure-JVM since r12
    — functions/ranking.py::with_global_position) mapped through
    ntile's positional
    bucket formula — NOT a global ntile() window, which Spark would
    execute by collapsing the whole per-user relation into a single
    partition. The bucket formula reproduces ntile(k) exactly
    (first N%k buckets get ceil(N/k) rows), so the ntile-based
    oracle is unchanged. The global max(ts) is a 1-row broadcast.
    """
    ev = load_table(spark, sf_dir, "events")
    gmax = ev.agg(F.max("ts").alias("gmax"))
    base = (
        ev.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count("*").alias("frequency"),
            hround(F.sum("value"), 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            "user_id",
            F.datediff(F.to_date("gmax"), F.to_date("last_ts")).alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    from etl_data_pipeline_spark.functions.caching import tracked_persist
    from etl_data_pipeline_spark.functions.ranking import (
        ntile_from_position,
        with_global_position,
    )

    # persisted: feeds the count, the three quartile sorts and the
    # final join — tracked so release_tracked() reclaims the handle
    base = tracked_persist(base)
    n_total = base.count()

    def _quartile(col_name: str, ascending: bool, alias: str) -> DataFrame:
        key = F.asc(col_name) if ascending else F.desc(col_name)
        pos_df = with_global_position(
            base.select("user_id", col_name), [key, F.asc("user_id")]
        )
        bucket = ntile_from_position(F.col("pos"), n_total, RFM_QUANTILES)
        return pos_df.select("user_id", bucket.alias(alias))

    scored = (
        base.join(_quartile("recency_days", True, "r_q"), "user_id")
        .join(_quartile("frequency", False, "f_q"), "user_id")
        .join(_quartile("monetary", False, "m_q"), "user_id")
        .select(
            "user_id", "recency_days", "frequency", "monetary",
            "r_q", "f_q", "m_q",
        )
    )
    return scored.withColumn(
        "rfm_segment",
        F.concat(
            F.col("r_q").cast("string"),
            F.col("f_q").cast("string"),
            F.col("m_q").cast("string"),
        ),
    )


QUERIES = {
    "events_peak_concurrency": events_peak_concurrency,
    "events_ab_test": events_ab_test,
    "profile_drift_psi": profile_drift_psi,
    "events_attribution": events_attribution,
    "basket_affinity": basket_affinity,
    "timeseries_holt": timeseries_holt,
    "timeseries_autocorr": timeseries_autocorr,
    "events_rfm": events_rfm,
    "pareto_frontier": pareto_frontier,
    "events_pattern_match": events_pattern_match,
    "timeseries_ewma": timeseries_ewma,
    "events_user_streaks": events_user_streaks,
    "cdc_compact_latest": cdc_compact_latest,
    "events_session_funnel": events_session_funnel,
    "events_funnel": events_funnel,
    "timeseries_user_sim": timeseries_user_sim,
    "events_anomaly_zscore": events_anomaly_zscore,
    "profile_table_quality": profile_table_quality,
    "expectations_report": expectations_report,
    "expectations_fk_report": expectations_fk_report,
    "events_transition_matrix": events_transition_matrix,
    "events_retention": events_retention,
    "events_resample_ffill": events_resample_ffill,
}

_ATTR_TOUCH_SQL = "('" + "','".join(ATTR_TOUCHES) + "')"


def _psi_oracle_block(bins_cte: str, colname: str) -> str:
    """One column's PSI as a SELECT (smoothed (p−q)·ln(p/q) over the
    observed-bin union) — identical arithmetic to the Spark helper."""
    p = "((c_ref + 1.0) / (n_ref + n_bins))"
    q = "((c_cur + 1.0) / (n_cur + n_bins))"
    return f"""
        SELECT '{colname}' AS column_name, n_bins,
               {sql_round(f'sum(({p} - {q}) * ln({p} / {q}))', 6)} AS psi
        FROM (
            SELECT bin,
                   sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS c_ref,
                   sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS c_cur
            FROM ({bins_cte}) GROUP BY bin
        ) c CROSS JOIN (
            SELECT count(DISTINCT bin) AS n_bins,
                   sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
                   sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_cur
            FROM ({bins_cte})
        ) t
        GROUP BY n_bins"""


_PSI_PRICE_BINS_CTE = f"""
    SELECT (o_orderdate < TIMESTAMP '{PSI_SPLIT_DATE}') AS is_ref,
           CASE WHEN hi > lo THEN
               least(floor((o_totalprice - lo) / ((hi - lo) / {PSI_PRICE_BINS})),
                     {PSI_PRICE_BINS - 1})
           ELSE 0 END AS bin
    FROM orders CROSS JOIN (
        SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
        FROM orders WHERE o_orderdate IS NOT NULL)
    WHERE o_orderdate IS NOT NULL
"""
_PSI_PRIO_BINS_CTE = f"""
    SELECT (o_orderdate < TIMESTAMP '{PSI_SPLIT_DATE}') AS is_ref,
           o_orderpriority AS bin
    FROM orders
    WHERE o_orderdate IS NOT NULL
"""

ORACLE = {
    "events_peak_concurrency": f"""
        WITH {_SQL_SESSION_CTE}, sess AS (
            SELECT user_id, session_seq,
                   min(us) AS s_start, max(us) AS s_end
            FROM t GROUP BY user_id, session_seq
        ), clipped AS (
            SELECT d * {DAY_US} AS day_start,
                   greatest(s_start, d * {DAY_US}) AS c_start,
                   least(s_end, (d + 1) * {DAY_US} - 1) AS c_end
            FROM sess, LATERAL (
                SELECT unnest(range(s_start // {DAY_US},
                                    s_end // {DAY_US} + 1)) AS d)
        ), deltas AS (
            SELECT day_start, c_start AS t, 1 AS delta FROM clipped
            UNION ALL
            SELECT day_start, c_end AS t, -1 FROM clipped
        ), sweep AS (
            SELECT day_start,
                   sum(delta) OVER (PARTITION BY day_start
                                    ORDER BY t, delta DESC
                                    ROWS UNBOUNDED PRECEDING) AS open_now
            FROM deltas
        )
        SELECT strftime(epoch_ms(day_start // 1000), '%Y-%m-%d') AS day,
               CAST(max(open_now) AS BIGINT) AS peak_concurrency,
               CAST(count(*) / 2 AS BIGINT) AS n_session_slices
        FROM sweep GROUP BY day_start
    """,
    "events_ab_test": f"""
        WITH pu AS (
            SELECT user_id,
                   CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                      THEN 1 ELSE 0 END)
                             >= {AB_CONV_MIN_PURCHASES}
                        THEN 1 ELSE 0 END AS converted
            FROM events GROUP BY user_id
        ), a AS (
            SELECT converted,
                   ({sql_md5_long60(f"user_id::VARCHAR || '{AB_SALT}'")}
                       % 2 = 1) AS is_treatment
            FROM pu
        ), agg AS (
            SELECT CAST(sum(CASE WHEN is_treatment THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_control,
                   CAST(sum(CASE WHEN is_treatment THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_treatment,
                   CAST(sum(CASE WHEN is_treatment THEN 0 ELSE converted END)
                        AS BIGINT) AS conv_control,
                   CAST(sum(CASE WHEN is_treatment THEN converted ELSE 0 END)
                        AS BIGINT) AS conv_treatment
            FROM a
        )
        SELECT n_control, n_treatment, conv_control, conv_treatment,
               {sql_round('conv_control / n_control::DOUBLE', 6)}
                   AS rate_control,
               {sql_round('conv_treatment / n_treatment::DOUBLE', 6)}
                   AS rate_treatment,
               CASE WHEN denom2 > 0
                    THEN {sql_round('(conv_treatment / n_treatment::DOUBLE'
                                    ' - conv_control / n_control::DOUBLE)'
                                    ' / sqrt(denom2)', 6)}
               END AS z_score,
               CASE WHEN denom2 > 0
                     AND abs((conv_treatment / n_treatment::DOUBLE
                              - conv_control / n_control::DOUBLE)
                             / sqrt(denom2)) >= {AB_Z_CRITICAL}
                    THEN 1 ELSE 0 END AS significant
        FROM (
            SELECT *,
                   ((conv_control + conv_treatment)
                        / (n_control + n_treatment)::DOUBLE)
                   * (1 - (conv_control + conv_treatment)
                        / (n_control + n_treatment)::DOUBLE)
                   * (1.0 / n_control + 1.0 / n_treatment) AS denom2
            FROM agg
        )
    """,
    "profile_drift_psi": f"""
        SELECT column_name, n_bins, psi,
               CASE WHEN psi >= {PSI_DRIFT_MIN} THEN 1 ELSE 0 END AS drifted
        FROM (
            {_psi_oracle_block(_PSI_PRICE_BINS_CTE, 'o_totalprice')}
            UNION ALL
            {_psi_oracle_block(_PSI_PRIO_BINS_CTE, 'o_orderpriority')}
        )
    """,
    # deliberately the OTHER formulation: a lateral conversion×touch
    # join (pair volume bounded only by the fixture size) — agreeing
    # with the window-function implementation from two independent
    # shapes is the point
    "events_attribution": f"""
        WITH e AS (
            SELECT user_id, event_id, event_type, value,
                   epoch_us(ts) AS us
            FROM events
        ), conv AS (
            SELECT user_id, event_id AS conv_id, us AS conv_us,
                   value AS conv_value
            FROM e WHERE event_type = 'purchase'
        ), tw AS (
            SELECT c.conv_id, c.conv_value, t.event_type AS channel,
                   t.us, t.event_id
            FROM conv c JOIN e t
              ON t.user_id = c.user_id
             AND t.event_type IN {_ATTR_TOUCH_SQL}
             AND t.us >= c.conv_us - {ATTR_LOOKBACK_US}
             AND t.us < c.conv_us
        ), lastt AS (
            SELECT conv_id, channel AS last_channel FROM (
                SELECT conv_id, channel,
                       row_number() OVER (PARTITION BY conv_id
                           ORDER BY us DESC, event_id DESC) AS rk
                FROM tw) WHERE rk = 1
        ), firstt AS (
            SELECT conv_id, channel AS first_channel FROM (
                SELECT conv_id, channel,
                       row_number() OVER (PARTITION BY conv_id
                           ORDER BY us ASC, event_id ASC) AS rk
                FROM tw) WHERE rk = 1
        ), lin AS (
            SELECT channel, {sql_round('sum(conv_value / cnt)', 2)}
                       AS value_linear
            FROM (SELECT conv_id, conv_value, channel,
                         count(*) OVER (PARTITION BY conv_id) AS cnt
                  FROM tw)
            GROUP BY channel
        ), lastagg AS (
            SELECT l.last_channel AS channel, count(*) AS conv_last,
                   {sql_round('sum(c.conv_value)', 2)} AS value_last
            FROM lastt l JOIN conv c USING (conv_id) GROUP BY 1
        ), firstagg AS (
            SELECT first_channel AS channel, count(*) AS conv_first
            FROM firstt GROUP BY 1
        )
        SELECT channel,
               coalesce(la.conv_last, 0) AS conv_last,
               coalesce(la.value_last, 0.0) AS value_last,
               coalesce(fa.conv_first, 0) AS conv_first,
               coalesce(li.value_linear, 0.0) AS value_linear
        FROM lastagg la
        FULL JOIN firstagg fa USING (channel)
        FULL JOIN lin li USING (channel)
    """,
    "basket_affinity": f"""
        WITH it AS (
            SELECT DISTINCT l_orderkey, p_type
            FROM lineitem JOIN part ON l_partkey = p_partkey
        ), tot AS (
            SELECT count(DISTINCT l_orderkey) AS n_baskets FROM it
        ), ic AS (
            SELECT p_type, count(*) AS c FROM it GROUP BY p_type
        ), pc AS (
            SELECT a.p_type AS item_a, b.p_type AS item_b,
                   count(*) AS n_pair
            FROM it a JOIN it b
              ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
            GROUP BY 1, 2
        )
        SELECT item_a, item_b, n_pair,
               ca.c AS n_a, cb.c AS n_b, tot.n_baskets,
               {sql_round('n_pair / tot.n_baskets', 6)} AS support,
               {sql_round('n_pair / ca.c', 6)} AS conf_a_b,
               {sql_round('n_pair / cb.c', 6)} AS conf_b_a,
               {sql_round('n_pair * tot.n_baskets / (ca.c * cb.c)', 6)}
                   AS lift
        FROM pc
        JOIN ic ca ON ca.p_type = item_a
        JOIN ic cb ON cb.p_type = item_b
        CROSS JOIN tot
    """,
    "timeseries_holt": f"""
        WITH RECURSIVE xs AS (
            SELECT user_id,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS idx,
                   value
            FROM events
        ), nn AS (
            SELECT user_id, max(idx) AS n FROM xs GROUP BY user_id
        ), rec AS (
            SELECT a.user_id, CAST(2 AS BIGINT) AS idx,
                   b.value AS level, b.value - a.value AS trend
            FROM xs a JOIN xs b
              ON a.user_id = b.user_id AND a.idx = 1 AND b.idx = 2
            UNION ALL
            SELECT r.user_id, r.idx + 1,
                   {HOLT_ALPHA} * x.value
                       + {1 - HOLT_ALPHA} * (r.level + r.trend) AS level,
                   {HOLT_BETA} * (({HOLT_ALPHA} * x.value
                       + {1 - HOLT_ALPHA} * (r.level + r.trend)) - r.level)
                       + {1 - HOLT_BETA} * r.trend AS trend
            FROM rec r
            JOIN xs x ON x.user_id = r.user_id AND x.idx = r.idx + 1
        )
        SELECT r.user_id, nn.n AS n_events,
               {sql_round('r.level', 8)} AS level,
               {sql_round('r.trend', 8)} AS trend,
               {sql_round('r.level + r.trend', 8)} AS forecast_next
        FROM rec r JOIN nn ON r.user_id = nn.user_id AND r.idx = nn.n
        WHERE nn.n >= 2
    """,
    "timeseries_autocorr": f"""
        WITH seq AS (
            SELECT user_id, value AS x,
                   lag(value) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS xl
            FROM events
        ), pairs AS (
            SELECT user_id, x, xl FROM seq WHERE xl IS NOT NULL
        ), s AS (
            SELECT user_id, count(*) AS n, sum(x) AS sx, sum(xl) AS sy,
                   sum(x*x) AS sxx, sum(xl*xl) AS syy, sum(x*xl) AS sxy
            FROM pairs GROUP BY user_id
        )
        SELECT user_id, n AS n_pairs,
               {sql_round('(n*sxy - sx*sy)'
                          ' / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy))', 6)}
                   AS autocorr_lag1
        FROM s
        WHERE n >= {AUTOCORR_MIN_PAIRS}
          AND {sql_round('n*sxx - sx*sx', 6)} > 0
          AND {sql_round('n*syy - sy*sy', 6)} > 0
    """,
    "events_rfm": f"""
        WITH mx AS (SELECT max(ts) AS gmax FROM events),
        base AS (
            SELECT user_id,
                   date_diff('day', max(ts)::DATE,
                             (SELECT gmax FROM mx)::DATE) AS recency_days,
                   count(*) AS frequency,
                   {sql_round('sum(value)', 2)} AS monetary
            FROM events GROUP BY user_id
        ), scored AS (
            SELECT user_id,
                   CAST(recency_days AS INTEGER) AS recency_days,
                   frequency, monetary,
                   CAST(ntile({RFM_QUANTILES}) OVER (
                       ORDER BY recency_days ASC, user_id ASC) AS INTEGER)
                       AS r_q,
                   CAST(ntile({RFM_QUANTILES}) OVER (
                       ORDER BY frequency DESC, user_id ASC) AS INTEGER)
                       AS f_q,
                   CAST(ntile({RFM_QUANTILES}) OVER (
                       ORDER BY monetary DESC, user_id ASC) AS INTEGER)
                       AS m_q
            FROM base
        )
        SELECT user_id, recency_days, frequency, monetary, r_q, f_q, m_q,
               r_q::VARCHAR || f_q::VARCHAR || m_q::VARCHAR AS rfm_segment
        FROM scored
    """,
    "events_pattern_match": f"""
        WITH s AS (
            SELECT user_id,
                   string_agg(substr(event_type, 1, 1), ''
                              ORDER BY ts, event_id) AS seq
            FROM events GROUP BY user_id
        )
        SELECT user_id,
               CAST(length(seq) AS INTEGER) AS n_events,
               CAST(len(regexp_extract_all(seq, '{PATTERN_STRICT}'))
                    AS INTEGER) AS n_strict_paths,
               CAST(len(regexp_extract_all(seq, '{PATTERN_FUNNEL}'))
                    AS INTEGER) AS n_funnel_paths
        FROM s
    """,
    "pareto_frontier": """
        WITH pts AS (
            SELECT p_retailprice AS price, min(p_size) AS size
            FROM part GROUP BY p_retailprice
        )
        SELECT price, size FROM pts p
        WHERE NOT EXISTS (
            SELECT 1 FROM pts q
            WHERE q.price < p.price AND q.size <= p.size
        )
        ORDER BY price
    """,
    "timeseries_ewma": f"""
        WITH s AS (
            SELECT user_id, count(*) AS n_events,
                   list_reduce(list(value ORDER BY ts, event_id),
                               (acc, x) -> {1.0 - EWMA_ALPHA} * acc
                                           + {EWMA_ALPHA} * x) AS raw
            FROM events GROUP BY user_id
        )
        SELECT user_id, n_events, {sql_round('raw', 8)} AS ewma FROM s
    """,
    "events_user_streaks": """
        WITH d AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ), i AS (
            SELECT user_id, day,
                   day - CAST(row_number() OVER (
                       PARTITION BY user_id ORDER BY day) AS INTEGER)
                       AS anchor
            FROM d
        ), s AS (
            SELECT user_id, anchor, count(*) AS len, max(day) AS streak_end
            FROM i GROUP BY user_id, anchor
        )
        SELECT user_id, count(*) AS n_streaks,
               CAST(sum(len) AS BIGINT) AS n_active_days,
               max(len) AS longest_streak,
               strftime(max(streak_end), '%Y-%m-%d') AS last_active_day
        FROM s GROUP BY user_id
    """,
    "expectations_report": """
        WITH marked AS (
            SELECT
                (l_returnflag IS NULL) AS v_flag,
                NOT (l_quantity IS NULL OR l_quantity BETWEEN 1 AND 40)
                    AS v_qty,
                NOT (l_linestatus IS NULL OR l_linestatus IN ('O', 'F'))
                    AS v_status,
                NOT (l_returnflag IS NULL
                     OR regexp_matches(l_returnflag, '^[ANR]$')) AS v_match,
                (l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
                 AND count(*) OVER (PARTITION BY l_orderkey, l_linenumber) > 1)
                    AS v_uni
            FROM lineitem
        )
        SELECT count(*)::BIGINT AS total_rows,
               sum((v_flag OR v_qty OR v_status OR v_match OR v_uni)::INT)::BIGINT
                   AS violating_rows,
               sum(v_flag::INT)::BIGINT AS flag_not_null,
               sum(v_qty::INT)::BIGINT AS qty_in_range,
               sum(v_status::INT)::BIGINT AS status_in_set,
               sum(v_match::INT)::BIGINT AS flag_matches,
               sum(v_uni::INT)::BIGINT AS line_unique
        FROM marked
    """,
    "expectations_fk_report": """
        WITH marked AS (
            SELECT
                (c_nationkey IS NOT NULL AND c_nationkey NOT IN (
                    SELECT n_nationkey FROM nation WHERE n_nationkey < 20
                )) AS v_fk,
                (c_acctbal IS NOT NULL AND c_acctbal < 0) AS v_bal,
                (c_mktsegment IS NULL) AS v_seg
            FROM customer
        )
        SELECT count(*)::BIGINT AS total_rows,
               sum((v_fk OR v_bal OR v_seg)::INT)::BIGINT AS violating_rows,
               sum(v_fk::INT)::BIGINT AS fk_nation,
               sum(v_bal::INT)::BIGINT AS acctbal_nonneg,
               sum(v_seg::INT)::BIGINT AS mktsegment_not_null
        FROM marked
    """,
    "events_session_funnel": """
        WITH {cte},
        v AS (
            SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
                      OVER (PARTITION BY user_id, session_seq) AS t_view
            FROM t
        ), c AS (
            SELECT *, min(CASE WHEN event_type = 'click' AND us > t_view
                               THEN us END)
                      OVER (PARTITION BY user_id, session_seq) AS t_click
            FROM v
        ), p AS (
            SELECT *, min(CASE WHEN event_type = 'purchase' AND us > t_click
                               THEN us END)
                      OVER (PARTITION BY user_id, session_seq) AS t_purchase
            FROM c
        ), g AS (
            SELECT user_id, session_seq,
                   count(*) AS n_events,
                   max(t_view) AS t_view,
                   max(t_click) AS t_click,
                   max(t_purchase) AS t_purchase
            FROM p GROUP BY user_id, session_seq
        )
        SELECT CASE WHEN t_purchase IS NOT NULL THEN 3
                    WHEN t_click IS NOT NULL THEN 2
                    WHEN t_view IS NOT NULL THEN 1
                    ELSE 0 END AS funnel_depth,
               count(*) AS n_sessions,
               {avg4} AS avg_session_events
        FROM g
        GROUP BY 1
    """.format(cte=_SQL_SESSION_CTE, avg4=sql_round("avg(n_events)", 4)),
    "cdc_compact_latest": """
        WITH ranked AS (
            SELECT user_id, event_id, ts, event_type, value,
                   row_number() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        SELECT user_id,
               event_id AS last_event_id,
               ts AS last_ts,
               event_type AS last_type,
               value AS last_value
        FROM ranked
        WHERE rn = 1 AND event_type <> 'error'
    """,
    "events_funnel": f"""
        WITH s1 AS (
            SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY user_id
        ), s2 AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = '{FUNNEL_STAGES[1]}' AND e.ts > s1.t1
            GROUP BY e.user_id
        ), s3 AS (
            SELECT e.user_id, min(e.ts) AS t3
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = '{FUNNEL_STAGES[2]}' AND e.ts > s2.t2
            GROUP BY e.user_id
        )
        SELECT 1 AS stage, '{FUNNEL_STAGES[0]}' AS event_type,
               count(*) AS n_users FROM s1
        UNION ALL
        SELECT 2, '{FUNNEL_STAGES[1]}', count(*) FROM s2
        UNION ALL
        SELECT 3, '{FUNNEL_STAGES[2]}', count(*) FROM s3
    """,
    "timeseries_user_sim": f"""
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS h, sum(value) AS v
            FROM events GROUP BY user_id, date_trunc('hour', ts)
        ), norms AS (
            SELECT user_id, sqrt(sum(v * v)) AS norm FROM hourly GROUP BY user_id
        ), dots AS (
            SELECT q.user_id AS q_user, c.user_id, sum(c.v * q.v) AS dot
            FROM hourly c
            JOIN hourly q ON c.h = q.h
            WHERE q.user_id % {TS_SIM_QUERY_MOD} = 0 AND c.user_id <> q.user_id
            GROUP BY q.user_id, c.user_id
        ), scored AS (
            SELECT d.q_user, d.user_id,
                   floor((d.dot / (qn.norm * cn.norm)) * 1000000 + 0.5)
                       / 1000000 AS cosine
            FROM dots d
            JOIN norms qn ON qn.user_id = d.q_user
            JOIN norms cn ON cn.user_id = d.user_id
        )
        SELECT q_user, rank, user_id, cosine FROM (
            SELECT *, row_number() OVER (PARTITION BY q_user
                ORDER BY cosine DESC, user_id ASC) AS rank
            FROM scored)
        WHERE rank <= {TS_SIM_TOP_K}
    """,
    "events_anomaly_zscore": f"""
        WITH stats AS (
            SELECT event_type,
                   floor((avg(value)) * 1000000 + 0.5) / 1000000 AS mean_v,
                   floor((stddev_samp(value)) * 1000000 + 0.5) / 1000000 AS std_v
            FROM events GROUP BY event_type
        )
        SELECT event_id, e.event_type, value,
               floor(((value - mean_v) / std_v) * 10000 + 0.5) / 10000 AS zscore
        FROM events e JOIN stats ON e.event_type = stats.event_type
        WHERE abs(floor(((value - mean_v) / std_v) * 10000 + 0.5) / 10000)
              >= {ZSCORE_FLAG}
    """,
    "profile_table_quality": "\nUNION ALL\n".join(
        f"""
        SELECT '{c}' AS column, count(*) AS n_rows,
               count(CASE WHEN {c} IS NULL THEN 1 END) AS n_nulls,
               count(DISTINCT {c}) AS n_distinct,
               min({c}::VARCHAR) AS min_str,
               max({c}::VARCHAR) AS max_str
        FROM orders
        """
        for c in PROFILE_COLS
    ),
    "events_transition_matrix": """
        WITH pairs AS (
            SELECT src, dst, count(*) AS n FROM (
                SELECT event_type AS src,
                       lead(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS dst
                FROM events)
            WHERE dst IS NOT NULL
            GROUP BY src, dst
        ), totals AS (SELECT src, sum(n) AS total FROM pairs GROUP BY src)
        SELECT p.src, p.dst, p.n,
               floor((CAST(p.n AS DOUBLE) / t.total) * 1000000 + 0.5)
                   / 1000000 AS prob
        FROM pairs p JOIN totals t ON p.src = t.src
    """,
    "events_resample_ffill": """
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS h,
                   floor((sum(value)) * 100 + 0.5) / 100 AS v
            FROM events GROUP BY user_id, date_trunc('hour', ts)
        ), span AS (
            SELECT user_id, min(h) AS h0, max(h) AS h1
            FROM hourly GROUP BY user_id
        ), grid AS (
            SELECT user_id,
                   unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
            FROM span
        )
        SELECT g.user_id,
               strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour,
               last_value(hourly.v IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS value_filled,
               hourly.v IS NULL AS is_gap
        FROM grid g
        LEFT JOIN hourly ON g.user_id = hourly.user_id AND g.h = hourly.h
    """,
    "events_retention": """
        WITH ev AS (SELECT DISTINCT user_id, ts::DATE AS d FROM events),
        first AS (SELECT user_id, min(d) AS cohort_date FROM ev GROUP BY user_id)
        SELECT strftime(first.cohort_date, '%Y-%m-%d') AS cohort_date,
               date_diff('day', first.cohort_date, ev.d) AS day_offset,
               count(*) AS n_users
        FROM ev JOIN first ON ev.user_id = first.user_id
        GROUP BY first.cohort_date, date_diff('day', first.cohort_date, ev.d)
    """,
}
