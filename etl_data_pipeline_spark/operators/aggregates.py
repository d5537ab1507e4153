"""Aggregation operators (SURVEY.md §2.B "Aggregation").

The reference's only aggregations are a driver-side ``max()``
(util.py:403-426) and ``len(data)`` (app.py:147-153) — generalized
here to the full hash-agg surface. All aggs are expressed via
``groupBy/rollup/cube`` so Spark performs map-side partial
aggregation before the shuffle (the scale-critical property: the
exchange carries one row per group per task, not the raw data).

Doubles are rounded inside the query on BOTH sides (Spark + oracle) —
float sum ordering is nondeterministic across engines (SURVEY.md §7.4
risk 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_pipeline_spark.functions.rounding import hround, sql_round
from etl_data_pipeline_spark.session import load_table


def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: multi-measure hash aggregation on lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            hround(F.sum("l_quantity"), 2).alias("sum_qty"),
            hround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            hround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            hround(F.avg("l_quantity"), 4).alias("avg_qty"),
            hround(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) — Spark plans this as a two-phase expand +
    agg; at scale prefer agg_approx_distinct (HLL, one pass)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB path for
    distinct counts: one pass, fixed memory, no expand. No SQL oracle
    (approximate result); driver records rows-only."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("approx_custs")
    )


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over nation x segment (subtotals + grand total)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.count("*").alias("cust_cnt"),
            hround(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
    )


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over status x priority (all grouping-set combinations)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("order_cnt"),
        hround(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(hround(F.sum("o_totalprice"), 2).alias("total_spent"),
             F.count("*").alias("order_cnt"))
        .filter(F.col("total_spent") > 300000)
    )


def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (p50/p90/p99) of event value per
    event_type — single-pass sort-based percentile inside the agg.

    At 100 TB exact percentiles require collecting per-group values;
    prefer agg_approx_percentile (t-digest-style sketch, fixed memory)
    — both are exposed, mirroring the distinct/approx_distinct pair.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        hround(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        hround(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        hround(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        F.count("*").alias("n"),
    )


def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch): fixed-memory
    one-pass percentiles — the 100 TB path. Rows-only check
    (approximation is engine-specific)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("p50_approx"),
        F.approx_percentile("value", F.lit(0.99), F.lit(10000)).alias("p99_approx"),
    )


def agg_approx_distinct_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL error-bound check as an ORACLED query: per priority, the
    exact distinct count plus a boolean asserting the HLL++ estimate
    (rsd=0.01) landed within 5x its published relative standard
    deviation. The oracle computes the exact count and TRUE — so the
    hash matches iff the sketch actually honored its bound, turning
    the one rows-only approx family into a hard correctness check
    while keeping agg_approx_distinct itself as the raw-sketch
    exhibit. Both aggregates run over ONE pre-distinct relation (r12):
    mixing countDistinct with a sketch aggregate in a single agg plans
    an Expand (2x rows) whose HLL buffers churn per expanded group —
    measured 3.6 s vs 0.95 s at sf0.1 for identical output. HLL is
    duplicate-insensitive (register values depend only on the SET of
    inputs), so sketching the distinct (priority, custkey) pairs gives
    the bit-identical estimate while the exact count becomes a plain
    count(*) — one distinct shuffle, no Expand. (At 100 TB you would
    run only the sketch.)"""
    orders = load_table(spark, sf_dir, "orders")
    per = (
        orders.select("o_orderpriority", "o_custkey")
        .distinct()
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("exact_custs"),
            F.approx_count_distinct("o_custkey", 0.01).alias("_approx"),
        )
    )
    return per.select(
        "o_orderpriority",
        "exact_custs",
        (
            F.abs(F.col("_approx") - F.col("exact_custs"))
            / F.col("exact_custs")
            <= 0.05
        ).alias("within_bound"),
    )


def agg_hll_rollup_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE-sketch rollup (Apache DataSketches HLL via
    ``hll_sketch_agg`` / ``hll_union_agg``): per-DAY user sketches
    merged to per-WEEK distinct-user estimates WITHOUT re-touching raw
    events — the pattern ``approx_count_distinct`` cannot express
    (its intermediate is not exposed) and the one every 100 TB rollup
    pipeline actually runs: sketch once at ingest grain, re-aggregate
    forever after at sketch size, not data size.

    Oracled via the bounds-twin trick (see agg_approx_distinct_bounds):
    the output carries the exact weekly distinct count plus a boolean
    asserting the merged estimate landed within 5% (lgConfigK=14 →
    rsd ≈ 0.8%, so 5% is ~6σ); the oracle computes the exact count and
    TRUE, making sketch-merge correctness a hard hash check. The exact
    aggregate shares the scan; at 100 TB you would run only the
    sketches."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("week", "ts").alias("week"),
        F.to_date("ts").alias("day"),
        "user_id",
    )
    daily = ev.groupBy("week", "day").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    weekly = daily.groupBy("week").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est")
    )
    exact = ev.groupBy("week").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return weekly.join(exact, "week").select(
        F.date_format("week", "yyyy-MM-dd").alias("week"),
        "exact_users",
        (
            F.abs(F.col("_est") - F.col("exact_users")) / F.col("exact_users")
            <= 0.05
        ).alias("within_bound"),
    )


CMS_DEPTH = 4  # independent hash rows
CMS_WIDTH = 2048  # buckets per row -> eps = e/2048 ~ 0.13% of stream mass
CMS_TOPK = 20


def cms_cell_array(col):
    """The CMS_DEPTH (row, bucket) cells a value increments — ONE
    shared expression builder for the batch sketch, the candidate
    probes, and the streaming maintenance twin, so hash row seeds and
    widths cannot drift between them."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.pmod(F.hash(col, F.lit(j)), F.lit(CMS_WIDTH)).alias("bucket"),
            )
            for j in range(CMS_DEPTH)
        ]
    )


def sketch_cms_topk_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation over the document token
    stream, oracled via the bounds-twin trick: for the top-20 tokens,
    the exact count plus TWO booleans — the CMS estimate is (a) never
    below the true count (deterministic: counters only ever add) and
    (b) within 3·ε·N above it (Markov bound per row; with depth 4 the
    miss probability is ~(1/3e)^4 ≈ 2e-6 per token — deterministic in
    practice on a fixed dataset, verified at every shipped SF tier).

    Why CMS at 100 TB: the sketch is d×w COUNTERS (8 K rows here)
    regardless of stream size, built with ONE map-side-combined
    shuffle whose traffic caps at d·w rows per task, and it is
    MERGEABLE — shard sketches add cell-wise, so frequency service
    over a federated corpus never re-touches raw tokens. The exact
    top-k aggregate here exists only to power the oracle check; at
    scale you would keep the sketch and a heavy-hitters heap.

    Estimate lookup is a broadcast join of the 20·d candidate cells
    against the 8 K-row sketch — no token-universe enumeration.

    Reference parity: none (reference is scan-only); extends the §2.B
    sketch family (approx_distinct / hll_rollup / approx_percentile).
    """
    import math

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(F.split("text", " ")).alias("token"))
    cells = cms_cell_array(F.col("token"))
    sketch = (
        tokens.select(F.explode(cells).alias("c"))
        .groupBy("c.j", "c.bucket")
        .agg(F.count("*").alias("cell_cnt"))
    )
    # Stream mass N = the row-0 counter total (every token lands in
    # exactly one bucket per row) — no second pass over the tokens.
    n_total = sketch.filter(F.col("j") == 0).agg(
        F.sum("cell_cnt").alias("n_total")
    )
    top = (
        tokens.groupBy("token")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("token"))
        .limit(CMS_TOPK)
    )
    probes = top.select(
        "token", "exact_cnt", F.explode(cells).alias("c")
    ).select("token", "exact_cnt", "c.j", "c.bucket")
    est = (
        probes.hint("broadcast")
        .join(sketch, ["j", "bucket"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("cell_cnt").alias("_est"))
    )
    eps = math.e / CMS_WIDTH
    return (
        est.join(F.broadcast(n_total))
        .select(
            "token",
            "exact_cnt",
            (F.col("_est") >= F.col("exact_cnt")).alias("never_undercounts"),
            (
                F.col("_est")
                <= F.col("exact_cnt") + F.lit(3.0 * eps) * F.col("n_total")
            ).alias("within_3eps"),
        )
        .orderBy(F.desc("exact_cnt"), F.asc("token"))
    )


def agg_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group statistics — median, MAD (median absolute
    deviation, the robust σ), and the 10–90% trimmed mean: the outlier-
    resistant profile a data-quality layer wants where mean/stddev
    (agg_stats) are skew-fragile.

    Two-pass shape by necessity (MAD is a nested median): pass 1
    computes the per-group quantiles, which BROADCAST back onto the
    fact scan for pass 2's deviation median and trimmed mean — the
    second shuffle carries only (group, value) pairs again, never a
    per-group value collection. Exact percentiles here mirror
    agg_percentile's caveat: at 100 TB prefer the sketch variants;
    the robust-stats SHAPE (quantile → broadcast → deviation agg) is
    what carries over."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    g1 = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med"),
        F.expr("percentile(value, 0.1)").alias("p10"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.count("*").alias("n"),
    )
    joined = ev.join(F.broadcast(g1), "event_type")
    return (
        joined.groupBy("event_type")
        .agg(
            hround(F.first("med"), 6).alias("median"),
            hround(
                F.expr("percentile(abs(value - med), 0.5)"), 6
            ).alias("mad"),
            hround(
                F.avg(
                    F.when(
                        F.col("value").between(F.col("p10"), F.col("p90")),
                        F.col("value"),
                    )
                ),
                6,
            ).alias("trimmed_mean"),
            F.first("n").alias("n"),
        )
    )


OVERLAP_TYPES = ("view", "purchase")


def sketch_overlap_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from MERGEABLE sketches: |A∩B| of
    the view/purchase user sets via inclusion-exclusion over HLL
    (|A| + |B| − |A∪B|), where the union estimate comes from MERGING
    the two per-type sketches — never re-touching raw events. This is
    the sketch-algebra every 100 TB audience system runs: per-segment
    sketches are built once at ingest; any pairwise (or k-way) overlap
    is then answered at sketch size. The subtraction compounds the
    three estimates' errors, which is exactly why it must ship with a
    measured bound, not folklore.

    Bounds-twin oracle: output carries the exact intersection (one
    distinct-users semi-intersection, shares the scan; at scale you
    would keep only the sketches) plus a boolean asserting the
    sketch-derived estimate lands within 5% of it (lgConfigK=14 → rsd
    ≈ 0.8%; inclusion-exclusion at these overlap fractions stays ~6σ
    inside 5%, verified at every shipped tier). Oracle computes the
    exact value and TRUE."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    per_type = (
        ev.filter(F.col("event_type").isin(*OVERLAP_TYPES))
        .groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
    )
    ests = per_type.agg(
        F.sum(
            F.when(
                F.col("event_type") == OVERLAP_TYPES[0],
                F.hll_sketch_estimate("sk"),
            ).otherwise(0.0)
        ).alias("_a"),
        F.sum(
            F.when(
                F.col("event_type") == OVERLAP_TYPES[1],
                F.hll_sketch_estimate("sk"),
            ).otherwise(0.0)
        ).alias("_b"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_u"),
    )
    users_a = ev.filter(F.col("event_type") == OVERLAP_TYPES[0]).select(
        "user_id"
    )
    users_b = ev.filter(F.col("event_type") == OVERLAP_TYPES[1]).select(
        "user_id"
    )
    exact = (
        users_a.intersect(users_b)
        .agg(F.count("*").alias("exact_overlap"))
    )
    err = F.abs(
        (F.col("_a") + F.col("_b") - F.col("_u")) - F.col("exact_overlap")
    )
    # Zero-overlap guard: relative error is undefined at 0, so fall
    # back to an absolute bound of 5% of the combined set mass (the
    # natural scale of the compounded sketch errors).
    bound = F.when(
        F.col("exact_overlap") == 0,
        err <= 0.05 * (F.col("_a") + F.col("_b")),
    ).otherwise(err / F.col("exact_overlap") <= 0.05)
    return exact.join(F.broadcast(ests)).select(
        F.lit(OVERLAP_TYPES[0]).alias("set_a"),
        F.lit(OVERLAP_TYPES[1]).alias("set_b"),
        "exact_overlap",
        bound.alias("within_bound"),
    )


def agg_approx_percentile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna error-bound check as an ORACLED query: the GK
    sketch at accuracy=10000 guarantees rank error <= n/accuracy; we
    assert the far looser rank-window [q-0.01, q+0.01] — the approx
    p50 must lie between the exact 49th and 51st percentiles, the
    approx p99 between the exact 98th and the max. The oracle computes
    the group keys and TRUE flags, so a sketch outside its bound
    breaks the hash. Exact percentiles and the sketch share one
    shuffle."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("_a50"),
        F.approx_percentile("value", F.lit(0.99), F.lit(10000)).alias("_a99"),
        F.expr("percentile(value, 0.49)").alias("_lo50"),
        F.expr("percentile(value, 0.51)").alias("_hi50"),
        F.expr("percentile(value, 0.98)").alias("_lo99"),
        F.max("value").alias("_hi99"),
        F.count("*").alias("n"),
    )
    return per.select(
        "event_type",
        "n",
        F.col("_a50").between(F.col("_lo50"), F.col("_hi50")).alias("p50_in_window"),
        F.col("_a99").between(F.col("_lo99"), F.col("_hi99")).alias("p99_in_window"),
    )


def agg_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution time rollup: hourly AND daily
    continuous-aggregate rows in one pass via GROUPING SETS (one
    shuffle; each input row feeds both resolutions map-side).

    grouping_id() disambiguates the resolution of each output row —
    the pattern behind time-series continuous aggregates."""
    ev = load_table(spark, sf_dir, "events")
    bucketed = ev.select(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_bucket"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm:ss").alias("day_bucket"),
        "event_type",
        "value",
    )
    bucketed.createOrReplaceTempView("_ev_buckets")
    return spark.sql(
        """
        SELECT hour_bucket, day_bucket, event_type,
               count(*) AS n_events,
               floor(sum(value) * 100 + 0.5) / 100 AS sum_value,
               CASE WHEN hour_bucket IS NULL THEN 'day' ELSE 'hour' END AS resolution
        FROM _ev_buckets
        GROUP BY event_type, GROUPING SETS ((hour_bucket), (day_bucket))
        """
    )


def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders priced above their market segment's average — the
    decorrelated form of a correlated scalar subquery.

    Spark plan: the per-segment averages are a tiny aggregate (one row
    per segment) broadcast back onto the fact side — the correlated
    subquery never re-executes per row, which is exactly what
    Catalyst's decorrelation does for the SQL spelling too. The
    average is rounded (2) on both sides before comparing so the
    boundary predicate is float-order independent.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    fact = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    )
    seg_avg = fact.groupBy("c_mktsegment").agg(
        hround(F.avg("o_totalprice"), 2).alias("seg_avg")
    )
    return (
        fact.join(F.broadcast(seg_avg), "c_mktsegment")
        .filter(F.col("o_totalprice") > F.col("seg_avg"))
        .select("o_orderkey", "c_mktsegment", "o_totalprice", "seg_avg")
    )


def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per group: sample stddev/variance,
    covariance, correlation. Rounded aggressively (4/6 dp) because the
    one-pass moment algorithms differ across engines — the statistics
    agree, the last float bits don't."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        hround(F.stddev_samp("l_quantity"), 4).alias("qty_std"),
        hround(F.var_samp("l_quantity"), 4).alias("qty_var"),
        hround(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_cov"),
        hround(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
    )


def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregates: per-segment sorted distinct nation set.

    collect_set order is nondeterministic by contract — array_sort
    makes the result value-stable (and oracle-comparable). The array
    per group is bounded (≤ 25 nations), which is the rule for
    collect_* at scale: never collect an unbounded group.

    The set is emitted as a comma-joined string (concat_ws) rather than
    a raw ArrayType column: a scalar form hashes stably in any result
    comparator, while array cells are unhashable in pandas-based
    canonicalizers. The array itself is an intermediate."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.concat_ws(",", F.array_sort(F.collect_set("c_nationkey"))).alias("nation_keys"),
    )


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: per-returnflag totals, per-linestatus
    totals, and the grand total in ONE pass — the general form of
    rollup/cube when the wanted set list is irregular.

    Catalyst expands the sets into a single Expand + hash aggregate:
    one shuffle for all three groupings, vs three separate scans if a
    user unioned three GROUP BYs (the 100 TB win). Key columns are
    null for sets they don't belong to; both key columns are non-null
    in the data, so the null pattern identifies the set.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.count("*").alias("n"),
        hround(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) of order priority per order status,
    with an explicit (count desc, value asc) tiebreak.

    Built as count + row_number rather than the engines' native mode()
    because native tie-breaking is unspecified/engine-dependent — the
    explicit window makes the result deterministic and portable. Two
    shuffles on tiny cardinalities (status × priority, then status)."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("n"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_count"),
        )
    )


def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family per order status: conditional count
    (count_if), universal/existential predicates (bool_and/bool_or) —
    the assertion-style aggregates data-quality checks are written in.
    """
    orders = load_table(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > 100000
    return orders.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.count_if(big).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_huge"),
    )


HIST_BUCKET_WIDTH = 50.0


def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values (floor-bucket + count) —
    one hash aggregate, the identical IEEE expression on both engines
    so bucket boundaries match bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / HIST_BUCKET_WIDTH).cast("long")
    return (
        ev.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            hround(F.min("value"), 2).alias("min_value"),
            hround(F.max("value"), 2).alias("max_value"),
        )
    )


QUERIES = {
    "subquery_scalar": subquery_scalar,
    "agg_stats": agg_stats,
    "agg_grouping_sets": agg_grouping_sets,
    "agg_mode": agg_mode,
    "agg_boolean": agg_boolean,
    "agg_collect": agg_collect,
    "agg_histogram": agg_histogram,
    "agg_groupby": agg_groupby,
    "agg_percentile": agg_percentile,
    "agg_approx_percentile": agg_approx_percentile,
    "agg_time_rollup": agg_time_rollup,
    "agg_distinct": agg_distinct,
    "agg_approx_distinct": agg_approx_distinct,
    "agg_approx_distinct_bounds": agg_approx_distinct_bounds,
    "agg_hll_rollup_bounds": agg_hll_rollup_bounds,
    "sketch_cms_topk_bounds": sketch_cms_topk_bounds,
    "sketch_overlap_bounds": sketch_overlap_bounds,
    "agg_robust_stats": agg_robust_stats,
    "agg_approx_percentile_bounds": agg_approx_percentile_bounds,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "agg_having": agg_having,
}

ORACLE = {
    "agg_approx_distinct_bounds": """
        SELECT o_orderpriority,
               count(DISTINCT o_custkey)::BIGINT AS exact_custs,
               TRUE AS within_bound
        FROM orders GROUP BY o_orderpriority
    """,
    "agg_robust_stats": f"""
        WITH g AS (
            SELECT event_type,
                   quantile_cont(value, 0.5) AS med,
                   quantile_cont(value, 0.1) AS p10,
                   quantile_cont(value, 0.9) AS p90,
                   count(*) AS n
            FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               {sql_round("any_value(g.med)", 6)} AS median,
               {sql_round("quantile_cont(abs(e.value - g.med), 0.5)", 6)}
                   AS mad,
               {sql_round(
                   "avg(CASE WHEN e.value BETWEEN g.p10 AND g.p90 "
                   "THEN e.value END)", 6)} AS trimmed_mean,
               any_value(g.n) AS n
        FROM events e JOIN g USING (event_type)
        GROUP BY e.event_type
    """,
    "sketch_overlap_bounds": f"""
        SELECT '{OVERLAP_TYPES[0]}' AS set_a, '{OVERLAP_TYPES[1]}' AS set_b,
               (SELECT count(*) FROM (
                    SELECT DISTINCT user_id FROM events
                    WHERE event_type = '{OVERLAP_TYPES[0]}'
                    INTERSECT
                    SELECT DISTINCT user_id FROM events
                    WHERE event_type = '{OVERLAP_TYPES[1]}'
               ))::BIGINT AS exact_overlap,
               TRUE AS within_bound
    """,
    "sketch_cms_topk_bounds": f"""
        SELECT token, exact_cnt,
               TRUE AS never_undercounts,
               TRUE AS within_3eps
        FROM (
            SELECT token, count(*) AS exact_cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS token
                  FROM documents)
            GROUP BY token
            ORDER BY exact_cnt DESC, token ASC
            LIMIT {CMS_TOPK}
        )
        ORDER BY exact_cnt DESC, token ASC
    """,
    "agg_hll_rollup_bounds": """
        SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
               count(DISTINCT user_id)::BIGINT AS exact_users,
               TRUE AS within_bound
        FROM events GROUP BY date_trunc('week', ts)
    """,
    "agg_approx_percentile_bounds": """
        SELECT event_type, count(*)::BIGINT AS n,
               TRUE AS p50_in_window,
               TRUE AS p99_in_window
        FROM events GROUP BY event_type
    """,
    "agg_stats": f"""
        SELECT l_returnflag, count(*) AS n,
               {sql_round('stddev_samp(l_quantity)', 4)} AS qty_std,
               {sql_round('var_samp(l_quantity)', 4)} AS qty_var,
               {sql_round('covar_samp(l_quantity, l_extendedprice)', 2)}
                   AS qty_price_cov,
               {sql_round('corr(l_quantity, l_extendedprice)', 6)}
                   AS qty_price_corr
        FROM lineitem GROUP BY l_returnflag
    """,
    "agg_boolean": """
        SELECT o_orderstatus, count(*) AS n,
               count(CASE WHEN o_totalprice > 100000 THEN 1 END) AS n_big,
               bool_and(o_totalprice > 0) AS all_positive,
               bool_or(o_totalprice > 400000) AS any_huge
        FROM orders GROUP BY o_orderstatus
    """,
    "agg_mode": """
        SELECT o_orderstatus, mode_priority, mode_count FROM (
            SELECT o_orderstatus, o_orderpriority AS mode_priority,
                   count(*) AS mode_count,
                   row_number() OVER (PARTITION BY o_orderstatus
                       ORDER BY count(*) DESC, o_orderpriority ASC) AS r
            FROM orders GROUP BY o_orderstatus, o_orderpriority)
        WHERE r = 1
    """,
    "agg_grouping_sets": f"""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               {sql_round('sum(l_quantity)', 2)} AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    "agg_collect": """
        SELECT c_mktsegment, count(*) AS n_customers,
               array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nation_keys
        FROM customer GROUP BY c_mktsegment
    """,
    "agg_histogram": f"""
        SELECT CAST(floor(value / {HIST_BUCKET_WIDTH}) AS BIGINT) AS bucket,
               count(*) AS n,
               {sql_round('min(value)', 2)} AS min_value,
               {sql_round('max(value)', 2)} AS max_value
        FROM events
        GROUP BY CAST(floor(value / {HIST_BUCKET_WIDTH}) AS BIGINT)
    """,
    "subquery_scalar": f"""
        WITH fact AS (
            SELECT o_orderkey, c_mktsegment, o_totalprice
            FROM orders JOIN customer ON o_custkey = c_custkey
        ), seg AS (
            SELECT c_mktsegment, {sql_round('avg(o_totalprice)', 2)} AS seg_avg
            FROM fact GROUP BY c_mktsegment
        )
        SELECT o_orderkey, fact.c_mktsegment, o_totalprice, seg_avg
        FROM fact JOIN seg ON fact.c_mktsegment = seg.c_mktsegment
        WHERE o_totalprice > seg_avg
    """,
    "agg_time_rollup": """
        WITH b AS (
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
                   strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day_bucket,
                   event_type, "value"
            FROM events)
        SELECT hour_bucket, day_bucket, event_type,
               count(*) AS n_events,
               floor(sum("value") * 100 + 0.5) / 100 AS sum_value,
               CASE WHEN hour_bucket IS NULL THEN 'day' ELSE 'hour' END AS resolution
        FROM b
        GROUP BY event_type, GROUPING SETS ((hour_bucket), (day_bucket))
    """,
    "agg_percentile": """
        SELECT event_type,
               floor((quantile_cont("value", 0.5)) * 10000 + 0.5) / 10000 AS p50,
               floor((quantile_cont("value", 0.9)) * 10000 + 0.5) / 10000 AS p90,
               floor((quantile_cont("value", 0.99)) * 10000 + 0.5) / 10000 AS p99,
               count(*) AS n
        FROM events GROUP BY event_type
    """,
    "agg_groupby": """
        SELECT l_returnflag, l_linestatus,
               floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
               floor((sum(l_extendedprice)) * 100 + 0.5) / 100 AS sum_base_price,
               floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS sum_disc_price,
               floor((avg(l_quantity)) * 10000 + 0.5) / 10000 AS avg_qty,
               floor((avg(l_discount)) * 10000 + 0.5) / 10000 AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "agg_distinct": """
        SELECT count(DISTINCT o_custkey) AS n_custs,
               count(DISTINCT o_orderstatus) AS n_statuses
        FROM orders
    """,
    "agg_rollup": """
        SELECT n_name, c_mktsegment, count(*) AS cust_cnt,
               floor((sum(c_acctbal)) * 100 + 0.5) / 100 AS sum_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP (n_name, c_mktsegment)
    """,
    "agg_cube": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS order_cnt,
               floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS revenue
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "agg_having": """
        SELECT o_custkey, floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS total_spent,
               count(*) AS order_cnt
        FROM orders
        GROUP BY o_custkey
        HAVING floor((sum(o_totalprice)) * 100 + 0.5) / 100 > 300000
    """,
}
