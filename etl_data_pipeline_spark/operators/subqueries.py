"""Decision-support subquery shapes (SURVEY.md §2.B.1, round-3
additions): EXISTS / NOT EXISTS / IN-over-aggregate / correlated
scalar / nested-aggregate — the TPC-H-style patterns (Q4, Q13, Q14,
Q15, Q17, Q18) a SQL user of the reference's target warehouses would
expect, restricted to the columns the harness tables carry.

Catalyst decorrelates every one of these into joins + aggregates — the
DataFrame forms below ARE that decorrelated plan, written directly
(semi/anti joins, aggregate-then-join), and one query
(``subq_corr_scalar_avgqty``) deliberately goes through ``spark.sql``
with the correlated spelling to exercise the rewrite itself.

100 TB posture: EXISTS/NOT EXISTS are semi/anti joins that shuffle
only the join keys + predicate columns; IN-over-aggregate reduces the
big side FIRST (the HAVING prunes to a tiny key set, which AQE then
broadcasts); nested aggregates reduce to 1-row broadcasts, never a
second scan of the fact table. Quantity sums are exact (integral
doubles), so thresholds and group counts are engine-deterministic;
revenue sums are order-dependent doubles and are rounded via hround
at the output boundary only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_pipeline_spark.functions.rounding import hround, sql_round
from etl_data_pipeline_spark.session import load_table


def subq_exists_lateship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of orders where EXISTS a
    lineitem shipped more than 60 days after the order date.

    The EXISTS is a LEFT SEMI join whose condition mixes an equi key
    (orderkey — drives the shuffle) with a non-equi residual (the date
    comparison — evaluated as a post-match filter inside the join).
    Semi join emits each order at most once regardless of how many
    lineitems match, so no DISTINCT pass is needed."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_cnt"))


def subq_not_exists_quiet_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS with a correlated range predicate: per-brand count of
    parts with NO lineitem shipped in 1995H1.

    The anti join's probe side is filtered BEFORE the join (the date
    range prunes lineitem at the scan — pushed to parquet), so the
    shuffle carries only H1-1995 keys, not all history."""
    p = load_table(spark, sf_dir, "part")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-07-01").cast("timestamp"))
        )
        .select("l_partkey")
    )
    quiet = p.join(li, p.p_partkey == li.l_partkey, "left_anti")
    return quiet.groupBy("p_brand").agg(F.count("*").alias("quiet_parts"))


_Q17_TEMPLATE = """
    SELECT {out} AS avg_yearly
    FROM {t} l1
    WHERE l1.l_quantity < (
        SELECT 0.5 * avg(l2.l_quantity) FROM {t} l2
        WHERE l2.l_partkey = l1.l_partkey
    )
"""


def subq_corr_scalar_avgqty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape, run as LITERAL correlated-scalar-subquery SQL
    through spark.sql: revenue/7 of lineitems below half their part's
    average quantity.

    This is the one query in the family that hands Catalyst the
    CORRELATED spelling and relies on its decorrelation (rewrite to a
    per-partkey aggregate joined back on the correlation key) — the
    plan ends up identical to the hand-decorrelated DataFrame form.
    The inner threshold is exact cross-engine: quantities are integral
    doubles, so sum (exact integer arithmetic in fp64), avg (one
    division) and 0.5* (power of two) are all bit-deterministic; only
    the outer order-dependent revenue sum needs rounding.

    The temp view exists only while spark.sql analyzes the statement
    (a unique per-call name, dropped before returning): in a CLASSIC
    session spark.sql analyzes eagerly, so the returned DataFrame has
    already bound the underlying relation and stays valid, with no
    catalog state leaking across invocations or sf_dirs. (Under Spark
    Connect, analysis is deferred to action time and this
    drop-before-return would break the frame — this engine builds
    classic local sessions, session.py.)"""
    import uuid

    view = f"lineitem_sq_{uuid.uuid4().hex}"
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(view)
    try:
        return spark.sql(
            _Q17_TEMPLATE.format(
                out=sql_round("sum(l_extendedprice) / 7.0", 2), t=view
            )
        )
    finally:
        spark.catalog.dropTempView(view)


def subq_in_heavy_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers' orders whose TOTAL lineitem quantity
    exceeds 280 — IN over a grouped-HAVING subquery.

    Plan shape that survives scale: aggregate lineitem FIRST (map-side
    partial sums make the per-orderkey rollup cheap), keep only the
    heavy keys (few — 0.1% of orders), and semi-join orders against
    that tiny set (AQE turns it into a broadcast). The re-join to
    lineitem for the displayed sum reuses the already-grouped relation
    instead of scanning lineitem again."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    qty = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("long").alias("sum_qty"))
    )
    heavy = qty.filter(F.col("sum_qty") > 280)
    return (
        o.join(heavy, o.o_orderkey == heavy.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            hround("o_totalprice", 2).alias("total_price"),
            "sum_qty",
        )
    )


def subq_nested_max_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose 1996Q1 revenue equals the
    MAXIMUM per-supplier revenue — a nested aggregate (max over a
    grouped aggregate) correlated back by value equality.

    The revenue relation is computed once; its max is a 1-row
    broadcast joined back (never a rescan). The match is on the
    ROUNDED revenue (2dp) on both sides: the relation is evaluated
    twice (once under the max, once as the probe side), and Spark's
    shuffled partial sums combine in nondeterministic order — raw
    doubles can differ in the last ulp between the two evaluations,
    so exact-double equality could match zero rows. Rounding collapses
    that ulp noise before the compare (the same output-boundary
    discipline every revenue aggregate here uses)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        hround(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


def agg_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: monthly share of revenue from PROMO-type parts
    — conditional aggregation (CASE inside sum) with a dimension join.

    part is broadcast (small dim); both sums come out of ONE pass over
    the joined relation (no second scan for the denominator). The
    share is a ratio of two same-pass sums rounded at 4dp."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            # literal-first so the fp evaluation order (100*promo)/net
            # matches the oracle text exactly
            hround(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", net).otherwise(F.lit(0.0)))
                / F.sum(net),
                4,
            ).alias("promo_share_pct")
        )
    )


def subq_q22ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per-nation count and balance mass of customers
    whose balance is above the positive-balance average AND who have
    placed NO order since 2000 (lapsed high-value accounts) — a
    scalar-subquery threshold and a NOT EXISTS in the same query.

    The threshold is a 1-row broadcast (rounded 6dp so the boundary
    predicate is engine-deterministic); the NOT EXISTS is an anti-join
    whose probe side is date-pruned AT THE SCAN before any shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    ab = c.filter(F.col("c_acctbal") > 0).agg(
        hround(F.avg("c_acctbal"), 6).alias("ab")
    )
    return (
        c.join(F.broadcast(ab))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_cust"),
            hround(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


def join_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by how many orders
    they placed, INCLUDING zero — the left-outer-join-then-count-
    non-null pattern a plain groupBy on orders cannot produce (it
    never sees orderless customers).

    Two shuffles, both on small relations (per-customer counts, then
    the tiny distribution); integer-only arithmetic, exact oracle."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )
    return per_cust.groupBy("order_cnt").agg(F.count("*").alias("cust_cnt"))


QUERIES = {
    "subq_exists_lateship": subq_exists_lateship,
    "subq_not_exists_quiet_parts": subq_not_exists_quiet_parts,
    "subq_corr_scalar_avgqty": subq_corr_scalar_avgqty,
    "subq_in_heavy_orders": subq_in_heavy_orders,
    "subq_nested_max_revenue": subq_nested_max_revenue,
    "agg_promo_share": agg_promo_share,
    "subq_q22ish": subq_q22ish,
    "join_count_distribution": join_count_distribution,
}

ORACLE = {
    "subq_exists_lateship": """
        SELECT o_orderpriority, count(*) AS order_cnt
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        )
        GROUP BY o_orderpriority
    """,
    "subq_not_exists_quiet_parts": """
        SELECT p_brand, count(*) AS quiet_parts
        FROM part p
        WHERE NOT EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_partkey = p.p_partkey
              AND l.l_shipdate >= TIMESTAMP '1995-01-01'
              AND l.l_shipdate < TIMESTAMP '1995-07-01'
        )
        GROUP BY p_brand
    """,
    "subq_corr_scalar_avgqty": _Q17_TEMPLATE.format(
        out=sql_round("sum(l_extendedprice) / 7.0", 2), t="lineitem"
    ),
    "subq_in_heavy_orders": """
        WITH heavy AS (
            SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING CAST(sum(l_quantity) AS BIGINT) > 280
        )
        SELECT c.c_name, o.o_orderkey,
               {tp} AS total_price, h.sum_qty
        FROM orders o
        JOIN heavy h ON o.o_orderkey = h.l_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
    """.format(tp=sql_round("o.o_totalprice", 2)),
    "subq_nested_max_revenue": """
        WITH rev AS (
            SELECT l_suppkey,
                   {tr} AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, rev.total_rev
        FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
        WHERE rev.total_rev = (SELECT max(total_rev) FROM rev)
    """.format(tr=sql_round("sum(l_extendedprice * (1 - l_discount))", 2)),
    "agg_promo_share": """
        SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
               {share} AS promo_share_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY strftime(l_shipdate, '%Y-%m')
    """.format(
        share=sql_round(
            "100 * sum(CASE WHEN p_type = 'PROMO'"
            " THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)"
            " / sum(l_extendedprice * (1 - l_discount))",
            4,
        )
    ),
    "subq_q22ish": """
        WITH ab AS (
            SELECT {thresh} AS ab FROM customer WHERE c_acctbal > 0
        )
        SELECT c.c_nationkey, count(*) AS n_cust, {tb} AS total_bal
        FROM customer c CROSS JOIN ab
        WHERE c.c_acctbal > ab.ab
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2000-01-01'
          )
        GROUP BY c.c_nationkey
    """.format(
        thresh=sql_round("avg(c_acctbal)", 6), tb=sql_round("sum(c.c_acctbal)", 2)
    ),
    "join_count_distribution": """
        SELECT order_cnt, count(*) AS cust_cnt
        FROM (
            SELECT c.c_custkey, count(o.o_orderkey) AS order_cnt
            FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey
        )
        GROUP BY order_cnt
    """,
}
