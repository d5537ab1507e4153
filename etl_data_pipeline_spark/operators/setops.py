"""Sort / limit / top-k / set operations / exact dedup
(SURVEY.md §2.B "Sort / limit / top-k / set ops / dedup").

Scale notes:
- sort_limit compiles to TakeOrderedAndProject — per-partition top-k
  then a k-row merge on the driver, NOT a global sort;
- topk_per_group is the windowed row_number pattern: one hash exchange
  on the group key, per-partition sort, early filter;
- dedup_exact is the hash-groupBy dedup (north-star "exact dedup"),
  fixing the reference's append-replay duplication (SURVEY.md §2.C #5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_data_pipeline_spark.session import load_table


def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by price (TakeOrderedAndProject; deterministic via
    orderkey tiebreak)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (row_number window + filter)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two order subsets (unionByName — position-safe)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_totalprice") > 250000).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return a.unionByName(b)


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics, like SQL INTERSECT)."""
    customer = load_table(spark, sf_dir, "customer")
    a = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = customer.filter(F.col("c_acctbal") > 0).select("c_custkey")
    return a.intersect(b)


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers minus customers-with-urgent-orders."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    with_urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return customer.subtract(with_urgent)


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact full-row dedup via hash groupBy (dropDuplicates).

    Input is orders unioned with itself — a synthetic replay of the
    reference's duplicate-on-retry failure mode (§2.C #5) — and the
    operator restores exactly-once. At 100 TB this is one hash
    exchange on all columns; for key-subset dedup prefer
    dropDuplicates([key]) (same plan, narrower key).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderpriority",
    )
    replayed = orders.unionByName(orders)
    return replayed.dropDuplicates()


QUERIES = {
    "sort_limit": sort_limit,
    "topk_per_group": topk_per_group,
    "set_union": set_union,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "dedup_exact": dedup_exact,
}

ORACLE = {
    "sort_limit": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    "topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders) WHERE rn <= 3
    """,
    "set_union": """
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_totalprice > 250000
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_orderpriority = '1-URGENT'
    """,
    "set_intersect": """
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT c_custkey FROM customer WHERE c_acctbal > 0
    """,
    "set_except": """
        SELECT c_custkey FROM customer
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders
        WHERE o_orderpriority = '1-URGENT'
    """,
    "dedup_exact": """
        SELECT DISTINCT o_orderkey, o_custkey, o_orderstatus,
                        o_totalprice, o_orderpriority
        FROM (SELECT * FROM orders UNION ALL SELECT * FROM orders)
    """,
}
