"""UDF / pandas-UDF / grouped-map surface (SURVEY.md §2.B "UDF/UDAF").

Demonstrates the three Python-extension tiers and their cost model:

- ``udf_scalar``: row-at-a-time Python UDF — the SLOW path (pickle
  per row, no codegen). Exists for API completeness; everything it
  does here is also expressible as built-ins (see the oracle).
- ``udf_pandas``: vectorized pandas UDF — Arrow batch transfer,
  ~10-100x faster than row-at-a-time; the right tool when NumPy/pandas
  logic is genuinely needed.
- ``udaf_grouped``: groupBy().applyInPandas — grouped-map over Arrow
  batches; the building block for custom per-group algorithms
  (used again by llm/similarity.py).

At 100 TB: keep UDFs off the hot path entirely where possible; when
unavoidable, pandas UDFs only, with enough partitions that each Arrow
batch fits executor-python memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf
from pyspark.sql.types import DoubleType, StringType

from etl_data_pipeline_spark.session import load_table


def _price_band(total):
    if total is None:
        return "unknown"
    if total > 150000:
        return "high"
    if total > 50000:
        return "mid"
    return "low"


def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (slow path, API parity)."""
    price_band_py = udf(_price_band, StringType())
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", price_band_py("o_totalprice").alias("price_band")
    )


def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF over Arrow batches (fast Python path)."""

    @pandas_udf(DoubleType())
    def discounted_price(ext: pd.Series, disc: pd.Series) -> pd.Series:
        vals = ext * (1.0 - disc)
        return np.floor(vals * 100 + 0.5) / 100

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        discounted_price("l_extendedprice", "l_discount").alias("disc_price"),
    )


def _cust_order_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "o_custkey": [pdf["o_custkey"].iloc[0]],
            "order_cnt": [len(pdf)],
            "total_spent": [np.floor(pdf["o_totalprice"].sum() * 100 + 0.5) / 100],
            "max_order": [np.floor(pdf["o_totalprice"].max() * 100 + 0.5) / 100],
        }
    )


def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-customer stats.

    (Expressible as groupBy().agg() — done this way deliberately to
    exercise the grouped-map path; the oracle proves equivalence.)
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_custkey", "o_totalprice").groupBy("o_custkey").applyInPandas(
        _cust_order_stats,
        "o_custkey long, order_cnt long, total_spent double, max_order double",
    )


QUERIES = {
    "udf_scalar": udf_scalar,
    "udf_pandas": udf_pandas,
    "udaf_grouped": udaf_grouped,
}

ORACLE = {
    "udf_scalar": """
        SELECT o_orderkey,
               CASE WHEN o_totalprice IS NULL THEN 'unknown'
                    WHEN o_totalprice > 150000 THEN 'high'
                    WHEN o_totalprice > 50000 THEN 'mid'
                    ELSE 'low' END AS price_band
        FROM orders
    """,
    "udf_pandas": """
        SELECT l_orderkey, l_linenumber,
               floor((l_extendedprice * (1.0 - l_discount)) * 100 + 0.5) / 100 AS disc_price
        FROM lineitem
    """,
    "udaf_grouped": """
        SELECT o_custkey,
               count(*) AS order_cnt,
               floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS total_spent,
               floor((max(o_totalprice)) * 100 + 0.5) / 100 AS max_order
        FROM orders
        GROUP BY o_custkey
    """,
}
