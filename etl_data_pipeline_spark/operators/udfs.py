"""UDF / pandas-UDF / grouped-map surface (SURVEY.md §2.B "UDF/UDAF").

Demonstrates the three Python-extension tiers and their cost model:

- ``udf_scalar``: row-at-a-time Python UDF — the SLOW path (pickle
  per row, no codegen). Exists for API completeness; everything it
  does here is also expressible as built-ins (see the oracle).
- ``udf_pandas``: vectorized pandas UDF — Arrow batch transfer,
  ~10-100x faster than row-at-a-time; the right tool when NumPy/pandas
  logic is genuinely needed.
- ``udaf_grouped``: groupBy().applyInPandas — grouped-map over Arrow
  batches; the building block for custom per-group algorithms (used
  again by llm/similarity.py). Computes a per-group OLS fit plus its
  residuals — a fit-then-apply shape one built-in aggregation pass
  cannot express.

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


_TREND_COLS = ["o_custkey", "n_orders", "slope", "intercept", "max_abs_resid"]


def _cust_price_trend(key, pdf):
    (custkey,) = key
    x = pdf["xd"].to_numpy(dtype=np.float64)
    y = pdf["y"].to_numpy(dtype=np.float64)
    if len(pdf) < 3 or np.unique(x).size < 2:
        return pd.DataFrame(columns=_TREND_COLS)
    xb, yb = x.mean(), y.mean()
    xc = x - xb
    slope = float((xc * (y - yb)).sum() / (xc * xc).sum())
    intercept = yb - slope * xb
    max_resid = float(np.abs(y - (intercept + slope * x)).max())
    r4 = lambda v: np.floor(v * 1e4 + 0.5) / 1e4  # round-half-up, both engines
    return pd.DataFrame(
        {
            "o_custkey": [custkey],
            "n_orders": [len(pdf)],
            "slope": [r4(slope)],
            "intercept": [r4(intercept)],
            "max_abs_resid": [r4(max_resid)],
        }
    )


def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-customer OLS spending trend
    (slope/intercept of totalprice over order date) AND the max
    absolute residual of that fit.

    This is the grouped-map surface doing work built-in aggregates
    can't do in one pass: the residual needs the group's fitted
    parameters applied back to every row of the same group —
    fit-then-apply inside one Arrow batch, no second shuffle. (A pure
    SQL engine needs an agg + a rejoin of the fit onto the rows; see
    the oracle.) Groups with <3 orders or a single distinct date are
    dropped (fit undefined).
    """
    o = load_table(spark, sf_dir, "orders")
    pts = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("xd"),
        F.col("o_totalprice").alias("y"),
    )
    return pts.groupBy("o_custkey").applyInPandas(
        _cust_price_trend,
        "o_custkey long, n_orders long, slope double, intercept double,"
        " max_abs_resid double",
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
        WITH pts AS (
            SELECT o_custkey,
                   datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS xd,
                   o_totalprice AS y
            FROM orders
        ), fit AS (
            SELECT o_custkey,
                   count(*) AS n_orders,
                   regr_slope(y, xd) AS slope,
                   regr_intercept(y, xd) AS intercept
            FROM pts
            GROUP BY o_custkey
            HAVING count(*) >= 3 AND var_pop(xd) > 0
        )
        SELECT f.o_custkey,
               f.n_orders,
               floor(f.slope * 1e4 + 0.5) / 1e4 AS slope,
               floor(f.intercept * 1e4 + 0.5) / 1e4 AS intercept,
               floor(max(abs(p.y - (f.intercept + f.slope * p.xd))) * 1e4 + 0.5) / 1e4
                   AS max_abs_resid
        FROM fit f JOIN pts p USING (o_custkey)
        GROUP BY f.o_custkey, f.n_orders, f.slope, f.intercept
    """,
}
