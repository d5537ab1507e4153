"""UDF / pandas-UDF / grouped-map surface (SURVEY.md §2.B "UDF/UDAF").

Demonstrates the three Python-extension tiers and their cost model:

- ``udf_scalar``: row-at-a-time Python UDF — the SLOW path (pickle
  per row, no codegen). Exists for API completeness; everything it
  does here is also expressible as built-ins (see the oracle).
- ``udf_pandas``: vectorized pandas UDF — Arrow batch transfer,
  ~10-100x faster than row-at-a-time; the right tool when NumPy/pandas
  logic is genuinely needed.
- ``udaf_grouped`` / ``udaf_segment_trend``: the two grouped-map
  regimes, same computation (per-group OLS fit + its residuals — a
  fit-then-apply shape one built-in aggregation pass cannot express),
  opposite cardinalities:

  * MANY TINY groups (per-customer) → ``groupBy().applyInPandas`` is
    the WRONG tool: one Python call + one Arrow round-trip per group
    (~1 ms each; measured 17.9 s for 15k customer groups at sf0.1).
    ``udaf_grouped`` instead repartitions by key and runs ONE
    ``mapInPandas`` call per partition with a vectorized pandas
    groupby inside — identical semantics, per-group overhead
    amortized across the whole partition (measured ~20x faster).
  * FEW BIG groups (per-market-segment) → ``applyInPandas`` is
    exactly right: a handful of Python calls, each over a large Arrow
    batch that NumPy chews vectorized. ``udaf_segment_trend`` is that
    regime.

At 100 TB: keep UDFs off the hot path entirely where possible; when
unavoidable, pandas UDFs only, with enough partitions that each Arrow
batch fits executor-python memory. For grouped-map, pick the shape by
group cardinality as above — the per-group dispatch overhead, not the
math, is what dominates a million-group job.
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


_TREND_SCHEMA = (
    "grp long, n_orders long, slope double, intercept double, max_abs_resid double"
)


def _r4(v):
    return np.floor(v * 1e4 + 0.5) / 1e4  # round-half-up, same formula both engines


def _trend_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized OLS fit + max |residual| for EVERY group in ``pdf``
    at once (columns grp/xd/y): centered slope/intercept via groupby
    moments, residuals via a fit-merge back onto the rows — zero
    Python-level per-group loops. Groups with <3 rows or a single
    distinct x are dropped (fit undefined)."""
    g = pdf.groupby("grp", sort=False)
    st = g.agg(
        n_orders=("xd", "size"),
        xm=("xd", "mean"),
        ym=("y", "mean"),
        ndx=("xd", "nunique"),
    )
    xc = pdf["xd"].to_numpy(np.float64) - g["xd"].transform("mean").to_numpy()
    yc = pdf["y"].to_numpy(np.float64) - g["y"].transform("mean").to_numpy()
    mom = (
        pd.DataFrame({"grp": pdf["grp"], "xx": xc * xc, "xy": xc * yc})
        .groupby("grp", sort=False)
        .sum()
    )
    st = st.join(mom)
    st = st[(st["n_orders"] >= 3) & (st["ndx"] >= 2)]
    # Round the fit FIRST, then compute residuals from the rounded
    # parameters: the oracle (DuckDB regr_*) agrees with the two-pass
    # moments only to ~1e-14, and an unrounded |y - (i + s*x)| would
    # amplify that by xd (~1e4) right up against the 4dp rounding
    # granularity. From identical rounded params both engines do
    # identical float arithmetic, so the residual column is exact.
    slope = _r4((st["xy"] / st["xx"]).to_numpy())
    intercept = _r4(st["ym"].to_numpy() - (st["xy"] / st["xx"]).to_numpy() * st["xm"].to_numpy())
    fit = pd.DataFrame(
        {"grp": st.index.to_numpy(), "slope": slope, "intercept": intercept}
    )
    rows = pdf.merge(fit, on="grp", how="inner")
    resid = np.abs(
        rows["y"].to_numpy()
        - (rows["intercept"].to_numpy() + rows["slope"].to_numpy() * rows["xd"].to_numpy())
    )
    mr = (
        pd.DataFrame({"grp": rows["grp"], "r": resid})
        .groupby("grp", sort=False)["r"]
        .max()
        .reindex(st.index)
    )
    return pd.DataFrame(
        {
            "grp": st.index.to_numpy(),
            "n_orders": st["n_orders"].to_numpy(np.int64),
            "slope": slope,
            "intercept": intercept,
            "max_abs_resid": _r4(mr.to_numpy()),
        }
    )


def _order_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("xd"),
        F.col("o_totalprice").alias("y"),
    )


def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer OLS spending trend (slope/intercept of totalprice
    over order date) AND the max absolute residual of that fit — the
    fit-then-apply shape built-in aggregates can't do in one pass (a
    pure SQL engine needs an agg + a rejoin; see the oracle).

    MANY-TINY-GROUPS regime (one group per customer): implemented as
    repartition-by-key + ONE ``mapInPandas`` call per partition with a
    vectorized pandas groupby inside, NOT ``applyInPandas`` — the
    per-group Python dispatch + Arrow round-trip of grouped-map
    (~1 ms/group) made this query the registry's slowest entry
    (17.9 s for 15k groups at sf0.1); amortizing it per-partition is
    ~20x faster with identical semantics. The repartition guarantees a
    group never SPANS partitions; within a partition it may span Arrow
    batches, hence the concat. Partition count is the memory knob at
    scale (each partition must fit pandas memory).
    """

    def per_partition(pdf_iter):
        batches = [p for p in pdf_iter if len(p)]
        if not batches:
            return
        pdf = pd.concat(batches, ignore_index=True) if len(batches) > 1 else batches[0]
        yield _trend_frame(pdf)

    pts = _order_points(spark, sf_dir).withColumnRenamed("o_custkey", "grp")
    out = pts.repartition("grp").mapInPandas(per_partition, _TREND_SCHEMA)
    return out.withColumnRenamed("grp", "o_custkey")


def udaf_segment_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment OLS trend — the SAME computation as
    udaf_grouped in the FEW-BIG-GROUPS regime (5 segments), where
    ``groupBy().applyInPandas`` is exactly the right tool: a handful
    of Python calls, each handed one large Arrow batch that the
    vectorized fit chews through. Customer→segment is a broadcast dim
    join; the grouped-map shuffle then moves each segment's rows to
    one worker."""

    def per_group(pdf):
        return _trend_frame(pdf)  # grouping column arrives inside pdf

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    pts = (
        _order_points(spark, sf_dir)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(F.col("c_mktsegment").alias("grp"), "xd", "y")
    )
    out = pts.groupBy("grp").applyInPandas(
        per_group, _TREND_SCHEMA.replace("grp long", "grp string")
    )
    return out.withColumnRenamed("grp", "c_mktsegment")


def udtf_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined TABLE function (Spark 4 ``@udtf``) — the
    fourth Python-extension tier after scalar/pandas/grouped-map: one
    input row LATERAL-expands to many output rows with per-row Python
    state (here a running character total across a document's tokens
    — trivially stateful inside one doc, which is the natural UDTF
    shape). Arrow-optimized (``useArrow=True``), so batches cross the
    boundary columnar like a pandas UDF.

    Cost model (same warning as udf_scalar): everything this one does
    is expressible as posexplode + a window (the oracle does exactly
    that) — a real deployment reaches for a UDTF only when the
    expansion logic needs Python (a tokenizer library, a parser). API
    parity exhibit, kept off every other query's path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, idx int, token string, cum_chars bigint",
          useArrow=True)
    class SplitTokens:
        def eval(self, doc_id, text):
            if text is None:
                return  # match the oracle: a NULL doc expands to no rows
            cum = 0
            for i, tok in enumerate(text.split(" ")):
                cum += len(tok)
                yield doc_id, i, tok, cum

    spark.udtf.register("split_tokens_udtf", SplitTokens)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "__udtf_docs"
    )
    return spark.sql(
        """SELECT s.doc_id, s.idx, s.token, s.cum_chars
           FROM __udtf_docs d,
                LATERAL split_tokens_udtf(d.doc_id, d.text) s"""
    )


QUERIES = {
    "udf_scalar": udf_scalar,
    "udtf_doc_tokens": udtf_doc_tokens,
    "udf_pandas": udf_pandas,
    "udaf_grouped": udaf_grouped,
    "udaf_segment_trend": udaf_segment_trend,
}

ORACLE = {
    "udtf_doc_tokens": """
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS l FROM documents
        ), pos AS (
            SELECT doc_id, CAST(g.i - 1 AS INTEGER) AS idx, l[g.i] AS token
            FROM toks, unnest(generate_series(1, len(l))) AS g(i)
        )
        SELECT doc_id, idx, token,
               CAST(sum(length(token)) OVER (
                   PARTITION BY doc_id ORDER BY idx
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_chars
        FROM pos
    """,
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
        , fit4 AS (
            SELECT o_custkey, n_orders,
                   floor(slope * 1e4 + 0.5) / 1e4 AS slope,
                   floor(intercept * 1e4 + 0.5) / 1e4 AS intercept
            FROM fit
        )
        SELECT f.o_custkey,
               f.n_orders,
               f.slope,
               f.intercept,
               floor(max(abs(p.y - (f.intercept + f.slope * p.xd))) * 1e4 + 0.5) / 1e4
                   AS max_abs_resid
        FROM fit4 f JOIN pts p USING (o_custkey)
        GROUP BY f.o_custkey, f.n_orders, f.slope, f.intercept
    """,
    "udaf_segment_trend": """
        WITH pts AS (
            SELECT c.c_mktsegment,
                   datediff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE)) AS xd,
                   o.o_totalprice AS y
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ), fit AS (
            SELECT c_mktsegment,
                   count(*) AS n_orders,
                   regr_slope(y, xd) AS slope,
                   regr_intercept(y, xd) AS intercept
            FROM pts
            GROUP BY c_mktsegment
            HAVING count(*) >= 3 AND var_pop(xd) > 0
        )
        , fit4 AS (
            SELECT c_mktsegment, n_orders,
                   floor(slope * 1e4 + 0.5) / 1e4 AS slope,
                   floor(intercept * 1e4 + 0.5) / 1e4 AS intercept
            FROM fit
        )
        SELECT f.c_mktsegment,
               f.n_orders,
               f.slope,
               f.intercept,
               floor(max(abs(p.y - (f.intercept + f.slope * p.xd))) * 1e4 + 0.5) / 1e4
                   AS max_abs_resid
        FROM fit4 f JOIN pts p USING (c_mktsegment)
        GROUP BY f.c_mktsegment, f.n_orders, f.slope, f.intercept
    """,
}
