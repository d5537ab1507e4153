"""Scalar function surface — one composite query per family
(SURVEY.md §2.B "Scalar function surface").

All expressions are built-in ``pyspark.sql.functions`` (JVM-side,
inside whole-stage codegen) — the fast path. The UDF module
(operators/udfs.py) demonstrates the slow path for comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from etl_data_pipeline_spark.functions.rounding import hround, sql_round
from etl_data_pipeline_spark.session import load_table


def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substring/concat/trim/regexp_extract/length."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
        F.trim(F.lit("  padded  ")).alias("trimmed"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.length("c_name").alias("name_len"),
    )


def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/date_add/datediff/date_trunc on o_orderdate."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus30"),
        F.datediff(F.lit("2025-01-01").cast("date"), d).alias("days_to_2025"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
    )


def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/mod/sqrt with null-safe arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        hround(F.col("o_totalprice") * 0.1, 2).alias("tithe"),
        hround(F.abs(F.col("o_totalprice") - 100000), 2).alias("dist_100k"),
        F.ceil("o_totalprice").cast("long").alias("price_ceil"),
        F.floor("o_totalprice").cast("long").alias("price_floor"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        hround(F.sqrt("o_totalprice"), 4).alias("price_sqrt"),
    )


def scalar_case_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif semantics."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 150000, "high")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("F")), F.lit("was_F")).alias(
            "status_masked"
        ),
        F.when(F.col("o_orderkey") % 2 == 0, F.col("o_totalprice")).alias(
            "even_price_or_null"
        ),
    )


def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops over the embedding column: size / element / slice /
    higher-order transform+aggregate (JVM-side, no UDF).

    The L2-norm is F.aggregate over F.transform — the built-in way to
    fold over an array column inside codegen. Accumulate in DOUBLE in
    both engines so float order/precision matches.
    """
    e = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.col("embedding"),
        F.lit(0.0).cast(DoubleType()),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    head3 = F.slice(F.col("embedding"), 1, 3)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        hround(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        hround(F.sqrt(sq_sum), 4).alias("l2_norm"),
        hround(
            F.aggregate(
                head3, F.lit(0.0).cast(DoubleType()), lambda acc, x: acc + x.cast("double")
            ),
            6,
        ).alias("head3_sum"),
    )


def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from events.props (get_json_object)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_mod10"),
    )


def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType family: parse events.props into map<string,int>
    (from_json), then key listing, membership, element access, and
    cardinality — the nested-type access pattern scalar_json's
    path-extraction doesn't cover. All JVM-side (JsonToStructs +
    map expressions in codegen)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        F.element_at(m, "k").alias("k_val"),
        m.getItem("missing").alias("missing_val"),
        F.size(m).alias("n_keys"),
    )


QUERIES = {
    "scalar_string": scalar_string,
    "scalar_map": scalar_map,
    "scalar_date": scalar_date,
    "scalar_math": scalar_math,
    "scalar_case_null": scalar_case_null,
    "scalar_array": scalar_array,
    "scalar_json": scalar_json,
}

ORACLE = {
    "scalar_map": """
        SELECT event_id,
               array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
               CAST(json_extract_string(props, '$.missing') AS INTEGER)
                   AS missing_val,
               len(json_keys(props)) AS n_keys
        FROM events
    """,
    "scalar_string": """
        SELECT c_custkey,
               upper(c_name) AS name_upper,
               lower(c_mktsegment) AS seg_lower,
               substring(c_name, 1, 8) AS name_prefix,
               concat_ws('|', c_mktsegment, c_name) AS seg_name,
               trim('  padded  ') AS trimmed,
               regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
               length(c_name) AS name_len
        FROM customer
    """,
    "scalar_date": """
        SELECT o_orderkey,
               year(o_orderdate) AS yr,
               month(o_orderdate) AS mo,
               dayofmonth(o_orderdate) AS dom,
               strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d')
                   AS plus30,
               datediff('day', CAST(o_orderdate AS DATE), DATE '2025-01-01')
                   AS days_to_2025,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
        FROM orders
    """,
    "scalar_math": """
        SELECT o_orderkey,
               floor((o_totalprice * 0.1) * 100 + 0.5) / 100 AS tithe,
               floor((abs(o_totalprice - 100000)) * 100 + 0.5) / 100 AS dist_100k,
               CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
               CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
               o_orderkey % 7 AS key_mod7,
               floor((sqrt(o_totalprice)) * 10000 + 0.5) / 10000 AS price_sqrt
        FROM orders
    """,
    "scalar_case_null": """
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 150000 THEN 'high'
                    WHEN o_totalprice > 50000 THEN 'mid'
                    ELSE 'low' END AS price_band,
               coalesce(nullif(o_orderstatus, 'F'), 'was_F') AS status_masked,
               CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice END
                   AS even_price_or_null
        FROM orders
    """,
    "scalar_array": """
        SELECT vec_id,
               len(embedding) AS dim,
               floor((CAST(embedding[1] AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS first_val,
               floor((sqrt(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) * 10000 + 0.5) / 10000 AS l2_norm,
               floor((list_sum(list_transform(embedding[1:3],
                   x -> CAST(x AS DOUBLE)))) * 1000000 + 0.5) / 1000000 AS head3_sum
        FROM embeddings
    """,
    "scalar_json": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
               CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod10
        FROM events
    """,
}
