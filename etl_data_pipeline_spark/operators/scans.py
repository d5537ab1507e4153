"""Scan / incremental-read operators (reference ops #1-#3,#7,#13-#14).

The reference's entire query surface is ``SELECT * FROM t [WHERE wm >
v]`` (util.py:146-159) plus a driver-side ``max()`` for the watermark
(util.py:403-426). Here each becomes a declarative DataFrame op whose
predicate/projection Catalyst pushes into the parquet scan — verified
in tests via ``.explain`` (PushedFilters / ReadSchema).

Timestamps in oracle-compared outputs are formatted to strings so the
Spark↔DuckDB value-hash comparison is representation-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_pipeline_spark.functions.rounding import hround, sql_round
from etl_data_pipeline_spark.session import load_table
from etl_data_pipeline_spark.watermark import apply_watermark

# Fixed demo watermark literals: chosen inside the data range at every
# SF (orders keys are 0..N-1 with N>=1500; shipdate spans ~1995-2000).
ID_WATERMARK = 1200
TS_WATERMARK = "2000-06-01 00:00:00"


def scan_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full table scan (ref #1: SELECT * FROM t, util.py:146)."""
    return load_table(spark, sf_dir, "customer")


def scan_incremental_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental scan, id-type watermark (ref #2/#3/#14: strict >,
    util.py:158-159, app.py:105-107). Predicate is pushed to parquet."""
    orders = load_table(spark, sf_dir, "orders")
    return apply_watermark(orders, "o_orderkey", ID_WATERMARK).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate_str"),
        "o_orderpriority",
    )


def scan_incremental_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental scan, timestamp-type watermark (ref #2/#14,
    util.py:154-156, app.py:108-112). Typed TimestampType comparison —
    the documented upgrade over the reference's string compare
    (SURVEY.md §2.C #2)."""
    li = load_table(spark, sf_dir, "lineitem")
    return apply_watermark(
        li, "l_shipdate", F.lit(TS_WATERMARK).cast("timestamp")
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss").alias("l_shipdate_str"),
    )


def watermark_advance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX over the watermark column (ref #7, util.py:403-426) — a
    1-row aggregate, never a driver-side max over collected rows."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(F.max("o_orderkey").alias("max_wm"))


def project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning (the reference always SELECT * — util.py:146;
    pruning is new surface). ReadSchema in the plan shows only these
    two columns are read."""
    return load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")


def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate surface: range, IN-list, >, LIKE, IS NOT NULL
    (generalizes the reference's single `>` predicate, util.py:156)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(5, 30)
        & F.col("l_returnflag").isin("A", "N")
        & (F.col("l_extendedprice") > 20000)
        & F.col("l_linestatus").like("O%")
        & F.col("l_shipdate").isNotNull()
    ).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag", "l_linestatus",
    )


def pipeline_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP (SURVEY.md §7.1 minimum slice): incremental watermark
    scan -> join dimension -> aggregate.

    Spark plan at scale: parquet scan with pushed `o_orderkey > wm`
    filter -> broadcast hash join against customer (small dim) ->
    partial (map-side) agg -> shuffle on c_mktsegment -> final agg.
    No driver materialization anywhere.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    inc = apply_watermark(orders, "o_orderkey", ID_WATERMARK)
    return (
        inc.join(F.broadcast(customer), inc.o_custkey == customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("order_cnt"),
            hround(F.sum("o_totalprice"), 2).alias("total_revenue"),
        )
    )


SAMPLE_MOD = 20  # keep 1-in-20 keys: a deterministic ~5% sample


def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sample of orders (~5%).

    TABLESAMPLE is seed/engine-dependent; pipelines that must be
    replayable (and oracle-comparable) sample on a key hash instead:
    the same rows are selected on every run, on every engine, and the
    predicate pushes down like any filter. Hash = portable 60-bit md5
    prefix (same construction as the dedup operators).
    """
    from etl_data_pipeline_spark.functions.hashing import md5_bucket

    orders = load_table(spark, sf_dir, "orders")
    bucket = md5_bucket(F.col("o_orderkey"), SAMPLE_MOD)
    return orders.filter(bucket == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


# Per-language keep rates in per-mille — the down/up-weighting a
# training-data mix does per stratum (e.g. downsample dominant English).
STRATA_RATES_PERMILLE = {"en": 50, "de": 250, "es": 500, "fr": 1000}


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language keep rates over
    documents (en 5%, de 25%, es 50%, fr 100%).

    Same replayable md5-bucket construction as sample_hash, but the
    threshold varies by stratum — exactly how corpus mixes rebalance
    languages/sources at 100 TB. Still a plain pushed-down filter: no
    shuffle, no per-stratum pass; rows not in any stratum drop out.
    """
    from etl_data_pipeline_spark.functions.hashing import md5_bucket

    docs = load_table(spark, sf_dir, "documents")
    bucket = md5_bucket(F.col("doc_id"), 1000)
    threshold = F.lit(0)
    for lang, permille in STRATA_RATES_PERMILLE.items():
        threshold = F.when(F.col("lang") == lang, permille).otherwise(threshold)
    return docs.filter(bucket < threshold).select(
        "doc_id", "lang", "source", "n_chars"
    )


WSAMPLE_K = 3          # keep the k best-keyed docs per source
WSAMPLE_SALT = ":wsamp"  # hash-domain separator vs the other samplers


def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, Efraimidis–Spirakis
    A-ES: per source, keep the k docs with the largest u^(1/w) where
    u is a deterministic hash-uniform in (0, 1] and w = n_chars —
    longer documents proportionally more likely to be drawn (the
    exposure-weighted draw a corpus mix does when sampling by tokens
    rather than by docs). Compared on ln(u)/w (monotone in u^(1/w)),
    ranked on the 9 dp-rounded key so both engines order identical
    doubles, with a doc_id tiebreak making the pick a total order.

    Replayable like sample_hash: no rand(), the same rows on every
    engine and every run. Scale posture: the key is a map-only
    projection; the per-group top-k is one window over the
    well-distributed ``source`` key — no global sort, no candidate
    materialization beyond k rows per group surviving the rank
    filter (Spark's WindowGroupLimit pushes the rk <= k cut into the
    shuffle read at execution).
    """
    from pyspark.sql.window import Window

    from etl_data_pipeline_spark.functions.hashing import md5_long60

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        md5_long60(F.concat(F.col("doc_id").cast("string"), F.lit(WSAMPLE_SALT)))
        + 1
    ) / F.lit(float(1 << 60))
    keyed = docs.select(
        "doc_id",
        "source",
        "n_chars",
        hround(F.log(u) / F.col("n_chars"), 9).alias("sample_key"),
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("sample_key"), F.asc("doc_id")
    )
    return (
        keyed.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= WSAMPLE_K)
    )


# One ANSI-SQL text, two engines: registered verbatim as BOTH the
# Spark implementation (spark.sql is our SQL parser — SURVEY.md §7.3
# "explicitly NOT built") and the DuckDB oracle. TPC-H Q6 shape.
SQL_Q6ISH = """
    SELECT l_returnflag,
           floor((sum(l_extendedprice * l_discount)) * 100 + 0.5) / 100
               AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_quantity < 24
      AND l_discount BETWEEN 0.02 AND 0.09
    GROUP BY l_returnflag
"""


def sql_passthrough_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door: the exact oracle text executed by
    spark.sql() over temp views — proving a SQL-speaking user of the
    reference's target databases can run the same dialect here
    unchanged. Catalyst plans it identically to the DataFrame form
    (pushed filters, partial aggs)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(SQL_Q6ISH)


def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile: the 10 heaviest l_orderkey groups with
    their share of all lineitem rows — the diagnostic that decides
    between plain shuffle join, AQE skew splitting, and explicit
    salting (join_skew_salted). Partial-agg count + TakeOrdered(10);
    the total is a 1-row broadcast, not a second scan."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "l_orderkey",
            "n",
            hround(F.col("n") / F.col("total") * 100, 6).alias("pct_of_rows"),
        )
        .orderBy(F.desc("n"), F.asc("l_orderkey"))
        .limit(10)
    )


def export_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training export: documents in
    md5-of-key order with their shuffle position — the replayable
    "random" order an LLM training run reads the corpus in (same
    permutation on every engine and every rerun, unlike rand()).

    Spark's orderBy range-partitions by the hash (sampled split
    points) — a distributed sort. The position column comes from
    per-partition cumulative offsets (functions/ranking.py, pure-JVM
    since r12: monotonically_increasing_id + one tiny count job), NOT
    a global row_number() window, which would collapse everything
    into one partition.
    """
    from etl_data_pipeline_spark.functions.hashing import md5_long60
    from etl_data_pipeline_spark.functions.ranking import with_global_position

    docs = load_table(spark, sf_dir, "documents")
    key = md5_long60(F.col("doc_id").cast("string"))
    return with_global_position(
        docs.select("doc_id", "lang", key.alias("shuffle_key")),
        [F.asc("shuffle_key"), F.asc("doc_id")],
        pos_col="shuffle_pos",
    )


QUERIES = {
    "scan_full": scan_full,
    "export_shuffle": export_shuffle,
    "sql_passthrough_q6": sql_passthrough_q6,
    "profile_key_skew": profile_key_skew,
    "sample_hash": sample_hash,
    "sample_stratified": sample_stratified,
    "sample_weighted": sample_weighted,
    "scan_incremental_id": scan_incremental_id,
    "scan_incremental_ts": scan_incremental_ts,
    "watermark_advance": watermark_advance,
    "project_columns": project_columns,
    "filter_predicates": filter_predicates,
    "pipeline_incremental": pipeline_incremental,
}

ORACLE = {
    "scan_full": "SELECT * FROM customer",
    "sql_passthrough_q6": SQL_Q6ISH,
    "export_shuffle": """
        SELECT doc_id, lang,
               ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                   AS shuffle_key,
               row_number() OVER (
                   ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT,
                            doc_id) AS shuffle_pos
        FROM documents
    """,
    "profile_key_skew": """
        WITH counts AS (
            SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY l_orderkey
        ), t AS (SELECT sum(n) AS total FROM counts)
        SELECT l_orderkey, n,
               floor((CAST(n AS DOUBLE) / total * 100) * 1000000 + 0.5)
                   / 1000000 AS pct_of_rows
        FROM counts CROSS JOIN t
        ORDER BY n DESC, l_orderkey ASC
        LIMIT 10
    """,
    "sample_hash": f"""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT
              % {SAMPLE_MOD} = 0
    """,
    "sample_weighted": f"""
        WITH keyed AS (
            SELECT doc_id, source, n_chars,
                   {sql_round("ln((('0x' || substr(md5(doc_id::VARCHAR || '"
                              + WSAMPLE_SALT
                              + "'), 1, 15))::BIGINT + 1)"
                              " / 1152921504606846976.0) / n_chars", 9)}
                       AS sample_key
            FROM documents
            WHERE n_chars > 0
        )
        SELECT doc_id, source, n_chars, sample_key,
               CAST(sample_rank AS INTEGER) AS sample_rank
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY source
                       ORDER BY sample_key DESC, doc_id ASC) AS sample_rank
            FROM keyed
        )
        WHERE sample_rank <= {WSAMPLE_K}
    """,
    "sample_stratified": f"""
        SELECT doc_id, lang, source, n_chars
        FROM documents
        WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000
              < CASE {' '.join(f"WHEN lang = '{l}' THEN {p}" for l, p in STRATA_RATES_PERMILLE.items())} ELSE 0 END
    """,
    "scan_incremental_id": f"""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_str,
               o_orderpriority
        FROM orders WHERE o_orderkey > {ID_WATERMARK}
    """,
    "scan_incremental_ts": f"""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
               strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS l_shipdate_str
        FROM lineitem WHERE l_shipdate > TIMESTAMP '{TS_WATERMARK}'
    """,
    "watermark_advance": "SELECT max(o_orderkey) AS max_wm FROM orders",
    "project_columns": "SELECT o_orderkey, o_totalprice FROM orders",
    "filter_predicates": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
               l_returnflag, l_linestatus
        FROM lineitem
        WHERE l_quantity BETWEEN 5 AND 30
          AND l_returnflag IN ('A', 'N')
          AND l_extendedprice > 20000
          AND l_linestatus LIKE 'O%'
          AND l_shipdate IS NOT NULL
    """,
    "pipeline_incremental": f"""
        SELECT c_mktsegment,
               count(*) AS order_cnt,
               {sql_round('sum(o_totalprice)', 2)} AS total_revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderkey > {ID_WATERMARK}
        GROUP BY c_mktsegment
    """,
}
