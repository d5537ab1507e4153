"""Join operators — all 8 variants (SURVEY.md §2.B "Joins").

New surface relative to the reference (it has no joins — its only
join-like op is a pandas anti-join diagnostic on the table registry,
util.py:384-387, generalized here as ``join_anti``).

Scale posture per join:
- small dims (region/nation/part/customer at dim-scale) are broadcast —
  explicitly via F.broadcast where we know the side is small, else AQE
  picks it up under the autoBroadcastJoinThreshold;
- large-large joins shuffle on the join key and rely on AQE skew-join
  splitting;
- the theta/range join is a broadcast nested-loop against a tiny bands
  relation — never a cartesian of two big sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_pipeline_spark.functions.rounding import hround, sql_round
from etl_data_pipeline_spark.session import load_table


def join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders ⋈ customer (shuffle/broadcast hash join —
    Catalyst chooses; customer is broadcast at these SFs)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return orders.join(
        customer, orders.o_custkey == customer.c_custkey, "inner"
    ).select("o_orderkey", "c_custkey", "c_name", "o_totalprice")


def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast hash join: lineitem ⋈ broadcast(part).

    At 100 TB lineitem stays un-shuffled; part (dim) ships to every
    executor — no exchange on the fact side at all.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "inner").select(
        "l_orderkey", "l_linenumber", "p_name", "p_brand", "l_quantity"
    )


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer: every customer, order keys nullable."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two filtered sides so nulls appear on both."""
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 100000
    )
    joined = customer.join(orders, customer.c_custkey == orders.o_custkey, "full")
    return joined.select(
        F.coalesce(customer.c_custkey, orders.o_custkey).alias("custkey"),
        "c_name",
        "o_orderkey",
        "o_totalprice",
    )


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi (EXISTS): customers having at least one big order."""
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti (NOT EXISTS): customers with no high-value order —
    generalizes the reference's registry anti-join diagnostic
    (util.py:384-387)."""
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range join: price-band classification.

    The bands side is a 3-row inline relation -> broadcast nested loop
    join; at 100 TB this is a per-row band lookup, no shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [(0.0, 50000.0, "low"), (50000.0, 150000.0, "mid"), (150000.0, 1e12, "high")],
        "lo double, hi double, band string",
    )
    return orders.join(
        F.broadcast(bands),
        (orders.o_totalprice > bands.lo) & (orders.o_totalprice <= bands.hi),
        "inner",
    ).select("o_orderkey", "o_totalprice", "band")


def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted shuffle join: lineitem ⋈ part on a salted composite
    key, then brand-level aggregation.

    The skew pattern for when one hot key would overwhelm a single
    reducer and the dim side is too big to broadcast: the fact side
    derives a DETERMINISTIC salt in [0, NSALT) (hash of the row key —
    reproducible, unlike rand()), the dim side replicates each row
    NSALT times, and the join key becomes (key, salt) so each hot key
    spreads over NSALT reducers. AQE's skew-join splitting handles
    moderate skew automatically; explicit salting is the heavy-hammer
    for pathological keys. Results are identical to the unsalted join —
    which is exactly what the oracle checks.
    """
    NSALT = 8
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(NSALT))
    )
    part = load_table(spark, sf_dir, "part").withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(NSALT)]))
    )
    return (
        li.hint("SHUFFLE_HASH")
        .join(part, (li.l_partkey == part.p_partkey) & (li.salt == part.salt))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("line_cnt"),
            hround(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: orders ⋈ customer ⋈ nation ⋈ region, aggregated.

    Catalyst collapses this into successive broadcast joins over the
    dims; only the final groupBy shuffles (partial agg map-side first).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("order_cnt"),
            hround(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def tpch_q3ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 revenue orders for one segment/date window.

    Plan: pushed filters on all three scans -> broadcast(customer) ->
    lineitem join shuffled on orderkey -> partial agg -> TakeOrdered(10).
    """
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("o_orderkey")
        .agg(
            hround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def tpch_q5ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation through the full star."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            hround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("line_cnt"),
        )
    )


RANGE_BIN_MS = 300_000  # 5-minute window = bin width


def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large interval join via bucketing: pairs of events by the
    same user within 5 minutes of each other.

    The naive plan for `0 <= ts_b - ts_a <= W` between two big tables
    is a BroadcastNestedLoopJoin (O(n·m) comparisons) — fine for the
    tiny-bands case (join_theta_range), fatal when both sides are
    large. The classic fix makes it an EQUI join: bin timestamps into
    W-wide buckets; an earlier event can only pair with events in its
    own or the next bucket, so the probe side explodes each row to 2
    bucket keys and the join key becomes (user_id, bucket). Shuffle is
    2·|events| rows on a well-distributed key; the residual range
    predicate filters inside each bucket. At 100 TB this is the only
    viable shape for event-proximity joins.

    Pair order is (earlier, later) with event_id tiebreak, so every
    qualifying pair appears exactly once.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_millis("ts").alias("ts_ms")
    )
    bucket = F.floor(F.col("ts_ms") / RANGE_BIN_MS)
    a = ev.select(
        "user_id",
        F.col("event_id").alias("event_a"),
        F.col("ts_ms").alias("ts_a"),
        F.explode(F.array(bucket, bucket + 1)).alias("bucket"),
    )
    b = ev.select(
        F.col("user_id").alias("user_b"),
        F.col("event_id").alias("event_b"),
        F.col("ts_ms").alias("ts_b"),
        bucket.alias("bucket_b"),
    )
    gap = F.col("ts_b") - F.col("ts_a")
    return (
        a.join(b, (a.user_id == b.user_b) & (a.bucket == b.bucket_b))
        .filter(
            gap.between(0, RANGE_BIN_MS)
            & (
                (F.col("ts_a") < F.col("ts_b"))
                | ((F.col("ts_a") == F.col("ts_b")) & (F.col("event_a") < F.col("event_b")))
            )
        )
        .select("user_id", "event_a", "event_b", gap.alias("gap_ms"))
    )


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (region × nation) — completes the
    join family. Only sane when one side is tiny: Spark broadcasts the
    small side (BroadcastNestedLoopJoin), so nothing shuffles; a
    cross join of two large inputs is a design bug, not an operator
    choice."""
    region = load_table(spark, sf_dir, "region").select("r_name")
    nation = load_table(spark, sf_dir, "nation").select("n_name")
    return region.crossJoin(nation)


def bloom_prune(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    m_bits: int = 1 << 17,
    k: int = 3,
) -> DataFrame:
    """Prune ``fact`` to the rows whose ``fact_key`` MIGHT join a key
    in single-column ``dim_keys``, using a Bloom filter built entirely
    with DataFrame ops (no driver-side bitmap, no UDF). No false
    negatives — every actually-joining row survives; false positives
    pass through at rate ≈ (fill)^k and must be eliminated by the real
    join downstream.

    Build: k hash positions per key (xxhash64 under k literal salts,
    pmod m_bits) → 64-bit words via shiftleft + bit_or aggregation
    (map-side-combined, ≤ m_bits/64 groups regardless of dim size) →
    ONE row holding map<word_idx, word>, broadcast onto the fact.
    Probe: pure codegen bit arithmetic, fact row kept iff all k bits
    are set."""

    def positions(col):
        return [
            F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(m_bits))
            for seed in range(k)
        ]

    key_col = dim_keys.columns[0]
    pos = dim_keys.select(
        F.explode(F.array(*positions(F.col(key_col)))).alias("pos")
    )
    bloom = (
        pos.select(
            F.expr("pos div 64").alias("w"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(pos % 64 as int))"
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .agg(
            F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias(
                "bloom"
            )
        )
    )
    probe = fact.crossJoin(F.broadcast(bloom))
    hit = None
    for i, p in enumerate(positions(F.col(fact_key))):
        probe = probe.withColumn(f"_bp{i}", p)
        cond = F.expr(
            f"(coalesce(element_at(bloom, _bp{i} div 64), cast(0 as bigint))"
            f" & shiftleft(cast(1 as bigint), cast(_bp{i} % 64 as int))) <> 0"
        )
        hit = cond if hit is None else (hit & cond)
    return probe.filter(hit).drop("bloom", *[f"_bp{i}" for i in range(k)])


def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pruning, built explicitly from
    DataFrame ops: lineitem ⋈ urgent orders, with the fact side
    pre-filtered by a Bloom filter of the dim's join keys BEFORE the
    join. Result is exact — Bloom false positives are eliminated by
    the real join that follows — which is exactly what the oracle
    (the plain join) checks.

    Why this matters at 100 TB: when the filtered dim side is too big
    to broadcast AS ROWS, its Bloom bitmap is still tiny and FIXED
    SIZE (m_bits/8 = 16 KiB here, independent of dim row count), so
    the fact scan can drop non-joining rows before the shuffle. This
    is Spark's `runtime.bloomFilter` rewrite (InjectRuntimeFilter)
    done by hand — see ``bloom_prune`` above for the mechanics — so
    the build/probe plan is visible and testable."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load_table(spark, sf_dir, "lineitem")
    pruned = bloom_prune(li, orders.select("o_orderkey"), "l_orderkey")
    return (
        pruned.join(orders, pruned.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_lines"),
            hround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
        )
    )


OVERLAP_BIN_US = 6 * 3600 * 1_000_000  # 6-hour grid, exact int micros
OVERLAP_HOT_MIN = 18                   # purchases/bin above which a
#                                        window counts as "hot"


def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP join: user sessions (variable-length
    intervals from the shared gaps-and-islands sessionizer) against
    hot 6-hour windows (bins with > OVERLAP_HOT_MIN purchases),
    emitting the overlapped pair plus the overlap duration — the
    "which sessions ran during an incident/promo window" shape that
    needs interval×interval semantics, completing the temporal-join
    family (asof = nearest-point, theta_range = point-in-band, this =
    interval∩interval).

    Scale design — NO theta join of two interval sets (O(n·m) via
    BroadcastNestedLoop): each session explodes into the grid bins
    its span covers (sequence() over exact integer micros bucket ids;
    the explode factor is bounded by session length / bin width), the
    windows relation IS bin-keyed by construction, and the join is a
    plain equi hash join on the bin id — followed by the exact
    overlap predicate + duration as a refine step (the standard
    bin-then-refine interval join; here windows tile the grid so the
    predicate is always satisfied, but the refine survives any window
    shape). Windows are time-range-bounded (≤ a few k per decade of
    data) and broadcast; sessions arrive already user-bucketed from
    the sessionizer's single exchange.

    Overlap convention: sessions are CLOSED point-event hulls
    [s_start, s_end]; windows half-open [w, w+BIN): a session ending
    exactly at w+BIN belongs to the NEXT bin only. overlap_us is the
    intersection length capped at the window's inclusive last micro —
    0 for a single-point session, never negative.

    Reference parity: the reference has no joins at all (its only
    join-like op is the registry anti-join, util.py:384-387); this is
    target-surface extension like the rest of the join family.
    """
    from etl_data_pipeline_spark.functions.sessions import with_session_seq

    ev = load_table(spark, sf_dir, "events")
    sess = (
        with_session_seq(ev.select("user_id", "ts", "event_id"))
        .groupBy("user_id", "session_seq")
        .agg(
            F.min(F.unix_micros("ts")).alias("s_start"),
            F.max(F.unix_micros("ts")).alias("s_end"),
        )
    )
    # bucket via s - s % BIN (exact long arithmetic; micros are
    # positive) — NOT floor(s / BIN), whose double division can round
    # across an integer boundary near 2^53-scale numerators.
    us = F.unix_micros("ts")
    hot = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy((us - us % OVERLAP_BIN_US).alias("w_start"))
        .agg(F.count("*").alias("n_purchases"))
        .filter(F.col("n_purchases") > OVERLAP_HOT_MIN)
    )
    binned = sess.select(
        "user_id",
        "session_seq",
        "s_start",
        "s_end",
        F.explode(
            F.sequence(
                F.col("s_start") - F.col("s_start") % OVERLAP_BIN_US,
                F.col("s_end") - F.col("s_end") % OVERLAP_BIN_US,
                F.lit(OVERLAP_BIN_US).cast("long"),
            )
        ).alias("bin_start"),
    )
    joined = binned.join(F.broadcast(hot), binned.bin_start == hot.w_start)
    w_end_incl = F.col("w_start") + (OVERLAP_BIN_US - 1)
    return (
        joined.filter(
            (F.col("s_start") < F.col("w_start") + OVERLAP_BIN_US)
            & (F.col("s_end") >= F.col("w_start"))
        )
        .select(
            "user_id",
            "session_seq",
            F.col("w_start").alias("window_start_us"),
            "n_purchases",
            (
                F.least(F.col("s_end"), w_end_incl)
                - F.greatest(F.col("s_start"), F.col("w_start"))
            ).alias("overlap_us"),
        )
    )


QUERIES = {
    "join_interval_overlap": join_interval_overlap,
    "join_bloom_pruned": join_bloom_pruned,
    "join_inner_hash": join_inner_hash,
    "join_cross": join_cross,
    "join_broadcast": join_broadcast,
    "join_left_outer": join_left_outer,
    "join_full_outer": join_full_outer,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_theta_range": join_theta_range,
    "join_range_binned": join_range_binned,
    "join_skew_salted": join_skew_salted,
    "join_multiway": join_multiway,
    "tpch_q3ish": tpch_q3ish,
    "tpch_q5ish": tpch_q5ish,
}

def _oracle_interval_overlap() -> str:
    from etl_data_pipeline_spark.functions.sessions import sql_session_seq_cte

    b = OVERLAP_BIN_US
    return f"""
        WITH {sql_session_seq_cte()}, sess AS (
            SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                   min(us) AS s_start, max(us) AS s_end
            FROM t GROUP BY user_id, session_seq
        ), hot AS (
            SELECT (epoch_us(ts) // {b}) * {b} AS w_start,
                   count(*) AS n_purchases
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1 HAVING count(*) > {OVERLAP_HOT_MIN}
        )
        SELECT s.user_id, s.session_seq, h.w_start AS window_start_us,
               h.n_purchases,
               least(s.s_end, h.w_start + {b} - 1)
                   - greatest(s.s_start, h.w_start) AS overlap_us
        FROM sess s JOIN hot h
          ON s.s_start < h.w_start + {b} AND s.s_end >= h.w_start
    """


ORACLE = {
    "join_interval_overlap": _oracle_interval_overlap(),
    "join_bloom_pruned": f"""
        SELECT l_returnflag, count(*) AS n_lines,
               {sql_round("sum(l_extendedprice * (1 - l_discount))", 2)} AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY l_returnflag
    """,
    "join_cross": "SELECT r_name, n_name FROM region CROSS JOIN nation",
    "join_inner_hash": """
        SELECT o_orderkey, c_custkey, c_name, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    "join_broadcast": """
        SELECT l_orderkey, l_linenumber, p_name, p_brand, l_quantity
        FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    "join_left_outer": """
        SELECT c_custkey, c_name, o_orderkey, o_totalprice
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
    "join_full_outer": """
        SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
               c.c_name, o.o_orderkey, o.o_totalprice
        FROM (SELECT * FROM customer WHERE c_acctbal > 5000) c
        FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 100000) o
          ON c.c_custkey = o.o_custkey
    """,
    "join_semi": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 150000)
    """,
    "join_anti": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 250000)
    """,
    "join_theta_range": """
        SELECT o_orderkey, o_totalprice, band
        FROM orders JOIN (VALUES (0.0, 50000.0, 'low'),
                                 (50000.0, 150000.0, 'mid'),
                                 (150000.0, 1e12, 'high')) AS b(lo, hi, band)
          ON o_totalprice > lo AND o_totalprice <= hi
    """,
    "join_range_binned": f"""
        SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
               epoch_ms(b.ts) - epoch_ms(a.ts) AS gap_ms
        FROM events a JOIN events b ON a.user_id = b.user_id
        WHERE epoch_ms(b.ts) - epoch_ms(a.ts) BETWEEN 0 AND {RANGE_BIN_MS}
          AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
    """,
    "join_skew_salted": """
        SELECT p_brand, count(*) AS line_cnt,
               floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "join_multiway": """
        SELECT r_name, n_name, count(*) AS order_cnt,
               floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "tpch_q3ish": """
        SELECT o_orderkey,
               floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    "tpch_q5ish": """
        SELECT n_name,
               floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue,
               count(*) AS line_cnt
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
}
