"""As-of join — the classic time-series operator Spark lacks natively
(SURVEY.md §2.B extension surface; reference has no joins at all).

For each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same ``by`` partition (inclusive
boundary, standard as-of semantics).

Scale design — union + window, NOT a range join:
a range-condition join explodes to |left|×|right| candidate pairs per
key before filtering; the union approach is ONE shuffle of
(by, ts)-tagged rows and a single ordered window pass per key —
O((|L|+|R|) log) per partition, the same trick databases use for
MERGE AS OF. Skewed ``by`` keys are handled by AQE skew splitting on
the window shuffle.

Oracle: DuckDB has native ``ASOF LEFT JOIN`` — exact cross-engine
check of an operator Spark itself doesn't ship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_data_pipeline_spark.functions.rounding import hround, sql_round
from etl_data_pipeline_spark.session import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
) -> DataFrame:
    """Generic as-of join: left rows + latest right ``value_cols`` as of
    ``left[on]`` (inclusive), matched within ``by`` groups.

    ``left`` and ``right`` must both have columns ``on`` and ``by``;
    ``value_cols`` are right-side columns to carry (left must not
    already have them). Right rows tied on (by, on) should be
    pre-deduplicated by the caller for deterministic results.

    The match is ROW-ATOMIC: all value_cols are filled as ONE struct
    with a single last(ignorenulls) pass, then unpacked — so a
    legitimate NULL in one value column of the matched right row stays
    NULL in the output (the matched row's own value), exactly like
    DuckDB ASOF JOIN / pandas merge_asof. Filling each column
    independently would instead let that column fall back to an OLDER
    right row, mixing columns from different matches.
    """
    lhs = left.withColumn("__side", F.lit(1))
    rhs_cols = [by, on] + value_cols
    rhs = right.select(*rhs_cols).withColumn("__side", F.lit(0))
    # Align schemas: left gains null value_cols, right gains null left-cols.
    for c in value_cols:
        lhs = lhs.withColumn(c, F.lit(None).cast(dict(rhs.dtypes)[c]))
    for c, t in left.dtypes:
        if c not in (by, on):
            rhs = rhs.withColumn(c, F.lit(None).cast(t))
    unioned = lhs.unionByName(rhs)
    # Rights sort BEFORE lefts at equal ts (__side 0 < 1) => inclusive
    # boundary: a right row at exactly left.ts is visible to that left.
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # One struct per right row — the window fills the LAST MATCHED ROW
    # as a unit (never NULL for a right row, even if every value inside
    # is NULL, so a matched row's NULLs are carried, not skipped).
    match_struct = F.when(
        F.col("__side") == 0, F.struct(*[F.col(c) for c in value_cols])
    )
    filled = unioned.select(
        "*", F.last(match_struct, ignorenulls=True).over(w).alias("__asof")
    )
    out_cols = [c for c, _ in left.dtypes] + [
        F.col(f"__asof.{c}").alias(c) for c in value_cols
    ]
    return filled.filter(F.col("__side") == 1).select(*out_cols)


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution as-of join on events: each purchase matched to the
    same user's most recent view at-or-before the purchase time.

    Right side is deduplicated per (user_id, ts) keeping max event_id so
    ties are deterministic in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
        .withColumn("view_ts", F.col("ts"))
    )
    joined = asof_join(
        purchases, views, on="ts", by="user_id", value_cols=["view_id", "view_ts"]
    )
    return joined.select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "view_id",
        "view_ts",
        (F.unix_timestamp("ts") - F.unix_timestamp("view_ts")).alias("secs_since_view"),
    )


ASOF_TOLERANCE_SECS = 1800  # 30-minute attribution window


def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a tolerance bound (pandas merge_asof's
    ``tolerance``): the most recent view still counts only within 30
    minutes of the purchase; staler matches become NULL.

    Because plain as-of already picks the NEAREST earlier row,
    tolerance is an exact post-filter on the matched gap — no change
    to the one-shuffle union+window plan.
    """
    matched = join_asof(spark, sf_dir)
    in_window = F.col("secs_since_view") <= ASOF_TOLERANCE_SECS
    return matched.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.when(in_window, F.col("view_id")).alias("view_id"),
        F.when(in_window, F.col("view_ts")).alias("view_ts"),
        F.when(in_window, F.col("secs_since_view")).alias("secs_since_view"),
    )


def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join (pandas merge_asof
    direction='nearest'): each purchase matched to the same user's
    closest view in time — before OR after — with ties resolved
    backward. The third member of the as-of family here (backward =
    join_asof, bounded-backward = join_asof_tolerance).

    Built as two runs of the same union+window asof kernel: the
    backward pass as-is, the forward pass on a NEGATED full-precision
    epoch key (nearest following row in real time = most recent row in
    negated time — direction reversal costs nothing new), then a
    per-purchase pick of the smaller delta. Deltas compare on
    fractional-second epochs (cast double) so sub-second timestamps
    order identically in both engines. Three bounded shuffles total;
    no range-condition pair explosion anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    back = asof_join(
        purchases,
        views.withColumn("b_ts", F.col("ts")).withColumnRenamed(
            "view_id", "b_id"
        ),
        on="ts",
        by="user_id",
        value_cols=["b_id", "b_ts"],
    )
    fwd = asof_join(
        purchases.withColumn("nts", -F.col("ts").cast("double")),
        views.select(
            "user_id",
            (-F.col("ts").cast("double")).alias("nts"),
            F.col("view_id").alias("f_id"),
            F.col("ts").alias("f_ts"),
        ),
        on="nts",
        by="user_id",
        value_cols=["f_id", "f_ts"],
    ).select("purchase_id", "f_id", "f_ts")
    j = back.join(fwd, "purchase_id")
    db = F.col("ts").cast("double") - F.col("b_ts").cast("double")
    df_ = F.col("f_ts").cast("double") - F.col("ts").cast("double")
    take_back = F.col("b_ts").isNotNull() & (
        F.col("f_ts").isNull() | (db <= df_)
    )
    chosen_id = F.when(take_back, F.col("b_id")).otherwise(F.col("f_id"))
    chosen_ts = F.when(take_back, F.col("b_ts")).otherwise(F.col("f_ts"))
    direction = F.when(take_back, F.lit("back")).otherwise(
        F.when(F.col("f_ts").isNotNull(), F.lit("fwd"))
    )
    return j.select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        chosen_id.alias("view_id"),
        chosen_ts.alias("view_ts"),
        direction.alias("direction"),
        F.abs(
            F.unix_timestamp("ts") - F.unix_timestamp(chosen_ts)
        ).alias("secs_to_view"),
    )


INTERP_STEP_SECS = 21600  # 6-hour resample grid


def asof_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR-interpolation resample (pandas ``interpolate`` /
    TimescaleDB ``interpolate()``): each user's 'view' value series is
    projected onto a regular 6-hour grid, with every grid instant
    valued by linear interpolation between its bracketing
    observations. Completes the gap-fill family: events_resample_ffill
    is the step-function variant; this is the continuous one.

    Built from TWO runs of the union+window as-of kernel (backward
    pass for the previous observation, forward pass on a negated
    full-precision epoch key for the next — see join_asof_nearest),
    then pure arithmetic. The grid is generated per user between the
    ceil/floor 6-hour boundaries of that user's observed span, so both
    brackets always exist (no extrapolation rows) and the observation
    microsecond offsets guarantee a nonzero denominator. Three bounded
    shuffles, all keyed by user_id; grid size is span/step per user,
    never |events|² anything.

    Exactness: interpolation runs on fractional-second double epochs
    with the SAME operation order in both engines (sub, sub, div, mul,
    add on IEEE doubles), so values hash-compare exactly; hround(6) is
    belt-and-braces.
    """
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("val"))
    )
    step = F.lit(float(INTERP_STEP_SECS))
    bounds = views.groupBy("user_id").agg(
        F.ceil(F.min(F.col("ts").cast("double")) / step).alias("lo"),
        F.floor(F.max(F.col("ts").cast("double")) / step).alias("hi"),
    )
    grid = (
        bounds.filter(F.col("lo") <= F.col("hi"))
        .select("user_id", F.explode(F.sequence("lo", "hi")).alias("k"))
        .select(
            "user_id",
            F.timestamp_seconds(F.col("k") * INTERP_STEP_SECS).alias("ts"),
        )
    )
    back = asof_join(
        grid,
        views.select(
            "user_id", "ts", F.col("val").alias("p_v"), F.col("ts").alias("p_ts")
        ),
        on="ts",
        by="user_id",
        value_cols=["p_v", "p_ts"],
    )
    fwd = asof_join(
        grid.withColumn("nts", -F.col("ts").cast("double")),
        views.select(
            "user_id",
            (-F.col("ts").cast("double")).alias("nts"),
            F.col("val").alias("n_v"),
            F.col("ts").alias("n_ts"),
        ),
        on="nts",
        by="user_id",
        value_cols=["n_v", "n_ts"],
    ).select("user_id", "ts", "n_v", "n_ts")
    j = back.join(fwd, ["user_id", "ts"])
    t = F.col("ts").cast("double")
    p = F.col("p_ts").cast("double")
    n = F.col("n_ts").cast("double")
    interp = F.when(F.col("n_ts") == F.col("p_ts"), F.col("p_v")).otherwise(
        F.col("p_v") + (F.col("n_v") - F.col("p_v")) * ((t - p) / (n - p))
    )
    return j.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("grid_ts"),
        hround(interp, 6).alias("value_interp"),
    )


QUERIES = {
    "asof_interpolate": asof_interpolate,
    "join_asof": join_asof,
    "join_asof_tolerance": join_asof_tolerance,
    "join_asof_nearest": join_asof_nearest,
}

ORACLE = {
    "asof_interpolate": f"""
        WITH v AS (
            SELECT user_id, ts, max(value) AS val
            FROM events WHERE event_type = 'view'
            GROUP BY user_id, ts
        ), b AS (
            SELECT user_id,
                   CAST(ceil(epoch(min(ts)) / {INTERP_STEP_SECS}.0) AS BIGINT) AS lo,
                   CAST(floor(epoch(max(ts)) / {INTERP_STEP_SECS}.0) AS BIGINT) AS hi
            FROM v GROUP BY user_id
        ), grid AS (
            SELECT user_id, make_timestamp(g.k * {INTERP_STEP_SECS} * 1000000) AS ts
            FROM b, unnest(generate_series(b.lo, b.hi)) AS g(k)
            WHERE lo <= hi
        ), p AS (
            SELECT grid.user_id, grid.ts, v.val AS p_v, v.ts AS p_ts
            FROM grid ASOF LEFT JOIN v
              ON grid.user_id = v.user_id AND grid.ts >= v.ts
        ), n AS (
            SELECT grid.user_id, grid.ts, v.val AS n_v, v.ts AS n_ts
            FROM grid ASOF LEFT JOIN v
              ON grid.user_id = v.user_id AND grid.ts <= v.ts
        )
        SELECT p.user_id, strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS grid_ts,
               {sql_round(
                   "CASE WHEN n_ts = p_ts THEN p_v ELSE p_v + (n_v - p_v) * "
                   "((epoch(p.ts) - epoch(p_ts)) / (epoch(n_ts) - epoch(p_ts)))"
                   " END", 6)} AS value_interp
        FROM p JOIN n ON p.user_id = n.user_id AND p.ts = n.ts
    """,
    "join_asof": """
        WITH v AS (
            SELECT user_id, ts, max(event_id) AS view_id
            FROM events WHERE event_type = 'view'
            GROUP BY user_id, ts
        ), p AS (
            SELECT event_id AS purchase_id, user_id, ts
            FROM events WHERE event_type = 'purchase'
        )
        SELECT p.purchase_id, p.user_id, p.ts AS purchase_ts,
               v.view_id, v.ts AS view_ts,
               CAST(epoch(date_trunc('second', p.ts))
                    - epoch(date_trunc('second', v.ts)) AS BIGINT)
                   AS secs_since_view
        FROM p ASOF LEFT JOIN v
          ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    "join_asof_nearest": """
        WITH v AS (
            SELECT user_id, ts, max(event_id) AS view_id
            FROM events WHERE event_type = 'view'
            GROUP BY user_id, ts
        ), p AS (
            SELECT event_id AS purchase_id, user_id, ts
            FROM events WHERE event_type = 'purchase'
        ), b AS (
            SELECT p.purchase_id, p.user_id, p.ts,
                   v.view_id AS b_id, v.ts AS b_ts
            FROM p ASOF LEFT JOIN v
              ON p.user_id = v.user_id AND p.ts >= v.ts
        ), f AS (
            SELECT p.purchase_id, v.view_id AS f_id, v.ts AS f_ts
            FROM p ASOF LEFT JOIN v
              ON p.user_id = v.user_id AND p.ts <= v.ts
        ), j AS (
            SELECT b.*, f.f_id, f.f_ts,
                   (b_ts IS NOT NULL AND (f_ts IS NULL OR
                        epoch(b.ts) - epoch(b_ts) <= epoch(f_ts) - epoch(b.ts)))
                       AS take_back
            FROM b JOIN f USING (purchase_id)
        )
        SELECT purchase_id, user_id, ts AS purchase_ts,
               CASE WHEN take_back THEN b_id ELSE f_id END AS view_id,
               CASE WHEN take_back THEN b_ts ELSE f_ts END AS view_ts,
               CASE WHEN take_back THEN 'back'
                    WHEN f_ts IS NOT NULL THEN 'fwd' END AS direction,
               abs(CAST(epoch(date_trunc('second', ts)) - epoch(date_trunc(
                   'second', CASE WHEN take_back THEN b_ts ELSE f_ts END))
                   AS BIGINT)) AS secs_to_view
        FROM j
    """,
    "join_asof_tolerance": f"""
        WITH v AS (
            SELECT user_id, ts, max(event_id) AS view_id
            FROM events WHERE event_type = 'view'
            GROUP BY user_id, ts
        ), p AS (
            SELECT event_id AS purchase_id, user_id, ts
            FROM events WHERE event_type = 'purchase'
        ), m AS (
            SELECT p.purchase_id, p.user_id, p.ts AS purchase_ts,
                   v.view_id, v.ts AS view_ts,
                   CAST(epoch(date_trunc('second', p.ts))
                        - epoch(date_trunc('second', v.ts)) AS BIGINT)
                       AS secs_since_view
            FROM p ASOF LEFT JOIN v
              ON p.user_id = v.user_id AND p.ts >= v.ts
        )
        SELECT purchase_id, user_id, purchase_ts,
               CASE WHEN secs_since_view <= {ASOF_TOLERANCE_SECS}
                    THEN view_id END AS view_id,
               CASE WHEN secs_since_view <= {ASOF_TOLERANCE_SECS}
                    THEN view_ts END AS view_ts,
               CASE WHEN secs_since_view <= {ASOF_TOLERANCE_SECS}
                    THEN secs_since_view END AS secs_since_view
        FROM m
    """,
}
