"""Round-13 optimization pins.

1. The triangle family's lineage cuts keep the wedge self-join
   co-partitioned (the pagerank checkpoint-under / persist-on-top
   contract extended to ``oriented`` — VERDICT r12 item 5).
2. The PQ packed-codebook encode is bit-equivalent to the relational
   min(struct(d, cid)) form it replaced.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_pipeline_spark.functions.caching import (
    release_tracked,
    tracked_checkpoint,
    tracked_persist,
)


def test_triangle_oriented_stays_copartitioned(spark, sf_dir):
    """The r13 lineage cut on ``oriented`` (checkpoint UNDER the
    repartition, persist on top) must keep hash(src): with broadcast
    off, the wedge self-join on e1.src == e2.src reads the cache
    directly — Sort → InMemoryTableScan with NO Exchange in between.
    A checkpoint ABOVE the repartition reads UnknownPartitioning under
    AQE and re-exchanges both sides (the r12 pagerank failure mode)."""
    from etl_data_pipeline_spark.operators.graph import _part_pairs

    p = spark.sparkContext.defaultParallelism
    pairs = tracked_checkpoint(_part_pairs(spark, sf_dir))
    deg = (
        pairs.select(F.col("u").alias("node"))
        .union(pairs.select("v"))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    ann = pairs.join(
        F.broadcast(deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du")),
        "u",
    ).join(
        F.broadcast(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv")),
        "v",
    )
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = tracked_persist(
        tracked_checkpoint(
            ann.select(
                F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
                F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
                F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("dd"),
            )
        ).repartition(p, "src")
    )
    oriented.count()  # materialize the cache
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = oriented.alias("e1").join(
            oriented.alias("e2"), F.col("e1.src") == F.col("e2.src")
        )
        tree = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        ).split("\n\n")[0]
        lines = tree.splitlines()
        scans = [
            i
            for i, l in enumerate(lines)
            if "InMemoryTableScan" in l
            and len(l) - len(l.lstrip(" :+-")) < 20
        ]
        assert len(scans) >= 2, tree
        for i in scans:
            above = "\n".join(lines[max(0, i - 3): i])
            assert "Exchange" not in above, tree
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        release_tracked(spark, blocking=True)


def test_pq_encode_wide_matches_relational_argmin(spark, sf_dir):
    """The packed-codebook fold encode (r13) must produce EXACTLY the
    codes the relational min(struct(d, cid)) produced — same
    lexicographic total order, same IEEE distance doubles."""
    from etl_data_pipeline_spark.llm.similarity import (
        CENTROID_MOD_REMAINDER,
        DIM,
        PQ_CODEBOOK_ID_CAP,
        PQ_M,
        QUERY_MOD,
        _pq_cb_row,
        _pq_encode_wide,
        _sq_dist,
    )
    from etl_data_pipeline_spark.session import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    new = {
        r["vec_id"]: [r[f"c{s}"] for s in range(PQ_M)]
        for r in _pq_encode_wide(e, _pq_cb_row(e)).collect()
    }

    sub = DIM // PQ_M
    cb = e.filter(
        (F.col("vec_id") % QUERY_MOD == CENTROID_MOD_REMAINDER)
        & (F.col("vec_id") < PQ_CODEBOOK_ID_CAP)
    ).select(
        F.col("vec_id").alias("cid"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        F.slice(F.col("v"), s * sub + 1, sub).alias("cv"),
                    )
                    for s in range(PQ_M)
                ]
            )
        ).alias("c"),
    ).select("cid", "c.s", "c.cv")
    corp = e.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        F.slice(F.col("v"), s * sub + 1, sub).alias("sv"),
                    )
                    for s in range(PQ_M)
                ]
            )
        ).alias("p"),
    ).select("vec_id", "p.s", "p.sv")
    old_rows = (
        corp.join(F.broadcast(cb), "s")
        .groupBy("vec_id", "s")
        .agg(
            F.min(
                F.struct(
                    _sq_dist(F.col("sv"), F.col("cv")).alias("d"),
                    F.col("cid").alias("cid"),
                )
            ).alias("m")
        )
        .select("vec_id", "s", F.col("m.cid").alias("cid"))
        .collect()
    )
    old: dict[int, list] = {}
    for r in old_rows:
        old.setdefault(r["vec_id"], [None] * PQ_M)[r["s"]] = r["cid"]
    assert new == old
