"""Physical-plan assertions (the 100 TB posture checks): predicate
pushdown reaches the parquet scan, column pruning narrows ReadSchema,
explicit broadcasts stay broadcast, top-k compiles to TakeOrdered."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from etl_data_pipeline_spark.operators import joins, scans, setops
from etl_data_pipeline_spark.session import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_watermark_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(scans.scan_incremental_id(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "GreaterThan(o_orderkey" in plan


def test_column_pruning_in_read_schema(spark, sf_dir):
    plan = _plan(scans.project_columns(spark, sf_dir))
    assert "o_orderkey" in plan and "o_totalprice" in plan
    # pruned: the other four orders columns never reach the scan
    assert "o_orderpriority" not in plan
    assert "o_orderdate" not in plan


def test_broadcast_join_is_broadcast(spark, sf_dir):
    plan = _plan(joins.join_broadcast(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sort_limit_is_take_ordered(spark, sf_dir):
    plan = _plan(setops.sort_limit(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # never a global sort


def test_flagship_no_cartesian_no_global_sort(spark, sf_dir):
    plan = _plan(scans.pipeline_incremental(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "GlobalSort" not in plan
    assert "BroadcastHashJoin" in plan


def test_whole_stage_codegen_active(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = li.filter(F.col("l_quantity") > 10).groupBy("l_returnflag").agg(
        F.sum("l_extendedprice")
    )
    # AQE wraps the plan pre-execution and hides codegen subtrees from
    # explain; toggle it off just to inspect the static plan.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            q.explain("codegen")
        out = buf.getvalue()
        n = int(out.split("Found ")[1].split(" ")[0])
        assert n >= 1, out[:500]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
