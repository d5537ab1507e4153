"""Public facade (engine.EtlEngine): SQL surface, named operators,
pipeline runner — the single import a switching user needs."""

from etl_data_pipeline_spark.engine import EtlEngine
from etl_data_pipeline_spark.spec import PipelineSpec, TableSpec


def test_engine_sql_and_views(spark, sf_dir):
    eng = EtlEngine(spark)
    eng.register_views(sf_dir)
    n = eng.sql("SELECT count(*) AS n FROM orders").first()["n"]
    assert n == eng.table(sf_dir, "orders").count() > 0
    top = eng.sql(
        """
        SELECT c_mktsegment, count(*) AS cnt
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY cnt DESC LIMIT 1
        """
    ).collect()
    assert len(top) == 1


def test_engine_named_query(spark, sf_dir):
    eng = EtlEngine(spark)
    out = eng.query("agg_groupby", sf_dir)
    assert out.count() > 0
    assert "sum_qty" in out.columns


def test_engine_run_pipeline(spark, sf_dir, tmp_path):
    eng = EtlEngine(spark)
    spec = PipelineSpec(
        tables=[
            TableSpec(
                name="nation",
                source_options={"dir": sf_dir},
                sink_options={"dir": str(tmp_path / "sink")},
            )
        ]
    )
    results = eng.run_pipeline(spec, state_path=str(tmp_path / "wm.json"))
    assert [r.status for r in results] == ["loaded"]
    assert spark.read.parquet(str(tmp_path / "sink" / "nation")).count() > 0


def test_source_sink_format_round_trips(spark, sf_dir, tmp_path):
    """Every file format in the registries round-trips a frame
    losslessly (ORC/JSON/CSV alongside the default parquet)."""
    from etl_data_pipeline_spark.sinks import write_sink
    from etl_data_pipeline_spark.sources import read_source

    src = read_source(spark, "parquet", "nation", {"dir": sf_dir})
    expected = sorted(r.n_name for r in src.collect())
    for fmt in ("parquet", "orc", "json", "csv"):
        out = str(tmp_path / fmt)
        write_sink(src, fmt, "nation", {"path": out})
        back = read_source(spark, fmt, "nation", {"path": out})
        assert sorted(r.n_name for r in back.collect()) == expected


def test_engine_manifest_facade(spark, tmp_path):
    """The manifest surface through the one-import facade: commit /
    read / change feed / history / cache release."""
    from pyspark.sql import functions as F

    from etl_data_pipeline_spark.engine import EtlEngine

    eng = EtlEngine(spark)
    t = str(tmp_path / "t")
    f = lambda n, tag: spark.range(n).select(
        F.col("id").alias("k"), F.lit(tag).alias("v")
    )
    m1 = eng.commit(f(5, "a"), t)
    eng.commit(f(8, "b"), t, mode="append", merge_keys=("k",))
    assert eng.read_table(t).count() == 8  # keys 0-4 fenced out, 5-7 landed
    assert eng.read_table(t, version=1).count() == 5
    assert eng.read_changes(t, 1).count() == 3
    h = eng.history(t)
    assert [m["version"] for m in h] == [1, 2] and h[0] == m1
    assert eng.release_caches() >= 0
