"""Python DataSource over manifest tables (streaming/manifest_source):
batch snapshot + time travel through spark.read, and the version-offset
streaming change feed through spark.readStream."""

import os

import pytest
from pyspark.sql import functions as F

from etl_data_pipeline_spark.sinks.manifest import commit, compact, read_manifest
from etl_data_pipeline_spark.streaming import manifest_source


@pytest.fixture(autouse=True)
def _register(spark):
    manifest_source.register(spark)


def _frame(spark, n, tag, base=0):
    return spark.range(base, base + n).select(
        F.col("id").alias("k"), F.lit(tag).alias("v")
    )


def test_batch_read_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    commit(_frame(spark, 5, "a"), t)
    commit(_frame(spark, 8, "b", base=100), t, mode="append")
    df = spark.read.format("manifest_table").option("path", t).load()
    assert df.schema.simpleString() == "struct<k:bigint,v:string>"
    assert df.count() == 13
    v1 = spark.read.format("manifest_table").option("path", t).option("version", 1).load()
    assert v1.count() == 5 and v1.select("v").distinct().first().v == "a"


def test_batch_read_typed_columns_roundtrip(spark, sf_dir, tmp_path):
    """Arrow-side type mapping: timestamps, arrays, doubles survive the
    DataSource byte-for-byte vs a direct parquet read."""
    t = str(tmp_path / "t")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).limit(200)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).limit(50)
    joined = ev.select("event_id", "user_id", "ts", "value").crossJoin(
        emb.select("embedding").limit(1)
    )
    commit(joined, t)
    back = spark.read.format("manifest_table").option("path", t).load()
    assert back.schema == joined.schema
    a = sorted(joined.collect(), key=lambda r: r.event_id)
    b = sorted(back.collect(), key=lambda r: r.event_id)
    assert a == b


def test_stream_feed_delivers_only_new_versions(spark, tmp_path):
    """Offsets are manifest versions: a restarted query (same
    checkpoint) sees ONLY versions committed since it last ran, and a
    compaction delivers nothing."""
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    commit(_frame(spark, 5, "a"), t)

    def run_once():
        q = (
            spark.readStream.format("manifest_table").option("path", t).load()
            .writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(sink)

    assert run_once().count() == 5

    commit(_frame(spark, 3, "b", base=50), t, mode="append")
    compact(spark, t)  # layout-only: must deliver nothing extra
    commit(_frame(spark, 2, "c", base=90), t, mode="append")

    out2 = run_once()  # SAME checkpoint: only the new versions arrive
    assert out2.count() == 5 + 3 + 2  # no compaction re-delivery
    news = {(r.k, r.v) for r in out2.filter("v != 'a'").collect()}
    assert news == {(50, "b"), (51, "b"), (52, "b"), (90, "c"), (91, "c")}

    # caught up: an immediate re-run delivers nothing
    assert run_once().count() == 10


def test_stream_feed_starting_version(spark, tmp_path):
    t = str(tmp_path / "t")
    commit(_frame(spark, 5, "a"), t)
    commit(_frame(spark, 3, "b", base=50), t, mode="append")
    q = (
        spark.readStream.format("manifest_table")
        .option("path", t).option("startingVersion", 1).load()
        .writeStream.format("memory").queryName("from_v1")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.table("from_v1").count() == 3  # only version 2's delta


def test_stream_feed_overwrite_fails_loudly(spark, tmp_path):
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    commit(_frame(spark, 4, "a"), t)

    def run_once():
        q = (
            spark.readStream.format("manifest_table").option("path", t).load()
            .writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    commit(_frame(spark, 9, "rebuilt"), t)  # overwrite
    with pytest.raises(Exception, match="broken by an overwrite"):
        run_once()


def test_batch_read_reads_evolved_old_files_nullfilled(spark, tmp_path):
    """Old delta files lack evolved columns; the Arrow reader
    null-fills them per file under the current schema."""
    t = str(tmp_path / "t")
    commit(_frame(spark, 3, "a"), t)
    commit(
        _frame(spark, 2, "b", base=10).withColumn("extra", F.lit(7)),
        t,
        mode="append",
        merge_schema=True,
    )
    df = spark.read.format("manifest_table").option("path", t).load()
    assert set(df.columns) == {"k", "v", "extra"}
    assert df.filter("extra IS NULL").count() == 3
    assert df.filter("extra = 7").count() == 2


def test_batch_writer_append_and_overwrite(spark, tmp_path):
    """df.write.format('manifest_table'): executor-staged files publish
    as one atomic commit; append is schema-checked, overwrite
    snapshots; no staging debris on success."""
    t = str(tmp_path / "t")
    _frame(spark, 5, "a").write.format("manifest_table").option("path", t).mode(
        "append"
    ).save()
    _frame(spark, 3, "b", base=50).write.format("manifest_table").option(
        "path", t
    ).mode("append").save()
    m = read_manifest(t)
    assert m["version"] == 2
    assert spark.read.format("manifest_table").option("path", t).load().count() == 8
    # schema drift without mergeSchema: fail loudly, nothing committed
    drifted = _frame(spark, 2, "x").withColumn("extra", F.lit(1))
    with pytest.raises(Exception, match="drifts the schema"):
        drifted.write.format("manifest_table").option("path", t).mode("append").save()
    assert read_manifest(t)["version"] == 2
    assert os.listdir(os.path.join(t, "_staging")) == []  # staging cleaned
    # opt-in evolution
    drifted.write.format("manifest_table").option("path", t).option(
        "mergeSchema", "true"
    ).mode("append").save()
    out = spark.read.format("manifest_table").option("path", t).load()
    assert set(out.columns) == {"k", "v", "extra"}
    assert out.filter("extra IS NULL").count() == 8
    # overwrite snapshots
    _frame(spark, 4, "z").write.format("manifest_table").option("path", t).mode(
        "overwrite"
    ).save()
    assert spark.read.format("manifest_table").option("path", t).load().count() == 4


def test_stream_writer_exactly_once(spark, tmp_path):
    """df.writeStream.format('manifest_table'): one commit per batch id
    under the txn fence; a forced replay (fresh checkpoint, same
    appId) is fenced out file-for-file."""
    from etl_data_pipeline_spark.sinks.manifest import read_table

    t = str(tmp_path / "t")
    src = str(tmp_path / "src")
    ev = _frame(spark, 20, "s").repartition(4)
    ev.write.parquet(src)

    def run(ckpt):
        stream = (
            spark.readStream.schema("k BIGINT, v STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.format("manifest_table")
            .option("path", t).option("appId", "ingest")
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("ck1")
    m = read_manifest(t)
    assert read_table(spark, t).count() == 20
    n_files = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert m["txn"] == {"ingest": n_files - 1}

    run("ck2")  # forced full replay with the same app
    assert read_manifest(t)["version"] == m["version"]  # nothing re-landed
    assert read_table(spark, t).count() == 20
    assert os.listdir(os.path.join(t, "_staging")) == []  # replays cleaned up


def test_batch_reader_filter_pushdown(spark, tmp_path):
    """pushFilters: simple predicates prune executor-side via pyarrow
    row-group statistics; results are identical to the unfiltered path
    (Spark re-evaluates every filter — pruning is never the
    correctness boundary), including filters on evolved columns old
    files predate."""
    t = str(tmp_path / "t")
    commit(_frame(spark, 1000, "a").repartition(4), t)
    commit(
        _frame(spark, 100, "b", base=5000).withColumn("extra", F.lit(1)),
        t,
        mode="append",
        merge_schema=True,
    )
    df = spark.read.format("manifest_table").option("path", t).load()
    assert df.filter("k >= 900 AND k < 5050").count() == 100 + 50
    assert df.filter(F.col("v") == "b").count() == 100
    assert df.filter("k IN (3, 5000, 5001)").count() == 3
    # evolved column: old files are all-null for it
    assert df.filter("extra IS NULL").count() == 1000
    assert df.filter("extra = 1").count() == 100
    assert df.filter("extra IS NOT NULL AND k < 5010").count() == 10


def test_golden_path_pipeline_to_stream_composition(spark, sf_dir, tmp_path):
    """The composed system, end to end: an incremental PIPELINE loads
    parquet deltas into a manifest table (content-fenced appends); a
    STREAMING query over the manifest_table DataSource consumes the
    change feed into a downstream aggregate; compaction and vacuum run
    between micro-batches. Exactly-once everywhere: the downstream
    total equals the source exactly, across restarts."""
    from etl_data_pipeline_spark.pipeline import IncrementalPipeline
    from etl_data_pipeline_spark.sinks.manifest import vacuum
    from etl_data_pipeline_spark.sinks.manifest import compact as mcompact
    from etl_data_pipeline_spark.spec import PipelineSpec, TableSpec
    from etl_data_pipeline_spark.watermark import WatermarkStore

    src = str(tmp_path / "src")
    table = str(tmp_path / "sink" / "orders")
    down = str(tmp_path / "down")
    ckpt = str(tmp_path / "ckpt")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    orders.filter(F.col("o_orderkey") < 500).write.parquet(
        os.path.join(src, "orders.parquet")
    )

    spec = PipelineSpec(
        tables=[
            TableSpec(
                name="orders",
                watermark_column="o_orderkey",
                watermark_type="id",
                source_options={"dir": src},
                sink_format="manifest",
                sink_options={"dir": str(tmp_path / "sink")},
                merge_keys=("o_orderkey",),
            )
        ]
    )
    pipe = IncrementalPipeline(spark, spec, WatermarkStore(tmp_path / "wm.json"))

    def drain():
        q = (
            spark.readStream.format("manifest_table").option("path", table).load()
            .writeStream.format("parquet").option("path", down)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(down)

    assert pipe.run()[0].status == "loaded"
    assert drain().count() == 500

    # wave 2 arrives; table is compacted and vacuumed behind the stream
    orders.filter(
        (F.col("o_orderkey") >= 500) & (F.col("o_orderkey") < 1100)
    ).write.mode("append").parquet(os.path.join(src, "orders.parquet"))
    assert pipe.run()[0].status == "loaded"
    mcompact(spark, table)
    vacuum(table, keep_last=3)  # retention outlasts the consumer's lag

    orders.filter(F.col("o_orderkey") >= 1100).write.mode("append").parquet(
        os.path.join(src, "orders.parquet")
    )
    assert pipe.run()[0].status == "loaded"

    out = drain()
    assert out.count() == orders.count()  # exactly once, no gaps
    assert out.select("o_orderkey").distinct().count() == orders.count()
    # downstream aggregate agrees with the source of truth
    got = out.agg(F.sum("o_totalprice")).first()[0]
    want = orders.agg(F.sum("o_totalprice")).first()[0]
    assert abs(got - want) < 1e-6


def test_datasource_partitioned_table_reads_and_prunes(spark, tmp_path):
    """DataSource over a hive-partitioned manifest table: partition
    values are injected from paths with the recorded types (incl. the
    null partition), filters on partition columns prune whole files at
    PLAN time, and the streaming feed carries partition columns too."""
    t = str(tmp_path / "t")
    df = spark.range(90).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("bucket"),
        F.lit("a").alias("v"),
    )
    commit(df, t, partition_by=("bucket",))
    # a null-partition delta
    commit(
        spark.createDataFrame([(1000, None, "n")], "k BIGINT, bucket INT, v STRING"),
        t,
        mode="append",
    )
    out = spark.read.format("manifest_table").option("path", t).load()
    assert out.schema.simpleString() == "struct<k:bigint,bucket:int,v:string>"
    assert out.count() == 91
    assert out.filter("bucket = 2").count() == 30  # typed partition compare
    assert out.filter("bucket IS NULL").count() == 1
    assert out.filter("bucket >= 1 AND k < 10").count() == 6
    # streaming feed over the partitioned deltas
    q = (
        spark.readStream.format("manifest_table").option("path", t).load()
        .writeStream.format("memory").queryName("pfeed")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    feed = spark.table("pfeed")
    assert feed.count() == 91
    assert feed.filter("bucket = 0").count() == 30


def _zordered_range_frame(spark, lo, hi):
    """One ingest batch covering [lo, hi): files laid out by the
    z-order idiom (morton key of the two filter columns), so parquet
    footer min/max on k is narrow per file AND per delta dir."""
    from etl_data_pipeline_spark.sinks import morton_key

    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 97).alias("k2"),
            F.lit(f"r{lo}").alias("v"),
        )
        .withColumn("__z", morton_key(F.col("k"), F.col("k2")))
        .repartitionByRange(2, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def test_batch_reader_stats_prune_whole_dirs(spark, tmp_path):
    """Dir-level IO pruning from the cached footer-stats sidecar: on a
    table of z-ordered ingest batches, a selective filter must yield
    PARTITIONS from a strict subset of delta dirs (fewer tasks, less
    IO at 100 TB), while results stay identical to the unfiltered
    read (Spark re-evaluates every filter)."""
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

    from etl_data_pipeline_spark.streaming.manifest_source import (
        ManifestBatchReader,
    )

    t = str(tmp_path / "t")
    for lo in (0, 1000, 2000, 3000):
        commit(_zordered_range_frame(spark, lo, lo + 1000), t,
               mode="append" if lo else "overwrite")
    dirs = read_manifest(t)["dirs"]
    assert len(dirs) == 4

    full = ManifestBatchReader({"path": t})
    n_full = len(full.partitions())

    pruned = ManifestBatchReader({"path": t})
    kept_filters = list(pruned.pushFilters([
        GreaterThanOrEqual(("k",), 2100), LessThanOrEqual(("k",), 2200),
    ]))
    assert len(kept_filters) == 2  # Spark re-evaluates everything
    parts = pruned.partitions()
    assert 0 < len(parts) < n_full
    # every surviving partition comes from the ONE dir that can hold
    # k in [2100, 2200]
    touched = {p.file_path for p in parts}
    other_dirs = [d for d in dirs if all(os.path.join(t, d) + os.sep
                                         not in f for f in touched)]
    assert len(other_dirs) == 3, (dirs, touched)

    # end-to-end: filtered result equals the brute-force answer
    df = spark.read.format("manifest_table").option("path", t).load()
    got = df.filter("k >= 2100 AND k <= 2200")
    assert got.count() == 101
    assert got.agg(F.min("k"), F.max("k")).first() == (2100, 2200)


def test_stats_pruning_never_wrong_on_unknown_columns(spark, tmp_path):
    """Filters on columns with no usable stats (strings written across
    commits, hive-partition-style values) must not prune anything
    incorrectly — equality with the unfiltered+filter answer."""
    t = str(tmp_path / "t")
    for lo in (0, 500):
        commit(_zordered_range_frame(spark, lo, lo + 500), t,
               mode="append" if lo else "overwrite")
    df = spark.read.format("manifest_table").option("path", t).load()
    assert df.filter(F.col("v") == "r500").count() == 500
    assert df.filter("k = 250 AND v = 'r0'").count() == 1
    assert df.filter("k IN (10, 510)").count() == 2
    assert df.filter("k > 10000").count() == 0
