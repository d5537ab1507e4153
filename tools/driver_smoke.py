"""Mimic the driver: import __spark_entry__, smoke entry(spark), then
exercise the IncrementalPipeline end-to-end (two runs + no-op run)."""

import sys, tempfile, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as em
from etl_data_pipeline_spark.session import get_spark
from etl_data_pipeline_spark.spec import PipelineSpec, TableSpec
from etl_data_pipeline_spark.watermark import WatermarkStore
from etl_data_pipeline_spark.pipeline import IncrementalPipeline

spark = get_spark("driver-smoke", shuffle_partitions=4)

# 1. entry() smoke — exactly what the driver does
df = em.entry(spark)
rows = df.collect()
print("entry() ->", df.schema.simpleString())
for r in rows:
    print("  ", r)
assert len(rows) > 0

# 2. registry sanity
qs, osql = em.queries(), em.oracle_sql()
print(f"queries: {len(qs)}, oracles: {len(osql)}, rows-only: {sorted(set(qs)-set(osql))}")

# 3. pipeline end-to-end: incremental copy of orders into a temp sink
tmp = tempfile.mkdtemp(prefix="etl_sink_")
store = WatermarkStore(os.path.join(tmp, "state.json"))
spec = PipelineSpec(tables=[
    TableSpec(name="orders", watermark_column="o_orderkey", watermark_type="id",
              source_options={"dir": "/root/testdata/sf0.001"},
              sink_options={"dir": tmp}, merge_keys=("o_orderkey",)),
    TableSpec(name="nation",  # full-load table
              source_options={"dir": "/root/testdata/sf0.001"},
              sink_options={"dir": tmp}),
])
pipe = IncrementalPipeline(spark, spec, store)
r1 = pipe.run()
print("run1:", r1)
n1 = spark.read.parquet(os.path.join(tmp, "orders")).count()
wm1 = store.get("orders")
print(f"  sink rows={n1}, watermark={wm1}")
assert n1 == 1500 and wm1 == "1499", (n1, wm1)

# second run: no new source rows -> empty gate, watermark unchanged
r2 = pipe.run()
print("run2:", r2)
assert [x.status for x in r2 if x.table == "orders"] == ["skipped_empty"]
n2 = spark.read.parquet(os.path.join(tmp, "orders")).count()
assert n2 == 1500, n2
assert store.get("orders") == "1499"

# replay-safety probe: clear the watermark (simulates crash before
# state write) -> rerun -> idempotent sink must NOT duplicate
store.clear("orders")
r3 = pipe.run()
n3 = spark.read.parquet(os.path.join(tmp, "orders")).count()
print("run3 (replay):", [x.status for x in r3], "rows:", n3)
assert n3 == 1500, f"replay duplicated rows: {n3}"

# error-isolation probe: one bad table must not stop others
spec2 = PipelineSpec(tables=[
    TableSpec(name="nonexistent", source_options={"dir": "/root/testdata/sf0.001"},
              sink_options={"dir": tmp}),
    TableSpec(name="region", source_options={"dir": "/root/testdata/sf0.001"},
              sink_options={"dir": tmp}),
])
r4 = IncrementalPipeline(spark, spec2, store).run()
print("run4 (isolation):", [(x.table, x.status) for x in r4])
statuses = {x.table: x.status for x in r4}
assert statuses["nonexistent"] == "failed" and statuses["region"] == "loaded"


# 5. manifest round-trip smoke: commit -> standard-API read -> feed ->
# version-keyed pipeline (round-5 surface)
from etl_data_pipeline_spark.sinks.manifest import commit as mcommit, read_manifest
from etl_data_pipeline_spark.streaming import manifest_source

manifest_source.register(spark)
mt = os.path.join(tmp, "morders")
src_orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
mcommit(src_orders.filter("o_orderkey < 1000"), mt)
mcommit(src_orders.filter("o_orderkey >= 1000"), mt, mode="append")
m = read_manifest(mt)
back = spark.read.format("manifest_table").option("path", mt).load()
assert back.count() == 1500 and m["version"] == 2 and m["total_rows"] == 1500
vpipe = IncrementalPipeline(
    spark,
    PipelineSpec(tables=[TableSpec(
        name="morders", watermark_type="version", source_format="manifest",
        source_options={"dir": tmp}, sink_options={"dir": os.path.join(tmp, "down")},
        merge_keys=("o_orderkey",))]),
    WatermarkStore(os.path.join(tmp, "vstate.json")),
)
rv = vpipe.run()
assert rv[0].status == "loaded" and rv[0].new_watermark == 2, rv
assert spark.read.parquet(os.path.join(tmp, "down", "morders")).count() == 1500
assert vpipe.run()[0].status == "skipped_empty"
print("manifest round-trip: OK (v2, 1500 rows, version-feed caught up)")

print("DRIVER SMOKE: ALL OK")
