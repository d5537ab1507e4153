"""Property-based watermark invariant (SURVEY.md §5.4, hypothesis):
for ANY batch split of an insert sequence, with arbitrary crash-replays
(lost watermark writes) interleaved, the incremental pipeline's sink
equals the full dataset exactly once and the watermark lands on max id.
"""

import os
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_data_pipeline_spark.pipeline import IncrementalPipeline
from etl_data_pipeline_spark.spec import PipelineSpec, TableSpec
from etl_data_pipeline_spark.watermark import WatermarkStore


@st.composite
def batch_plan(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    n_batches = draw(st.integers(min_value=1, max_value=4))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=n),
                min_size=n_batches - 1,
                max_size=n_batches - 1,
            )
        )
    )
    bounds = [0] + cuts + [n]
    batches = [list(range(lo, hi)) for lo, hi in zip(bounds, bounds[1:])]
    crash_after = draw(
        st.lists(st.booleans(), min_size=len(batches), max_size=len(batches))
    )
    return batches, crash_after


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(plan=batch_plan())
def test_incremental_equals_full_under_any_split(spark, plan):
    batches, crash_after = plan
    total = sum(len(b) for b in batches)
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        spec = PipelineSpec(
            tables=[
                TableSpec(
                    name="t",
                    watermark_column="id",
                    watermark_type="id",
                    source_options={"dir": src},
                    sink_options={"dir": os.path.join(tmp, "sink")},
                    merge_keys=("id",),
                )
            ]
        )
        store = WatermarkStore(os.path.join(tmp, "state.json"))
        pipe = IncrementalPipeline(spark, spec, store)
        for ids, crash in zip(batches, crash_after):
            if ids:
                spark.createDataFrame(
                    [(i, i * 10) for i in ids], "id long, value long"
                ).write.mode("append").parquet(os.path.join(src, "t.parquet"))
            elif not os.path.exists(os.path.join(src, "t.parquet")):
                continue  # nothing ever written yet — source doesn't exist
            pipe.run()
            if crash:
                store.clear("t")  # lost watermark write -> next run replays
                pipe.run()
        if total == 0:
            return
        sink = spark.read.parquet(os.path.join(tmp, "sink", "t"))
        got = sorted(r.id for r in sink.select("id").collect())
        assert got == list(range(total))  # every row exactly once
        assert store.get("t") == str(total - 1)
