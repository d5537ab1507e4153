"""Real Structured Streaming tests: file-stream replay of events with
availableNow triggers; batch/stream parity; foreachBatch incremental
sink (the streaming form of the reference loop)."""

import os

import pytest
from pyspark.sql import functions as F

from etl_data_pipeline_spark.session import load_table
from etl_data_pipeline_spark.streaming import jobs
from etl_data_pipeline_spark.watermark import WatermarkStore


@pytest.fixture
def event_chunks(spark, sf_dir, tmp_path):
    """events replayed as 4 parquet chunk files (a file-source feed)."""
    src = str(tmp_path / "stream_src")
    ev = load_table(spark, sf_dir, "events")
    ev.withColumn("chunk", F.col("event_id") % 4).repartition(4, "chunk").drop(
        "chunk"
    ).write.parquet(src)
    return src, ev


def _run_to_memory(spark, stream_df, name, mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_tumbling_batch_stream_parity(spark, event_chunks, tmp_path):
    src, ev = event_chunks
    stream = jobs.events_file_stream(spark, src)
    got = _run_to_memory(
        spark, jobs.tumbling_counts(stream), "t_tumbling", mode="complete"
    )
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    g = {(r.window_start, r.event_type): r.n_events for r in got.collect()}
    b = {(r.window_start, r.event_type): r.n_events for r in batch.collect()}
    assert g == b


def test_stream_dedup_drops_replays(spark, event_chunks, tmp_path):
    src, ev = event_chunks
    # replay the same files again -> duplicate events in the stream dir
    spark.read.parquet(src).write.mode("append").parquet(src)
    stream = jobs.events_file_stream(spark, src, max_files_per_trigger=2)
    got = _run_to_memory(spark, jobs.dedup_stream(stream), "t_dedup")
    assert got.select("event_id").distinct().count() == got.count()
    assert got.count() == ev.count()


def test_session_window_runs(spark, event_chunks):
    src, _ = event_chunks
    stream = jobs.events_file_stream(spark, src)
    got = _run_to_memory(
        spark, jobs.session_counts(stream), "t_session", mode="complete"
    )
    assert got.count() > 0
    assert set(got.columns) == {"user_id", "session_start", "n_events"}


def test_running_user_totals_stateful(spark, event_chunks):
    """applyInPandasWithState: per-user running totals accumulate
    across micro-batches; the max emitted total per user equals the
    batch ground truth."""
    src, ev = event_chunks
    stream = jobs.events_file_stream(spark, src, max_files_per_trigger=2)
    got = _run_to_memory(spark, jobs.running_user_totals(stream), "t_state")
    final = (
        got.groupBy("user_id").agg(F.max("n_events").alias("n_events")).collect()
    )
    truth = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert {r.user_id: r.n_events for r in final} == truth
    # more than one emission per user proves cross-batch statefulness
    assert got.count() > len(truth)


def test_incremental_rollup_matches_batch(spark, event_chunks, tmp_path):
    """Micro-batch-merged rollup == one-shot batch aggregate; a second
    availableNow run over the same source changes nothing (batch-id
    idempotence + checkpoint)."""
    src, ev = event_chunks
    target = str(tmp_path / "rollup_target")
    q = jobs.run_incremental_rollup(spark, src, target)
    q.awaitTermination(120)
    got = spark.read.parquet(os.path.join(target, "rollup_hourly")).drop(
        "last_batch_id"
    )
    truth = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_bucket"), "event_type"
    ).agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
    g = {(r.hour_bucket, r.event_type): (r.n_events, round(r.sum_value, 6))
         for r in got.collect()}
    t = {(r.hour_bucket, r.event_type): (r.n_events, round(r.sum_value, 6))
         for r in truth.collect()}
    assert g == t
    q2 = jobs.run_incremental_rollup(spark, src, target)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(os.path.join(target, "rollup_hourly"))
    assert got2.count() == got.count()
    assert got2.agg(F.sum("n_events")).first()[0] == ev.count()


def test_stream_stream_join_matches_batch(spark, event_chunks):
    """Stream-stream join result == the same join run in batch."""
    src, ev = event_chunks
    stream = jobs.events_file_stream(spark, src, max_files_per_trigger=2)
    purchases = stream.filter(F.col("event_type") == "purchase")
    views = stream.filter(F.col("event_type") == "view")
    got = _run_to_memory(
        spark,
        jobs.stream_stream_attribution_join(purchases, views),
        "t_ssjoin",
    )
    bp = ev.filter(F.col("event_type") == "purchase")
    bv = ev.filter(F.col("event_type") == "view")
    batch = jobs.stream_stream_attribution_join(bp, bv)  # same fn works on batch dfs
    assert got.count() > 0
    assert got.count() == batch.count()


def test_foreach_batch_incremental_sink(spark, event_chunks, tmp_path):
    """Micro-batch incremental load: appends + watermark-store advance
    per batch (streaming replacement of app.py:141-172)."""
    src, ev = event_chunks
    target = str(tmp_path / "target")
    state = str(tmp_path / "state.json")
    q = jobs.run_incremental_micro_batch(spark, src, target, state)
    q.awaitTermination(120)
    store = WatermarkStore(state)
    sunk = spark.read.parquet(os.path.join(target, "events"))
    assert sunk.count() == ev.count()
    assert store.get("events") == str(ev.agg(F.max("event_id")).first()[0])
    # second availableNow run over the same source: checkpoint says
    # nothing new -> no duplicates
    q2 = jobs.run_incremental_micro_batch(spark, src, target, state)
    q2.awaitTermination(120)
    assert spark.read.parquet(os.path.join(target, "events")).count() == ev.count()


def test_conversion_sessions_stateful(spark, tmp_path):
    """Custom gap-OR-purchase sessionizer: closed sessions across
    TIME-ORDERED micro-batches must equal a Python reference run over
    the full per-user ordered event log (sessions straddling batch
    boundaries prove the cross-batch state)."""
    import os

    from etl_data_pipeline_spark.session import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    src = os.path.join(str(tmp_path), "ordered_src")
    # four files split by TIME quartile so arrival order == event order
    q = ev.selectExpr("percentile(unix_timestamp(ts), array(0.25, 0.5, 0.75)) p").first().p
    chunks = [
        ev.filter(F.unix_timestamp("ts") <= q[0]),
        ev.filter((F.unix_timestamp("ts") > q[0]) & (F.unix_timestamp("ts") <= q[1])),
        ev.filter((F.unix_timestamp("ts") > q[1]) & (F.unix_timestamp("ts") <= q[2])),
        ev.filter(F.unix_timestamp("ts") > q[2]),
    ]
    for i, c in enumerate(chunks):
        c.coalesce(1).write.mode("append").parquet(src)

    stream = jobs.events_file_stream(spark, src, max_files_per_trigger=1)
    got = _run_to_memory(
        spark, jobs.conversion_sessions(stream, gap_secs=1800), "t_conv_sessions"
    )
    got_set = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events, r.ended_by)
        for r in got.collect()
    }

    # Python reference over the fully-ordered log
    expected = set()
    rows = sorted(
        ev.collect(), key=lambda r: (r.user_id, r.ts, r.event_id)
    )
    from itertools import groupby

    for uid, it in groupby(rows, key=lambda r: r.user_id):
        start = last = None
        n = 0
        for r in it:
            if start is not None and (r.ts - last).total_seconds() > 1800:
                expected.add((uid, str(start), str(last), n, "gap"))
                start = None
            if start is None:
                start, n = r.ts, 0
            last = r.ts
            n += 1
            if r.event_type == "purchase":
                expected.add((uid, str(start), str(r.ts), n, "purchase"))
                start, n = None, 0
        # trailing open session is never emitted — state holds it
    assert got_set == expected
    assert any(e[4] == "purchase" for e in expected)
    assert any(e[4] == "gap" for e in expected)
