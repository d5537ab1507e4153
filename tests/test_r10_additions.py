"""Round-10 additions: kmeans/IVF bucket-miss coverage + rescue
(VERDICT r9 item 3) and the clustered-corpus ANN recall fixture
(item 1)."""

import pytest
from pyspark.sql import functions as F


def test_kmeans_coverage_invariants(spark, sf_dir):
    from etl_data_pipeline_spark.llm.similarity import embedding_kmeans_coverage

    row = embedding_kmeans_coverage(spark, sf_dir).first()
    assert row.total_vectors > 0
    assert row.n_assigned + row.n_missed == row.total_vectors
    assert 0 <= row.n_rescued <= row.n_missed
    assert row.n_still_missed == row.n_missed - row.n_rescued
    assert row.final_miss_frac <= row.miss_frac


def test_kmeans_coverage_rescue_touches_only_misses(spark, sf_dir, monkeypatch):
    """The rescue round's input must be the anti-joined remainder —
    O(misses), never the whole corpus (a full-corpus second round
    would reintroduce the O(N·K) shape the shortlist kernel exists to
    avoid). Pin by intercepting the seed_offset=RESCUE call and
    checking its vector set is exactly the first round's misses."""
    import etl_data_pipeline_spark.llm.dedup as dd
    from etl_data_pipeline_spark.llm.similarity import (
        KMEANS_RESCUE_SEED_OFFSET,
        embedding_kmeans_coverage,
    )

    real = dd.sem_scored
    captured = {}

    def spy(e, c0, n_centroids=None, seed_offset=dd.SEM_SEED_OFFSET):
        if seed_offset == KMEANS_RESCUE_SEED_OFFSET:
            captured["ids"] = {r.vec_id for r in e.select("vec_id").collect()}
        return real(e, c0, n_centroids, seed_offset)

    monkeypatch.setattr(dd, "sem_scored", spy)
    row = embedding_kmeans_coverage(spark, sf_dir).first()
    assert "ids" in captured, "rescue round never ran"
    assert len(captured["ids"]) == row.n_missed  # only the misses


def test_kmeans_coverage_column_types(spark, sf_dir):
    """Counts stay BIGINT and fractions DOUBLE — the dtype-faithful
    oracle gate compares types, and DuckDB's sum(int)->HUGEINT trap is
    why the Spark side uses count(), not sum()."""
    from etl_data_pipeline_spark.llm.similarity import embedding_kmeans_coverage

    df = embedding_kmeans_coverage(spark, sf_dir)
    types = dict(df.dtypes)
    for c in ("total_vectors", "n_assigned", "n_missed", "n_rescued",
              "n_still_missed"):
        assert types[c] == "bigint", (c, types[c])
    for c in ("miss_frac", "final_miss_frac"):
        assert types[c] == "double", (c, types[c])


def test_vacuum_safe_during_live_ann_ingest(spark, sf_dir, tmp_path):
    """VERDICT r9 item 5: vacuum() against a LIVE streaming appender.
    The writer lease serializes vacuum with commits, so a vacuum
    running concurrently with run_incremental_ann_index must never
    delete a dir any retained version references — the drained table
    still equals the batch build's layout, and history is folded to
    the retention window."""
    import glob as _glob
    import os
    import shutil
    import threading

    from pyspark.sql import functions as F

    from etl_data_pipeline_spark.llm import similarity
    from etl_data_pipeline_spark.session import load_table
    from etl_data_pipeline_spark.sinks import manifest
    from etl_data_pipeline_spark.streaming import jobs

    src = str(tmp_path / "vec_src")
    tgt = str(tmp_path / "ann_tgt")
    stage = str(tmp_path / "vec_stage")
    os.makedirs(src)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label"
    )
    for c in range(5):
        stage_d = os.path.join(stage, f"c{c}")
        emb.filter(F.col("vec_id") % 5 == c).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage_d)
        shutil.move(
            _glob.glob(os.path.join(stage_d, "part-*.parquet"))[0],
            os.path.join(src, f"chunk_{c}.parquet"),
        )

    table_dir = os.path.join(tgt, "ann_index")
    stop = threading.Event()
    vacuumed: list[int] = []

    def hammer():
        while not stop.is_set():
            if manifest.read_manifest(table_dir) is not None:
                vacuumed.extend(manifest.vacuum(table_dir, keep_last=2))
            stop.wait(0.2)

    th = threading.Thread(target=hammer, daemon=True)
    th.start()
    try:
        q = jobs.run_incremental_ann_index(
            spark, src, tgt, sf_dir, app_id="ann_vacuum_soak", compact_every=2
        )
        q.awaitTermination(300)
    finally:
        stop.set()
        th.join(timeout=30)
    # one more vacuum at rest: the final state must also be prunable
    manifest.vacuum(table_dir, keep_last=2)

    idx_dir = str(tmp_path / "batch_index")
    similarity.write_ivf_index(spark, sf_dir, idx_dir)
    want = sorted(
        map(
            tuple,
            spark.read.schema(similarity.IVF_INDEX_SCHEMA)
            .parquet(idx_dir)
            .select("vec_id", "cell", "label")
            .collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            manifest.read_table(spark, table_dir)
            .select("vec_id", "cell", "label")
            .collect(),
        )
    )
    assert got == want and got
    # retention actually enforced: at most keep_last snapshots remain
    mdir = os.path.join(table_dir, "_manifests")
    assert len([f for f in os.listdir(mdir) if f.endswith(".json")]) <= 2


def test_entropy_blocks_bounded_on_random_digit_corpus(spark, tmp_path):
    """VERDICT r9 item 6 (assert half): on a realistic random-digit
    key corpus the two-level entropy blocks stay small — the sf3
    sequential-id tier's big blocks are a corpus artifact, not an
    operator property. 5 000 hash-random 9-digit keys must produce a
    max block orders below the 50 000 cap (the 450k-row probe reads
    max 73; at 5k the bound is tighter still)."""
    from pyspark.sql import functions as F

    from etl_data_pipeline_spark.llm import dedup

    n9 = F.lpad(
        (F.abs(F.xxhash64(F.col("id"), F.lit(7))) % 1_000_000_000).cast("string"),
        9,
        "0",
    )
    cust = spark.range(5000).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), n9).alias("c_name"),
    )
    cust.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    keyed = dedup._entropy_keyed(spark, str(tmp_path))
    max_block = (
        keyed.groupBy("seg", "seg_val")
        .agg(F.count("*").alias("sz"))
        .agg(F.max("sz"))
        .first()[0]
    )
    assert max_block < 100, max_block


class _FakeSqlEx:
    def __init__(self, state, code=0):
        self._s, self._c = state, code

    def getSQLState(self):
        return self._s

    def getErrorCode(self):
        return self._c

    def getCause(self):
        return None


class _FakeErr(Exception):
    def __init__(self, state, code=0):
        super().__init__(f"SQLSTATE {state}")
        self.java_exception = _FakeSqlEx(state, code)


def test_pipeline_classifies_jdbc_failures(spark, tmp_path):
    """TableRunResult carries error_class when the failure chain holds
    a JDBC SQLSTATE: fatal states surface as 'fatal', and with
    transient_retries a 'retryable' state retries in-run (safe: no
    watermark advanced, idempotent sinks)."""
    from etl_data_pipeline_spark.pipeline import IncrementalPipeline
    from etl_data_pipeline_spark.spec import PipelineSpec, TableSpec
    from etl_data_pipeline_spark.watermark import WatermarkStore

    t = TableSpec(name="kv", source_format="parquet",
                  source_options={"dir": str(tmp_path)},
                  sink_options={"dir": str(tmp_path / "sink")})
    spec = PipelineSpec(tables=[t], transient_retries=2)
    pipe = IncrementalPipeline(
        spark, spec, WatermarkStore(tmp_path / "wm.json")
    )

    # fatal: no retry, classified
    pipe.run_table = lambda _t: (_ for _ in ()).throw(_FakeErr("23505"))
    r = pipe._run_table_isolated(t)
    assert r.status == "failed" and r.error_class == "fatal"

    # retryable: fails twice with a deadlock state, third attempt wins
    calls = {"n": 0}

    def flaky(_t):
        calls["n"] += 1
        if calls["n"] < 3:
            raise _FakeErr("40001")
        from etl_data_pipeline_spark.pipeline import TableRunResult

        return TableRunResult(_t.name, "loaded")

    pipe.run_table = flaky
    r = pipe._run_table_isolated(t)
    assert r.status == "loaded" and calls["n"] == 3

    # retryable but retries exhausted: classified failure
    calls["n"] = -10  # never reaches 3 within the attempt budget
    r = pipe._run_table_isolated(t)
    assert r.status == "failed" and r.error_class == "retryable"

    # non-JDBC failure: no classification
    pipe.run_table = lambda _t: (_ for _ in ()).throw(ValueError("boom"))
    r = pipe._run_table_isolated(t)
    assert r.status == "failed" and r.error_class is None


def test_incremental_classifier_scores_stream(spark, sf_dir, tmp_path):
    """Streaming classifier scoring (run_incremental_classifier_scores):
    the corpus arrives in 3 chunks; after the drain the manifest table
    holds EXACTLY classifier_score_corpus's rows for the same corpus
    (per-row featurization ⇒ streamed score == batch score), and a
    second availableNow run over the same source is a txn-fenced
    no-op (same manifest version)."""
    import glob as _glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from etl_data_pipeline_spark.llm.features import classifier_score_corpus
    from etl_data_pipeline_spark.session import load_table
    from etl_data_pipeline_spark.sinks import manifest
    from etl_data_pipeline_spark.streaming import jobs

    src = str(tmp_path / "doc_src")
    tgt = str(tmp_path / "clf_tgt")
    stage = str(tmp_path / "doc_stage")
    os.makedirs(src)
    docs = load_table(spark, sf_dir, "documents")
    for c in range(3):
        stage_d = os.path.join(stage, f"c{c}")
        docs.filter(F.col("doc_id") % 3 == c).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage_d)
        shutil.move(
            _glob.glob(os.path.join(stage_d, "part-*.parquet"))[0],
            os.path.join(src, f"chunk_{c}.parquet"),
        )

    q = jobs.run_incremental_classifier_scores(spark, src, tgt, sf_dir)
    q.awaitTermination(300)

    table_dir = os.path.join(tgt, "clf_scores")
    got = sorted(
        map(tuple, manifest.read_table(spark, table_dir).collect())
    )
    want = sorted(map(tuple, classifier_score_corpus(spark, sf_dir).collect()))
    assert got == want and got

    v_before = manifest.read_manifest(table_dir)["version"]
    q2 = jobs.run_incremental_classifier_scores(spark, src, tgt, sf_dir)
    q2.awaitTermination(300)
    assert manifest.read_manifest(table_dir)["version"] == v_before  # replay no-op
