"""Round-9 additions: the trained-centroid IVF pair.

sim_ann_ivf_trained runs one spherical-k-means (Lloyd) refinement over
the seed centroid sample — with the TRAINING assignment itself routed
through the shortlist kernel, not a dense corpus × centroids join —
then cell-assigns and answers top-3 per query at nprobe=1.
sim_ann_ivf_trained_recall is its accountability curve, directly
comparable to sim_ann_recall's untrained one (measured at sf0.1:
0.083/0.133/0.167 untrained → 0.133/0.150/0.233 trained).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_data_pipeline_spark.llm import similarity
from etl_data_pipeline_spark.session import load_table


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _r6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_trained_ivf_matches_numpy_pipeline(spark, sf_dir):
    """End-to-end NumPy replica of the trained pipeline: shortlist
    assignment to the seed sample (count-derived mask), per-cluster
    rounded means, shortlist assignment to the refined centroids (its
    OWN count-derived mask), in-cell exact top-3 with deterministic
    tiebreaks. Pins both Lloyd arithmetic and the two mask
    derivations."""
    import numpy as np

    from etl_data_pipeline_spark.llm.dedup import (
        SEM_LSH_MAX_PLANES,
        SEM_LSH_TABLES,
        SEM_SEED_OFFSET,
        _sem_planes_used,
    )

    out = {
        (r.query_id, r.rank): (r.cell, r.vec_id, r.cosine)
        for r in similarity.sim_ann_ivf_trained(spark, sf_dir).collect()
    }
    rows = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}

    table_planes = [
        similarity._planes(
            SEM_LSH_MAX_PLANES, seed=similarity.PLANES_SEED + SEM_SEED_OFFSET + t
        )
        for t in range(SEM_LSH_TABLES)
    ]

    def buckets(v, mask):
        return {
            (t, sum(1 << i for i, p in enumerate(planes)
                    if float(np.dot(v, np.array(p))) > 0) % mask)
            for t, planes in enumerate(table_planes)
        }

    def cos6(a, b):
        return _r6(
            float(np.dot(a, b))
            / (math.sqrt(float(np.dot(a, a))) * math.sqrt(float(np.dot(b, b))))
        )

    def assign(cents):
        mask = 1 << _sem_planes_used(len(cents))
        cb = {cid: buckets(cv, mask) for cid, cv in cents.items()}
        cells = {}
        for vid, v in vecs.items():
            vb = buckets(v, mask)
            short = [c for c, bs in cb.items() if bs & vb]
            if short:
                cells[vid] = min((-cos6(cents[c], v), c) for c in short)[1]
        return cells

    seeds = {
        vid: v
        for vid, v in vecs.items()
        if vid % similarity.QUERY_MOD == similarity.CENTROID_MOD_REMAINDER
    }
    a0 = assign(seeds)
    # per-cluster per-dim rounded means (the embedding_kmeans recipe)
    members = {}
    for vid, c in a0.items():
        members.setdefault(c, []).append(vecs[vid])
    c1 = {
        c: np.array([_r6(float(x)) for x in np.mean(np.stack(ms), axis=0)])
        for c, ms in members.items()
    }
    cells = assign(c1)

    expected = {}
    for qid in sorted(vecs):
        if qid % similarity.QUERY_MOD != 0 or qid not in cells:
            continue
        qcell = cells[qid]
        cand = sorted(
            (-cos6(vecs[qid], vecs[vid]), vid)
            for vid in vecs
            if vid != qid and cells.get(vid) == qcell
        )
        for rank, (negc, vid) in enumerate(cand[:3], start=1):
            expected[(qid, rank)] = (qcell, vid, -negc)
    assert out == expected and out


def test_trained_recall_monotonic_and_bounded(spark, sf_dir):
    rows = sorted(
        similarity.sim_ann_ivf_trained_recall(spark, sf_dir).collect(),
        key=lambda r: r.nprobe,
    )
    assert [r.nprobe for r in rows] == list(similarity.RECALL_NPROBES)
    recalls = [r.recall_at_k for r in rows]
    assert recalls == sorted(recalls)
    for r in rows:
        assert r.n_hit <= min(r.n_approx, r.n_exact)
        assert 0.0 <= r.recall_at_k <= 1.0


def test_trained_ivf_plan_posture(spark, sf_dir):
    """Broadcast joins for the query cells, no cartesian products, no
    Python nodes — the training step must not smuggle in a dense
    corpus × centroids shape (its joins are all shortlist-keyed or
    vec_id-keyed)."""
    plan = _plan(similarity.sim_ann_ivf_trained(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan


def test_incremental_ann_index_stream(spark, sf_dir, tmp_path):
    """Streaming IVF index maintenance (run_incremental_ann_index):
    the corpus arrives in 3 chunks; after the drain the manifest
    table holds EXACTLY the batch build's layout rows (same frozen
    quantizer ⇒ same cells), every vector has exactly one decision
    row, a point LOOKUP over the streamed index returns exactly
    query_ivf_index's answer for the same ids, and a second
    availableNow run over the same source is a no-op (txn fence:
    same manifest version, same decisions)."""
    import glob as _glob
    import os
    import shutil

    from etl_data_pipeline_spark.sinks import manifest
    from etl_data_pipeline_spark.streaming import jobs

    src = str(tmp_path / "vec_src")
    tgt = str(tmp_path / "ann_tgt")
    stage = str(tmp_path / "vec_stage")
    os.makedirs(src)

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label"
    )
    for c in range(3):
        part = emb.filter(F.col("vec_id") % 3 == c).coalesce(1)
        stage_d = os.path.join(stage, f"c{c}")
        part.write.mode("overwrite").parquet(stage_d)
        pf = _glob.glob(os.path.join(stage_d, "part-*.parquet"))[0]
        shutil.move(pf, os.path.join(src, f"chunk_{c}.parquet"))

    q = jobs.run_incremental_ann_index(spark, src, tgt, sf_dir)
    q.awaitTermination(180)

    # batch-built reference layout over the same corpus + quantizer
    idx_dir = str(tmp_path / "batch_index")
    similarity.write_ivf_index(spark, sf_dir, idx_dir)
    want_rows = sorted(
        map(
            tuple,
            spark.read.schema(similarity.IVF_INDEX_SCHEMA)
            .parquet(idx_dir)
            .select("vec_id", "cell", "label")
            .collect(),
        )
    )
    table_dir = os.path.join(tgt, "ann_index")
    got_rows = sorted(
        map(
            tuple,
            manifest.read_table(spark, table_dir)
            .select("vec_id", "cell", "label")
            .collect(),
        )
    )
    assert got_rows == want_rows and got_rows

    # one decision per vector; indexed set == the layout's vec_ids
    dec = spark.read.parquet(os.path.join(tgt, "ann_decisions"))
    by_id = {r.vec_id: r for r in dec.collect()}
    assert dec.count() == emb.count()  # exactly one row per vector
    assert len(by_id) == emb.count()
    indexed_ids = {v for v, _, _ in want_rows}
    for vid, r in by_id.items():
        if vid in indexed_ids:
            assert r.decision == "indexed" and r.cell is not None
        else:
            assert r.decision == "unindexed" and r.cell is None

    # point lookup over the streamed table == the parquet-layout lookup
    want_full = sorted(
        map(tuple, similarity.sim_ann_ivf_filtered(spark, sf_dir).collect())
    )
    qid = want_full[0][0]
    got_one = sorted(
        map(
            tuple,
            similarity.query_incremental_ann_index(
                spark, table_dir, sf_dir, query_ids=[qid]
            ).collect(),
        )
    )
    assert got_one == [r for r in want_full if r[0] == qid] and got_one
    # the lookup reads only the probed LEAF dirs (cell=…/label=…) of
    # the delta dirs that wrote them — a strict subset of the table's
    # files, bounded by nprobe pairs × committed versions
    one = similarity.query_incremental_ann_index(
        spark, table_dir, sf_dir, query_ids=[qid]
    )
    all_files = set(manifest.read_table(spark, table_dir).inputFiles())
    one_files = set(one.inputFiles())
    assert one_files and one_files < all_files
    n_versions = manifest.read_manifest(table_dir)["version"]
    assert len(one_files) <= similarity.IVF_FILTERED_NPROBE * n_versions
    # and the full-workload read over the table matches end-to-end
    got_full = sorted(
        map(
            tuple,
            similarity.query_incremental_ann_index(spark, table_dir, sf_dir).collect(),
        )
    )
    assert got_full == want_full

    # replay: same source, same checkpoint — txn fence makes it a no-op
    v_before = manifest.read_manifest(table_dir)["version"]
    dec_before = sorted(map(tuple, dec.collect()))
    q2 = jobs.run_incremental_ann_index(spark, src, tgt, sf_dir)
    q2.awaitTermination(180)
    assert manifest.read_manifest(table_dir)["version"] == v_before
    dec_after = sorted(
        map(tuple, spark.read.parquet(os.path.join(tgt, "ann_decisions")).collect())
    )
    assert dec_after == dec_before


def test_manifest_empty_partitioned_append_does_not_poison_reads(spark, tmp_path):
    """Review-caught poison case: an empty partitioned append writes a
    delta dir with ZERO parquet files (just _SUCCESS), and a
    schema-inference read of that dir fails — breaking every later
    read of the whole table. The reader now scans each delta dir with
    the manifest's RECORDED schema, so the empty dir contributes an
    empty frame instead. (The streaming ANN job additionally skips
    the commit for all-miss batches; this pins the reader-side
    defense for any other writer.)"""
    from etl_data_pipeline_spark.sinks import manifest

    tdir = str(tmp_path / "t")
    ddl = "vec_id bigint, v array<double>, cell bigint, label int"
    rows = spark.createDataFrame(
        [(1, [0.5, 0.5], 7, 1), (2, [0.1, 0.9], 7, 2)], ddl
    )
    manifest.commit(rows, tdir, partition_by=("cell", "label"))
    manifest.commit(
        spark.createDataFrame([], ddl), tdir, mode="append"
    )  # the empty delta
    assert manifest.read_manifest(tdir)["version"] == 2
    got = sorted(
        (r.vec_id, r.cell, r.label)
        for r in manifest.read_table(spark, tdir).collect()
    )
    assert got == [(1, 7, 1), (2, 7, 2)]


def test_incremental_ann_index_compaction(spark, sf_dir, tmp_path):
    """compact_every folds the delta-dir list while preserving BOTH
    the (cell, label) layout and output equality: with 3 chunks and
    compact_every=2 the table ends with fewer dirs than batches, and
    the full-workload read still equals sim_ann_ivf_filtered."""
    import glob as _glob
    import os
    import shutil

    from etl_data_pipeline_spark.sinks import manifest
    from etl_data_pipeline_spark.streaming import jobs

    src = str(tmp_path / "vec_src")
    tgt = str(tmp_path / "ann_tgt")
    stage = str(tmp_path / "vec_stage")
    os.makedirs(src)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label"
    )
    for c in range(3):
        stage_d = os.path.join(stage, f"c{c}")
        emb.filter(F.col("vec_id") % 3 == c).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage_d)
        shutil.move(
            _glob.glob(os.path.join(stage_d, "part-*.parquet"))[0],
            os.path.join(src, f"chunk_{c}.parquet"),
        )

    q = jobs.run_incremental_ann_index(
        spark, src, tgt, sf_dir, compact_every=2, app_id="ann_compact_test"
    )
    q.awaitTermination(180)

    table_dir = os.path.join(tgt, "ann_index")
    m = manifest.read_manifest(table_dir)
    assert m["partition_by"] == ["cell", "label"]
    assert len(m["dirs"]) < 3  # folded at least once
    want = sorted(
        map(tuple, similarity.sim_ann_ivf_filtered(spark, sf_dir).collect())
    )
    got = sorted(
        map(
            tuple,
            similarity.query_incremental_ann_index(spark, table_dir, sf_dir).collect(),
        )
    )
    assert got == want and got


def test_incremental_ann_index_kill_restart(spark, sf_dir, tmp_path):
    """Crash-window soak for the streaming index: deliver 5 chunks
    under a processingTime trigger, KILL the query mid-stream (some
    batches committed, some not — including possibly a batch whose
    manifest commit landed but whose checkpoint offset didn't), then
    restart with availableNow to drain. The txn fence must absorb the
    replayed boundary batch, so the final table equals a
    straight-through run (and the batch layout) row-for-row, with no
    duplicated vec_ids."""
    import glob as _glob
    import os
    import shutil
    import time

    from etl_data_pipeline_spark.sinks import manifest
    from etl_data_pipeline_spark.streaming import jobs

    src = str(tmp_path / "vec_src")
    tgt = str(tmp_path / "ann_tgt")
    stage = str(tmp_path / "vec_stage")
    os.makedirs(src)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label"
    )

    def deliver(i):
        d = os.path.join(stage, f"c{i}")
        emb.filter(F.col("vec_id") % 5 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        shutil.move(
            _glob.glob(os.path.join(d, "part-*.parquet"))[0],
            os.path.join(src, f"chunk_{i}.parquet"),
        )

    for i in range(5):
        deliver(i)
    q1 = jobs.run_incremental_ann_index(
        spark, src, tgt, sf_dir,
        trigger={"processingTime": "200 milliseconds"},
        app_id="ann_soak",
    )
    table_dir = os.path.join(tgt, "ann_index")
    deadline = time.time() + 120
    while time.time() < deadline:
        m = manifest.read_manifest(table_dir)
        if m is not None and m.get("txn", {}).get("ann_soak", -1) >= 1:
            break
        time.sleep(0.2)
    else:
        raise AssertionError("ann soak: no committed batch within 120s")
    q1.stop()  # kill mid-stream: later chunks may be unprocessed

    # restart over the SAME checkpoint; drain the rest
    q2 = jobs.run_incremental_ann_index(
        spark, src, tgt, sf_dir, app_id="ann_soak"
    )
    q2.awaitTermination(180)

    got = sorted(
        map(
            tuple,
            manifest.read_table(spark, table_dir)
            .select("vec_id", "cell", "label")
            .collect(),
        )
    )
    assert len({v for v, _, _ in got}) == len(got)  # no duplicated vec_id
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
    assert got == want and got
