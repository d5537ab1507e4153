"""Round-9 probe: per-batch ingest cost of the streaming IVF index
maintenance (run_incremental_ann_index) as the index GROWS.

The job's claim is O(batch) maintenance — cost independent of index
size (contrast a rebuild, O(index), or run_incremental_dedup's state
swap, which rewrites its small signature index per batch). This
splits a tier's embeddings into N equal chunks, drains them through
ONE availableNow run (maxFilesPerTrigger=1 ⇒ one chunk per
micro-batch), and prints each micro-batch's wall from the streaming
progress events: flat per-batch walls while the index grows N× IS the
claim as measured numbers. A full write_ivf_index rebuild of the same
tier is timed alongside for the O(index) comparison point.

Usage: python tools/ann_ingest_probe.py [tier_dir] [n_chunks]
       # defaults: .scaledata/sf1 10
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tier = sys.argv[1] if len(sys.argv) > 1 else os.path.join(root, ".scaledata", "sf1")
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from bench import wait_for_quiet_host
    from etl_data_pipeline_spark.llm import similarity
    from etl_data_pipeline_spark.session import get_spark, load_table
    from etl_data_pipeline_spark.sinks import manifest
    from etl_data_pipeline_spark.streaming import jobs

    waited, hot = wait_for_quiet_host()
    if waited or hot:
        print(f"(waited {waited}s for quiet host; hot_host={hot})")
    spark = get_spark("ann-ingest-probe")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="ann_ingest_probe_")
    src = os.path.join(work, "src")
    tgt = os.path.join(work, "tgt")
    os.makedirs(src)
    try:
        emb = load_table(spark, tier, "embeddings").select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
            "label",
        )
        total = emb.count()
        for c in range(n_chunks):
            stage = os.path.join(work, f"stage{c}")
            emb.filter(F.col("vec_id") % n_chunks == c).coalesce(1).write.mode(
                "overwrite"
            ).parquet(stage)
            pf = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
            shutil.move(pf, os.path.join(src, f"chunk_{c:02d}.parquet"))

        t0 = time.time()
        q = jobs.run_incremental_ann_index(spark, src, tgt, tier)
        q.awaitTermination(1800)
        drain = time.time() - t0

        # recentProgress yields StreamingQueryProgress objects (PySpark 4);
        # .json is the stable serialized form
        prog = [json.loads(p.json if hasattr(p, "json") else p) for p in q.recentProgress]
        # rows per batch from the decision sink, NOT numInputRows: the
        # progress counter tallies source RE-reads (the isEmpty probe +
        # the persist materialization), so it over-reports by 2x
        walls = {
            p["batchId"]: p["batchDuration"] / 1000.0
            for p in prog
            if p.get("numInputRows", 0) > 0
        }
        # only decision == 'indexed' rows actually land in the index
        # (bucket misses get decision rows but no index append)
        dec_dir = os.path.join(tgt, "ann_decisions")
        nrows = {
            int(d.split("=")[1]): spark.read.parquet(os.path.join(dec_dir, d))
            .filter("decision = 'indexed'")
            .count()
            for d in os.listdir(dec_dir)
            if d.startswith("batch=")
        }
        print(f"tier {tier}: {total} vectors in {n_chunks} chunks; drain {drain:.1f}s")
        print("| batch | rows | index rows before | batch wall s |")
        print("|---|---|---|---|")
        seen = 0
        for bid in sorted(walls):
            rows = nrows.get(bid, 0)
            print(f"| {bid} | {rows} | {seen} | {walls[bid]:.2f} |")
            seen += rows
        m = manifest.read_manifest(os.path.join(tgt, "ann_index"))
        print(f"manifest versions: {m['version']}; table rows: {m.get('rowcount')}")

        t0 = time.time()
        rebuild_dir = os.path.join(work, "rebuild")
        similarity.write_ivf_index(spark, tier, rebuild_dir)
        print(f"full write_ivf_index rebuild of the same tier: {time.time() - t0:.1f}s")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
