"""Round-10 probe (VERDICT r9 item 5): LONG-RUN economics of the
streaming IVF index (run_incremental_ann_index) — the r9 probe proved
O(batch) ingest to batch 10; this one runs a 100-batch soak with
``compact_every`` set and a LIVE vacuum, recording what a deployment
actually operates on:

  - per-batch ingest wall across the whole run (flat = O(batch) holds
    two decades longer than the r9 evidence),
  - point-lookup latency sampled as the index grows, before and after
    each compaction fold (compaction's whole point is lookup shape:
    uncompacted, a lookup unions one tiny file per batch per probed
    list),
  - manifest delta-dir count over time (sawtooth: grows to
    compact_every, folds to 1),
  - vacuum() running against the live appender (lease-serialized),
    reclaiming superseded delta dirs — retained-version safety is
    pinned by tests/test_r10_additions.py; here we record the
    on-disk dir count it keeps bounded.

Usage: python tools/ann_soak_probe.py [tier_dir] [n_chunks] [compact_every]
       # defaults: .scaledata/sf1 100 20
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tier = sys.argv[1] if len(sys.argv) > 1 else os.path.join(root, ".scaledata", "sf1")
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    compact_every = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    from pyspark.sql import functions as F

    from bench import wait_for_quiet_host
    from etl_data_pipeline_spark.llm import similarity
    from etl_data_pipeline_spark.session import get_spark, load_table
    from etl_data_pipeline_spark.sinks import manifest
    from etl_data_pipeline_spark.streaming import jobs

    waited, hot = wait_for_quiet_host()
    if waited or hot:
        print(f"(waited {waited}s for quiet host; hot_host={hot})")
    spark = get_spark("ann-soak-probe")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="ann_soak_probe_")
    src = os.path.join(work, "src")
    tgt = os.path.join(work, "tgt")
    os.makedirs(src)
    table_dir = os.path.join(tgt, "ann_index")
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
            shutil.move(pf, os.path.join(src, f"chunk_{c:03d}.parquet"))
            shutil.rmtree(stage, ignore_errors=True)

        # a fixed lookup workload: 8 ids from the QUERY residue class
        # (vec_id % 100 == 0 — the workload contract every lookup
        # shares; ids outside it are filtered to an empty probe set)
        some_ids = [
            r.vec_id
            for r in emb.select("vec_id")
            .filter(F.col("vec_id") % 100 == 0)
            .orderBy("vec_id")
            .limit(8)
            .collect()
        ]

        lookup_log: list[tuple[int, int, float, int]] = []
        stop = threading.Event()

        def sampler():
            """Every ~5 s: one point lookup (wall), the manifest's
            delta-dir count, and a vacuum keeping 2 versions — all
            against the LIVE appender."""
            while not stop.is_set():
                m = manifest.read_manifest(table_dir)
                if m is not None:
                    ndirs = len(m.get("dirs", ()))
                    t0 = time.time()
                    try:
                        n = similarity.query_incremental_ann_index(
                            spark, table_dir, tier, query_ids=some_ids
                        ).count()
                    except Exception as exc:  # table mid-first-commit
                        n = -1
                        print(f"  (lookup failed transiently: {exc})")
                    wall = time.time() - t0
                    try:
                        manifest.vacuum(table_dir, keep_last=2)
                    except Exception as exc:
                        print(f"  (vacuum failed transiently: {exc})")
                    lookup_log.append((m["version"], ndirs, round(wall, 2), n))
                stop.wait(5.0)

        th = threading.Thread(target=sampler, daemon=True)
        t0 = time.time()
        q = jobs.run_incremental_ann_index(
            spark,
            src,
            tgt,
            tier,
            app_id="ann_soak",
            compact_every=compact_every,
        )
        th.start()
        q.awaitTermination(3600)
        drain = time.time() - t0
        stop.set()
        th.join(timeout=30)

        prog = [
            json.loads(p.json if hasattr(p, "json") else p)
            for p in q.recentProgress
        ]
        walls = sorted(
            (p["batchId"], p["batchDuration"] / 1000.0)
            for p in prog
            if p.get("numInputRows", 0) > 0
        )
        print(
            f"tier {tier}: {total} vectors, {n_chunks} batches, "
            f"compact_every={compact_every}, drain {drain:.1f}s"
        )
        if walls:
            fifth = [w for _b, w in walls]
            head = sum(fifth[: max(1, len(fifth) // 5)]) / max(1, len(fifth) // 5)
            tail = sum(fifth[-max(1, len(fifth) // 5):]) / max(1, len(fifth) // 5)
            print(
                f"ingest wall: first-quintile mean {head:.2f}s, "
                f"last-quintile mean {tail:.2f}s, ratio {tail / head:.2f} "
                f"(flat = O(batch))"
            )
        m = manifest.read_manifest(table_dir)
        ondisk = len(os.listdir(os.path.join(table_dir, "_versions")))
        print(
            f"final manifest: version {m['version']}, {len(m['dirs'])} live dirs, "
            f"{ondisk} on-disk version dirs (vacuum keep_last=2)"
        )
        print("| sampled at version | delta dirs | lookup wall s | rows |")
        print("|---|---|---|---|")
        for ver, ndirs, wall, n in lookup_log:
            print(f"| {ver} | {ndirs} | {wall:.2f} | {n} |")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
