"""A/B: pure-JVM with_global_position vs the r11 RDD zipWithIndex hop
(r11 VERDICT item 2). Times the three consumers — events_rfm,
corpus_interleave, export_shuffle — under each variant at the given
scale dirs; the noop sink is the action so nothing funnels back.

Usage: python tools/ab_global_position.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["events_rfm", "corpus_interleave", "export_shuffle"]


def main() -> int:
    dirs = sys.argv[1:] or ["/root/repo/.scaledata/sf1", "/root/repo/.scaledata/sf10"]

    import __spark_entry__ as entrymod
    from etl_data_pipeline_spark.functions import ranking
    from etl_data_pipeline_spark.session import get_spark

    spark = get_spark("ab-global-position", shuffle_partitions=32)
    qs = entrymod.queries()
    variants = {
        "jvm": ranking.with_global_position,
        "rdd": ranking.with_global_position_rdd,
    }
    results = {}
    for sf_dir in dirs:
        for name in QUERIES:
            for vname, fn in variants.items():
                ranking.with_global_position = fn
                try:
                    best = None
                    for _ in range(2):
                        t0 = time.time()
                        qs[name](spark, sf_dir).write.format("noop").mode(
                            "overwrite"
                        ).save()
                        w = time.time() - t0
                        best = w if best is None else min(best, w)
                    results[(sf_dir, name, vname)] = best
                    print(f"{sf_dir:40s} {name:20s} {vname}: {best:7.2f}s", flush=True)
                finally:
                    ranking.with_global_position = variants["jvm"]
    print("\n== speedups (rdd/jvm) ==")
    for sf_dir in dirs:
        for name in QUERIES:
            j = results[(sf_dir, name, "jvm")]
            r = results[(sf_dir, name, "rdd")]
            print(f"{sf_dir:40s} {name:20s} {r / j:5.2f}x  (jvm {j:.2f}s rdd {r:.2f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
