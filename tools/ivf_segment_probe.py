"""Round-9 segment probe: Spark-side wall time for the re-routed IVF
family across the 10× → 30× tiers (the decade pair that exposed the
dense-assignment knee on sim_ann_ivfpq), plus optional extra tiers /
queries via argv. Prints a BASELINE.md-ready markdown table with the
per-segment exponent log(t_hi/t_lo) / log(rows_hi/rows_lo).

Usage: python tools/ivf_segment_probe.py [--reps N] [--tiers d1,d2]
           [query ...]
       # defaults: reps 3, tiers .scaledata/sf1,.scaledata/sf3,
       # queries = the four re-routed IVF entries
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "sim_ann_ivf",
    "sim_ann_ivf_filtered",
    "sim_ann_recall",
    "sim_ann_ivf_filtered_recall",
]


def main() -> None:
    argv = list(sys.argv[1:])
    reps = 3
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i : i + 2]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tiers = [
        os.path.join(root, ".scaledata", "sf1"),
        os.path.join(root, ".scaledata", "sf3"),
    ]
    if "--tiers" in argv:
        i = argv.index("--tiers")
        tiers = argv[i + 1].split(",")
        del argv[i : i + 2]
    names = argv or DEFAULT_QUERIES

    import __spark_entry__ as em
    from bench import wait_for_quiet_host
    from etl_data_pipeline_spark.session import get_spark

    waited, hot = wait_for_quiet_host()
    if waited or hot:
        print(f"(waited {waited}s for quiet host; hot_host={hot})")

    spark = get_spark("ivf-segment-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()

    def rows_of(d: str) -> int:
        import pyarrow.parquet as pq
        import glob

        p = os.path.join(d, "embeddings.parquet")
        files = glob.glob(os.path.join(p, "*.parquet")) if os.path.isdir(p) else [p]
        return sum(pq.read_metadata(f).num_rows for f in files)

    # BOTH tiers drop a warm-up rep: an asymmetric warm-up (r9 review
    # finding) leaves the upper tier's median carrying one-time
    # JIT/codegen/page-cache cost, biasing the reported exponent UP.
    def run(name: str, d: str) -> float:
        ts = []
        for r in range(reps + 1):
            t0 = time.time()
            qs[name](spark, d).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            spark.catalog.clearCache()
            if r:
                ts.append(dt)
        return sorted(ts)[len(ts) // 2]

    nrows = [rows_of(d) for d in tiers]
    ratio = nrows[1] / nrows[0]
    print(f"loadavg at start: {os.getloadavg()[0]:.1f}; tiers {nrows}")
    print(f"| query | t({nrows[0]}) s | t({nrows[1]}) s | factor | segment exponent |")
    print("|---|---|---|---|---|")
    for name in names:
        t1 = run(name, tiers[0])
        t2 = run(name, tiers[1])
        factor = t2 / t1
        exp = math.log(factor) / math.log(ratio)
        print(f"| {name} | {t1:.2f} | {t2:.2f} | {factor:.1f}x | {exp:.2f} |")
    print(f"loadavg at end: {os.getloadavg()[0]:.1f}")


if __name__ == "__main__":
    main()
