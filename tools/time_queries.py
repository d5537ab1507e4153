"""Quick isolated warm timing: median of N noop-sink passes per query
(bench.py's per-query protocol without the full set). Usage:
  python tools/time_queries.py [--reps N] q1 [q2 ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_data_pipeline_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as em

    qs = em.queries()
    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    from etl_data_pipeline_spark.functions.caching import release_tracked

    for name in args:  # warmup pass
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_tracked(spark)
        spark.catalog.clearCache()
    samples: dict[str, list[float]] = {n: [] for n in args}
    for _ in range(reps):
        for name in args:
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.time() - t0)
            release_tracked(spark)
            spark.catalog.clearCache()
    for name, ts in samples.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{med:8.3f}  {name}  (all: {[round(t,3) for t in ts]})")


if __name__ == "__main__":
    main()
