"""Registry-wide timing sweep: run EVERY registered query end-to-end
(noop sink) at a given SF and report the slow tail. This is the net
that catches scale timebombs the curated bench set misses — round 2 it
caught text_repetition running 30 s on a single core at sf0.1.

Usage: python tools/sweep_timing.py [sf_dir] [threshold_secs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Θ(n·k)-output on zero-padded sequential ids — quadratic pair count is
# the TRUE result size on this corpus, not an implementation flaw
# (see dedup_levenshtein docstring); excluded so the sweep stays fast.
SKIP = {"dedup_levenshtein"}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0

    import __spark_entry__ as em
    from etl_data_pipeline_spark.session import get_spark

    spark = get_spark("sweep")
    spark.sparkContext.setLogLevel("ERROR")
    slow, errors = [], []
    for name, fn in em.queries().items():
        if name in SKIP:
            continue
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if dt > threshold:
                slow.append((name, round(dt, 1)))
        except Exception as e:  # sweep must report, not die
            errors.append((name, str(e)[:160]))
        spark.catalog.clearCache()
    for name, err in errors:
        print(f"ERROR {name}: {err}")
    for name, dt in sorted(slow, key=lambda x: -x[1]):
        print(f"SLOW  {name}: {dt}s")
    print(f"== sweep done: {len(errors)} errors, {len(slow)} over {threshold}s ==")
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
