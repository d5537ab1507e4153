"""Measure dedup_substring_scrub's min_dup_docs boundedness knob
across the 10x->100x segment (round-7 VERDICT item 4).

The default (min_dup_docs=2, exact Lee-et-al. semantics) measured a
1.16 exponent on sf1->sf10 because the corpus's duplicate-span mass
itself grows ~47x per decade. This probe re-times the same segment at
raised span-frequency floors, recording the BENT curve: each floor
increment sheds most of the remaining (power-law) duplicate-span
mass, so the capped operator should land at/below the linear floor.

Usage: python tools/scrub_knob_probe.py [sf1_dir] [sf10_dir]
Prints a markdown table for BASELINE.md.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLOORS = [2, 4, 8]


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d1 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(root, ".scaledata", "sf1")
    d10 = sys.argv[2] if len(sys.argv) > 2 else os.path.join(root, ".scaledata", "sf10")

    from bench import wait_for_quiet_host
    from etl_data_pipeline_spark.llm.text_analysis import dedup_substring_scrub
    from etl_data_pipeline_spark.session import get_spark

    waited, hot = wait_for_quiet_host()
    if waited or hot:
        print(f"(waited {waited}s for quiet host; hot_host={hot})")
    spark = get_spark("scrub-knob-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def run(d: str, floor: int, warm: bool) -> tuple[float, int]:
        """Median-of-2 noop-write wall time + total removed-token mass
        (the output-volume driver the knob is meant to bound)."""
        ts = []
        removed = 0
        for r in range(2 + (1 if warm else 0)):
            t0 = time.time()
            df = dedup_substring_scrub(spark, d, min_dup_docs=floor)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            spark.catalog.clearCache()
            if r == 0:
                from pyspark.sql import functions as F

                removed = (
                    dedup_substring_scrub(spark, d, min_dup_docs=floor)
                    .agg(F.sum("n_removed"))
                    .first()[0]
                    or 0
                )
                spark.catalog.clearCache()
            if r or not warm:
                ts.append(dt)
        return sorted(ts)[len(ts) // 2], removed

    print(f"loadavg at start: {os.getloadavg()[0]:.1f}")
    print("| min_dup_docs | t(10x) s | t(100x) s | removed(10x) | removed(100x) | segment exponent |")
    print("|---|---|---|---|---|---|")
    for floor in FLOORS:
        t1, rm1 = run(d1, floor, warm=True)
        t10, rm10 = run(d10, floor, warm=False)
        exp = math.log10(t10 / t1) if t1 > 0 else float("nan")
        print(
            f"| {floor} | {t1:.2f} | {t10:.2f} | {rm1:,} | {rm10:,} "
            f"| {exp:.2f} |".replace(",", " ")
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
