"""Round-10 probe (VERDICT r9 item 6): dedup_levenshtein_entropy on a
REALISTIC-KEY corpus at the 30x tier.

The sf3 gate is green but output-bound at ~2,000 s because the
generated customers carry zero-padded SEQUENTIAL ids: every block of
10^2 consecutive ids is pairwise within 2 substitutions, so ~10^8 TRUE
<=2-edit pairs exist — a corpus artifact, not an operator cost. This
probe builds a customer tier of the SAME row count whose name digits
are hash-random (the realistic record-linkage regime: sparse key
space, rare true matches), runs the production path with NO exhibit
override, and reports:

  - wall clock (expected: orders of magnitude below the sequential
    tier — wall tracks TRUE pair volume, not corpus size),
  - the _entropy_keyed block-size distribution (max / p99 / mean),
    asserting the two-level blocks stay bounded on this key shape too,
  - output row count (best matches found).

Usage: python tools/entropy_linkage_probe.py [n_rows] [compare_dir]
       # defaults: 450000 (the 30x tier) and no sequential comparison
       # pass .scaledata/sf3 as compare_dir to also time the
       # sequential-id tier (slow: output-bound, ~30 min)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 450_000
    compare_dir = sys.argv[2] if len(sys.argv) > 2 else None

    from pyspark.sql import functions as F

    from bench import wait_for_quiet_host
    from etl_data_pipeline_spark.llm import dedup
    from etl_data_pipeline_spark.session import get_spark

    waited, hot = wait_for_quiet_host()
    if waited or hot:
        print(f"(waited {waited}s for quiet host; hot_host={hot})")
    spark = get_spark("entropy-linkage-probe")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="entropy_probe_")
    try:
        # realistic-key tier: 9 hash-random digits per name (same
        # length as the sequential tier's zero-padded ids), built by
        # Spark in parallel — deterministic via xxhash64
        n9 = F.lpad(
            (F.abs(F.xxhash64(F.col("id"), F.lit(42))) % 1_000_000_000).cast(
                "string"
            ),
            9,
            "0",
        )
        cust = (
            spark.range(n_rows)
            .select(
                F.col("id").alias("c_custkey"),
                F.concat(F.lit("Customer#"), n9).alias("c_name"),
            )
        )
        cust.write.mode("overwrite").parquet(os.path.join(work, "customer.parquet"))

        def run(sf_dir: str, label: str) -> None:
            t0 = time.time()
            keyed = dedup._entropy_keyed(spark, sf_dir)
            blocks = (
                keyed.groupBy("seg", "seg_val")
                .agg(F.count("*").alias("sz"))
                .agg(
                    F.max("sz").alias("max_block"),
                    F.expr("percentile_approx(sz, 0.99)").alias("p99_block"),
                    F.avg("sz").alias("mean_block"),
                    F.count("*").alias("n_blocks"),
                )
                .first()
            )
            t_blocks = time.time() - t0
            t0 = time.time()
            out = dedup.dedup_levenshtein_entropy(spark, sf_dir)
            n_out = out.count()
            wall = time.time() - t0
            spark.catalog.clearCache()
            print(
                f"| {label} | {n_rows if label != 'sequential' else 'tier'} "
                f"| {blocks['n_blocks']} | {blocks['max_block']} "
                f"| {blocks['p99_block']} | {blocks['mean_block']:.1f} "
                f"| {n_out} | {wall:.1f} (+{t_blocks:.1f} keying probe) |"
            )

        print(
            "| tier | rows | blocks | max block | p99 block | mean block "
            "| best-match rows | wall s |"
        )
        print("|---|---|---|---|---|---|---|---|")
        run(work, "random-digit (realistic)")
        if compare_dir:
            run(compare_dir, "sequential")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
