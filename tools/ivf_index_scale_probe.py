"""Round-9 scale demonstration for the IVF index LAYOUT (round-8
VERDICT item 2): at the 10x and 30x tiers, write the (cell, label)-
partitioned index and record

- FULL-WORKLOAD output equality with sim_ann_ivf_filtered (the layout
  changes the read path, never the answer) + wall time vs recomputing
  the filtered ANN from the raw corpus,
- the LOOKUP shape (query_ids=[one id], the production point query):
  files actually read (inputFiles of the statically-pruned read) vs
  total index files, and its wall time — the probed-fraction claim as
  numbers. Dynamic partition pruning is NOT the mechanism (Spark
  declines DPP under a window on the filtering side; the full
  workload probes ~every cell anyway) — the lookup path prunes
  STATICALLY from the materialized probe list.

Usage: python tools/ivf_index_scale_probe.py [tier_dir ...]
       # default tiers: .scaledata/sf1 .scaledata/sf3
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tiers = sys.argv[1:] or [
        os.path.join(root, ".scaledata", "sf1"),
        os.path.join(root, ".scaledata", "sf3"),
    ]

    from bench import wait_for_quiet_host
    from etl_data_pipeline_spark.llm import similarity
    from etl_data_pipeline_spark.session import get_spark

    waited, hot = wait_for_quiet_host()
    if waited or hot:
        print(f"(waited {waited}s for quiet host; hot_host={hot})")
    spark = get_spark("ivf-index-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    print("| tier | rows | build s | full query s | recompute s | "
          "lookup s | lookup files / total | lookup rows |")
    print("|---|---|---|---|---|---|---|---|")
    for d in tiers:
        idx = tempfile.mkdtemp(prefix="ivf_idx_")
        try:
            t0 = time.time()
            similarity.write_ivf_index(spark, d, idx)
            t_build = time.time() - t0
            spark.catalog.clearCache()

            t0 = time.time()
            got_rows = sorted(
                map(tuple, similarity.query_ivf_index(spark, idx, d).collect())
            )
            t_query = time.time() - t0
            spark.catalog.clearCache()

            t0 = time.time()
            want = sorted(
                map(tuple, similarity.sim_ann_ivf_filtered(spark, d).collect())
            )
            t_re = time.time() - t0
            spark.catalog.clearCache()
            assert got_rows == want and want, (
                f"FULL-WORKLOAD MISMATCH at {d}: "
                f"{len(got_rows)} vs {len(want)} rows"
            )

            qid = want[0][0]
            t0 = time.time()
            one = similarity.query_ivf_index(spark, idx, d, query_ids=[qid])
            one_rows = sorted(map(tuple, one.collect()))
            t_lookup = time.time() - t0
            n_read = len(set(one.inputFiles()))
            total = len(
                glob.glob(os.path.join(idx, "cell=*", "label=*", "*.parquet"))
            )
            assert one_rows == [r for r in want if r[0] == qid] and one_rows, (
                f"LOOKUP MISMATCH at {d}"
            )
            assert n_read < total, "lookup did not prune"
            spark.catalog.clearCache()

            nrows = spark.read.parquet(
                os.path.join(d, "embeddings.parquet")
            ).count()
            print(
                f"| {os.path.basename(d)} | {nrows} | {t_build:.1f} | "
                f"{t_query:.2f} | {t_re:.2f} | {t_lookup:.2f} | "
                f"{n_read}/{total} | {len(one_rows)} |"
            )
        finally:
            shutil.rmtree(idx, ignore_errors=True)


if __name__ == "__main__":
    main()
