"""ANN recall matrix (round-10 VERDICT item 1): recall@3 of the IVF
family measured across every knob the docstrings price —

  corpus    x  uniform (the driver tier's near-random embeddings — the
               structural worst case for any pruned index)
               clustered (the deterministic mixture fixture
               llm.similarity._clustered_corpus derives from the same
               table — the regime IVF exists for)
  training  x  untrained seed id-sample / one-Lloyd-step refined
  shortlist x  SEM_LSH_TABLES in {4 (default), 8, 16}
  nprobe    x  1 / 2 / 4 (inside each recall result)

The registered queries pin the DEFAULT cell of this matrix with
DuckDB-oracled answers; this probe exists to measure the rest, so the
knob documentation ("more tables raise the shortlist hit rate",
"training buys recall back") carries numbers instead of folklore.

Usage: python tools/ann_recall_matrix.py [sf_dir]   # default sf0.1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import etl_data_pipeline_spark.llm.dedup as dd
    from etl_data_pipeline_spark.llm.similarity import (
        _clustered_corpus,
        _ivf_corpus,
        _ivf_sem_build_from,
        _ivf_trained_build_from,
        _unfiltered_recall_tail,
    )
    from etl_data_pipeline_spark.session import get_spark

    spark = get_spark("ann-recall-matrix", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    default_tables = dd.SEM_LSH_TABLES
    print(f"sf_dir={sf_dir}")
    print("| corpus | tables | trained | nprobe=1 | nprobe=2 | nprobe=4 | wall s |")
    print("|---|---|---|---|---|---|---|")
    try:
        for corpus_name in ("uniform", "clustered"):
            for tables in (4, 8, 16):
                dd.SEM_LSH_TABLES = tables
                for trained in (False, True):
                    t0 = time.time()
                    # fresh corpus per cell: the persisted frames cache
                    # bucket arrays computed under the PREVIOUS table
                    # count otherwise
                    e = (
                        _ivf_corpus(spark, sf_dir)
                        if corpus_name == "uniform"
                        else _clustered_corpus(spark, sf_dir)
                    )
                    if trained:
                        _, assigned, aranked, _c1 = _ivf_trained_build_from(e)
                    else:
                        _, assigned, aranked = _ivf_sem_build_from(e)
                    rows = {
                        r.nprobe: r.recall_at_k
                        for r in _unfiltered_recall_tail(
                            e, assigned, aranked
                        ).collect()
                    }
                    spark.catalog.clearCache()
                    print(
                        f"| {corpus_name} | {tables} | {trained} "
                        f"| {rows.get(1, float('nan')):.3f} "
                        f"| {rows.get(2, float('nan')):.3f} "
                        f"| {rows.get(4, float('nan')):.3f} "
                        f"| {time.time() - t0:.1f} |"
                    )
    finally:
        dd.SEM_LSH_TABLES = default_tables


if __name__ == "__main__":
    main()
