"""Capture .explain('formatted') output for named queries.

Usage: python tools/capture_plans.py <out_dir> <suffix> q1 [q2 ...]
Writes <out_dir>/<query>_<suffix>.txt for each query. The plan is the
ANALYZED physical plan at the bench's scale factor dir
($SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1) — the same
relation the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_data_pipeline_spark.session import get_spark


def main() -> None:
    out_dir, suffix, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as em

    qs = em.queries()
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
        from etl_data_pipeline_spark.functions.caching import release_tracked

        release_tracked(spark)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
