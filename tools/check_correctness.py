"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given SF and
compares with its DuckDB oracle: row count, column names, and an
order-insensitive value comparison (sorted by all columns, values
normalized to strings). Use while iterating; the driver runs its own
version per-round.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip repr at 12 significant digits to absorb fp noise
        return f"{v:.12g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from etl_data_pipeline_spark.session import get_spark

    spark = get_spark("correctness-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed, passed, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failed.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failed.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        if sc != dc:
            failed.append((name, f"columns differ: spark={sc} duck={dc}"))
            print(f"FAIL  {name}: columns spark={sc} vs duck={dc}")
        elif len(sr) != len(dr):
            failed.append((name, f"rowcount spark={len(sr)} duck={len(dr)}"))
            print(f"FAIL  {name}: rowcount spark={len(sr)} duck={len(dr)}")
        elif sr != dr:
            diff = next(i for i, (a, b) in enumerate(zip(sr, dr)) if a != b)
            failed.append((name, f"values differ at sorted row {diff}: {sr[diff]} vs {dr[diff]}"))
            print(f"FAIL  {name}: first diff row {diff}:\n  spark={sr[diff]}\n  duck ={dr[diff]}")
        else:
            passed.append(name)
            print(f"PASS  {name}: {len(sr)} rows [{time.time()-t0:.1f}s]")

    print(
        f"\n== {len(passed)} passed, {len(rows_only)} rows-only, {len(failed)} failed =="
    )
    for name, why in failed:
        print(f"  FAILED {name}: {why[:300]}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
