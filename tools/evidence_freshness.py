"""Driver-evidence freshness audit (round-7 VERDICT item 7).

Diffs the live query registry against the union of all
``CORRECTNESS_r*.json`` driver records and prints, stalest first:

- queries with NO driver evidence at all (highest priority), then
- queries grouped by the round of their most recent green driver row.

The output is exactly the ordering the per-round ``hoist`` list in
``etl_data_pipeline_spark/operators/__init__.py`` should follow: the
driver checks only a ~50-entry prefix of the registry per round, so
rotating the stalest-evidence queries to the front keeps every
query's evidence fresh over a handful of rounds.

Usage::

    python tools/evidence_freshness.py            # human-readable report
    python tools/evidence_freshness.py --hoist N  # print the first N names
                                                  # as a ready-to-paste hoist
    python tools/evidence_freshness.py --hoist N --write [--touch a,b]
        # write the cut to etl_data_pipeline_spark/operators/hoist.json
        # (--touch: queries CHANGED this round, hoisted ahead of the
        # staleness order so the driver re-proves them),
        # which collect_registry() reads at import time — run this once
        # per round AFTER registering any new queries, so the rotation
        # can't be mis-cut by hand (round-10 VERDICT item 4).
Exit status is nonzero when any registered query has no evidence, so
the script doubles as a CI-shaped freshness check.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_evidence(
    repo_root: str, max_round: int | None = None
) -> dict[str, tuple[int, bool]]:
    """name -> (latest round with a row, that row was green).
    ``max_round`` replays the view as of that round — used to verify a
    committed hoist cut against the evidence it was derived from, so a
    NEWER correctness record (written by the driver after the cut)
    doesn't invalidate it."""
    latest: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
        with open(path) as f:
            rows = json.load(f)
        for name, rec in rows.items():
            # Rows-only queries (the by-design no-oracle sketches) get
            # err="no_oracle" and null matches but spark_rows >= 0 —
            # that IS their green driver row, not a failure.
            rows_only = rec.get("err") == "no_oracle" and rec.get("spark_rows", -1) >= 0
            green = rows_only or bool(
                rec.get("rows_match")
                and rec.get("schema_match") is not False
                and rec.get("hash_match") is not False
                and not rec.get("err")
            )
            prev = latest.get(name)
            if prev is None or rnd >= prev[0]:
                latest[name] = (rnd, green)
    return latest


def registry_names() -> list[str]:
    from etl_data_pipeline_spark.operators import collect_registry

    # collect_registry builds DataFrame factories lazily; no SparkSession
    # is started just to enumerate names.
    queries, _oracle = collect_registry()
    return list(queries)


def rotation_order(
    names: list[str],
    evidence: dict[str, tuple[int, bool]],
    touched: list[str] | None = None,
) -> list[str]:
    """The hoist priority order: queries with NO driver evidence first
    (new registrations), then queries TOUCHED this round (semantics or
    plan changed — the driver should re-prove them even if their last
    evidence is recent), then latest-row-red, then green queries in
    ascending order of their most recent green round (stalest first).
    Within each tier, registry order is preserved."""
    touched_set = set(touched or [])
    never = [n for n in names if n not in evidence]
    touch = [n for n in names if n in touched_set and n not in set(never)]
    rest = set(never) | set(touch)
    red = [
        n for n in names
        if n in evidence and not evidence[n][1] and n not in rest
    ]
    by_round: dict[int, list[str]] = {}
    for n in names:
        if n in evidence and evidence[n][1] and n not in rest:
            by_round.setdefault(evidence[n][0], []).append(n)
    ordered: list[str] = list(never) + list(touch) + list(red)
    for rnd in sorted(by_round):
        ordered.extend(by_round[rnd])
    return ordered


def main(argv: list[str]) -> int:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hoist_n = 0
    if "--hoist" in argv:
        hoist_n = int(argv[argv.index("--hoist") + 1])
    touched: list[str] = []
    if "--touch" in argv:
        touched = argv[argv.index("--touch") + 1].split(",")
    names = registry_names()
    evidence = load_evidence(repo_root)

    never = [n for n in names if n not in evidence]
    red = [n for n in names if n in evidence and not evidence[n][1]]
    by_round: dict[int, list[str]] = {}
    for n in names:
        if n in evidence and evidence[n][1]:
            by_round.setdefault(evidence[n][0], []).append(n)

    ordered = rotation_order(names, evidence, touched)

    if hoist_n:
        cut = ordered[:hoist_n]
        if "--write" in argv:
            dest = os.path.join(
                repo_root, "etl_data_pipeline_spark", "operators", "hoist.json"
            )
            max_round = max(
                (r for r, _g in evidence.values()), default=0
            )
            with open(dest, "w") as f:
                json.dump(
                    {"max_round": max_round, "touched": touched, "names": cut},
                    f,
                    indent=1,
                )
                f.write("\n")
            print(
                f"wrote {len(cut)} names (evidence through r{max_round}) "
                f"-> {dest}"
            )
        else:
            for n in cut:
                print(f'        "{n}",')
        return 1 if never else 0

    stale_records = [n for n in evidence if n not in set(names)]
    print(f"registry queries : {len(names)}")
    print(f"driver evidence  : {len([n for n in names if n in evidence])}")
    if never:
        print(f"\nNO EVIDENCE ({len(never)}) — put these first in the hoist:")
        for n in never:
            print(f"  {n}")
    if red:
        print(f"\nLATEST ROW RED ({len(red)}):")
        for n in red:
            print(f"  {n} (r{evidence[n][0]})")
    print("\nevidence age (latest green round -> count):")
    for rnd in sorted(by_round):
        print(f"  r{rnd}: {len(by_round[rnd])}")
        if rnd == min(by_round):
            for n in by_round[rnd]:
                print(f"      {n}")
    if stale_records:
        print(f"\nevidence for names no longer registered ({len(stale_records)}):")
        for n in stale_records:
            print(f"  {n}")
    return 1 if never else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
