"""Declarative pipeline specification.

Replaces the reference's ``tables_list`` CSV registry
(``table_name,to_be_loaded,watermark_column,watermark_type`` —
tables_list:1, read via pandas at util.py:359) and its selection
semantics (util.py:352-400):

- keep rows with ``to_be_loaded == "yes"``            (util.py:368)
- optional user table-list filter (``isin``)           (util.py:375-381)
- report requested-but-unknown tables (anti-join)      (util.py:384-387)
"""

from __future__ import annotations

import csv
from dataclasses import dataclass, field
from pathlib import Path

VALID_WATERMARK_TYPES = ("id", "timestamp")


@dataclass(frozen=True)
class TableSpec:
    """One table's pipeline config (one row of the reference registry)."""

    name: str
    enabled: bool = True
    watermark_column: str | None = None
    # 'id' | 'timestamp' | None (full load). Unknown values degrade to
    # full load at runtime (app.py:113-117), not at parse time — the
    # reference accepts them into the registry.
    watermark_type: str | None = None
    source_format: str = "parquet"
    source_options: dict = field(default_factory=dict)
    sink_format: str = "parquet"
    sink_options: dict = field(default_factory=dict)
    # Idempotence key for the sink (fixes the reference's append-replay
    # duplication, SURVEY.md §2.C #5/#7). None → plain append.
    merge_keys: tuple[str, ...] | None = None
    # Declared DDL schema ("a BIGINT, b STRING"). None → accept the
    # source schema as-is (the reference's behavior). Set → every read
    # is validated before any write (SURVEY.md §1.2); extra source
    # columns are tolerated and dropped, missing/mistyped fail the
    # table (isolated, like any per-table error).
    expected_schema: str | None = None
    # Declarative data-quality gate (expectations.py): a tuple of
    # Expectation rules checked in ONE pass per batch. Build the spec
    # AFTER SparkSession creation (rules hold Column expressions).
    # mode 'fail': any violation fails the table, watermark frozen —
    # the batch retries after the upstream fix. mode 'drop': violating
    # rows go to a quarantine parquet next to the sink, the clean
    # subset loads, and the watermark advances over the WHOLE batch.
    expectations: tuple = ()
    expectations_mode: str = "fail"

    def __post_init__(self) -> None:
        # Validate at CONSTRUCTION, not first violation: a typo'd mode
        # would otherwise run silently on clean data and fail the table
        # only when a batch finally has violations — bad config must
        # fail before any batch runs.
        if self.expectations_mode not in ("fail", "drop"):
            raise ValueError(
                f"table {self.name}: unknown expectations_mode "
                f"{self.expectations_mode!r} (use 'fail' or 'drop')"
            )

    @property
    def is_incremental(self) -> bool:
        return self.watermark_column is not None


@dataclass
class PipelineSpec:
    tables: list[TableSpec]
    max_parallel_tables: int = 4  # reference: Airflow concurrency=4 (dags/…:89-90)
    # In-run retries for TRANSIENT JDBC failures only (deadlock victim,
    # connection drop, lock timeout — sources.jdbc_error_class says
    # which). 0 = reference behavior (fail the table, next scheduled
    # run retries). Retrying is safe by the §2.C contract: a failed
    # run never advances the watermark and every sink absorbs replays
    # (staged swaps / merge keys / content fences), so an in-run retry
    # is indistinguishable from the next scheduled run arriving early.
    transient_retries: int = 0

    def enabled_tables(self) -> list[TableSpec]:
        return [t for t in self.tables if t.enabled]


def read_table_registry(path: str | Path, table_list: str = "all") -> list[TableSpec]:
    """Read a reference-format ``tables_list`` CSV into specs.

    ``table_list`` is the reference CLI arg: ``"all"`` or a
    comma-separated subset (app.py:39-46, util.py:375-381). Requested
    tables that are missing/disabled are reported (printed) like the
    reference's diagnostic anti-join (util.py:384-387) but never fail
    the run.
    """
    specs: list[TableSpec] = []
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            wm_col = (row.get("watermark_column") or "").strip() or None
            wm_type = (row.get("watermark_type") or "").strip() or None
            specs.append(
                TableSpec(
                    name=row["table_name"].strip(),
                    enabled=(row.get("to_be_loaded", "").strip().lower() == "yes"),
                    watermark_column=wm_col,
                    watermark_type=wm_type,
                )
            )
    enabled = [s for s in specs if s.enabled]
    if table_list.strip().lower() == "all":
        return enabled
    requested = [t.strip() for t in table_list.split(",") if t.strip()]
    by_name = {s.name: s for s in enabled}
    missing = [t for t in requested if t not in by_name]
    if missing:
        print(f"WARNING: requested tables not found/enabled: {missing}")
    return [by_name[t] for t in requested if t in by_name]
