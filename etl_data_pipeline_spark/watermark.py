"""Watermark state store + incremental-scan predicate.

Re-implements, Spark-first, the reference's watermark machinery and its
exact semantics (SURVEY.md §2.C):

- strict ``>`` comparison — boundary rows equal to the stored watermark
  are never re-read (util.py:156, util.py:159)
- type dispatch: 'id' -> integer cast, 'timestamp' -> timestamp;
  unknown type or unparseable stored value degrades to FULL LOAD rather
  than failing the table (app.py:105-122)
- missing / 'None' / empty state -> full load (app.py:103, 123-127)
- watermark advances to the max of the just-read batch, only after a
  successful load (app.py:157-172, util.py:403-426)
- empty batch -> watermark unchanged (app.py:147-153)

State lives in a JSON file per store (the reference used Airflow
Variables keyed ``last_watermark_<table>``, dags/…:44-76; same keying
here). Values are stored as strings exactly like Airflow Variables.

Scale note: the watermark filter is a plain Catalyst predicate, so at
100 TB it is pushed into the parquet/JDBC scan (min/max row-group
pruning / WHERE clause pushdown) — the incremental read touches only
new data, it does not scan-then-filter.
"""

from __future__ import annotations

import json
import os
import tempfile
from datetime import datetime
from pathlib import Path
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class WatermarkStore:
    """Per-table scalar watermark state, persisted as JSON.

    Keys follow the reference's ``last_watermark_<table>`` convention
    (dags/data_pipeline_with_incremental.py:44-46).

    Concurrency: one store file is SHARED by every table job in a
    pipeline run (the fan-out runner advances distinct per-table keys
    from a thread pool), and each mutation is a whole-file
    read-modify-write. ``set``/``clear`` therefore hold an exclusive
    flock on a ``.lock`` sidecar for the read+write, so concurrent
    advances of DIFFERENT keys can never drop each other's update —
    without the lock, two jobs reading the same snapshot would each
    persist a map missing the other's table. ``get`` stays lock-free:
    the rename publish is atomic, so readers always see a complete
    (point-in-time) map.
    """

    def __init__(self, path: str | Path):
        self.path = Path(path)

    def _locked(self):
        from etl_data_pipeline_spark.functions.locks import exclusive_flock

        return exclusive_flock(f"{self.path}.lock")

    def _read_all(self) -> dict[str, str]:
        if not self.path.exists():
            return {}
        try:
            return json.loads(self.path.read_text())
        except (json.JSONDecodeError, OSError):
            return {}

    def _write_all(self, state: dict[str, str]) -> None:
        # atomic DURABLE publish: write-temp + fsync + rename + dir
        # fsync. The rename alone survives a process crash but not a
        # power loss shortly after exit — on ext4/xfs the renamed file
        # can surface zero-length, _read_all then returns {} and every
        # table degrades to full load (duplicating rows on plain
        # append sinks). Same protocol as the writer-lease sidecar.
        fd, tmp = tempfile.mkstemp(dir=str(self.path.parent), suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(state, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self.path)
        except BaseException:
            try:
                os.unlink(tmp)  # don't leak the temp on a failed dump
            except OSError:
                pass
            raise
        try:
            dfd = os.open(str(self.path.parent), os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
        except OSError:
            pass  # directory fsync is best-effort (not supported everywhere)

    def get(self, table: str) -> str | None:
        """Stored watermark as a string, or None (≙ Variable.get default_var=None)."""
        return self._read_all().get(f"last_watermark_{table}")

    def set(self, table: str, value: Any) -> None:
        with self._locked():
            state = self._read_all()
            state[f"last_watermark_{table}"] = str(value)
            self._write_all(state)

    def clear(self, table: str) -> None:
        with self._locked():
            state = self._read_all()
            state.pop(f"last_watermark_{table}", None)
            self._write_all(state)


def parse_watermark(raw: str | None, watermark_type: str | None) -> Any | None:
    """Typed watermark value, or None meaning FULL LOAD.

    Degrade paths (must match app.py:96-132 exactly):
    - raw missing / '' / 'None'          -> None (full load)
    - type 'id': int(raw); ValueError    -> None (full load)
    - type 'timestamp': ISO parse; fail  -> None (full load)
    - unknown type                       -> None (full load)
    """
    if raw is None or raw == "" or raw == "None":
        return None
    if watermark_type == "id":
        try:
            return int(raw)
        except (ValueError, TypeError):
            return None
    if watermark_type == "timestamp":
        # The reference compares timestamps as SQL strings
        # (app.py:108-112, util.py:154-156). We upgrade to a typed
        # TimestampType comparison — documented semantic fix
        # (SURVEY.md §2.C #2).
        try:
            return datetime.fromisoformat(str(raw))
        except (ValueError, TypeError):
            return None
    return None  # unknown watermark type -> full load (app.py:113-117)


def watermark_predicate(column: str, value: Any) -> Column:
    """Strict ``>`` incremental predicate (util.py:156,159).

    Returned as a Catalyst Column so the optimizer pushes it into the
    source scan (JDBC WHERE / parquet row-group pruning).
    """
    return F.col(column) > F.lit(value)


def apply_watermark(df: DataFrame, column: str | None, value: Any | None) -> DataFrame:
    """Watermark-filtered view of ``df`` (full scan when value is None)."""
    if column is None or value is None:
        return df
    return df.filter(watermark_predicate(column, value))


def max_watermark(df: DataFrame, column: str) -> Any | None:
    """Max of the watermark column over the batch (util.py:403-426).

    1-row aggregate via ``first()`` — never a full collect. NULLs are
    skipped by F.max, matching the reference's None-skip (util.py:414).
    """
    row = df.agg(F.max(F.col(column)).alias("wm")).first()
    return None if row is None else row["wm"]
