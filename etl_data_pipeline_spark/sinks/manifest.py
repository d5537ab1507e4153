"""Manifest-pointer table: single-rename atomic commits over parquet.

The staged-swap sinks (sinks/__init__.py) are all-or-nothing for the
WRITER, but their two-rename swap leaves a window where the target
path does not exist — readers must either tolerate a transient miss or
take the writer lease. This module closes that last gap the way real
table formats do (Delta's _delta_log, Iceberg's metadata pointer,
Hive's symlink tables): data files live in immutable delta
directories, each VERSION is a small manifest listing the directories
it comprises, and the only mutable object is the current-version
pointer file swapped in ONE atomic rename. Readers resolve the
manifest, then read directories that COMMITS never rename or delete —
no missing-path window, with no reader-side locking.

    table/
      _versions/v00000001/        <- immutable delta dirs (one per
      _versions/v00000002/           data-writing commit)
      _manifests/v00000002.json   <- immutable per-version manifest
                                     snapshots (time travel)
      MANIFEST.json               <- current pointer: {"version": 2,
                                     "dirs": [...], "schema": {...}, ...}
      MANIFEST.json.lease         <- writer serialization (flock + fence)

**Append is O(delta), not O(table)**: an append commit writes ONLY the
incoming rows as a new delta directory and publishes a manifest whose
``dirs`` list is the previous list plus that directory — the Delta/
Iceberg file-list idiom. (The first cut of this module rewrote the
whole table per append; at 100 TB that is an O(table) write per
micro-batch — disqualifying for the streaming sink.) The cost moves to
READS as the dir list grows — ``compact()`` folds the list back to one
directory as a new version, the standard small-files answer.

Schema lives IN the manifest (ordered column -> Spark simpleString
type), so append-time compatibility checks never touch data files:
mismatched column sets fail loudly unless ``merge_schema=True`` opts
into evolution (new columns append to the schema; old delta dirs
null-fill them at read via unionByName), and a TYPE conflict on the
same column always fails — silent cast-widening hides producer bugs.
Time travel reads each version with the schema ITS manifest recorded.

Commits serialize on the same flock/fencing-token lease as the staged
sinks; the manifest records the fencing token so the history is an
auditable total order. Old versions stay readable (time travel) until
``vacuum`` reclaims them; retention (``keep_last``) is the operator's
promise to in-flight readers — exactly Delta/Iceberg VACUUM
semantics: retain at least your longest-running reader. Because
versions share delta dirs, vacuum deletes a data dir only when NO
retained version references it.

Honest scope note (VERDICT r3 "missing" #2): this is the single-node /
POSIX-rename instantiation of the table-format idea — correct
concurrent-writer behavior on one host via flock. On S3-class object
stores rename is not atomic and flock does not exist; there you swap
the pointer with a conditional PUT (If-Match) or use Delta/Iceberg —
the API here is deliberately shaped so that swap is the only piece to
replace.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import tempfile
from functools import reduce

from pyspark.sql import DataFrame, SparkSession

from etl_data_pipeline_spark.sinks import writer_lease

MANIFEST = "MANIFEST.json"


class FeedBrokenError(ValueError):
    """read_changes cannot produce the requested delta because an
    overwrite/merge dropped directories inside the range — consumers
    must re-sync from a full snapshot. A TYPED class (not message
    sniffing): the message embeds the table path, and a path that
    happens to contain 'overwrite' must not be classified as a feed
    break by substring matching (r9 review)."""


class VacuumedError(FileNotFoundError):
    """A pinned version's snapshot was reclaimed by retention; same
    typing rationale as FeedBrokenError."""


_VERSION_RE = re.compile(r"v(\d{8})")


def _ddl(schema: dict[str, str]) -> str:
    """The recorded column->type map as a Spark DDL string — one
    definition for every schema-pinned read/empty-frame site."""
    return ", ".join(f"`{c}` {t}" for c, t in schema.items())


def _manifest_path(table_dir: str) -> str:
    return os.path.join(table_dir, MANIFEST)


def _snapshot_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, "_manifests", f"v{version:08d}.json")


def _normalize(m: dict | None) -> dict | None:
    """Accept both manifest generations: the first cut recorded a
    single ``dir``; current manifests record a ``dirs`` list."""
    if m is not None and "dirs" not in m and "dir" in m:
        m = dict(m)
        m["dirs"] = [m.pop("dir")]
    return m


def read_manifest(table_dir: str) -> dict | None:
    """Current manifest, or None for a table that has no commits yet.
    Pure read — no lock: the single-rename publish guarantees any
    reader sees a complete manifest."""
    try:
        with open(_manifest_path(table_dir)) as f:
            return _normalize(json.load(f))
    except FileNotFoundError:
        return None


def _schema_of(df: DataFrame) -> dict[str, str]:
    return {f.name: f.dataType.simpleString() for f in df.schema.fields}


def _check_schema(
    cur: dict, df: DataFrame, merge_schema: bool, table_dir: str
) -> dict[str, str]:
    """Manifest-only append compatibility check (no data files read).
    Returns the merged schema the new version records."""
    prev = cur.get("schema")
    if prev is None:
        # legacy manifest without a recorded schema: derive from data
        spark = df.sparkSession
        prev = _schema_of(spark.read.parquet(os.path.join(table_dir, cur["dirs"][-1])))
        cur = {**cur, "schema": prev}
    return _check_schema_dict(cur, _schema_of(df), merge_schema, table_dir)


def _check_schema_dict(
    cur: dict, new: dict[str, str], merge_schema: bool, table_dir: str
) -> dict[str, str]:
    """Core of :func:`_check_schema` for callers that hold a schema
    dict rather than a DataFrame (the staged-files writer)."""
    prev = cur.get("schema")
    if prev is None:
        raise ValueError(
            f"append to {table_dir!r}: legacy manifest records no schema; "
            f"run one DataFrame-based commit() first (it backfills the "
            f"schema) or overwrite"
        )
    conflicts = {
        c: (prev[c], new[c]) for c in new if c in prev and prev[c] != new[c]
    }
    if conflicts:
        raise ValueError(
            f"append to {table_dir!r} changes column TYPES {conflicts} — "
            f"type evolution is never implicit (a silent cast hides "
            f"producer bugs); migrate via an overwrite commit"
        )
    extra = [c for c in new if c not in prev]
    missing = [c for c in prev if c not in new]
    if (extra or missing) and not merge_schema:
        raise ValueError(
            f"append to {table_dir!r} drifts the schema "
            f"(new columns {extra}, absent columns {missing}); a typo'd "
            f"producer must fail loudly — pass merge_schema=True to opt "
            f"into evolution"
        )
    merged = dict(prev)
    for c in extra:
        merged[c] = new[c]
    return merged


def commit(
    df: DataFrame,
    table_dir: str,
    mode: str = "overwrite",
    merge_schema: bool = False,
    merge_keys: tuple[str, ...] | None = None,
    txn: tuple[str, int] | None = None,
    partition_by: tuple[str, ...] | None = None,
) -> dict:
    """Commit ``df`` as the table's next version and return the new
    manifest.

    - ``overwrite``: the new version IS the DataFrame (``dirs`` = the
      one new directory).
    - ``append``: O(delta) — ONLY the incoming rows are written, as a
      new immutable directory appended to the previous version's
      ``dirs`` list. Readers of the previous version are untouched.
      Column sets must match the manifest schema exactly unless
      ``merge_schema=True`` opts into evolution (see module doc);
      same-column type changes always fail.

    Replay idempotency, two independent fences:

    - ``merge_keys``: CONTENT fence for append — incoming rows whose
      key already exists in the current version are anti-joined away
      (the manifest twin of idempotent_append_parquet, fixing the
      reference's replay duplication, SURVEY.md §2.C #5/#7). A replay
      whose rows all already landed is a no-op: NO new version is
      written and the current manifest is returned unchanged.
    - ``txn``: TRANSACTION fence ``(app_id, version)`` for streaming
      foreachBatch — the manifest records the highest committed
      version per app_id (Delta's txnAppId/txnVersion idiom), and a
      commit at-or-below that high-water mark returns the current
      manifest without reading the batch AT ALL. This is the
      exactly-once contract: the batch data and its txn mark publish
      in the same atomic rename, so a crash between them is
      impossible and a replayed batch is always detected.

    Sequence (under the writer lease, fencing token = lease token):
    1. read current manifest (inside the lease: serializable)
    2. write the delta to _versions/v{n+1} — a failure here leaves an
       orphan directory and an UNCHANGED manifest (vacuum cleans it)
    3. write the version snapshot to _manifests/v{n+1}.json (fsynced)
    4. write the pointer to a temp file, fsync, single os.replace onto
       MANIFEST.json — the commit point; crash before it = no commit,
       after it = committed. Readers never observe an intermediate
       state.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite/append, not {mode!r}")
    os.makedirs(table_dir, exist_ok=True)
    with writer_lease(_manifest_path(table_dir)) as fence:
        return _commit_locked(
            df, table_dir, mode, fence, merge_schema, merge_keys, txn,
            partition_by=partition_by,
        )


def _commit_locked(
    df: DataFrame,
    table_dir: str,
    mode: str,
    fence: int,
    merge_schema: bool = False,
    merge_keys: tuple[str, ...] | None = None,
    txn: tuple[str, int] | None = None,
    data_change: bool = True,
    partition_by: tuple[str, ...] | None = None,
) -> dict:
    """Steps 1-4 of commit(); caller holds the manifest writer lease."""
    cur = read_manifest(table_dir)
    # partitioning is a TABLE property, not a per-commit choice: the
    # first commit fixes it; appends must match (or omit it — the
    # manifest's layout is authoritative); changing it needs overwrite
    cur_parts = tuple((cur or {}).get("partition_by") or ())
    if mode == "append" and cur is not None:
        if partition_by is not None and tuple(partition_by) != cur_parts:
            raise ValueError(
                f"append to {table_dir!r} changes partition_by "
                f"{cur_parts} -> {tuple(partition_by)}; repartitioning "
                f"the layout requires an overwrite commit"
            )
        partition_by = cur_parts or None
    parts = tuple(partition_by or ())
    prev_txn: dict[str, int] = dict((cur or {}).get("txn", {}))
    if txn is not None:
        app_id, txn_version = txn
        if app_id in prev_txn and int(txn_version) <= prev_txn[app_id]:
            return cur  # replayed batch: already committed, skip
        prev_txn[app_id] = int(txn_version)
    version = 1 if cur is None else cur["version"] + 1
    if cur is not None and not os.path.isdir(os.path.join(table_dir, "_manifests")):
        _backfill_legacy_snapshots(table_dir, cur)
    rel = os.path.join("_versions", f"v{version:08d}")
    data_dir = os.path.join(table_dir, rel)
    shutil.rmtree(data_dir, ignore_errors=True)  # crashed orphan of a failed commit
    out = df
    keyed = False
    if mode == "append" and cur is not None:
        schema = _check_schema(cur, df, merge_schema, table_dir)
        if merge_keys:
            keys = list(merge_keys)
            prev_keys = _read_dirs(
                df.sparkSession, table_dir, cur["dirs"], cur.get("schema")
            ).select(*keys).distinct()
            # persist: the anti-joined plan (a full-table key scan) is
            # evaluated by BOTH the emptiness probe and the write —
            # unpersisted it would run twice per batch, and a
            # non-deterministic input could even diverge between them
            out = df.join(prev_keys, on=keys, how="left_anti").persist()
            keyed = True
            # all rows already present and no txn mark to record:
            # true no-op — don't burn a version on an empty delta
            if txn is None and out.limit(1).count() == 0:
                out.unpersist()
                return cur
        dirs = list(cur["dirs"]) + [rel]
    else:
        schema = _schema_of(df)
        dirs = [rel]
    try:
        if parts:
            missing = [c for c in parts if c not in out.columns]
            if missing:
                raise ValueError(
                    f"partition_by columns {missing} not in the DataFrame "
                    f"(columns: {out.columns})"
                )
            out.write.partitionBy(*parts).parquet(data_dir)
        else:
            out.write.parquet(data_dir)
    finally:
        if keyed:
            out.unpersist()
    manifest = {"version": version, "dirs": dirs, "schema": schema, "fence": fence}
    if parts:
        manifest["partition_by"] = list(parts)
    _record_rowcounts(manifest, cur, data_dir, appended=len(dirs) > 1, data_change=data_change)
    if not data_change:
        # layout-only commit (compaction): logically the same rows —
        # the change feed skips it instead of re-emitting the table
        manifest["data_change"] = False
    if prev_txn:
        manifest["txn"] = prev_txn  # carried forward + this commit's mark
    return _publish_version(table_dir, data_dir, manifest)


def _record_rowcounts(
    manifest: dict, cur: dict | None, data_dir: str, appended: bool, data_change: bool = True
) -> None:
    """Audit bookkeeping (DESCRIBE HISTORY's numRows): per-commit delta
    row count from parquet footers, running total carried through the
    manifest. Layout-only commits keep the total and contribute no
    delta. Legacy manifests without a recorded total simply restart
    the running total from this commit's perspective (None = unknown),
    never guessing."""
    delta = _dir_rowcount(data_dir)
    manifest["delta_rows"] = delta if data_change else 0
    if not appended:
        manifest["total_rows"] = delta
    else:
        prev_total = (cur or {}).get("total_rows")
        manifest["total_rows"] = None if prev_total is None else prev_total + delta


def _publish_version(table_dir: str, data_dir: str, manifest: dict) -> dict:
    """The durable publish tail shared by every commit flavor: fsync
    the data, write the immutable snapshot, swap the pointer in ONE
    atomic rename, fsync the rename."""
    # data must be durable BEFORE the pointer is — including the
    # _versions/ dirent naming the new directory (losing that to a
    # power cut while MANIFEST.json survived would orphan the commit)
    _fsync_tree(data_dir)
    pfd = os.open(os.path.dirname(data_dir), os.O_RDONLY)
    try:
        os.fsync(pfd)
    finally:
        os.close(pfd)
    payload = json.dumps(manifest)
    # immutable snapshot first (time travel), then the pointer swap
    snap = _snapshot_path(table_dir, manifest["version"])
    os.makedirs(os.path.dirname(snap), exist_ok=True)
    _write_durable(snap, payload)
    fd, tmp = tempfile.mkstemp(dir=table_dir, suffix=".manifest.tmp")
    with os.fdopen(fd, "w") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _manifest_path(table_dir))  # THE commit point: one atomic rename
    dfd = os.open(table_dir, os.O_RDONLY)
    try:
        os.fsync(dfd)  # persist the rename itself across power loss
    finally:
        os.close(dfd)
    return manifest


def commit_staged_files(
    table_dir: str,
    staged_files: list[str],
    schema: dict[str, str],
    mode: str = "append",
    merge_schema: bool = False,
    txn: tuple[str, int] | None = None,
) -> dict:
    """Commit ALREADY-WRITTEN parquet files as the table's next
    version — the zero-copy publish path for writers that produce
    files on executors (the ``manifest_table`` Spark DataSource
    writer): each staged file is MOVED (os.replace, same filesystem)
    into the new immutable delta directory, so the commit's data cost
    is O(#files) renames regardless of row volume. Same lease, same
    fences (txn), same schema contract, same single-rename publish as
    :func:`commit`.

    ``schema`` is the writer's column -> Spark simpleString type map
    (the DataFrame schema the files were written with).
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite/append, not {mode!r}")
    os.makedirs(table_dir, exist_ok=True)
    with writer_lease(_manifest_path(table_dir)) as fence:
        cur = read_manifest(table_dir)
        prev_txn: dict[str, int] = dict((cur or {}).get("txn", {}))
        if txn is not None:
            app_id, txn_version = txn
            if app_id in prev_txn and int(txn_version) <= prev_txn[app_id]:
                return cur  # replayed batch: already committed, skip
            prev_txn[app_id] = int(txn_version)
        version = 1 if cur is None else cur["version"] + 1
        if cur is not None and not os.path.isdir(
            os.path.join(table_dir, "_manifests")
        ):
            _backfill_legacy_snapshots(table_dir, cur)
        rel = os.path.join("_versions", f"v{version:08d}")
        data_dir = os.path.join(table_dir, rel)
        shutil.rmtree(data_dir, ignore_errors=True)
        if cur is not None and cur.get("partition_by"):
            raise ValueError(
                f"{table_dir!r} is hive-partitioned by "
                f"{cur['partition_by']}; the staged-files writer emits "
                f"flat files — use the DataFrame commit() path for "
                f"partitioned tables"
            )
        if mode == "append" and cur is not None:
            out_schema = _check_schema_dict(cur, dict(schema), merge_schema, table_dir)
            dirs = list(cur["dirs"]) + [rel]
        else:
            out_schema = dict(schema)
            dirs = [rel]
        os.makedirs(data_dir)
        for i, f in enumerate(staged_files):
            os.replace(f, os.path.join(data_dir, f"part-{i:05d}.parquet"))
        manifest = {
            "version": version,
            "dirs": dirs,
            "schema": out_schema,
            "fence": fence,
        }
        _record_rowcounts(manifest, cur, data_dir, appended=len(dirs) > 1)
        if prev_txn:
            manifest["txn"] = prev_txn
        return _publish_version(table_dir, data_dir, manifest)


def _backfill_legacy_snapshots(table_dir: str, cur: dict) -> None:
    """First commit to a legacy (first-cut) table: materialize
    snapshot files for its existing versions so time travel keeps
    working once _manifests exists (a legacy version's dirs list is
    exactly its own full-rewrite directory). Runs once, under the
    lease."""
    vdir = os.path.join(table_dir, "_versions")
    os.makedirs(os.path.join(table_dir, "_manifests"), exist_ok=True)
    if os.path.isdir(vdir):
        for entry in sorted(os.listdir(vdir)):
            m = _VERSION_RE.fullmatch(entry)
            if m is None:
                continue
            v = int(m.group(1))
            if v > cur["version"]:
                continue  # crashed-commit orphan, not a version
            snap = {"version": v, "dirs": [os.path.join("_versions", entry)]}
            if v == cur["version"]:
                snap = dict(cur)  # keep fence/txn of the head
            _write_durable(_snapshot_path(table_dir, v), json.dumps(snap))


def _write_durable(path: str, payload: str) -> None:
    """Write ``path`` atomically (temp + rename) and fsync file and
    parent dirent."""
    d = os.path.dirname(path)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    dfd = os.open(d, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _dir_rowcount(data_dir: str) -> int:
    """Row count of one delta directory from parquet FOOTERS only —
    metadata reads, no data pages, driver-side (the dir is one
    commit's output, not the table)."""
    import pyarrow.parquet as pq

    n = 0
    for root, _dirs, files in os.walk(data_dir):
        for name in files:
            if name.endswith(".parquet"):
                n += pq.ParquetFile(os.path.join(root, name)).metadata.num_rows
    return n


def _fsync_tree(path: str) -> None:
    """fsync every file and directory under ``path``. Spark writes
    parquet without fsync; publishing a manifest that points at
    non-durable data would let a power loss leave the COMMITTED
    version truncated. Driver-side walk — delta dirs are one commit's
    output, not the whole table history."""
    for root, dirs, files in os.walk(path, topdown=False):
        for name in files:
            fd = os.open(os.path.join(root, name), os.O_RDONLY)
            try:
                os.fsync(fd)
            finally:
                os.close(fd)
        fd = os.open(root, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)


def _read_dirs(
    spark: SparkSession,
    table_dir: str,
    dirs: list[str],
    schema: dict[str, str] | None,
) -> DataFrame:
    """Union the delta directories of one version. Multi-dir versions
    unionByName with null-fill so post-evolution reads see old deltas
    null-filled in the evolved columns; the final select pins the
    manifest's column order.

    When the manifest records a schema, each dir is read WITH it: an
    inference read would fail outright on a delta dir holding zero
    parquet files (a committed empty partitioned append writes only
    _SUCCESS — UNABLE_TO_INFER_SCHEMA), poisoning every later read of
    the whole table; the recorded schema turns that dir into an empty
    frame instead. It also pins hive-partition column types at the
    SCAN instead of directory inference."""
    from pyspark.sql import functions as F

    if schema:
        ddl = _ddl(schema)
        frames = [
            spark.read.schema(ddl).parquet(os.path.join(table_dir, d))
            for d in dirs
        ]
    else:
        frames = [spark.read.parquet(os.path.join(table_dir, d)) for d in dirs]
    if len(frames) == 1:
        out = frames[0]
    else:
        out = reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
        )
    if schema:
        # CAST to the recorded schema, not just select: hive-partition
        # columns come back with DIRECTORY-INFERRED types (a string
        # region partition stays string, but '2024-01-01' infers date,
        # '42' infers int) — the manifest's recorded type is the
        # contract
        out = out.select(
            *[F.col(c).cast(t).alias(c) for c, t in schema.items()]
        )
    return out


def _range_disjoint(rng, lo, hi) -> bool:
    """True when [rng.min, rng.max] provably misses [lo, hi] (either
    bound may be None = unbounded). Incomparable types keep the dir."""
    try:
        if lo is not None and rng[1] < lo:
            return True
        if hi is not None and rng[0] > hi:
            return True
    except TypeError:
        return False
    return False


def prune_dirs(
    table_dir: str, dirs: list[str], ranges: dict[str, tuple]
) -> list[str]:
    """Delta directories that can contain rows matching every column
    range in ``ranges`` ({col: (lo, hi)}, None = unbounded side).

    Uses the same cached parquet footer min/max sidecar as merge
    pruning (:func:`_dir_key_range_cached` — driver-side metadata
    only, computed once per immutable dir). A dir with unknown stats
    for a column is KEPT: pruning is an optimization, never the
    correctness boundary. This is what makes z-ordered writes
    (write_zordered) pay off on the READ side: clustered files give
    narrow per-dir ranges, so a selective filter touches a strict
    subset of dirs."""
    kept = []
    for d in dirs:
        skip = False
        for col, (lo, hi) in ranges.items():
            rng = _dir_key_range_cached(table_dir, d, col)
            if rng is not None and _range_disjoint(rng, lo, hi):
                skip = True
                break
        if not skip:
            kept.append(d)
    return kept


def read_table(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    where: dict | None = None,
) -> DataFrame:
    """Read the current version (or a pinned one — time travel).

    ``where`` ({col: (lo, hi) | scalar}) both PRUNES delta directories
    via cached footer min/max stats (prune_dirs) and applies the exact
    row filter to the result, so ``read_table(..., where=w)`` equals
    ``read_table(...)`` filtered — just cheaper: at 100 TB the scan,
    not the merge, dominates, and a selective filter on a z-ordered
    table reads a strict subset of dirs.

    Resolution is manifest -> immutable directories, so a concurrent
    COMMIT can never yield a missing path or a half-written mix: the
    reader's directories existed, complete, before its manifest was
    published. A concurrent VACUUM can delete versions past retention,
    including one being read — size ``keep_last`` to outlast the
    longest-running reader (the standard table-format retention
    contract); a pinned read that loses that race raises a clear
    "vacuumed" error, not a raw path error.
    """
    from pyspark.sql import functions as F

    cur = read_manifest(table_dir)
    if cur is None:
        raise FileNotFoundError(f"no committed version in {table_dir!r}")
    if version is None or version == cur["version"]:
        m = cur
    else:
        if not 1 <= version <= cur["version"]:
            raise ValueError(
                f"version {version} not in [1, {cur['version']}] for {table_dir!r}"
            )
        m = _load_snapshot(table_dir, version, cur)
    dirs = m["dirs"]
    cond = None
    if where:
        ranges = {
            c: (v if isinstance(v, tuple) else (v, v)) for c, v in where.items()
        }
        dirs = prune_dirs(table_dir, dirs, ranges)
        for c, (lo, hi) in ranges.items():
            for bound, op in ((lo, "__ge__"), (hi, "__le__")):
                if bound is not None:
                    term = getattr(F.col(c), op)(F.lit(bound))
                    cond = term if cond is None else (cond & term)
        if not dirs and m.get("schema"):
            # every dir pruned: an empty frame with the table schema
            ddl = _ddl(m["schema"])
            empty = spark.createDataFrame([], ddl)
            return empty.filter(cond) if cond is not None else empty
        if not dirs:
            dirs = m["dirs"]  # legacy table without recorded schema:
            # cannot synthesize an empty typed frame — skip pruning
    out = _read_dirs(spark, table_dir, dirs, m.get("schema"))
    return out.filter(cond) if cond is not None else out


def _load_snapshot(table_dir: str, version: int, cur: dict) -> dict:
    """Version snapshot, or the current manifest for the head; raises
    a 'vacuumed' error when retention dropped it. The legacy fallback
    (first-cut tables: full-rewrite dirs named after their version, no
    snapshot files) applies ONLY when the table has no _manifests
    directory at all — in a dir-list table a data dir named v{N} can
    outlive version N's snapshot (it stays referenced by newer
    versions), so its existence must not masquerade as the snapshot."""
    if version == cur["version"]:
        return cur
    try:
        with open(_snapshot_path(table_dir, version)) as f:
            return _normalize(json.load(f))
    except FileNotFoundError:
        legacy = os.path.join("_versions", f"v{version:08d}")
        if not os.path.isdir(
            os.path.join(table_dir, "_manifests")
        ) and os.path.isdir(os.path.join(table_dir, legacy)):
            return {"version": version, "dirs": [legacy], "schema": None}
        raise VacuumedError(
            f"version {version} of {table_dir!r} was vacuumed"
        ) from None


def read_changes(
    spark: SparkSession,
    table_dir: str,
    since_version: int,
    until_version: int | None = None,
    version_column: str | None = None,
) -> DataFrame:
    """Change feed: the rows ADDED after ``since_version`` (Delta's
    readChangeFeed for the append-only case). With dir-list versions
    this is O(delta): each append version's changes ARE the
    directories it added, so the feed is a union of exactly those
    directories — the full table is never scanned. ``since_version=0``
    means 'everything' (the feed of a table never read before).

    This is what makes a manifest table a first-class INCREMENTAL
    source without a watermark column: a consumer stores the last
    version it processed and reads forward from there — the engine's
    version-watermark pipeline mode (sources/__init__.py
    'changes_since').

    Compaction commits are layout-only (``data_change: false``) and
    are skipped — their rows were already emitted by the append
    commits that produced them. A real OVERWRITE inside the range
    breaks append-only semantics and raises (the consumer must
    re-sync from a snapshot, exactly Delta CDF's contract); a
    snapshot already vacuumed raises the standard 'vacuumed' error —
    size retention to outlast your slowest consumer.

    ``until_version`` pins the feed's UPPER bound (default: the
    current version). An incremental consumer that records its
    progress needs this: it captures the head version FIRST, reads the
    feed bounded to it, and records exactly that version — a commit
    landing mid-read can then never produce rows the recorded
    watermark claims were not read.

    ``version_column`` names an extra long column carrying the
    manifest version whose commit ADDED each row (Delta CDF's
    ``_commit_version`` analog). A merge-keyed consumer needs it: a
    key updated in two source versions inside one feed range yields
    two delta rows, and only the feed version says which one wins —
    no data column carries that ordering. Costs nothing extra to
    read: the same delta dirs, one literal per version.
    """
    from pyspark.sql import functions as F

    cur = read_manifest(table_dir)
    if cur is None:
        raise FileNotFoundError(f"no committed version in {table_dir!r}")
    head = cur["version"] if until_version is None else int(until_version)
    if not 0 <= since_version <= cur["version"]:
        raise ValueError(
            f"since_version {since_version} not in [0, {cur['version']}] "
            f"for {table_dir!r}"
        )
    if not since_version <= head <= cur["version"]:
        raise ValueError(
            f"until_version {head} not in [{since_version}, {cur['version']}] "
            f"for {table_dir!r}"
        )
    if since_version == 0:
        prev: set[str] = set()
    else:
        prev = set(_load_snapshot(table_dir, since_version, cur)["dirs"])
    added: list[str] = []
    by_version: list[tuple[int, list[str]]] = []
    for v in range(since_version + 1, head + 1):
        m = _load_snapshot(table_dir, v, cur)
        dirs = set(m["dirs"])
        if m.get("data_change", True):
            removed = prev - dirs
            if removed:
                raise FeedBrokenError(
                    f"change feed of {table_dir!r} broken by an "
                    f"overwrite/merge at version {v} (directories "
                    f"{sorted(removed)} dropped); re-sync from a full "
                    f"snapshot"
                )
            new = [d for d in m["dirs"] if d not in prev and d not in added]
            added.extend(new)
            if new:
                by_version.append((v, new))
        # layout-only versions shift the baseline without logical change
        prev = dirs
    # column set AS OF the feed's upper bound — cur's schema may have
    # evolved past `head`, and those columns don't exist in the fed dirs
    schema = (
        cur.get("schema")
        if head == 0
        else _load_snapshot(table_dir, head, cur).get("schema")
    )
    if not added:
        # empty feed with the bound version's schema, so downstream
        # unions and writes see stable columns
        if schema:
            ddl = _ddl(schema)
            out = spark.createDataFrame([], ddl)
        else:
            out = _read_dirs(spark, table_dir, cur["dirs"], None).limit(0)
        if version_column:
            out = out.withColumn(version_column, F.lit(None).cast("long"))
        return out
    if version_column is None:
        return _read_dirs(spark, table_dir, added, schema)
    # one frame per COMMIT (not per dir): the version literal is the
    # same for every dir a commit added, and the commit count in a feed
    # range is small by construction (a consumer reading a 10k-version
    # backlog should snapshot-resync, not feed)
    frames = [
        _read_dirs(spark, table_dir, dirs, schema).withColumn(
            version_column, F.lit(v).cast("long")
        )
        for v, dirs in by_version
    ]
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
    )


def history(table_dir: str) -> list[dict]:
    """The table's retained commit history, oldest first — version,
    dirs, fencing token, txn marks, data_change flag per entry (the
    DESCRIBE HISTORY analog). Pure manifest bookkeeping: no data read,
    no lock (snapshots are immutable; the head is one atomic read).
    Vacuumed versions are absent — history length is the retention
    window, by design."""
    cur = read_manifest(table_dir)
    if cur is None:
        return []
    out: list[dict] = []
    for v in range(1, cur["version"] + 1):
        try:
            out.append(_load_snapshot(table_dir, v, cur))
        except FileNotFoundError:
            continue  # vacuumed
    return out


# sentinel for "the footers could not be READ" — distinct from "the
# stats are genuinely absent": the former must never be cached (a
# transient IO blip would otherwise permanently disable pruning for
# an immutable dir), the latter is a stable, cacheable fact
_STATS_READ_FAILED = object()


def _norm_stat(v):
    """Normalize a parquet footer stat for comparison against
    Spark-side aggregates: footer TIMESTAMP stats come back tz-AWARE
    (Spark writes isAdjustedToUTC instants) while Spark's F.min/F.max
    collect as naive session-time values — an aware-vs-naive
    comparison raises TypeError, silently disabling pruning for every
    timestamp-keyed merge. Both sides are therefore normalized to the
    INTEGER epoch-microsecond instant (the batch side via
    F.unix_micros in _validate_merge_batch): converting either side
    to a naive wall-clock rendering instead would be WRONG under a
    non-UTC session timezone (shifted ranges ⇒ a dir wrongly pruned ⇒
    silent row loss in merges) and ambiguous inside DST folds —
    integer instants have neither problem. Naive footer timestamps
    (TIMESTAMP_NTZ files) stay naive: incomparable with the integer ⇒
    _range_disjoint keeps the dir ⇒ never prunes, never corrupts."""
    import datetime as _dt

    if isinstance(v, _dt.datetime) and v.tzinfo is not None:
        epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
        return (v - epoch) // _dt.timedelta(microseconds=1)
    return v


def _dir_key_range(table_dir: str, rel_dir: str, column: str):
    """(min, max) of ``column`` across every parquet footer under one
    delta directory; None when stats are genuinely absent (missing
    footer stats, a hive-partition column absent from the files,
    incomparable stat types); the ``_STATS_READ_FAILED`` sentinel when
    a footer could not be read at all. Driver-side METADATA reads only
    (the same footers `_dir_rowcount` uses); no data pages touched."""
    import pyarrow.parquet as pq

    lo = hi = None
    for root, _dirs, files in os.walk(os.path.join(table_dir, rel_dir)):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            try:
                md = pq.ParquetFile(os.path.join(root, fn)).metadata
            except OSError:
                return _STATS_READ_FAILED
            try:
                idx = md.schema.names.index(column)
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        return None
                    mn, mx = _norm_stat(st.min), _norm_stat(st.max)
                    if lo is None or mn < lo:
                        lo = mn
                    if hi is None or mx > hi:
                        hi = mx
            except (ValueError, TypeError):
                return None
    return None if lo is None else (lo, hi)


def _validate_merge_batch(batch: DataFrame, keys: list[str]):
    """Key-contract checks shared by BOTH merge paths (first write
    included — a fresh table must not be born violating the contract):
    no NULL keys, no duplicate keys. Returns the stats row (n, kmin,
    kmax on the first key) so callers don't re-aggregate.

    For a TIMESTAMP first key, kmin/kmax are the integer
    epoch-microsecond INSTANTS (unix_micros), matching _norm_stat's
    footer normalization — collecting the datetime would render it in
    the session timezone, and comparing wall-clock renderings against
    UTC instants mis-prunes under any non-UTC session (see
    _norm_stat)."""
    from pyspark.sql import functions as F

    missing = [k for k in keys if k not in batch.columns]
    if missing:
        raise ValueError(f"merge keys {missing} not in batch columns")
    k0 = F.col(keys[0])
    if batch.schema[keys[0]].dataType.simpleString() == "timestamp":
        kmin, kmax = F.unix_micros(F.min(k0)), F.unix_micros(F.max(k0))
    else:
        kmin, kmax = F.min(k0), F.max(k0)
    null_key = reduce(lambda a, b: a | b, [F.col(k).isNull() for k in keys])
    stats = batch.agg(
        F.count("*").alias("n"),
        F.count_distinct(*[F.col(k) for k in keys]).alias("nk"),
        F.sum(F.when(null_key, 1).otherwise(0)).alias("n_null"),
        kmin.alias("kmin"),
        kmax.alias("kmax"),
    ).first()
    if stats["n"] and stats["n_null"]:
        # checked FIRST: count_distinct skips null-containing key
        # tuples, so a null key would otherwise surface as a
        # misleading 'duplicate keys' error — and a null key can never
        # match for replacement anyway (SQL null semantics in the
        # anti-join would silently turn the update into a
        # duplicate-looking insert)
        raise ValueError(
            f"merge batch has {stats['n_null']} row(s) with NULL in "
            f"merge keys {tuple(keys)}; a null key cannot match a "
            f"row to replace — filter or repair them upstream"
        )
    if stats["n"] != stats["nk"]:
        raise ValueError(
            f"merge batch has duplicate keys ({stats['n']} rows, "
            f"{stats['nk']} distinct {tuple(keys)}); deduplicate "
            f"upstream — last-write-wins needs an ordering only the "
            f"caller knows"
        )
    return stats


def _dir_key_range_cached(table_dir: str, rel_dir: str, column: str):
    """:func:`_dir_key_range` behind a per-(dir, column) JSON cache
    under ``table/_stats/``. Delta directories are IMMUTABLE once
    published, so a computed range never invalidates — without the
    cache, every merge re-opens the parquet footers of EVERY directory
    in the manifest, making merge latency grow with total table age
    instead of O(new dirs since the last merge) (the Delta/Iceberg
    answer is stats in the commit metadata; a sidecar keyed by the
    immutable dir is the same idea retrofitted without a manifest
    format change). Cache write failures are ignored — the cache is an
    optimization, never the correctness boundary."""
    cache_dir = os.path.join(table_dir, "_stats")
    name = rel_dir.replace(os.sep, "__") + f".{column}.json"
    cache_path = os.path.join(cache_dir, name)
    try:
        with open(cache_path) as f:
            cached = json.load(f)
        # a malformed sidecar (foreign writer, hand edit) is a cache
        # MISS, never an error surfaced to merges/pruned reads — the
        # cache must not become the correctness boundary
        if cached is None:
            return None
        if isinstance(cached, list) and len(cached) == 2:
            return (_stat_from_json(cached[0]), _stat_from_json(cached[1]))
    except (FileNotFoundError, ValueError, TypeError, OSError):
        pass
    rng = _dir_key_range(table_dir, rel_dir, column)
    if rng is _STATS_READ_FAILED:
        # transient footer-read failure: behave as "no stats" for THIS
        # call but do NOT cache — the dir's footers may be fine on the
        # next attempt
        return None
    enc = None if rng is None else [_stat_to_json(v) for v in rng]
    if enc is None or all(v is not _UNSERIALIZABLE for v in enc):
        try:
            os.makedirs(cache_dir, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".tmp")
            with os.fdopen(fd, "w") as f:
                json.dump(enc, f)
            os.replace(tmp, cache_path)
        except OSError:
            pass
    return rng


_UNSERIALIZABLE = object()


def _stat_to_json(v):
    """JSON form of a footer stat: native for int/float/str, a tagged
    ISO string for date/datetime (temporal merge keys are the common
    case the cache previously refused, re-reading every footer on
    every merge), the _UNSERIALIZABLE sentinel otherwise (skip
    caching; correctness unaffected)."""
    import datetime as _dt

    if isinstance(v, bool) or not isinstance(
        v, (int, float, str, _dt.date, _dt.datetime)
    ):
        return _UNSERIALIZABLE
    if isinstance(v, _dt.datetime):
        return {"__ts__": v.isoformat()}
    if isinstance(v, _dt.date):
        return {"__d__": v.isoformat()}
    return v


def _stat_from_json(v):
    import datetime as _dt

    if isinstance(v, dict):
        if "__ts__" in v:
            return _dt.datetime.fromisoformat(v["__ts__"])
        if "__d__" in v:
            return _dt.date.fromisoformat(v["__d__"])
        raise ValueError(f"unknown stat tag: {v!r}")
    return v


def merge_upsert(
    spark: SparkSession,
    table_dir: str,
    batch: DataFrame,
    merge_keys: tuple[str, ...],
    txn: tuple[str, int] | None = None,
    partition_by: tuple[str, ...] | None = None,
) -> dict:
    """Row-level MERGE (Delta's ``whenMatchedUpdateAll /
    whenNotMatchedInsertAll``): table rows whose key matches a batch
    row are REPLACED by it, unmatched batch rows are INSERTED, and —
    the scale-defining part — delta directories that provably contain
    NO matched key are carried into the new version UNTOUCHED.

    Pruning uses parquet footer min/max statistics on the FIRST merge
    key (the Delta/Iceberg file-skipping idiom, at directory grain):
    a dir whose key range cannot intersect the batch's [min, max] is
    kept as-is; everything else is rewritten as survivors (anti-join
    on the full key) unioned with the batch into ONE new directory.
    Cost is O(matched dirs + batch), not O(table) — on a table loaded
    by time- or id-ordered appends, a merge touching recent keys
    rewrites only the recent directories. Pruning degrades SAFELY:
    missing stats / partition-column keys / unordered data just mean
    more dirs rewritten, never a wrong result.

    Contract:
    - batch columns must match the manifest schema exactly (merge is
      not a schema-evolution path);
    - batch keys must be UNIQUE — "replace with which row?" is a
      caller bug this surfaces loudly rather than resolving silently;
    - ``txn=(app_id, version)`` gives the same exactly-once replay
      fence as commit(); merge is also IDEMPOTENT by semantics
      (replaying the same batch reproduces the same table state);
    - old versions still time-travel to pre-merge rows (rewritten
      dirs stay on disk, reference-counted by vacuum);
    - the change feed cannot express row replacement: read_changes
      across a merge version raises its re-sync error, exactly as for
      an overwrite.

    The reference has no update path at all — its sink is append-only
    and replays duplicate (util.py:251-271, SURVEY.md §2.C #5); this
    is the engine-side upsert endpoint for CDC-style workloads, the
    manifest twin of scd1_upsert on the staged-swap sinks.
    """
    keys = list(merge_keys)
    if not keys:
        raise ValueError("merge_upsert needs at least one merge key")
    os.makedirs(table_dir, exist_ok=True)
    # the batch plan feeds up to three jobs (validation agg, anti-join
    # key side, union write side): persist so an expensive upstream
    # (windowed micro-batch, multi-join CDC source) computes once
    batch = batch.persist()
    try:
        with writer_lease(_manifest_path(table_dir)) as fence:
            return _merge_locked(
                spark, table_dir, batch, keys, txn, partition_by, fence
            )
    finally:
        batch.unpersist()


def _merge_locked(
    spark: SparkSession,
    table_dir: str,
    batch: DataFrame,
    keys: list[str],
    txn: tuple[str, int] | None,
    partition_by: tuple[str, ...] | None,
    fence: int,
) -> dict:
    cur = read_manifest(table_dir)
    if cur is None:
        # first write: merge degenerates to the initial commit — but
        # the key contract holds from birth (a first batch with
        # duplicate or NULL keys would poison every later merge)
        _validate_merge_batch(batch, keys)
        return _commit_locked(
            batch, table_dir, "overwrite", fence, txn=txn,
            partition_by=partition_by,
        )
    cur_parts = tuple(cur.get("partition_by") or ())
    if partition_by is not None and tuple(partition_by) != cur_parts:
        raise ValueError(
            f"merge into {table_dir!r} changes partition_by "
            f"{cur_parts} -> {tuple(partition_by)}; repartitioning the "
            f"layout requires an overwrite commit"
        )
    prev_txn: dict[str, int] = dict(cur.get("txn", {}))
    if txn is not None:
        app_id, txn_version = txn
        if app_id in prev_txn and int(txn_version) <= prev_txn[app_id]:
            return cur  # replayed batch: already merged
        prev_txn[app_id] = int(txn_version)
    schema = _check_schema(cur, batch, merge_schema=False, table_dir=table_dir)
    stats = _validate_merge_batch(batch, keys)
    if stats["n"] == 0 and txn is None:
        return cur  # empty batch: nothing to merge, no version burned
    touched: list[str] = []
    kept: list[str] = []
    if stats["n"] == 0:
        # empty batch WITH a txn: record the high-water mark the same
        # way commit() does (an empty delta carrying the mark) —
        # returning early would leave a hole in the (app_id -> batch)
        # sequence, and a later out-of-order replay of this batch id
        # WITH data would not be fenced. Nothing can match, so no dir
        # is touched.
        kept = list(cur["dirs"])
    else:
        for d in cur["dirs"]:
            rng = _dir_key_range_cached(table_dir, d, keys[0])
            # one audited comparison path (incomparable types: never
            # prune — _range_disjoint keeps the dir on TypeError)
            disjoint = rng is not None and _range_disjoint(
                rng, stats["kmin"], stats["kmax"]
            )
            (kept if disjoint else touched).append(d)
    if touched:
        existing = _read_dirs(spark, table_dir, touched, schema)
        survivors = existing.join(batch.select(*keys), on=keys, how="left_anti")
        out = survivors.unionByName(batch)
    else:
        out = batch
    version = cur["version"] + 1
    rel = os.path.join("_versions", f"v{version:08d}")
    data_dir = os.path.join(table_dir, rel)
    shutil.rmtree(data_dir, ignore_errors=True)
    parts = cur_parts
    if parts:
        out.write.partitionBy(*parts).parquet(data_dir)
    else:
        out.write.parquet(data_dir)
    manifest = {
        "version": version,
        "dirs": kept + [rel],
        "schema": schema,
        "fence": fence,
    }
    if parts:
        manifest["partition_by"] = list(parts)
    new_rows = _dir_rowcount(data_dir)
    touched_rows = sum(
        _dir_rowcount(os.path.join(table_dir, d)) for d in touched
    )
    manifest["delta_rows"] = new_rows
    prev_total = cur.get("total_rows")
    manifest["total_rows"] = (
        None if prev_total is None else prev_total - touched_rows + new_rows
    )
    if prev_txn:
        manifest["txn"] = prev_txn
    return _publish_version(table_dir, data_dir, manifest)


def compact(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite the CURRENT version into ONE directory of ~target-sized
    files as a new commit — the manifest-table answer to both the
    small-files problem AND the growing ``dirs`` list O(delta) appends
    accumulate (each append adds a directory; this folds them).

    Holds the lease across read-size-rewrite-publish, so a commit
    landing mid-compaction is impossible (it would otherwise be
    silently undone by the compacted snapshot of the older version).
    Readers are untouched throughout: compaction is just another
    version; the folded delta dirs stay on disk for time travel until
    vacuum reclaims them. Returns the new manifest.
    """
    with writer_lease(_manifest_path(table_dir)) as fence:
        cur = read_manifest(table_dir)
        if cur is None:
            raise FileNotFoundError(f"no committed version in {table_dir!r}")
        total = 0
        for rel in cur["dirs"]:
            for root, _dirs, files in os.walk(os.path.join(table_dir, rel)):
                total += sum(
                    os.path.getsize(os.path.join(root, f))
                    for f in files
                    if f.endswith(".parquet")
                )
        n_files = max(1, -(-total // target_file_bytes))  # ceil division
        parts = tuple(cur.get("partition_by") or ())
        df = _read_dirs(spark, table_dir, cur["dirs"], cur.get("schema"))
        # cluster by partition columns so the fold yields few files per
        # partition, and PRESERVE the table's layout property
        df = df.repartition(n_files, *parts) if parts else df.repartition(n_files)
        return _commit_locked(
            df, table_dir, "overwrite", fence, data_change=False,
            partition_by=parts or None,
        )


def vacuum(
    table_dir: str, keep_last: int = 2, staging_ttl_secs: float = 24 * 3600
) -> list[int]:
    """Reclaim history past retention: drop version snapshots older
    than the newest ``keep_last``, then delete every delta directory
    NO retained version references (versions share dirs, so age alone
    never justifies deletion), plus crashed-commit debris — dirs and
    snapshots numbered ABOVE the current version (under the lease no
    commit is in flight, so anything above current is provably
    garbage), stray ``.manifest.tmp`` files, and ``_staging`` spool
    files older than ``staging_ttl_secs`` (a crashed DataSource writer
    job leaks its staged parquet; an AGE threshold — not existence —
    guards live writer tasks, which stage without the lease). Returns
    the dropped COMMITTED version numbers."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1: the live version is never vacuumed")
    mpath = _manifest_path(table_dir)
    removed: list[int] = []
    with writer_lease(mpath):
        cur = read_manifest(table_dir)
        if cur is None:
            return removed
        cutoff = cur["version"] - keep_last + 1
        # 1. drop out-of-retention (and orphaned future) snapshots
        mdir = os.path.join(table_dir, "_manifests")
        retained: list[dict] = [cur]
        if os.path.isdir(mdir):
            for entry in sorted(os.listdir(mdir)):
                m = re.fullmatch(r"v(\d{8})\.json", entry)
                if m is None:
                    continue  # debris: never wedge retention on it
                v = int(m.group(1))
                if v < cutoff or v > cur["version"]:
                    os.unlink(os.path.join(mdir, entry))
                    if v < cutoff:
                        removed.append(v)
                elif v != cur["version"]:
                    with open(os.path.join(mdir, entry)) as f:
                        retained.append(_normalize(json.load(f)))
        # 2. delete data dirs no retained version references
        referenced = {d for m in retained for d in m["dirs"]}
        vdir = os.path.join(table_dir, "_versions")
        legacy_retained = {  # legacy tables: dir name IS the version
            os.path.join("_versions", f"v{v:08d}")
            for v in range(max(1, cutoff), cur["version"] + 1)
        }
        for entry in sorted(os.listdir(vdir)):
            # strict name match: stray non-version entries (editor
            # backups, operator debris like 'v1.bak') are skipped, not
            # int()-crashed — a single piece of debris must not wedge
            # retention enforcement for the table forever
            if _VERSION_RE.fullmatch(entry) is None:
                continue
            rel = os.path.join("_versions", entry)
            if rel not in referenced and rel not in legacy_retained:
                shutil.rmtree(os.path.join(vdir, entry))
                v = int(entry[1:])
                if v < cutoff and v not in removed:
                    removed.append(v)
                # drop the merge-pruning stats sidecars of a deleted
                # dir (cache keyed by the immutable dir; dir gone ->
                # entries are dead weight)
                sdir = os.path.join(table_dir, "_stats")
                if os.path.isdir(sdir):
                    prefix = rel.replace(os.sep, "__") + "."
                    for s in os.listdir(sdir):
                        if s.startswith(prefix):
                            try:
                                os.unlink(os.path.join(sdir, s))
                            except FileNotFoundError:
                                pass
        for entry in os.listdir(table_dir):
            if entry.endswith(".manifest.tmp"):
                os.unlink(os.path.join(table_dir, entry))
        staging = os.path.join(table_dir, "_staging")
        if os.path.isdir(staging):
            import time as _time

            horizon = _time.time() - staging_ttl_secs
            for entry in os.listdir(staging):
                p = os.path.join(staging, entry)
                try:
                    if os.path.getmtime(p) < horizon:
                        # operator debris can be a DIRECTORY (e.g. a
                        # write pointed into _staging); a bare unlink
                        # would raise and wedge retention on this
                        # entry forever — the same single-debris rule
                        # the _versions/_manifests sweeps follow
                        if os.path.isdir(p):
                            shutil.rmtree(p, ignore_errors=True)
                        else:
                            os.unlink(p)
                except OSError:
                    pass  # a writer just cleaned it up itself / EPERM:
                    # never let one entry abort the sweep
    return sorted(set(removed))
