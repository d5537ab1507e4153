"""Live PostgreSQL connector over libpq via ctypes — no pip installs.

The reference's TARGET engine is PostgreSQL (util.py:190-271:
psycopg2 connect / execute_batch append / fetchall reads). Every
prior round verified the Postgres DIALECT contracts (quoting,
timestamp literals, DDL types, case folds) on stand-in engines
because no PG driver was importable — but the sandbox ships the full
PostgreSQL 15 server AND ``libpq.so.5``, so the generated SQL can be
executed on the real engine after all. This module is the thinnest
possible client: ctypes bindings for the dozen libpq calls the
pipeline needs (connect, parameterized exec, text-mode results,
SQLSTATE extraction), plus the source/sink adapters the connector
registry mounts as format ``"pglive"``.

SCALE HONESTY: the source adapter materializes the result set on the
DRIVER and hands Spark a local DataFrame — exactly the reference's
own shape (cursor.fetchall(), util.py:170), kept deliberately. The
100 TB path for a JDBC-speaking RDBMS is Spark's parallel JDBC source
(sources/__init__.py 'jdbc', partitioned reads, server-side pushdown)
— this adapter exists to run the REFERENCE-PARITY loop against a real
PostgreSQL (tests/test_pg_live.py boots one), sharing every dialect
contract (jdbc_incremental_dbtable / jdbc_create_table_ddl /
jdbc_error_class with dialect='postgres') with the JDBC path so the
two can never drift.

Values cross in TEXT format both ways: PQexecParams with $n
placeholders (no literal escaping, no injection surface) and text
result parsing by type OID — timestamps keep microseconds,
timestamptz normalizes to naive UTC (Spark's internal convention
under the engine's pinned UTC session timezone).
"""

from __future__ import annotations

import ctypes
import datetime as dt
from decimal import Decimal

CONNECTION_OK = 0
PGRES_COMMAND_OK = 1
PGRES_TUPLES_OK = 2
PG_DIAG_SQLSTATE = ord("C")

# result-parse table by type OID (the common scalar types the harness
# tables use; anything unlisted stays a string — safe, lossless)
_OID_BOOL = 16
_OID_BYTEA = 17
_OID_INT8 = 20
_OID_INT2 = 21
_OID_INT4 = 23
_OID_TEXT = 25
_OID_FLOAT4 = 700
_OID_FLOAT8 = 701
_OID_VARCHAR = 1043
_OID_DATE = 1082
_OID_TIMESTAMP = 1114
_OID_TIMESTAMPTZ = 1184
_OID_NUMERIC = 1700


class PgError(RuntimeError):
    """A libpq failure; carries ``sqlstate`` (may be None for
    connection-level errors) so callers can classify it with
    sources.jdbc_error_class(dialect='postgres')."""

    def __init__(self, message: str, sqlstate: str | None = None):
        super().__init__(message)
        self.sqlstate = sqlstate


_lib = None


def _libpq():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL("libpq.so.5")
        lib.PQconnectdb.restype = ctypes.c_void_p
        lib.PQconnectdb.argtypes = [ctypes.c_char_p]
        lib.PQstatus.argtypes = [ctypes.c_void_p]
        lib.PQerrorMessage.restype = ctypes.c_char_p
        lib.PQerrorMessage.argtypes = [ctypes.c_void_p]
        lib.PQfinish.argtypes = [ctypes.c_void_p]
        lib.PQexecParams.restype = ctypes.c_void_p
        lib.PQexecParams.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.PQresultStatus.argtypes = [ctypes.c_void_p]
        lib.PQresultErrorMessage.restype = ctypes.c_char_p
        lib.PQresultErrorMessage.argtypes = [ctypes.c_void_p]
        lib.PQresultErrorField.restype = ctypes.c_char_p
        lib.PQresultErrorField.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.PQntuples.argtypes = [ctypes.c_void_p]
        lib.PQnfields.argtypes = [ctypes.c_void_p]
        lib.PQfname.restype = ctypes.c_char_p
        lib.PQfname.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.PQftype.restype = ctypes.c_uint
        lib.PQftype.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.PQgetisnull.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        lib.PQgetvalue.restype = ctypes.c_char_p
        lib.PQgetvalue.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        lib.PQclear.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def _parse_ts(s: str) -> dt.datetime:
    # "YYYY-MM-DD HH:MM:SS[.ffffff]" (naive)
    return dt.datetime.fromisoformat(s)


def _parse_tstz(s: str) -> dt.datetime:
    # "...+HH[:MM]" — normalize to naive UTC (engine session tz is UTC)
    d = dt.datetime.fromisoformat(s)
    return d.astimezone(dt.timezone.utc).replace(tzinfo=None)


_PARSERS = {
    _OID_BOOL: lambda s: s == "t",
    _OID_BYTEA: lambda s: bytes.fromhex(s[2:]) if s.startswith("\\x") else s.encode(),
    _OID_INT2: int,
    _OID_INT4: int,
    _OID_INT8: int,
    _OID_FLOAT4: float,
    _OID_FLOAT8: float,
    _OID_NUMERIC: Decimal,
    _OID_DATE: dt.date.fromisoformat,
    _OID_TIMESTAMP: _parse_ts,
    _OID_TIMESTAMPTZ: _parse_tstz,
}


def _render_param(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "\\x" + bytes(v).hex()
    return str(v)


class PgConnection:
    """One libpq connection. ``execute`` runs one statement with $n
    text parameters and returns (columns, rows) for row-returning
    statements or (None, rowcount-ish None) for commands. Errors raise
    PgError with the server SQLSTATE attached."""

    def __init__(self, conninfo: str):
        lib = _libpq()
        self._lib = lib
        self._conn = lib.PQconnectdb(conninfo.encode())
        if not self._conn or lib.PQstatus(self._conn) != CONNECTION_OK:
            msg = (
                lib.PQerrorMessage(self._conn).decode(errors="replace")
                if self._conn
                else "PQconnectdb returned NULL"
            )
            if self._conn:
                lib.PQfinish(self._conn)
                self._conn = None
            raise PgError(f"postgres connect failed: {msg}")

    def execute(self, sql: str, params: tuple = ()):
        lib = self._lib
        if self._conn is None:
            raise PgError("connection is closed")
        n = len(params)
        values = (ctypes.c_char_p * n)(
            *[
                None if (r := _render_param(p)) is None else r.encode()
                for p in params
            ]
        ) if n else None
        res = lib.PQexecParams(
            self._conn, sql.encode(), n, None, values, None, None, 0
        )
        try:
            status = lib.PQresultStatus(res)
            if status == PGRES_COMMAND_OK:
                return None, None
            if status == PGRES_TUPLES_OK:
                nf = lib.PQnfields(res)
                nt = lib.PQntuples(res)
                names = [lib.PQfname(res, j).decode() for j in range(nf)]
                parsers = [
                    _PARSERS.get(lib.PQftype(res, j), lambda s: s)
                    for j in range(nf)
                ]
                rows = [
                    tuple(
                        None
                        if lib.PQgetisnull(res, i, j)
                        else parsers[j](lib.PQgetvalue(res, i, j).decode())
                        for j in range(nf)
                    )
                    for i in range(nt)
                ]
                return names, rows
            msg = lib.PQresultErrorMessage(res).decode(errors="replace")
            state = lib.PQresultErrorField(res, PG_DIAG_SQLSTATE)
            raise PgError(
                msg.strip() or f"libpq status {status}",
                state.decode() if state else None,
            )
        finally:
            lib.PQclear(res)

    def close(self) -> None:
        if self._conn is not None:
            self._lib.PQfinish(self._conn)
            self._conn = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---- connector-registry adapters (format "pglive") -------------------

_SPARK_TO_PY = None  # (import pyspark lazily; this module is pure-ctypes)


def _spark_type_for_oid(oid: int):
    from pyspark.sql import types as T

    return {
        _OID_BOOL: T.BooleanType(),
        _OID_BYTEA: T.BinaryType(),
        _OID_INT2: T.ShortType(),
        _OID_INT4: T.IntegerType(),
        _OID_INT8: T.LongType(),
        _OID_FLOAT4: T.FloatType(),
        _OID_FLOAT8: T.DoubleType(),
        _OID_NUMERIC: T.DecimalType(38, 6),
        _OID_DATE: T.DateType(),
        _OID_TIMESTAMP: T.TimestampNTZType(),
        _OID_TIMESTAMPTZ: T.TimestampType(),
    }.get(oid, T.StringType())


def read_pg(spark, table: str, options: dict):
    """Source adapter: run ONE text-mode SELECT on the driver and hand
    Spark the materialized rows — the reference's fetchall shape
    (util.py:170), see the module docstring for why that is kept.
    ``dbtable`` may be a table name or a ``(subquery) alias`` pushdown
    (jdbc_incremental_dbtable output) — either way the FILTER executes
    on the PostgreSQL server, not in Spark."""
    from pyspark.sql import types as T

    conninfo = options.get("conninfo")
    if not conninfo:
        raise ValueError("pglive source requires options['conninfo']")
    dbtable = options.get("dbtable", table)
    sql = f"SELECT * FROM {dbtable}"
    lib = _libpq()
    with PgConnection(conninfo) as c:
        res = lib.PQexecParams(c._conn, sql.encode(), 0, None, None, None, None, 0)
        try:
            if lib.PQresultStatus(res) != PGRES_TUPLES_OK:
                msg = lib.PQresultErrorMessage(res).decode(errors="replace")
                state = lib.PQresultErrorField(res, PG_DIAG_SQLSTATE)
                raise PgError(msg.strip(), state.decode() if state else None)
            nf = lib.PQnfields(res)
            nt = lib.PQntuples(res)
            fields = []
            parsers = []
            for j in range(nf):
                oid = lib.PQftype(res, j)
                fields.append(
                    T.StructField(
                        lib.PQfname(res, j).decode(),
                        _spark_type_for_oid(oid),
                        True,
                    )
                )
                parsers.append(_PARSERS.get(oid, lambda s: s))
            rows = [
                tuple(
                    None
                    if lib.PQgetisnull(res, i, j)
                    else parsers[j](lib.PQgetvalue(res, i, j).decode())
                    for j in range(nf)
                )
                for i in range(nt)
            ]
        finally:
            lib.PQclear(res)
    return spark.createDataFrame(rows, T.StructType(fields))


def _reject_complex_columns(df, where: str) -> None:
    """The pglive sinks speak the reference's RELATIONAL shape: scalar
    columns only. A list/map/struct value would silently render as its
    Python repr inside a text parameter — reject at config time."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    if bad:
        raise ValueError(
            f"{where}: complex-typed columns {bad} are not writable as "
            f"text parameters — serialize them first (to_json) or use a "
            f"file-format sink"
        )


def write_pg(df, table: str, options: dict) -> None:
    """Sink adapter: batched multi-row parameterized INSERTs — the
    reference's execute_batch append (util.py:226-247) with $n
    parameters instead of string-formatted literals. Collects the
    batch driver-side (reference parity; the Spark-parallel path is
    the 'jdbc' sink). Rows per statement are sized so the parameter
    count stays under libpq's 65535 limit."""
    conninfo = options.get("conninfo")
    if not conninfo:
        raise ValueError("pglive sink requires options['conninfo']")
    _reject_complex_columns(df, "pglive sink")
    target = options.get("dbtable", table)
    cols = df.columns
    quoted = ", ".join(f'"{c}"' for c in cols)
    rows = [tuple(r) for r in df.collect()]
    if not rows:
        return
    per_stmt = max(1, min(500, 60000 // max(1, len(cols))))
    with PgConnection(conninfo) as c:
        for lo in range(0, len(rows), per_stmt):
            chunk = rows[lo : lo + per_stmt]
            values = ", ".join(
                "("
                + ", ".join(
                    f"${i * len(cols) + j + 1}" for j in range(len(cols))
                )
                + ")"
                for i in range(len(chunk))
            )
            params = tuple(v for r in chunk for v in r)
            c.execute(
                f'INSERT INTO {target} ({quoted}) VALUES {values}', params
            )


def read_pg_partitioned(spark, table: str, options: dict):
    """DISTRIBUTED live-PostgreSQL read — the Spark-JDBC partitioned
    shape on the real engine: N range predicates over
    ``partition_column`` (first slice unbounded below, last unbounded
    above — Spark's own jdbc semantics, so no row is lost outside the
    bounds), each executed by its OWN task over its OWN libpq
    connection via mapInPandas. This is the scale path the driver-side
    ``read_pg`` adapter deliberately is not: the server sees N
    concurrent range scans and rows never funnel through the Spark
    driver. Requires libpq.so.5 on the executors (true in local mode
    and on any node with the postgres client library).

    options: conninfo, dbtable?, partition_column, num_partitions,
    lower_bound?, upper_bound? (bounds probed with one MIN/MAX query
    when absent — the same one-row probe Spark JDBC issues)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    conninfo = options.get("conninfo")
    if not conninfo:
        raise ValueError("pglive source requires options['conninfo']")
    dbtable = options.get("dbtable", table)
    pcol = options["partition_column"]
    n = int(options["num_partitions"])
    if n < 1:
        raise ValueError("num_partitions must be >= 1")

    lib = _libpq()
    with PgConnection(conninfo) as c:
        # schema probe: zero rows, full OID set
        res = lib.PQexecParams(
            c._conn,
            f"SELECT * FROM {dbtable} WHERE false".encode(),
            0, None, None, None, None, 0,
        )
        try:
            if lib.PQresultStatus(res) != PGRES_TUPLES_OK:
                msg = lib.PQresultErrorMessage(res).decode(errors="replace")
                state = lib.PQresultErrorField(res, PG_DIAG_SQLSTATE)
                raise PgError(msg.strip(), state.decode() if state else None)
            nf = lib.PQnfields(res)
            names = [lib.PQfname(res, j).decode() for j in range(nf)]
            oids = [lib.PQftype(res, j) for j in range(nf)]
        finally:
            lib.PQclear(res)
        lo = options.get("lower_bound")
        hi = options.get("upper_bound")
        if lo is None or hi is None:
            _, rows = c.execute(
                f'SELECT min("{pcol}"), max("{pcol}") FROM {dbtable}'
            )
            lo = rows[0][0] if lo is None else lo
            hi = rows[0][1] if hi is None else hi
    schema = T.StructType(
        [
            T.StructField(nm, _spark_type_for_oid(oid), True)
            for nm, oid in zip(names, oids)
        ]
    )
    if lo is None or hi is None or n == 1:  # empty table or one slice
        preds = [None] * 1
    else:
        lo, hi = int(lo), int(hi)
        stride = max(1, (hi - lo) // n + 1)
        preds = []
        for i in range(n):
            lo_b = lo + i * stride
            hi_b = lo + (i + 1) * stride
            if n == 1:
                preds.append(None)
            elif i == 0:
                preds.append(f'"{pcol}" < {hi_b} OR "{pcol}" IS NULL')
            elif i == n - 1:
                preds.append(f'"{pcol}" >= {lo_b}')
            else:
                preds.append(f'"{pcol}" >= {lo_b} AND "{pcol}" < {hi_b}')
    seeds = spark.createDataFrame(
        [(i, p) for i, p in enumerate(preds)], "pid int, pred string"
    ).repartitionByRange(len(preds), F.col("pid"))

    def gen(pdfs):
        for pdf in pdfs:
            for pred in pdf["pred"]:
                where = f" WHERE {pred}" if pred and not pd.isna(pred) else ""
                with PgConnection(conninfo) as conn:
                    cols, rows = conn.execute(
                        f"SELECT * FROM {dbtable}{where}"
                    )
                if rows:
                    yield pd.DataFrame(rows, columns=cols, dtype=object)

    return seeds.mapInPandas(gen, schema)


def write_pg_distributed(df, table: str, options: dict) -> None:
    """DISTRIBUTED live-PostgreSQL append — the parallel twin of
    ``write_pg``: every Spark partition opens its OWN libpq connection
    and streams its rows as batched $n-parameterized multi-row
    INSERTs, so N tasks write concurrently and rows never funnel
    through the driver (Spark's own JDBC writer shape). Same
    at-least-once semantics as Spark JDBC: each task commits
    independently and a retried task re-inserts its rows — callers
    needing exactly-once use an idempotent downstream (merge keys /
    staged swap), exactly the engine's standing sink contract. The
    per-statement row count keeps parameters under libpq's 65535
    limit."""
    conninfo = options.get("conninfo")
    if not conninfo:
        raise ValueError("pglive sink requires options['conninfo']")
    _reject_complex_columns(df, "pglive distributed sink")
    target = options.get("dbtable", table)
    cols = df.columns
    quoted = ", ".join(f'"{c}"' for c in cols)
    ncols = len(cols)
    per_stmt = max(1, min(500, 60000 // max(1, ncols)))

    def write_partition(rows):
        chunk: list[tuple] = []
        conn = None
        try:
            for row in rows:
                if conn is None:
                    conn = PgConnection(conninfo)
                chunk.append(tuple(row))
                if len(chunk) >= per_stmt:
                    _insert_chunk(conn, target, quoted, ncols, chunk)
                    chunk = []
            if conn is not None and chunk:
                _insert_chunk(conn, target, quoted, ncols, chunk)
        finally:
            if conn is not None:
                conn.close()

    df.foreachPartition(write_partition)


def _insert_chunk(conn: PgConnection, target, quoted, ncols, chunk) -> None:
    values = ", ".join(
        "(" + ", ".join(f"${i * ncols + j + 1}" for j in range(ncols)) + ")"
        for i in range(len(chunk))
    )
    params = tuple(v for r in chunk for v in r)
    conn.execute(f'INSERT INTO {target} ({quoted}) VALUES {values}', params)
