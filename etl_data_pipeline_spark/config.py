"""Environment-keyed connection/config registry.

Mirrors the reference's ``config.py`` (DB_DETAILS dict keyed by env,
credentials from environment variables — config.py:3-20, looked up via
``load_db_details(env)`` util.py:339-349). We keep the same shape but
the values feed Spark reader/writer options (e.g. a JDBC url) instead
of driver-level DB-API connections.
"""

from __future__ import annotations

import os


def _env(name: str, default: str = "") -> str:
    return os.environ.get(name, default)


def db_details(env: str) -> dict:
    """Connection registry for ``env`` ('dev'/'prod'/...).

    Raises KeyError on unknown env, like the reference's dict lookup
    (util.py:344).
    """
    registry = {
        "dev": {
            "SOURCE_DB": {
                "DB_TYPE": _env("SOURCE_DB_TYPE", "parquet"),
                "PATH": _env("SOURCE_DB_PATH", "/root/testdata/sf0.001"),
                "JDBC_URL": _env("SOURCE_JDBC_URL", ""),
                "USER": _env("SOURCE_DB_USER", ""),
                "PASSWORD": _env("SOURCE_DB_PASSWORD", ""),
                # libpq conninfo for DB_TYPE=pglive (live PostgreSQL)
                "CONNINFO": _env("SOURCE_PG_CONNINFO", ""),
            },
            "TARGET_DB": {
                "DB_TYPE": _env("TARGET_DB_TYPE", "parquet"),
                "PATH": _env("TARGET_DB_PATH", "/tmp/etl_target"),
                "JDBC_URL": _env("TARGET_JDBC_URL", ""),
                "USER": _env("TARGET_DB_USER", ""),
                "PASSWORD": _env("TARGET_DB_PASSWORD", ""),
                "CONNINFO": _env("TARGET_PG_CONNINFO", ""),
            },
        },
    }
    return registry[env]
