"""MySQL dialect surface of the reference, isolated and testable.

The container has no MySQL, so the live JDBC path runs against embedded
Derby (``sources/jdbc.py``).  Everything the reference *says* to MySQL is
pure SQL text, though — this module reproduces it exactly and documents the
dialect delta, so a deployment pointing ``JdbcSource`` at
``jdbc:mysql://...`` sends byte-identical queries to what the reference's
Cloud SQL Admin export sends.

Reference query text:
- data export:   ``SELECT * FROM `{table}`;``
  (``/root/reference/app/cloud-sql-exporter/main.py:65``)
- schema export: ``SELECT COLUMN_NAME,DATA_TYPE FROM
  INFORMATION_SCHEMA.COLUMNS WHERE TABLE_SCHEMA = '{db}' AND
  TABLE_NAME = '{table}' ORDER BY ORDINAL_POSITION;``
  (``main.py:53-55``)
- catalog enumeration default: ``SELECT table_name FROM
  information_schema.tables WHERE table_schema = 'default';``
  (``/root/reference/variables.tf:72-75``)

Like ``ingest/types.py``, each generator has a bug-compat mode (exact
reference text, including its lack of identifier escaping) and a strict
mode (backtick-doubled identifiers, quoted literals) — parity is the
default where the reference is safe, opt-in where it is not.

Dialect delta (Derby test harness vs MySQL production), for the record:

===========================  =========================  ====================
behavior                     Derby (tested live)        MySQL (text parity)
===========================  =========================  ====================
identifier quoting           ``"x"`` (ANSI)             ```x``` (backtick)
unquoted identifier case     uppercased                 preserved (Linux)
information_schema           none (SYS.* catalogs)      lowercase-insensitive
strings in Spark JDBC DDL    CLOB (no pushdown)         TEXT/VARCHAR
row streaming                fetchsize                  needs useCursorFetch
zero dates ``0000-00-00``    n/a                        CONVERT_TO_NULL
===========================  =========================  ====================
"""

from __future__ import annotations

from .jdbc import JdbcSource

MYSQL_DRIVER = "com.mysql.cj.jdbc.Driver"


def quote_ident(name: str) -> str:
    """MySQL identifier quoting: backticks, embedded backticks doubled."""
    return "`" + name.replace("`", "``") + "`"


def quote_literal(value: str) -> str:
    """MySQL string literal: single quotes, embedded quotes doubled."""
    return "'" + value.replace("'", "''") + "'"


def export_data_query(table: str, mode: str = "compat") -> str:
    """The per-table data-export SELECT (``cloud-sql-exporter/main.py:65``).

    ``compat`` is the reference's exact text — it backticks the name but
    never escapes embedded backticks (its tables come from its own catalog
    query, so it is safe in situ).  ``strict`` escapes."""
    if mode == "compat":
        return "SELECT * FROM `{}`;".format(table)
    if mode == "strict":
        return f"SELECT * FROM {quote_ident(table)};"
    raise ValueError(f"unknown mode {mode!r}; use 'compat' or 'strict'")


def export_schema_query(database: str, table: str, mode: str = "compat") -> str:
    """The per-table schema-export SELECT (``main.py:53-55``): column names
    + the DATA_TYPE strings that feed the five-type mapper
    (``ingest/types.py``).  Note the reference's UPPERCASE
    ``INFORMATION_SCHEMA.COLUMNS`` — legal because MySQL treats
    information_schema identifiers case-insensitively."""
    if mode == "compat":
        return (
            "SELECT COLUMN_NAME,DATA_TYPE FROM INFORMATION_SCHEMA.COLUMNS "
            "WHERE TABLE_SCHEMA = '{}' AND TABLE_NAME = '{}' "
            "ORDER BY ORDINAL_POSITION;"
        ).format(database, table)
    if mode == "strict":
        return (
            "SELECT COLUMN_NAME,DATA_TYPE FROM INFORMATION_SCHEMA.COLUMNS "
            f"WHERE TABLE_SCHEMA = {quote_literal(database)} "
            f"AND TABLE_NAME = {quote_literal(table)} "
            "ORDER BY ORDINAL_POSITION;"
        )
    raise ValueError(f"unknown mode {mode!r}; use 'compat' or 'strict'")


def default_catalog_query() -> str:
    """The table-enumeration default (``variables.tf:72-75``) — the SQL the
    query-runner executes verbatim through SQLAlchemy
    (``cloud-sql-query-runner/main.py:52-57``)."""
    return (
        "SELECT table_name FROM information_schema.tables "
        "WHERE table_schema = 'default';"
    )


def mysql_source(
    host: str,
    database: str,
    user: str,
    password: str,
    port: int = 3306,
    num_partitions: int = 32,
) -> JdbcSource:
    """A production ``JdbcSource`` for MySQL/Cloud SQL with the dialect
    options a large parallel scan actually needs:

    - ``useCursorFetch``: without it Connector/J materializes the WHOLE
      result set per partition in executor memory regardless of fetchsize —
      the single most common MySQL-at-scale OOM
    - ``connectionTimeZone=UTC`` + ``forceConnectionTimeZoneToSession``:
      timestamp parity with the engine's pinned UTC session (session.py)
    - ``zeroDateTimeBehavior=CONVERT_TO_NULL``: MySQL's ``0000-00-00``
      sentinel rows surface as NULL instead of driver exceptions
    - ``rewriteBatchedStatements``: batches Spark's JDBC-writer inserts
      into multi-row statements (order-of-magnitude write speedup)
    """
    return JdbcSource(
        url=f"jdbc:mysql://{host}:{port}/{database}",
        user=user,
        password=password,
        num_partitions=num_partitions,
        extra={
            "driver": MYSQL_DRIVER,
            "useCursorFetch": "true",
            "connectionTimeZone": "UTC",
            "forceConnectionTimeZoneToSession": "true",
            "zeroDateTimeBehavior": "CONVERT_TO_NULL",
            "rewriteBatchedStatements": "true",
        },
    )
