"""Warehouse JDBC dialects: identifier quoting, Spark→SQL type
mapping, overwrite strategy, and staged-COPY text for the two network
warehouses the reference loads (SURVEY.md §2.2).

Reference parity: the reference loads Postgres through a pandas
``to_sql`` hop (etl_aws_vini.py:307-335) and Redshift through
``COPY ... FORMAT AS PARQUET`` from S3 (etl_aws_vini.py:522-543).
This module generates the equivalent SQL/DDL text for BOTH paths so
the dialect behavior is pinned by goldens even though the sandbox has
no network database: the live JDBC roundtrip runs against embedded
Derby (tests/test_jdbc_roundtrip.py) through the same ``write_jdbc``
parameterization, and a real cluster only swaps the dialect object.

Design notes:

- ``overwrite`` on a warehouse should TRUNCATE, not drop: dropping
  loses grants/sort keys/dist keys and invalidates dependent views.
  Spark's JDBC sink honors ``truncate=true`` only when the dialect
  supports it — both Postgres and Redshift do; Derby does not (full
  re-create is the embedded-engine fallback).
- ``createTableColumnTypes`` overrides Spark's lowest-common-
  denominator defaults where they are wrong for the engine (Spark
  maps StringType to TEXT on Postgres — fine — but to VARCHAR(256)
  via redshift-jdbc's default, which truncates documents; Redshift
  needs explicit VARCHAR(65535)).
- Redshift bulk load is NOT row-wise JDBC at scale: the fast path is
  parquet-to-S3 then one ``COPY`` — :func:`JdbcDialect.copy_from_
  parquet` emits that statement; executors write the parquet stage in
  parallel and the warehouse ingests it in one set-based load.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T


def _decimal(dt: T.DecimalType) -> str:
    return f"NUMERIC({dt.precision},{dt.scale})"


# per-dialect Spark-type → DDL-type mapping; anything absent falls
# back to the JDBC driver's default mapping
_PG_TYPES: dict[type, str | None] = {
    T.StringType: "TEXT",
    T.BinaryType: "BYTEA",
    T.DoubleType: "DOUBLE PRECISION",
    T.FloatType: "REAL",
    T.LongType: "BIGINT",
    T.IntegerType: "INTEGER",
    T.ShortType: "SMALLINT",
    T.ByteType: "SMALLINT",  # no 1-byte int in Postgres
    T.BooleanType: "BOOLEAN",
    T.DateType: "DATE",
    T.TimestampType: "TIMESTAMP",  # session-TZ-normalized upstream
    T.TimestampNTZType: "TIMESTAMP",
}

_REDSHIFT_TYPES: dict[type, str | None] = {
    # redshift-jdbc defaults strings to VARCHAR(256): silently
    # truncating for document corpora — pin the 64K max instead
    T.StringType: "VARCHAR(65535)",
    T.BinaryType: "VARBYTE",
    T.DoubleType: "DOUBLE PRECISION",
    T.FloatType: "REAL",
    T.LongType: "BIGINT",
    T.IntegerType: "INTEGER",
    T.ShortType: "SMALLINT",
    T.ByteType: "SMALLINT",
    T.BooleanType: "BOOLEAN",
    T.DateType: "DATE",
    T.TimestampType: "TIMESTAMP",
    T.TimestampNTZType: "TIMESTAMP",
}

_DERBY_TYPES: dict[type, str | None] = {
    # Derby has no TEXT; CLOB cannot be a key — VARCHAR(4096) is the
    # embedded-test compromise
    T.StringType: "VARCHAR(4096)",
    T.DoubleType: "DOUBLE",
    T.TimestampType: "TIMESTAMP",
}


@dataclass(frozen=True)
class JdbcDialect:
    """One warehouse's SQL surface, as data. ``quote_char`` doubles
    embedded quotes per the SQL standard; all three targets here use
    double-quote folding."""

    name: str
    driver: str
    supports_truncate: bool
    quote_char: str = '"'
    type_map: dict[type, str | None] = field(default_factory=dict)

    def quote_ident(self, ident: str) -> str:
        escaped = ident.replace(self.quote_char, self.quote_char * 2)
        return f"{self.quote_char}{escaped}{self.quote_char}"

    def quote_table(self, table: str) -> str:
        """schema-qualified names quote each part separately."""
        return ".".join(self.quote_ident(p) for p in table.split("."))

    def ddl_type(self, dt: T.DataType) -> str:
        if isinstance(dt, T.DecimalType):
            return _decimal(dt)
        mapped = self.type_map.get(type(dt))
        if mapped is not None:
            return mapped
        raise ValueError(
            f"{self.name}: no DDL mapping for Spark type {dt.simpleString()}"
        )

    def create_table_ddl(self, schema: T.StructType, table: str) -> str:
        """Full CREATE TABLE text — what a migration/staging script
        runs; pinned by goldens per dialect."""
        cols = ",\n  ".join(
            f"{self.quote_ident(f.name)} {self.ddl_type(f.dataType)}"
            f"{'' if f.nullable else ' NOT NULL'}"
            for f in schema.fields
        )
        return f"CREATE TABLE {self.quote_table(table)} (\n  {cols}\n)"

    def create_table_column_types(self, schema: T.StructType) -> str:
        """Value for Spark's ``createTableColumnTypes`` JDBC option:
        only the columns where this dialect overrides the driver
        default need (or want) listing; we list all mapped ones so the
        created table is fully pinned. Spark requires UNQUOTED names
        here (it validates them as a DDL fragment)."""
        parts = []
        for f in schema.fields:
            try:
                parts.append(f"{f.name} {self.ddl_type(f.dataType)}")
            except ValueError:
                continue  # let the driver default stand
        return ", ".join(parts)

    def overwrite_options(self, schema: T.StructType) -> dict[str, str]:
        """JDBC writer options implementing 'overwrite = truncate,
        keep DDL' where the engine supports it (grants/dist keys
        survive), falling back to re-create elsewhere."""
        opts = {"truncate": "true" if self.supports_truncate else "false"}
        col_types = self.create_table_column_types(schema)
        if col_types:
            opts["createTableColumnTypes"] = col_types
        return opts


POSTGRES = JdbcDialect(
    name="postgresql",
    driver="org.postgresql.Driver",
    supports_truncate=True,
    type_map=_PG_TYPES,
)

REDSHIFT = JdbcDialect(
    name="redshift",
    driver="com.amazon.redshift.jdbc42.Driver",
    supports_truncate=True,
    type_map=_REDSHIFT_TYPES,
)

DERBY = JdbcDialect(
    name="derby",
    driver="org.apache.derby.jdbc.EmbeddedDriver",
    supports_truncate=False,  # Derby's TRUNCATE can't run via the sink
    type_map=_DERBY_TYPES,
)


def quote_literal(val: str) -> str:
    """SQL single-quoted string literal with embedded quotes doubled
    (the standard escape) — the literal-side twin of
    :meth:`JdbcDialect.quote_ident`. Every value interpolated into
    generated COPY text goes through this so a path or role containing
    ``'`` cannot produce a malformed (or injected) statement."""
    return "'" + val.replace("'", "''") + "'"


def redshift_copy_from_parquet(
    table: str,
    s3_path: str,
    iam_role: str,
    region: str | None = None,
) -> str:
    """The reference's Redshift load statement
    (etl_aws_vini.py:522-543): stage parquet on object storage, then
    one set-based ``COPY ... FORMAT AS PARQUET``. Generated here so
    the text is golden-pinned; execution requires a live warehouse
    connection (`cursor.execute(copy_sql)` over the same JDBC url)."""
    stmt = (
        f"COPY {REDSHIFT.quote_table(table)}\n"
        f"FROM {quote_literal(s3_path)}\n"
        f"IAM_ROLE {quote_literal(iam_role)}\n"
        f"FORMAT AS PARQUET"
    )
    if region:
        stmt += f"\nREGION {quote_literal(region)}"
    return stmt


def postgres_copy_from_csv(table: str, columns: list[str]) -> str:
    """Postgres bulk-load twin (COPY FROM STDIN) — the set-based
    alternative to row-wise INSERTs when a psycopg-style client is
    available; text pinned by goldens."""
    cols = ", ".join(POSTGRES.quote_ident(c) for c in columns)
    return (
        f"COPY {POSTGRES.quote_table(table)} ({cols}) "
        f"FROM STDIN WITH (FORMAT csv, HEADER true)"
    )
