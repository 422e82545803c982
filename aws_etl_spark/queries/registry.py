"""Query registry: the single source of truth for the engine's declared
capability surface.

Every operator from SURVEY.md §2 (reference-parity relational surface)
and §2.13 (LLM-data-pipeline extensions) registers here as a named
query: a PySpark callable plus, where SQL-expressible, an equivalent
ANSI-SQL oracle string that DuckDB runs over the same parquet tables.
``__spark_entry__.py``, the pytest suite, and ``bench.py`` all consume
this registry — one declaration, three consumers.

Determinism contract (driver compares order-insensitive value hashes):

* float aggregates route through exact decimal arithmetic and are cast
  to double at the end, so Spark's parallel/partial aggregation and
  DuckDB's single-node aggregation produce bit-identical values;
* top-k queries always tiebreak on a unique key;
* column names are aliased identically on both sides (the driver sorts
  columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

ALL_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    category: str
    doc: str = ""
    tables: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = True  # include in bench.py timing set


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    category: str = "relational",
    doc: str = "",
    tables: tuple[str, ...] = (),
    bench: bool = True,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver may hand us a session without our factory conf;
            # timestamp→string rendering must not depend on host TZ, and
            # events.parquet stores TIMESTAMP(NANOS) which Spark only
            # reads via the nanosAsLong escape hatch. ANSI mode (Spark 4
            # default) must be OFF: the corpus uses the reference's
            # lenient semantics (NULL on malformed date parse, NULL on
            # decimal overflow — variables.py:27,40) and the DuckDB
            # oracle texts use TRY_* to match.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.conf.set("spark.sql.ansi.enabled", "false")
            return fn(spark, sf_dir)

        wrapped.__name__ = getattr(fn, "__name__", name)
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=wrapped,
            oracle=oracle,
            category=category,
            doc=doc or (fn.__doc__ or "").strip(),
            tables=tables,
            bench=bench,
        )
        return fn

    return deco


def load_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long (nanosAsLong): surface a real
        # microsecond timestamp; integer DIV avoids double rounding of
        # 1.7e18-scale nanos. Oracle side: CAST(ts AS TIMESTAMP).
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = ALL_TABLES
) -> None:
    """Register parquet tables as temp views (lazy; cheap per call)."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def sql_query(
    name: str,
    spark_sql: str,
    oracle: str | None = None,
    category: str = "relational",
    doc: str = "",
    tables: tuple[str, ...] = ALL_TABLES,
    bench: bool = True,
) -> None:
    """Register a query whose Spark side is a SQL string.

    When ``oracle`` is omitted the same text is used for DuckDB — most
    ANSI SQL runs unchanged on both engines; pass a dialect-adjusted
    oracle only where they genuinely diverge.
    """

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, tables)
        return spark.sql(spark_sql)

    fn.__name__ = f"q_{name}"
    fn.__doc__ = doc
    register(
        name,
        oracle=oracle if oracle is not None else spark_sql,
        category=category,
        doc=doc,
        tables=tables,
        bench=bench,
    )(fn)


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


_LOADED = False


def _ensure_loaded() -> None:
    """Import all corpus modules exactly once (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    from aws_etl_spark.queries import (  # noqa: F401
        advanced_rel,
        dedup_queries,
        event_analytics,
        functions_corpus,
        incremental_queries,
        llm_text,
        multimodal_queries,
        reference_parity,
        relational,
        similarity_queries,
        streaming_queries,
        udf_queries,
    )

    _LOADED = True
