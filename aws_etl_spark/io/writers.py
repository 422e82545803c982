"""Writers (SURVEY.md §2.2).

Deliberate departure from the reference: ``coalesce(1)`` forced every
output into ONE file (csv-to-parquet.py:46, transformation.py:49) —
a single-task funnel that caps write throughput at one core regardless
of cluster size. Here output sizing is declarative
(``maxRecordsPerFile`` + AQE-coalesced partitions); single-file output
is an explicit opt-in for small reference outputs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    single_file: bool = False,
    compression: str | None = None,
) -> None:
    """``compression``: snappy (Spark default; fastest scans), zstd
    (~30-40%% smaller at similar read cost — the 100 TB at-rest
    default), gzip, lz4, none."""
    writer = df.coalesce(1).write if single_file else df.write
    writer = writer.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    df.write.mode(mode).option("header", header).csv(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str, mode: str = "overwrite"
) -> None:
    """XML write (built-in since Spark 4): one ``row_tag`` element per
    row, partition-parallel like every other sink here."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)


def save_as_table(
    df: DataFrame,
    name: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
) -> None:
    """Catalog-registered write — replaces the reference's post-hoc
    Glue crawler (glue-crawler.tf:10-17): the schema is registered at
    write time, no inference pass. ``bucket_by`` pre-co-locates later
    equi-joins on the bucket keys (no shuffle at read)."""
    writer = df.write.mode(mode).format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        writer = writer.bucketBy(n, *cols).sortBy(*cols)
    writer.saveAsTable(name)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    batch_size: int = 10_000,
    dialect=None,
    **options: str,
) -> None:
    """Distributed JDBC load — replaces the reference's single-node
    pandas ``to_sql`` hop (etl_aws_vini.py:307-335), which also only
    loaded the *last* parquet part-file (`:328`, a silent
    correctness bug at >1 file). Every executor writes its partitions
    over its own connection.

    ``dialect`` (an :class:`aws_etl_spark.io.dialects.JdbcDialect`)
    pins engine-specific behavior: overwrite becomes TRUNCATE-and-load
    where supported (grants/sort keys survive; Postgres/Redshift) vs
    drop-and-recreate (Derby), column DDL types come from the
    dialect's mapping (``createTableColumnTypes``), and the JDBC
    driver class is set explicitly. Explicit ``options`` win over
    dialect-derived ones."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batch_size)
        .mode(mode)
    )
    if dialect is not None:
        writer = writer.option("driver", dialect.driver)
        if mode == "overwrite":
            for k, v in dialect.overwrite_options(df.schema).items():
                writer = writer.option(k, v)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
