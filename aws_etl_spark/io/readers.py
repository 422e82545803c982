"""Readers (SURVEY.md §2.1).

Reference parity: the CSV reader reproduces ``csv-to-parquet.py:38-44``
(header, comma, utf-8, all-string schema unless told otherwise) and its
format guard (``:14-17``); everything else is the broader source
surface the engine exposes (parquet, json, jdbc, binaryFile, listing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SUPPORTED_SOURCE_FORMATS = {
    "csv", "parquet", "orc", "json", "xml", "jdbc", "binaryFile",
}


class UnsupportedFormatError(ValueError):
    """Reference behavior: refuse unknown source formats up front
    (csv-to-parquet.py:14-17) instead of failing mid-job."""


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    sep: str = ",",
    encoding: str = "utf-8",
    infer_schema: bool = False,
    mode: str = "PERMISSIVE",
    corrupt_column: str | None = None,
) -> DataFrame:
    """CSV read. Default mirrors the reference: header on, no
    inference → every column StringType (typing is the transform
    stage's job, SURVEY §1.3). Pass ``schema`` (preferred at scale —
    inference scans the data twice) or ``infer_schema=True`` to type
    at read.

    Malformed-row policy (the reference has none — a bad row poisons
    the daily run): ``mode`` is PERMISSIVE (nulls for bad fields) /
    DROPMALFORMED / FAILFAST; with ``corrupt_column`` set, PERMISSIVE
    additionally lands the raw text of each bad row in that column for
    a quarantine sink.
    """
    reader = spark.read.options(header=header, sep=sep, encoding=encoding, mode=mode)
    if corrupt_column is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_column)
        if schema is not None and isinstance(schema, T.StructType):
            schema = T.StructType(
                list(schema.fields) + [T.StructField(corrupt_column, T.StringType())]
            )
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC read (vectorized, same pushdown/pruning surface as parquet)."""
    return spark.read.orc(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """XML read (built-in datasource since Spark 4; one DataFrame row
    per ``row_tag`` element). Schema inference costs an extra pass —
    pass an explicit schema on large inputs, as with csv/json."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    dialect=None,
    **options: str,
) -> DataFrame:
    """JDBC read (validation read-back in the reference,
    etl_aws_vini.py:364-377). Partitioned pull when bounds are given —
    a single-connection JDBC read is a driver bottleneck at scale.
    ``dialect`` pins the driver class per warehouse (see
    aws_etl_spark.io.dialects)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if dialect is not None:
        reader = reader.option("driver", dialect.driver)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_binary_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """Binary-file source → (path, modificationTime, length, content)
    — the multimodal ingest path and the object-listing equivalent of
    the reference's S3ListOperator (etl_aws_vini.py:470-476)."""
    return spark.read.format("binaryFile").load(path_glob)


def list_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """Listing only (no content): binaryFile metadata minus payload —
    column-pruned to a pure listing by Catalyst."""
    return read_binary_files(spark, path_glob).select(
        "path", "modificationTime", "length"
    )


def read_table(
    spark: SparkSession, fmt: str, path: str, **kwargs
) -> DataFrame:
    """Format-dispatched read with the reference's up-front guard."""
    if fmt not in SUPPORTED_SOURCE_FORMATS:
        raise UnsupportedFormatError(
            f"source format {fmt!r} not supported; expected one of "
            f"{sorted(SUPPORTED_SOURCE_FORMATS)}"
        )
    if fmt == "csv":
        return read_csv(spark, path, **kwargs)
    if fmt == "parquet":
        return read_parquet(spark, path)
    if fmt == "orc":
        return read_orc(spark, path)
    if fmt == "json":
        return read_json(spark, path, **kwargs)
    if fmt == "xml":
        return read_xml(spark, path, **kwargs)
    if fmt == "binaryFile":
        return read_binary_files(spark, path)
    raise UnsupportedFormatError(f"jdbc requires read_jdbc(url=..., table=...)")


def with_source_file(df: DataFrame) -> DataFrame:
    """Tag rows with their source file (lineage;
    ``input_file_name`` per SURVEY §2.1)."""
    return df.withColumn("_source_file", F.input_file_name())
