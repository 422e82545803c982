"""IO layer: readers, writers, landing-zone ingest (SURVEY §2.1-2.2)."""

from aws_etl_spark.io.ingest import convert_table, fetch_archive, ingest_tables
from aws_etl_spark.io.readers import (
    SUPPORTED_SOURCE_FORMATS,
    UnsupportedFormatError,
    list_files,
    read_binary_files,
    read_csv,
    read_jdbc,
    read_json,
    read_orc,
    read_parquet,
    read_table,
    read_xml,
    with_source_file,
)
from aws_etl_spark.io.writers import (
    save_as_table,
    write_csv,
    write_jdbc,
    write_orc,
    write_parquet,
    write_xml,
)
