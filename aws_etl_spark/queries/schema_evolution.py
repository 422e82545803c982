"""Schema-evolution read surface.

The reference's Glue crawler re-infers the curated table's schema
after each load (k8s/resources/glue-crawler.tf:10-17) — new columns
appear in later partitions and the catalog presents the union, with
the column NULL for partitions written before it existed. The Spark
spelling is parquet ``mergeSchema``: per-file footers are unioned at
read time, so a lake can evolve additively without rewriting history.

``evolve_schema_read`` exercises the full lifecycle inside one
driver-checkable query: write batch 1 (1995 orders, no priority
column) and batch 2 (1996 orders, with the added ``o_orderpriority``)
into hive-style partition directories of one dataset, read the merged
union back, and aggregate over the coalesced column — legacy rows
fold into a 'LEGACY' bucket. The oracle recomputes the same result
from the source table (batch-1 rows contribute no priority), so the
driver hash proves the evolved read surfaces exactly the written
data: a column misaligned across file groups, a dropped partition,
or a NULL-fill bug all flip the hash.

At 100 TB this is the additive-evolution contract: mergeSchema costs
one footer read per FILE GROUP (not per row), partition pruning still
applies (pinned in tests/test_plans.py — a filter on the partition
key reaches the scan as a PartitionFilter), and no history rewrite
ever happens.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_spark.io.writers import write_parquet
from aws_etl_spark.queries.registry import load_table, register

_PRICE_DEC = "decimal(12,2)"  # money at its native scale (never after division)


def _evolve_base(sf_dir: str) -> Path:
    """Per-(sf, process) scratch root — same isolation contract as
    queries/serving.py: repeated in-process runs overwrite in place,
    concurrent processes never race each other's files."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = (
        Path(tempfile.gettempdir())
        / "aws_etl_spark_evolve"
        / f"{tag}-{os.getpid()}"
    )
    base.mkdir(parents=True, exist_ok=True)
    return base


def write_evolved_dataset(spark: SparkSession, sf_dir: str) -> str:
    """Write the two-generation dataset and return its root path.

    batch=1: (o_orderkey, o_totalprice) for 1995 orders — the schema
    as first deployed. batch=2: the same plus ``o_orderpriority`` for
    1996 orders — the column added later. Distinct hive-style
    partition dirs under one root, exactly what a crawler re-crawl
    sees."""
    orders = load_table(spark, sf_dir, "orders")
    base = _evolve_base(sf_dir)
    root = base / "orders_evolved"
    batch1 = orders.filter(F.year("o_orderdate") == 1995).select(
        "o_orderkey", "o_totalprice"
    )
    batch2 = orders.filter(F.year("o_orderdate") == 1996).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    write_parquet(batch1, str(root / "batch=1"))
    write_parquet(batch2, str(root / "batch=2"))
    return str(root)


def read_parquet_merged(spark: SparkSession, path: str) -> DataFrame:
    """Evolved-schema read: union the file footers (``mergeSchema``)
    and recover hive-style partition columns via ``basePath``. Columns
    absent from older file groups surface as NULL — the additive
    evolution contract."""
    return (
        spark.read.option("mergeSchema", "true")
        .option("basePath", path)
        .parquet(path)
    )


_EVOLVE_ORACLE = f"""
WITH src AS (
  SELECT o_totalprice,
         CASE WHEN EXTRACT(year FROM o_orderdate) = 1996
              THEN o_orderpriority END AS pr
  FROM orders
  WHERE EXTRACT(year FROM o_orderdate) IN (1995, 1996)
)
SELECT COALESCE(pr, 'LEGACY') AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS {_PRICE_DEC})), 2) AS DOUBLE)
         AS total_price
FROM src
GROUP BY COALESCE(pr, 'LEGACY')
"""


@register(
    "evolve_schema_read",
    oracle=_EVOLVE_ORACLE,
    category="pipeline",
    tables=("orders",),
)
def q_evolve_schema_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write → evolve → merged read → aggregate, in one plan set (see
    module docstring). The driver hash proves NULL-fill, file-group
    alignment, and partition discovery end to end against a
    source-table recompute."""
    root = write_evolved_dataset(spark, sf_dir)
    merged = read_parquet_merged(spark, root)
    return (
        merged.groupBy(
            F.coalesce("o_orderpriority", F.lit("LEGACY")).alias("priority")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast(_PRICE_DEC)), 2)
            .cast("double")
            .alias("total_price"),
        )
    )
