"""Landing-zone ingest utilities (reference lambda +
csv→parquet stage, SURVEY.md EP2).

``fetch_archive`` reproduces the Lambda's semantics
(k8s/lambda-function/lambda_function.py:9-28: download zip → store
archive → explode members into a ``data/`` prefix) against any local/
mounted filesystem; network fetch is optional (a local archive path
works offline).

``convert_table`` is EP2 (csv-to-parquet.py:37-46) as a library call:
lazy source relation → columnar write, no argv/literal_eval protocol,
no coalesce(1). ``ingest_tables`` fans the conversion out over a
thread pool — the 8 EMR steps the reference runs *serially*
(StepConcurrencyLevel=1, etl_aws_vini.py:148) are independent jobs
and run concurrently inside one Spark app.
"""

from __future__ import annotations

import shutil
import zipfile
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

from pyspark.sql import SparkSession

from aws_etl_spark.io.readers import read_table
from aws_etl_spark.io.writers import write_parquet


def fetch_archive(
    source: str,
    landing_dir: str,
    data_prefix: str = "data",
) -> list[str]:
    """Stage an archive into the landing zone and explode its members
    under ``landing_dir/data_prefix/``. ``source`` is a local path or
    an http(s) URL. Returns extracted member paths."""
    landing = Path(landing_dir)
    landing.mkdir(parents=True, exist_ok=True)
    archive_path = landing / Path(source).name
    if source.startswith(("http://", "https://")):
        import urllib.request

        urllib.request.urlretrieve(source, archive_path)  # noqa: S310
    elif Path(source) != archive_path:
        shutil.copyfile(source, archive_path)

    out_dir = landing / data_prefix
    out_dir.mkdir(parents=True, exist_ok=True)
    extracted: list[str] = []
    with zipfile.ZipFile(archive_path) as zf:
        for member in zf.namelist():
            if member.endswith("/"):
                continue
            target = out_dir / Path(member).name
            with zf.open(member) as src, open(target, "wb") as dst:
                shutil.copyfileobj(src, dst)
            extracted.append(str(target))
    return extracted


def convert_table(
    spark: SparkSession,
    source_path: str,
    target_path: str,
    source_format: str = "csv",
    **read_kwargs,
) -> int:
    """One bronze→silver conversion (EP2). Returns written row count
    (read back lazily from the target for reconciliation)."""
    df = read_table(spark, source_format, source_path, **read_kwargs)
    write_parquet(df, target_path)
    return spark.read.parquet(target_path).count()


def ingest_tables(
    spark: SparkSession,
    tables: dict[str, str],
    silver_dir: str,
    source_format: str = "csv",
    max_parallel: int = 8,
    **read_kwargs,
) -> dict[str, int]:
    """Fan out conversions concurrently (independent Spark jobs share
    the session; the scheduler interleaves their stages)."""
    def one(item: tuple[str, str]) -> tuple[str, int]:
        name, src = item
        n = convert_table(
            spark, src, f"{silver_dir}/{name}", source_format, **read_kwargs
        )
        return name, n

    with ThreadPoolExecutor(max_workers=max_parallel) as pool:
        return dict(pool.map(one, tables.items()))
