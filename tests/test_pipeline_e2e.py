"""End-to-end reference-lifecycle test: archive ingest → landing CSVs
→ silver parquet (EP2 fan-out) → curated transformation (EP1) →
parquet sink → count reconciliation — the whole DAG
(etl_aws_vini.py) as one in-process pipeline."""

from __future__ import annotations

import zipfile

import pytest

from aws_etl_spark.io.ingest import fetch_archive, ingest_tables
from aws_etl_spark.io.readers import UnsupportedFormatError, read_csv, read_table
from aws_etl_spark.io.writers import write_csv, write_parquet
from aws_etl_spark.pipeline.runner import (
    Pipeline,
    SensorTimeout,
    StepFailed,
    file_sensor,
    reconcile_counts,
)
from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded, load_table

TABLES = ["region", "nation", "customer", "orders", "lineitem"]


@pytest.fixture(scope="module")
def landing(spark, sf_dir, tmp_path_factory):
    """Build a zip archive of CSVs from the driver testdata, then
    explode it into a landing dir (lambda_function.py semantics)."""
    root = tmp_path_factory.mktemp("zones")
    csv_src = root / "csv_src"
    for t in TABLES:
        write_csv(load_table(spark, sf_dir, t), str(csv_src / t))
    archive = root / "source.zip"
    with zipfile.ZipFile(archive, "w") as zf:
        for t in TABLES:
            part = next((csv_src / t).glob("*.csv"))
            zf.write(part, arcname=f"{t}.csv")
    extracted = fetch_archive(str(archive), str(root / "landing"))
    assert len(extracted) == len(TABLES)
    return root


def test_full_reference_lifecycle(spark, landing):
    ctx_holder = {}
    failures = []

    def sense(ctx):
        return file_sensor(f"{landing}/landing/data/*.csv", timeout_sec=10)

    def to_silver(ctx):
        tables = {t: f"{landing}/landing/data/{t}.csv" for t in TABLES}
        return ingest_tables(spark, tables, f"{landing}/silver")

    def to_curated(ctx):
        for t in TABLES:
            # all-string silver (reference §1.3): curated query casts
            spark.read.parquet(f"{landing}/silver/{t}").createOrReplaceTempView(t)
        _ensure_loaded()
        df = spark.sql(_curated_sql())
        write_parquet(df, f"{landing}/curated/sales")
        return df.count()

    def validate(ctx):
        sink_count = spark.read.parquet(f"{landing}/curated/sales").count()
        return reconcile_counts(ctx["to_curated"], sink_count, "curated")

    p = (
        Pipeline("reference_lifecycle", on_failure=lambda s, e: failures.append(s))
        .add_step("sense", sense)
        .add_step("to_silver", to_silver, depends_on=["sense"])
        .add_step("to_curated", to_curated, depends_on=["to_silver"])
        .add_step("validate", validate, depends_on=["to_curated"])
    )
    ctx = p.run()
    ctx_holder.update(ctx)

    assert len(ctx["sense"]) == len(TABLES)
    assert all(n > 0 for n in ctx["to_silver"].values())
    assert ctx["validate"] == ctx["to_curated"] > 0
    assert not failures


def _curated_sql() -> str:
    # the registered curated query text, run over all-string silver
    # views — proving the cast/cleaning semantics type bronze data
    from aws_etl_spark.queries import reference_parity

    return reference_parity._SPARK_CURATED


def test_all_string_silver_schema(spark, landing):
    df = spark.read.parquet(f"{landing}/silver/orders")
    assert all(t == "string" for _, t in df.dtypes)


def test_curated_output_typed(spark, landing):
    out = spark.read.parquet(f"{landing}/curated/sales")
    types = dict(out.dtypes)
    assert types["order_key"] == "int"
    assert types["total_price"] == "decimal(10,2)"
    assert types["order_date"] == "timestamp"
    assert types["return_quantity"] == "double"


def test_format_guard(spark):
    with pytest.raises(UnsupportedFormatError):
        read_table(spark, "avro", "/nonexistent")


def test_sensor_timeout():
    with pytest.raises(SensorTimeout):
        file_sensor("/nonexistent/*.never", timeout_sec=0.5, poke_interval_sec=0.1)


def test_retries_and_failure_callback():
    calls = {"n": 0}
    failed = []

    def flaky(ctx):
        calls["n"] += 1
        if calls["n"] < 2:
            raise RuntimeError("transient")
        return "ok"

    p = Pipeline("retry", on_failure=lambda s, e: failed.append(s))
    p.add_step("flaky", flaky, retries=1)
    assert p.run()["flaky"] == "ok"
    assert calls["n"] == 2

    def always_fails(ctx):
        raise RuntimeError("permanent")

    p2 = Pipeline("fail", on_failure=lambda s, e: failed.append(s))
    p2.add_step("bad", always_fails, retries=1)
    with pytest.raises(StepFailed):
        p2.run()
    assert failed == ["bad"]


def test_dependency_cycle_rejected():
    p = Pipeline("cycle")
    p.add_step("a", lambda c: 1)
    with pytest.raises(ValueError):
        p.add_step("b", lambda c: 2, depends_on=["missing"])


def test_reconcile_mismatch_raises():
    with pytest.raises(AssertionError):
        reconcile_counts(10, 9, "x")


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC sink/source roundtrip preserves schema and rows."""
    from aws_etl_spark.io import read_orc, read_table, write_orc
    from aws_etl_spark.queries.registry import load_table

    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(nation, path)
    back = read_orc(spark, path)
    assert back.schema == nation.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))
    assert read_table(spark, "orc", path).count() == nation.count()


def test_csv_malformed_row_policies(spark, tmp_path):
    """PERMISSIVE quarantines bad rows in the corrupt column;
    FAILFAST raises on first bad row."""
    import pytest
    from pyspark.sql import types as T

    from aws_etl_spark.io import read_csv

    p = tmp_path / "dirty.csv"
    p.write_text("k,v\n1,10\nnot_an_int,20\n3,thirty\n")
    schema = T.StructType(
        [T.StructField("k", T.IntegerType()), T.StructField("v", T.IntegerType())]
    )
    good = read_csv(
        spark, str(p), schema=schema, mode="PERMISSIVE", corrupt_column="_bad"
    )
    rows = good.collect()
    assert len(rows) == 3
    quarantined = [r for r in rows if r._bad is not None]
    assert len(quarantined) == 2  # both malformed rows captured raw
    # count() on CSV is pushdown-counted without parsing — collect to
    # actually exercise the malformed-row drop
    dropped = read_csv(spark, str(p), schema=schema, mode="DROPMALFORMED").collect()
    assert [tuple(r) for r in dropped] == [(1, 10)]
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        read_csv(spark, str(p), schema=schema, mode="FAILFAST").collect()


def test_parquet_compression_codecs(spark, sf_dir, tmp_path):
    from aws_etl_spark.io import write_parquet
    from aws_etl_spark.queries.registry import load_table

    nation = load_table(spark, sf_dir, "nation")
    for codec in ["snappy", "zstd"]:
        path = str(tmp_path / f"nation_{codec}")
        write_parquet(nation, path, compression=codec)
        back = spark.read.parquet(path)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_xml_roundtrip(spark, sf_dir, tmp_path):
    """XML sink/source roundtrip (built-in datasource, Spark 4): one
    element per row, schema given explicitly on read-back (XML
    inference widens integral types)."""
    from aws_etl_spark.io import read_table, read_xml, write_xml
    from aws_etl_spark.queries.registry import load_table

    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_xml")
    write_xml(nation, path, row_tag="nation")
    back = read_xml(spark, path, row_tag="nation", schema=nation.schema)
    assert back.schema == nation.schema
    assert sorted(map(tuple, back.select(*nation.columns).collect())) == sorted(
        map(tuple, nation.collect())
    )
    assert (
        read_table(spark, "xml", path, row_tag="nation", schema=nation.schema).count()
        == nation.count()
    )
