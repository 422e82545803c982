"""Multimodal plumbing tests: Arrow batch iteration, metadata-driven
frame planning, stubbed decode contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_etl_spark.multimodal.binary_ops import (
    PAYLOAD_SCHEMA,
    byte_features,
    decode_image,
    frame_sample_plan,
    repartition_by_size,
)


def _payload_df(spark):
    rows = [
        (1, b"\x00\x01\x02\x03", ("image/png", 2, 2, None)),
        (2, b"\xff" * 1000, ("video/mp4", 640, 480, 3500)),
        (3, None, (None, None, None, None)),
    ]
    return spark.createDataFrame(rows, PAYLOAD_SCHEMA)


def test_byte_features_deterministic_and_null_safe(spark):
    df = _payload_df(spark)
    out = {r.item_id: r for r in byte_features(df, "item_id", "payload").collect()}
    assert out[1].byte_len == 4
    assert out[1].mean_byte == pytest.approx(1.5)
    assert out[2].byte_len == 1000
    assert out[2].digest is not None and len(out[2].digest) == 32
    assert out[3].byte_len is None and out[3].digest is None


def test_frame_sample_plan_from_metadata(spark):
    df = _payload_df(spark)
    plan = frame_sample_plan(df.filter("item_id = 2"), "item_id", "meta", every_ms=1000)
    ts = sorted(r.frame_ts_ms for r in plan.collect())
    assert ts == [0, 1000, 2000]  # 3500 ms at 1 frame/s → frames at 0,1,2 s


def test_repartition_by_size_preserves_rows(spark):
    df = _payload_df(spark)
    out = repartition_by_size(df, "payload")
    assert out.count() == 3
    assert set(out.columns) == set(df.columns)


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_mapinpandas_path_uses_arrow(spark):
    df = _payload_df(spark)
    plan = byte_features(df, "item_id", "payload")._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
