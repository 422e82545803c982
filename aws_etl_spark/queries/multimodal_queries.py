"""Multimodal-column queries (§2.13): binary payload plumbing proven
on synthesized blobs (documents.text UTF-8 bytes — the container has
no media codecs; see aws_etl_spark.multimodal.binary_ops).

``multimodal_byte_features`` runs the REAL Arrow/mapInPandas path and
still has a full SQL oracle because the fake featurizer is
deterministic byte math DuckDB can mirror (octet_length/md5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_spark.multimodal.binary_ops import byte_features
from aws_etl_spark.queries.registry import load_table, register

_FEATURES_ORACLE = """
SELECT doc_id AS item_id,
       OCTET_LENGTH(ENCODE(text)) AS byte_len,
       MD5(text) AS digest
FROM documents
"""


@register(
    "multimodal_byte_features",
    oracle=_FEATURES_ORACLE,
    category="multimodal",
    tables=("documents",),
)
def q_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas featurization of a binary column."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return byte_features(docs, "doc_id", "payload").select(
        "item_id", "byte_len", "digest"
    )


@register(
    "multimodal_frame_sample",
    oracle=None,  # the frame decoder is a Python kernel (pluggable
    # codec seam) — plumbing + determinism + feature math pinned in
    # tests/test_multimodal.py::test_extract_frames_plumbing
    category="multimodal",
    tables=("documents",),
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing over binary media payloads: plan one
    frame per second from metadata, decode each planned frame with
    the pluggable decoder (deterministic byte-window fake in this
    codec-less env), reduce to per-frame features inside the same
    Arrow batch. documents.text bytes stand in for media payloads;
    duration metadata derives from payload size."""
    from aws_etl_spark.multimodal.binary_ops import extract_frames

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            (F.length("text") * 25).cast("long").alias("duration_ms")
        ).alias("meta"),
    )
    return extract_frames(docs, "doc_id", "payload", "meta", every_ms=1000)
