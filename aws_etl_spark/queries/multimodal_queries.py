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
