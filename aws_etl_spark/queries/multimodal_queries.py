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


@register(
    "multimodal_phash_neardup",
    oracle=None,  # the perceptual hash is a Python decode kernel
    # (pluggable codec seam) — not SQL-expressible; the banded join is
    # pinned equal to brute-force Hamming pairing in
    # tests/test_multimodal.py::test_phash_banded_equals_bruteforce
    category="multimodal",
    tables=("documents",),
)
def q_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs by 64-bit dHash: decode (deterministic
    fake in this codec-less env; decoder seam takes Pillow when
    present) → area-mean 9×8 → gradient-sign fingerprint → banded
    Hamming join (shared with SimHash: pigeonhole chunk equi-join,
    linear scale, bucket caps). The image analogue of text near-dup —
    one fingerprint row per image, candidates only within shared
    16-bit chunks, never all-pairs. documents.text bytes stand in for
    image payloads with metadata-derived dimensions."""
    from aws_etl_spark.dedup.simhash import hamming_near_dup_pairs
    from aws_etl_spark.multimodal.binary_ops import decode_render_fake, dhash64

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        # documents stand in for an image table; real tables carry
        # meta.width/height
        F.lit(18).alias("width"),
        F.lit(16).alias("height"),
    )
    # the banded join self-joins its input: cache the signatures so
    # the Python decode kernel runs once, not once per side (the
    # multi-consumer caching policy — same reason simhash caches)
    sigs = dhash64(
        docs, "doc_id", "payload", "width", "height",
        decoder=decode_render_fake,
    ).cache()
    return hamming_near_dup_pairs(
        sigs, id_col="item_id", sig_col="phash", max_distance=3, chunks=4
    )
