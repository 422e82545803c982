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


def _md5_bucket8(expr: str) -> str:
    """DuckDB decode of the first 8 md5 hex digits (the ops/corpus.py
    strpos idiom widened from 4 to 8 digits; value < 2^32 fits BIGINT)
    — mirrors Python ``int(md5(x).hexdigest()[:8], 16)``."""
    h = f"md5({expr})"
    digit = "(strpos('0123456789abcdef', substr({h},{i},1))-1)"
    terms = " + ".join(
        digit.format(h=h, i=i) + f"*{16 ** (8 - i)}::BIGINT"
        for i in range(1, 9)
    )
    return f"({terms})"


# Full SQL mirror of the dHash pipeline under the md5-bucket renderer:
# shingle render (18x16 grid, brightness = 255*count//max) -> 2x2
# block sums (mean comparison == sum comparison at equal block sizes,
# so no division ever happens) -> row-major gradient sign bits ->
# two's-complement BIGINT -> brute-force Hamming pairing. Exactness of
# the Spark side's BANDED join vs this brute force rests on the
# pigeonhole precondition (no oversize buckets), asserted in
# tests/test_multimodal.py on the graded corpora.
_PHASH_EXACT_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(ws)-2,0)+1),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gram
  FROM tok
),
cellcnt AS (
  SELECT doc_id, {_md5_bucket8("gram")} % 288 AS cell,
         COUNT(*)::BIGINT AS cnt
  FROM grams GROUP BY doc_id, cell
),
mx AS (SELECT doc_id, MAX(cnt) AS m FROM cellcnt GROUP BY doc_id),
blocks AS (
  SELECT c.doc_id, (c.cell//18)//2 AS r2, (c.cell%18)//2 AS c2,
         SUM((c.cnt*255)//m.m) AS s
  FROM cellcnt c JOIN mx m USING (doc_id)
  GROUP BY c.doc_id, r2, c2
),
grid AS (
  SELECT d.doc_id, r2.range AS r2, c2.range AS c2
  FROM (SELECT DISTINCT doc_id FROM documents) d,
       range(0,8) r2, range(0,9) c2
),
bs AS (
  SELECT g.doc_id, g.r2, g.c2, COALESCE(b.s, 0) AS s
  FROM grid g LEFT JOIN blocks b
    ON b.doc_id = g.doc_id AND b.r2 = g.r2 AND b.c2 = g.c2
),
bits AS (
  SELECT l.doc_id, l.r2*8 + l.c2 AS j,
         CASE WHEN l.s > r.s THEN 1 ELSE 0 END AS bit
  FROM bs l JOIN bs r
    ON r.doc_id = l.doc_id AND r.r2 = l.r2 AND r.c2 = l.c2+1
  WHERE l.c2 <= 7
),
sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN j < 63 THEN bit * (CAST(1 AS BIGINT) << j)
                       ELSE 0 END)
              - SUM(CASE WHEN j = 63 THEN bit ELSE 0 END)
                * (CAST(1 AS BIGINT) << 62) * 2
              AS BIGINT) AS sig
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON b.doc_id > a.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
"""


@register(
    "multimodal_phash_neardup_exact",
    oracle=_PHASH_EXACT_ORACLE,
    category="multimodal",
    tables=("documents",),
)
def q_phash_neardup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-provable twin of ``multimodal_phash_neardup``: the SAME
    dHash pipeline (Python mapInPandas render → area-mean resize →
    gradient-sign fingerprint → banded Hamming join), with the render
    bucket switched from crc32 to md5 (``decode_render_md5``) so every
    stage has a DuckDB spelling. The driver hash proves the Arrow
    kernel, the two's-complement bit assembly, and the pigeonhole
    banded join end to end — recall caveats and all (the
    algorithm-mirroring-oracle trick, as ann_cosine_topk_lsh r5 /
    ivf_exact r6)."""
    from aws_etl_spark.dedup.simhash import hamming_near_dup_pairs
    from aws_etl_spark.multimodal.binary_ops import (
        decode_render_md5,
        dhash64,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.lit(18).alias("width"),
        F.lit(16).alias("height"),
    )
    sigs = dhash64(
        docs, "doc_id", "payload", "width", "height",
        decoder=decode_render_md5,
    ).cache()
    return hamming_near_dup_pairs(
        sigs, id_col="item_id", sig_col="phash", max_distance=3, chunks=4
    )


# Frame-sampling twin: the REAL extract_frames kernel (plan → window
# decode → per-frame reduce) projected onto its engine-portable
# feature columns. The frame plan (duration-derived count, clamp) and
# the byte-window position/clip arithmetic are pure integer/IEEE math
# DuckDB mirrors exactly; byte_mean/byte_crc (numpy/zlib kernels) stay
# on the rows-only original, cross-pinned in test_multimodal.py.
_FRAME_EXACT_ORACLE = """
WITH d AS (
  SELECT doc_id AS item_id,
         OCTET_LENGTH(ENCODE(text)) AS plen,
         LEAST(GREATEST(CAST(FLOOR((LENGTH(text)*25)/1000.0) AS BIGINT),
                        1), 10000) AS nf
  FROM documents
),
f AS (
  SELECT item_id, plen, unnest(range(0, nf)) AS i FROM d
)
SELECT item_id,
       CAST(i AS BIGINT) AS frame_idx,
       CAST(i * 1000 AS BIGINT) AS frame_ts_ms,
       CASE WHEN plen = 0 THEN NULL
            ELSE CAST(LEAST(256, plen - (i*9973) % GREATEST(plen-256, 1))
                 AS BIGINT) END AS n_bytes
FROM f
"""


@register(
    "multimodal_frame_sample_exact",
    oracle=_FRAME_EXACT_ORACLE,
    category="multimodal",
    tables=("documents",),
)
def q_frame_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-provable twin of ``multimodal_frame_sample``: identical
    plumbing (same metadata plan, same mapInPandas decode loop, same
    default byte-window decoder), output projected to the columns with
    a DuckDB spelling — frame index/timestamp grid and the decoded
    window's byte length (position arithmetic plus end-of-payload
    clipping). A wrong frame count, a mis-stepped window position, or
    a dropped clip all flip the hash."""
    from aws_etl_spark.multimodal.binary_ops import extract_frames

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            (F.length("text") * 25).cast("long").alias("duration_ms")
        ).alias("meta"),
    )
    return extract_frames(
        docs, "doc_id", "payload", "meta", every_ms=1000
    ).select("item_id", "frame_idx", "frame_ts_ms", "n_bytes")
