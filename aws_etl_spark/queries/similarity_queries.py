"""Similarity-search queries over the embeddings table (§2.13).

Exact variants carry full DuckDB oracles: the left-fold double dot
product is bit-identical to ``list_dot_product`` on DOUBLE[] and the
oracle mirrors the exact cosine expression shape. Approximate variants
(LSH / IVF) are recall-checked against the exact path in
tests/test_similarity.py and are rows-only for the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aws_etl_spark.queries.registry import load_table, register
from aws_etl_spark.similarity import (
    cosine_pairs_above,
    cosine_topk,
    cosine_topk_lsh,
    ivf_topk,
)

_TOPK_ORACLE = """
WITH s AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
         (SQRT(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
          SQRT(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < 20
),
r AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, neighbor_id, rank, cosine FROM r WHERE rank <= 5
"""

_PAIRS_ORACLE = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
       (SQRT(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        SQRT(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
      (SQRT(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
       SQRT(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.3
"""


@register(
    "ann_cosine_topk_exact",
    oracle=_TOPK_ORACLE,
    category="similarity",
    tables=("embeddings",),
)
def q_ann_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 20 query vectors (self excluded)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.filter("vec_id < 20"), k=5)


@register(
    "ann_embedding_near_dup",
    oracle=_PAIRS_ORACLE,
    category="similarity",
    tables=("embeddings",),
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cosine ≥ 0.3 (synthetic embeddings are unclustered; max pairwise cosine ≈ 0.48)), exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs_above(emb, threshold=0.3)


@register(
    "ann_cosine_topk_lsh",
    oracle=None,  # approximate; recall-gated in tests/test_similarity.py
    category="similarity",
    tables=("embeddings",),
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH banded ANN top-5 (32 bits × 8 bands) + exact re-rank."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_lsh(emb, emb.filter("vec_id < 20"), k=5)


@register(
    "ann_cosine_topk_ivf",
    oracle=None,  # approximate; recall-gated in tests/test_similarity.py
    category="similarity",
    tables=("embeddings",),
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5 (16 lists, probe 4)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter("vec_id < 20"), k=5)


_QUANTIZE_ORACLE = """
WITH e AS (
  SELECT vec_id, r.i AS pos, CAST(embedding[r.i] AS DOUBLE) AS val
  FROM embeddings CROSS JOIN range(1, 1025) r(i)
  WHERE r.i <= LEN(embedding)
),
s AS (SELECT pos, MAX(ABS(val)) AS mx FROM e GROUP BY pos)
SELECT e.vec_id, e.pos,
       CASE WHEN s.mx = 0 THEN 0
            ELSE CAST(FLOOR(e.val / s.mx * 127 + 0.5) AS BIGINT) END AS q8
FROM e JOIN s USING (pos)
"""


@register(
    "embeddings_quantize_int8",
    oracle=_QUANTIZE_ORACLE,
    category="similarity",
    tables=("embeddings",),
)
def q_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension symmetric int8 quantization (q = round(x/max|x|
    ·127)) — the embedding-compression pass ANN indexes run before
    sharding (4× memory cut, dot products stay proportional).

    Two passes: a (dims)-sized max-abs aggregate (map-side combined,
    broadcast back — never a driver round-trip), then a scan-bound
    projection. FLOOR(x + 0.5) instead of ROUND: both engines
    half-up the same way; float32 inputs are cast to double BEFORE
    dividing (DuckDB would otherwise divide in float32 while Spark
    promotes to double). Output exploded (vec_id, pos, q8) — array
    cells would crash the driver's canonicalizer.
    """
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.posexplode("embedding").alias("p", "v")
    ).select(
        "vec_id",
        (F.col("p") + 1).cast("long").alias("pos"),
        F.col("v").cast("double").alias("val"),
    )
    scales = e.groupBy("pos").agg(F.max(F.abs(F.col("val"))).alias("mx"))
    return e.join(F.broadcast(scales), "pos").select(
        "vec_id",
        "pos",
        F.when(F.col("mx") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor(F.col("val") / F.col("mx") * 127 + F.lit(0.5)).cast("long")
        )
        .alias("q8"),
    )
