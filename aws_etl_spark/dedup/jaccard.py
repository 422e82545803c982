"""Exact n-gram (shingle) Jaccard similarity between documents.

This is the *exact* near-dup path: explode distinct shingles, self-join
on shingle, count per-pair intersections, derive Jaccard from
|A∩B| / (|A| + |B| − |A∩B|). Entirely JVM-side.

Scale notes: the self-join shuffles on the shingle value, so cost is
Σ per-shingle df² — fine when shingles are discriminative (long-tail
distribution), quadratic on stop-shingles. For 100 TB corpora use
:mod:`aws_etl_spark.dedup.minhash` for candidate generation and this
module only to verify candidate pairs; or pre-filter hot shingles
(document-frequency cap) the way MinHashLSH implicitly does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shingle_words(text: Column, k: int = 3) -> Column:
    """Distinct word-k-gram shingles of a text column (JVM higher-order
    fns: split → sliding window via transform(sequence) → distinct)."""
    words = F.split(F.trim(text), r"\s+")
    n = F.size(words)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i, k)),
    )
    return F.array_distinct(shingles)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All document pairs (id_a < id_b) with shingle-Jaccard ≥ threshold.

    Returns ``(id_a, id_b, n_common, jaccard)``; jaccard is an
    int/int division — bit-deterministic across engines.
    """
    sh = df.select(
        F.col(id_col).alias("doc"), shingle_words(F.col(text_col), k).alias("shingles")
    ).withColumn("n_shingles", F.size("shingles"))

    exploded = sh.select(
        "doc", "n_shingles", F.explode("shingles").alias("shingle")
    )

    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.col("a.n_shingles").alias("na"),
            F.col("b.n_shingles").alias("nb"),
        )
        .agg(F.count("*").alias("n_common"))
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )
    return pairs


def jaccard_of_shingle_arrays(a: Column, b: Column) -> Column:
    """Exact Jaccard of two pre-computed distinct-shingle arrays
    (used to verify LSH candidate pairs without re-shuffling)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))
