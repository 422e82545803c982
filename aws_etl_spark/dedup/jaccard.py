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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shingle_words(text: Column, k: int = 3) -> Column:
    """Distinct word-k-gram shingles of a text column (JVM higher-order
    fns: split → sliding window via transform(sequence) → distinct).

    Reference semantics for small projections; the hot paths use
    :func:`shingle_rows` — higher-order lambdas are interpreted
    per-element and cost ~7 ms/doc on long documents.
    """
    words = F.split(F.trim(text), r"\s+")
    n = F.size(words)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i, k)),
    )
    return F.array_distinct(shingles)


def shingle_rows(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, distinct: bool = True
) -> DataFrame:
    """Distinct (doc, shingle) rows via posexplode + lead() windows —
    fully whole-stage-codegen'd (no interpreted array lambdas), one
    shuffle on the doc id that downstream per-doc aggregations reuse
    (same hash partitioning → no second exchange)."""
    words = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("pos", "w"),
    )
    win = Window.partitionBy("doc").orderBy("pos")
    # all lead() parts must be computed in ONE projection over the
    # un-filtered rows — a window fn after the filter would re-evaluate
    # over the truncated partition and emit short tail shingles
    parts = words.select(
        "doc",
        F.col("w").alias("w0"),
        *[F.lead("w", i).over(win).alias(f"w{i}") for i in range(1, k)],
    )
    rows = parts.filter(F.col(f"w{k - 1}").isNotNull()).select(
        "doc",
        F.concat_ws(" ", *[F.col(f"w{i}") for i in range(k)]).alias("shingle"),
    )
    # skip the dedup pass for consumers where multiplicity is harmless
    # (e.g. min-aggregation fingerprints)
    return rows.dropDuplicates(["doc", "shingle"]) if distinct else rows


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
    # both sides of the shingle self-join read this — cache it so
    # shingling runs once (multi-consumer caching policy, SURVEY.md §4)
    exploded = shingle_rows(df, id_col, text_col, k).withColumn(
        "n_shingles", F.count("*").over(Window.partitionBy("doc"))
    ).cache()

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


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """All document pairs (id_a < id_b) where the SMALLER shingle set
    is contained in the larger at >= threshold: asymmetric containment
    C = |A ∩ B| / min(|A|, |B|), the sub-document/quote-inclusion
    detector (Broder's containment, the measure Jaccard under-scores
    when |A| << |B|).

    Returns ``(id_a, id_b, n_common, containment)``; containment is an
    int/int division — bit-deterministic across engines. Same bucketed
    shingle self-join plan as :func:`ngram_jaccard_pairs` (shingles
    cached once, pairs grouped map-side); the containment filter is
    applied post-aggregation so candidate generation is shared work at
    scale.
    """
    exploded = shingle_rows(df, id_col, text_col, k).withColumn(
        "n_shingles", F.count("*").over(Window.partitionBy("doc"))
    ).cache()

    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.col("a.n_shingles").alias("na"),
            F.col("b.n_shingles").alias("nb"),
        )
        .agg(F.count("*").alias("n_common"))
        .withColumn(
            "containment",
            F.col("n_common") / F.least(F.col("na"), F.col("nb")),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "n_common", "containment")
    )
