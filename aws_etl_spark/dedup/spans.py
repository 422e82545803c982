"""Substring-level (span) deduplication over the documents table.

Document-level near-dup (minhash/simhash/jaccard) misses the common
corpus pathology where WHOLE documents are distinct but specific
SPANS — license headers, navigation chrome, quoted passages — repeat
across thousands of them. Span-level dedup (Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL 2022, which removes
repeated ≥50-token substrings) targets exactly that. This module is
the data-parallel formulation: fixed-length word k-gram spans instead
of a global suffix array — a suffix array is inherently a single
global sorted structure, while hashed span posting lists shard over
any number of executors, and a k-gram span table detects every
repeated substring of length ≥ k (any such substring contains a
repeated k-gram), trading span-boundary precision for linear scaling.

Two views of the same span table:

- :func:`duplicated_spans` — corpus-level: which spans repeat, in how
  many docs, how often (the "global boilerplate census" that feeds a
  removal/exclusion list).
- :func:`doc_span_profile` — per-document: what fraction of a doc's
  spans also occur elsewhere (the per-doc duplication score used as a
  filter signal, the span analogue of a quality score).

Both are exact GROUP BYs over the shingle rows — one shuffle on the
span hash, map-side-combined counts, no self-join — so they stay
linear in corpus size at any scale (the span table is the SAME
exploded shingle relation the Jaccard/minhash paths build; a real
pipeline materializes it once and feeds all four consumers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_etl_spark.dedup.jaccard import shingle_rows


def _span_occurrences(
    docs: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame | None:
    """Per-(doc, span) occurrence counts ``(doc, shingle, occ)`` — the
    one artifact BOTH span views derive from: the census reads
    ``(span → count rows, sum occ, min doc)`` and the profile reads
    the distinct keys. Served from the process-scoped pair cache
    (round-13 optimization) so the second consumer in a process pays a
    parquet read instead of re-exploding the corpus; a fresh process
    is cold and bit-identical (exact integer counts). Returns ``None``
    when the cache cannot serve (env hatch / in-memory input) — the
    callers then keep their historical single-consumer pipelines, so
    the pinned plan shapes are unchanged."""
    from aws_etl_spark.ops.pair_cache import materialized

    def build() -> DataFrame:
        return (
            shingle_rows(docs, id_col, text_col, k=k, distinct=False)
            .groupBy("doc", "shingle")
            .agg(F.count("*").cast("bigint").alias("occ"))
        )

    params = {"id_col": id_col, "text_col": text_col, "k": k}
    return materialized("span_occ", docs, params, build, fallback=lambda: None)


def duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """(span, n_docs, n_occurrences, first_doc) for every word-k-gram
    occurring in ≥ ``min_docs`` distinct documents.

    ``n_occurrences`` counts every occurrence (within-doc repeats
    included); ``first_doc`` is the min doc id, the deterministic
    exemplar. One groupBy(span) — count + count-distinct + min in a
    single aggregate pass.
    """
    so = _span_occurrences(docs, id_col, text_col, k)
    if so is not None:
        # (doc, span) rows are unique after the occurrence grouping,
        # so count(*) == countDistinct(doc) and sum(occ) == the raw
        # occurrence count — same integers, one shared artifact
        return (
            so.groupBy(F.col("shingle").alias("span"))
            .agg(
                F.count("*").cast("bigint").alias("n_docs"),
                F.sum("occ").cast("bigint").alias("n_occurrences"),
                F.min("doc").cast("bigint").alias("first_doc"),
            )
            .filter(F.col("n_docs") >= min_docs)
        )
    sh = shingle_rows(docs, id_col, text_col, k=k, distinct=False)
    return (
        sh.groupBy(F.col("shingle").alias("span"))
        .agg(
            F.countDistinct("doc").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.min("doc").cast("bigint").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def doc_span_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """(doc_id, n_spans, n_dup_spans, dup_fraction) per document.

    ``n_spans`` counts the doc's DISTINCT k-gram spans; a span is
    "dup" when it also occurs in ≥1 OTHER document. ``dup_fraction``
    is int/int double division (bit-deterministic). Docs shorter than
    k words have no spans and are reported with zero counts.

    Shape: distinct (doc, span) → span doc-frequency (one agg) →
    broadcast-scale join back on span hash → per-doc agg. The span-DF
    relation is the classic document-frequency table; at corpus scale
    it is Zipf-distributed and joins back hash-partitioned (no
    broadcast assumption needed).
    """
    so = _span_occurrences(docs, id_col, text_col, k)
    if so is not None:
        sh = so.select("doc", "shingle")
    else:
        sh = shingle_rows(docs, id_col, text_col, k=k, distinct=True)
    span_df = sh.groupBy("shingle").agg(
        F.countDistinct("doc").alias("span_docs")
    )
    per_doc = (
        sh.join(span_df, "shingle")
        .groupBy("doc")
        .agg(
            F.count("*").cast("bigint").alias("n_spans"),
            F.sum((F.col("span_docs") >= 2).cast("bigint"))
            .cast("bigint")
            .alias("n_dup_spans"),
        )
    )
    all_docs = docs.select(F.col(id_col).alias("doc"))
    return (
        all_docs.join(per_doc, "doc", "left")
        .select(
            F.col("doc").alias("doc_id"),
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce(F.col("n_dup_spans"), F.lit(0))
            .cast("bigint")
            .alias("n_dup_spans"),
            F.when(F.coalesce(F.col("n_spans"), F.lit(0)) > 0,
                   F.col("n_dup_spans") / F.col("n_spans"))
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
    )
