"""Deduplication operators for large-scale text corpora.

All operators are pure DataFrame compositions (JVM-side, codegen'd) —
no Python UDFs in any hot path — so they scale with executor count:

- :func:`exact.dedup_exact` — content-hash group dedup (one shuffle)
- :func:`jaccard.ngram_jaccard_pairs` — exact n-gram-shingle Jaccard
  via shingle-explode + self-join (the verify path / small-corpus path)
- :func:`minhash.minhash_near_dup_pairs` — MinHash+LSH banding
  (the 100 TB path: candidate generation is linear in corpus size,
  pairs only materialize within colliding buckets)
- :func:`simhash.simhash_near_dup_pairs` — 64-bit SimHash with
  pigeonhole chunk banding for low Hamming radii
- :func:`components.connected_components` / :func:`components.dedup_clusters`
  — star-contraction connected components turning pair edges into
  duplicate clusters with a canonical survivor per cluster
"""

from aws_etl_spark.dedup.components import connected_components, dedup_clusters
from aws_etl_spark.dedup.exact import dedup_exact
from aws_etl_spark.dedup.jaccard import ngram_jaccard_pairs, shingle_words
from aws_etl_spark.dedup.minhash import minhash_near_dup_pairs, minhash_signatures
from aws_etl_spark.dedup.simhash import simhash_near_dup_pairs, simhash_signature

__all__ = [
    "connected_components",
    "dedup_clusters",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "shingle_words",
    "minhash_near_dup_pairs",
    "minhash_signatures",
    "simhash_near_dup_pairs",
    "simhash_signature",
]
