"""Similarity search over embedding columns (see topk module doc)."""

from aws_etl_spark.similarity.topk import (
    cosine_pairs_above,
    cosine_topk,
    cosine_topk_lsh,
    dot,
    ivf_topk,
    norm,
)

__all__ = [
    "cosine_topk",
    "cosine_topk_lsh",
    "cosine_pairs_above",
    "ivf_topk",
    "dot",
    "norm",
]
