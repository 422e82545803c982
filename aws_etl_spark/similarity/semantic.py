"""SemDeDup-style semantic deduplication over an embedding column.

Pipeline (cf. Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540 — public
method, re-expressed as DataFrame ops):

1. train a spherical k-means coarse quantizer on a seeded sample
   (reuses the IVF trainer in :mod:`aws_etl_spark.similarity.topk`);
2. assign every vector to its nearest centroid — one Arrow-batched
   map, then the corpus is SHARDED BY CLUSTER (one shuffle);
3. within each cluster, score pairwise cosine and drop every vector
   that has a LOWER-id clustermate with cosine ≥ threshold (keep-min
   survivor rule, deterministic);
4. emit survivors (or the full corpus with a ``is_dup`` flag).

Why this shape at 100 TB: exact all-pairs cosine is O(N²·d) and dies
at web scale; SemDeDup bounds the quadratic term to within-cluster
pairs (Σ c_i² for cluster sizes c_i ≪ N²) and the cross-cluster
misses are the method's documented approximation, not a bug. Cluster
sizes are capped (``max_cluster``) the same way LSH bucket sizes are
capped in minhash — boilerplate-heavy corpora otherwise concentrate
mass in one cluster and re-introduce the quadratic blowup.

The trained (k-means-state) variant is not SQL-oracle-expressible →
its registry entry is rows-only; tests cross-validate against the
exact cosine-pairs operator: every dropped doc has a true near-dup
partner at the same threshold, and recall vs. the exact pair set is
gated (tests/test_corpus.py). The PINNED-quantizer variant
(``centroids=fixed_unit_centroids(...)``) is fully hash-oracled —
``dedup_semantic_exact`` mirrors every cell assignment and drop
decision in DuckDB via centroid literals.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aws_etl_spark.similarity.topk import (
    _train_spherical_centroids,
    _with_norm,
    nearest_centroids_udf,
    pair_dot,
)


def _assign_udf(cents: list[tuple[int, list[float]]]):
    C_mat = [(cid, np.asarray(cv, dtype=np.float64)) for cid, cv in cents]

    @F.pandas_udf("int")
    def assign(xs: pd.Series) -> pd.Series:
        A = np.stack(xs.to_numpy()).astype(np.float64)
        D = np.stack([A @ cv for _, cv in C_mat], axis=1)
        cids = np.asarray([cid for cid, _ in C_mat])
        return pd.Series(cids[np.argmax(D, axis=1)].astype(np.int32))

    return assign


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_centroids: int = 16,
    kmeans_iters: int = 2,
    seed: int = 42,
    max_cluster: int = 10_000,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """(id, cluster, is_dup, max_cosine_prior) per corpus row.

    ``is_dup`` marks rows having a lower-id clustermate with cosine ≥
    ``threshold``; survivors are the non-dup rows (keep-min rule, the
    same deterministic convention as the minhash/CC dedup family).
    ``max_cosine_prior`` is the evidence column: the best cosine to
    any lower-id clustermate (NULL for cluster minima).

    Pass ``centroids`` (e.g. ``fixed_unit_centroids``) to pin the
    quantizer instead of training it; the pinned path assigns with the
    sequential-fold kernel (``nearest_centroids_udf``) so every dot is
    bit-identical to DuckDB's ``list_dot_product`` and the whole
    pipeline becomes hash-oracle-provable — the k-means training state
    is the only non-portable part of SemDeDup.
    """
    unit = _with_norm(corpus, id_col, vec_col, "c")
    if centroids is not None:
        assigned = unit.withColumn(
            "cluster", nearest_centroids_udf(centroids, 1)(F.col("c_vec"))[0]
        )
    else:
        cents = _train_spherical_centroids(
            corpus, id_col, vec_col, n_centroids, kmeans_iters, seed
        )
        assigned = unit.withColumn("cluster", _assign_udf(cents)(F.col("c_vec")))

    # cap pathological clusters before the pair join (document-
    # frequency-cap analogue; keeps within-cluster work bounded)
    capped = assigned.withColumn(
        "__rn",
        F.row_number().over(Window.partitionBy("cluster").orderBy("c_id")),
    ).filter(F.col("__rn") <= max_cluster)

    lo = capped.select(
        "cluster",
        F.col("c_id").alias("kept_id"),
        F.col("c_vec").alias("kept_vec"),
        F.col("c_norm").alias("kept_norm"),
    )
    hi = capped.select(
        "cluster",
        F.col("c_id").alias("cand_id"),
        F.col("c_vec").alias("cand_vec"),
        F.col("c_norm").alias("cand_norm"),
    )
    scored = (
        lo.join(hi, "cluster")
        .filter(F.col("kept_id") < F.col("cand_id"))
        .select(
            "cluster",
            "cand_id",
            (
                pair_dot(F.col("kept_vec"), F.col("cand_vec"))
                / (F.col("kept_norm") * F.col("cand_norm"))
            ).alias("cos"),
        )
        .groupBy("cluster", "cand_id")
        .agg(F.max("cos").alias("max_cosine_prior"))
    )
    labeled = (
        assigned.select(F.col("c_id").alias(id_col), "cluster")
        .join(
            scored.withColumnRenamed("cand_id", id_col),
            [id_col, "cluster"],
            "left",
        )
        .withColumn(
            "is_dup",
            F.coalesce(
                F.col("max_cosine_prior") >= threshold, F.lit(False)
            ),
        )
    )
    return labeled.select(
        id_col, "cluster", "is_dup", "max_cosine_prior"
    )
