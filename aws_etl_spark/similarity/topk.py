"""Vector similarity search over embedding columns (array<float>).

Three strategies, trading recall for scale (north-star §2.13; cf. the
distributed top-k similarity-search literature in PAPERS.md):

- :func:`cosine_topk` — exact brute force: query×corpus join with a
  JVM-side left-fold dot product + per-query window top-k. O(Q·N·d);
  the correctness baseline, and fine when Q is small (the common
  "probe a corpus" case — N scales out across executors, Q broadcast).
- :func:`cosine_topk_lsh` — random-hyperplane (sign) LSH: b-bit
  signatures, banded equi-join for candidates, exact re-rank within
  collisions. Candidate generation is linear; recall tunable via
  bits/bands.
- :func:`ivf_topk` — inverted-file: partition the corpus by nearest
  of C centroids, probe the n_probe nearest lists per query. The
  100 TB path: corpus shuffled once by centroid id; each query only
  scans ~n_probe/C of the data.

Determinism: dot products are left-fold double accumulation —
bit-identical to DuckDB's ``list_dot_product`` on DOUBLE[] (verified
empirically), so exact variants are oracle-checkable; cosine uses the
expression shape ``dot / (norm_a * norm_b)`` which oracles must mirror
exactly (float division/multiply order matters).
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Left-fold double dot product of two float arrays (JVM-side).

    Used for per-vector work (norms, signatures). For per-PAIR scoring
    use :func:`pair_dot` — same bit-exact result, ~20× faster on wide
    candidate sets (higher-order lambdas are interpreted, not
    codegen'd).
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pair_dot_impl(xs: pd.Series, ys: pd.Series) -> pd.Series:
    A = np.stack(xs.to_numpy()).astype(np.float64)
    B = np.stack(ys.to_numpy()).astype(np.float64)
    P = A * B
    acc = np.zeros(P.shape[0], dtype=np.float64)
    for j in range(P.shape[1]):
        acc = acc + P[:, j]
    return pd.Series(acc)


def pair_dot(a: Column, b: Column) -> Column:
    """Arrow-batched dot product, bit-identical to the left fold.

    Determinism trick: vectorize across ROWS, fold sequentially across
    DIMENSIONS (acc = acc + P[:, j]). Each row's accumulation order is
    then exactly the scalar left fold — matching both the JVM
    ``dot`` and DuckDB ``list_dot_product`` bit-for-bit — while numpy
    does the heavy lifting. (A BLAS matmul would be faster still but
    reorders additions → non-reproducible across libraries.)

    UDF creation is deferred to call time (module import must not
    require an active SparkSession).
    """
    return F.pandas_udf("double")(_pair_dot_impl)(a, b)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def _with_norm(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        F.col(vec_col).alias(f"{prefix}_vec"),
        norm(F.col(vec_col)).alias(f"{prefix}_norm"),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self excluded).

    Returns (query_id, neighbor_id, rank, cosine). The query side is
    broadcast — at scale Q ≪ N and the corpus never shuffles.
    """
    q = _with_norm(queries, id_col, vec_col, "q")
    c = _with_norm(corpus, id_col, vec_col, "c")
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            (pair_dot(F.col("q_vec"), F.col("c_vec"))
             / (F.col("q_norm") * F.col("c_norm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_pairs_above(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine ≥ threshold (embedding
    near-dup dedup). Exact; for huge corpora gate through
    :func:`cosine_topk_lsh` buckets instead."""
    a = _with_norm(df, id_col, vec_col, "a")
    b = _with_norm(df, id_col, vec_col, "b")
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select(
            F.col("a_id").alias("id_a"),
            F.col("b_id").alias("id_b"),
            (pair_dot(F.col("a_vec"), F.col("b_vec"))
             / (F.col("a_norm") * F.col("b_norm"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _hyperplanes(dim: int, bits: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def signature_bits(vec: Column, planes: list[list[float]]) -> Column:
    """array<int> of sign bits, one per hyperplane (JVM reference
    implementation; the LSH path uses the batched kernel below)."""
    return F.array(
        *[
            F.when(
                dot(vec, F.array(*[F.lit(x) for x in p])) >= 0, F.lit(1)
            ).otherwise(F.lit(0))
            for p in planes
        ]
    )


def _signature_udf(planes: list[list[float]]):
    """Batched sign-signature kernel: all bits in one Arrow pass,
    per-plane dims folded sequentially (same order as the JVM fold,
    so both implementations emit identical signatures)."""
    P_mat = [np.asarray(p, dtype=np.float64) for p in planes]

    @F.pandas_udf("array<int>")
    def sig(xs: pd.Series) -> pd.Series:
        A = np.stack(xs.to_numpy()).astype(np.float64)
        cols = []
        for p in P_mat:
            prod = A * p
            acc = np.zeros(prod.shape[0], dtype=np.float64)
            for j in range(prod.shape[1]):
                acc = acc + prod[:, j]
            cols.append((acc >= 0).astype(np.int32))
        M = np.stack(cols, axis=1)
        return pd.Series(list(M))

    return sig


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    bits: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via sign-LSH banding + exact re-rank.

    Candidates = corpus vectors sharing ≥1 signature band with the
    query; within candidates, exact cosine + window top-k.
    """
    if bits % bands != 0:
        raise ValueError("bits must divide into bands evenly")
    r = bits // bands
    planes = _hyperplanes(dim, bits, seed)

    sig_udf = _signature_udf(planes)

    def banded(df: DataFrame, prefix: str) -> DataFrame:
        # UDF result must be materialized as a column before it can be
        # referenced inside the higher-order banding lambda
        df = df.withColumn("__sig", sig_udf(F.col(f"{prefix}_vec")))
        band_arr = F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda i: F.struct(
                i.alias("band"),
                F.concat_ws(",", F.slice(F.col("__sig"), i * r + 1, r)).alias(
                    "bucket"
                ),
            ),
        )
        return (
            df.withColumn("bk", F.explode(band_arr))
            .select(
                "*", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket")
            )
            .drop("bk", "__sig")
        )

    q = banded(_with_norm(queries, id_col, vec_col, "q"), "q")
    c = banded(_with_norm(corpus, id_col, vec_col, "c"), "c")

    cand = (
        c.join(q, ["band", "bucket"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "q_vec", "q_norm", "c_id", "c_vec", "c_norm")
        .dropDuplicates(["q_id", "c_id"])
    )
    scored = cand.select(
        F.col("q_id").alias("query_id"),
        F.col("c_id").alias("neighbor_id"),
        (pair_dot(F.col("q_vec"), F.col("c_vec"))
         / (F.col("q_norm") * F.col("c_norm"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: sample centroids from the corpus
    (deterministic seed), assign corpus vectors to their nearest
    centroid (one shuffle), probe the n_probe nearest lists per query.

    The centroid table is tiny and driver-collected once (like an IVF
    coarse quantizer); at 100 TB the corpus assignment is a single
    map + shuffle-on-centroid-id, and queries touch n_probe/C of data.
    """
    cents = [
        (i, [float(x) for x in row[1]])
        for i, row in enumerate(
            corpus.select(id_col, vec_col)
            .sample(fraction=1.0, seed=seed)
            .limit(n_centroids)
            .collect()
        )
    ]

    C_mat = [(cid, np.asarray(cvec, dtype=np.float64)) for cid, cvec in cents]

    def _nearest_udf(n: int):
        """Batched nearest-centroid kernel: dots folded sequentially
        per centroid (deterministic), ranked by (-dot, centroid id)."""

        @F.pandas_udf("array<int>")
        def nearest(xs: pd.Series) -> pd.Series:
            A = np.stack(xs.to_numpy()).astype(np.float64)
            dots = []
            for _cid, cvec in C_mat:
                prod = A * cvec
                acc = np.zeros(prod.shape[0], dtype=np.float64)
                for j in range(prod.shape[1]):
                    acc = acc + prod[:, j]
                dots.append(acc)
            D = np.stack(dots, axis=1)  # rows × centroids
            cids = np.asarray([cid for cid, _ in C_mat])
            order = np.argsort(-D, axis=1, kind="stable")  # ties → cid order
            return pd.Series(list(cids[order[:, :n]].astype(np.int32)))

        return nearest

    c = _with_norm(corpus, id_col, vec_col, "c").withColumn(
        "centroid", _nearest_udf(1)(F.col("c_vec"))[0]
    )
    q = _with_norm(queries, id_col, vec_col, "q").withColumn(
        "centroid", F.explode(_nearest_udf(n_probe)(F.col("q_vec")))
    )
    cand = (
        c.join(F.broadcast(q), "centroid")
        .filter(F.col("q_id") != F.col("c_id"))
        .dropDuplicates(["q_id", "c_id"])
    )
    scored = cand.select(
        F.col("q_id").alias("query_id"),
        F.col("c_id").alias("neighbor_id"),
        (pair_dot(F.col("q_vec"), F.col("c_vec"))
         / (F.col("q_norm") * F.col("c_norm"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
