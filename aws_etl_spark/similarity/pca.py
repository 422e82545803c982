"""Dominant principal component by quantized-exact REPEATED SQUARING
of the distributed Gram matrix.

The expensive part — one pass over the full embedding corpus — is the
Gram reduction from :mod:`aws_etl_spark.similarity.gram`: each
partition folds into a single d×d int64 accumulator and only
``partitions × d(d+1)/2`` triangle rows ever shuffle. Everything
after that is data-size-independent: all linear algebra runs on the
d² Gram rows (d=64 → 4096 rows), so a 100 TB corpus and a 60 k-row
test corpus pay the same per-step cost. The tiny mirrored matrix is
``localCheckpoint``-ed so the corpus scan happens exactly once.

Why squaring instead of plain power iteration: training-embedding
spectra are near-isotropic (top eigengap λ1/λ2 ≈ 1.02–1.07 on the
test corpus), so v ← Gv converges at (λ2/λ1)^k — hundreds of steps.
Squaring the matrix squares the ratio: after S squarings M ≈ c·G^(2^S),
so S=10 applies the equivalent of 1024 power steps in 10 tiny
matrix-matrix products (64³ integer multiplies each). Measured on the
driver corpus: cosine vs numpy's eigh top eigenvector ≥ 0.9999 at
every sf by S=10; the 1e-6 quantization floor caps it at ~0.99996.

Why it is hash-provable: floats only appear as single IEEE ops over
exactly-equal integers. Each step is

    P      = M · M                 (exact int64: |entries| ≤ d·SC²)
    M'     = floor(double(P)/double(max|P|) · SC)    (identical IEEE)

int64→double casts round to nearest even identically on both engines,
the division/multiply are single IEEE ops, and floor re-enters
integer land — so DuckDB replays every squaring bit-for-bit from an
unrolled CTE (the pagerank_exact / MMR oracle construction). Max-norm
(not L2/Frobenius) renormalization is deliberate: no sqrt, no
order-dependent double summation.

Overflow contract: after the first normalization |M| ≤ SC, so every
product entry is bounded by d·SC² = 64·10¹² ≈ 6.4e13 ≪ 2^63 — no
data-dependent overflow exists past step 0. The raw Gram entries are
bounded by the gram kernel's own runtime contract.

Sign/start contract: the final vector is M applied to the all-ones
start, so the converged sign is a pure function of the integer matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_etl_spark.similarity.gram import gram_matrix_quantized

V_SCALE = 1_000_000


def _normalized(df: DataFrame, col: str) -> DataFrame:
    """floor(double(x)/double(max|x|)·SC) as ``m`` — exact-int in,
    exact-int out, identical IEEE ops on any engine."""
    mx = df.agg(F.max(F.abs(F.col(col))).alias("mx"))
    return df.crossJoin(F.broadcast(mx)).select(
        *[c for c in df.columns if c != col],
        F.when(F.col("mx") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor(
                F.col(col).cast("double")
                / F.col("mx").cast("double")
                * F.lit(float(V_SCALE))
            ).cast("long")
        )
        .alias("m"),
    )


def pca_power_component(
    emb: DataFrame,
    vec_col: str = "embedding",
    scale: int = 1000,
    squarings: int = 10,
) -> DataFrame:
    """Top principal direction of XᵀX as rows ``(dim, component_q6)``
    (1-based dim, component quantized at V_SCALE under max-norm).

    Execution split (round-13 optimization): the ONE data-sized pass —
    the Gram reduction — stays fully distributed; everything after it
    operates on the d×d integer matrix (d=64 → 4096 rows, ~32 KB),
    whose size is a property of the EMBEDDING DIMENSION, not the
    corpus. That bounded state is collected once and the ``squarings``
    repeated-squaring steps run as exact int64/IEEE arithmetic on the
    driver (the established bounded-collect pattern of the k-means
    centroid rounds), replacing ~4 driver-coordinated Spark jobs per
    squaring (join + agg + max + checkpoint on 4096 rows) with
    microseconds of numpy. Bit-equivalence to the distributed form
    (and to the unrolled-CTE oracle) holds because every step is the
    same op sequence: exact int64 products/sums (entries bounded by
    d·SC² ≈ 6.4e13 ≪ 2^63 — the module overflow contract), then one
    int64→double cast, one divide, one multiply, one floor — numpy
    float64 and Spark/DuckDB DOUBLE are the same IEEE-754 ops.
    """
    import numpy as np
    from pyspark.sql import types as T

    tri = gram_matrix_quantized(emb, vec_col=vec_col, scale=scale)
    rows = tri.collect()  # d(d+1)/2 triangle rows — dimension-bounded
    spark = emb.sparkSession
    out_schema = T.StructType(
        [
            T.StructField("dim", T.LongType(), True),
            T.StructField("component_q6", T.LongType(), True),
        ]
    )
    if not rows:
        return spark.createDataFrame([], out_schema)
    d = max(max(r["i"], r["j"]) for r in rows)
    g = np.zeros((d, d), dtype=np.int64)
    for r in rows:
        g[r["i"] - 1, r["j"] - 1] = r["gram_q"]
        g[r["j"] - 1, r["i"] - 1] = r["gram_q"]

    def norm(x: np.ndarray) -> np.ndarray:
        # floor(double(x)/double(max|x|)·SC): same single-IEEE-op
        # chain as the SQL _normalized / the oracle's CASE
        mx = np.abs(x).max()
        if mx == 0:
            return np.zeros_like(x)
        return np.floor(
            x.astype(np.float64) / np.float64(mx) * np.float64(V_SCALE)
        ).astype(np.int64)

    m = norm(g)
    for _ in range(squarings):
        m = norm(m @ m)  # exact: |entries| <= d·SC² ≈ 6.4e13 < 2^63
    w = m.sum(axis=1, dtype=np.int64) * np.int64(V_SCALE)
    v = norm(w)
    from aws_etl_spark.ops.scale import bounded_rows_df

    return bounded_rows_df(
        spark, [(int(i + 1), int(v[i])) for i in range(d)], out_schema
    )


def pca_power_oracle_sql(scale: int = 1000, squarings: int = 10) -> str:
    """Unrolled-CTE DuckDB twin of :func:`pca_power_component`."""
    sc = V_SCALE

    def norm(src: str, col: str, keys: str) -> str:
        return f"""(
  SELECT {keys},
         CASE WHEN mx.mx = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(FLOOR(CAST({col} AS DOUBLE) / CAST(mx.mx AS DOUBLE)
                              * {sc}) AS BIGINT) END AS m
  FROM {src} CROSS JOIN (SELECT MAX(ABS({col})) AS mx FROM {src}) mx
)"""

    parts = [
        f"""
WITH e AS MATERIALIZED (
  SELECT vec_id, r.i AS i,
         CAST(FLOOR(CAST(embedding[r.i] AS DOUBLE) * {scale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN range(1, 1025) r(i)
  WHERE r.i <= LEN(embedding)
),
g AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, CAST(SUM(a.q * b.q) AS BIGINT) AS gram_q
  FROM e a JOIN e b ON a.vec_id = b.vec_id
  GROUP BY a.i, b.i
),
m0 AS MATERIALIZED {norm('g', 'gram_q', 'i, j')}"""
    ]
    for k in range(1, squarings + 1):
        parts.append(
            f""",
p{k} AS MATERIALIZED (
  SELECT a.i AS i, b.j AS j, CAST(SUM(a.m * b.m) AS BIGINT) AS p
  FROM m{k - 1} a JOIN m{k - 1} b ON a.j = b.i
  GROUP BY a.i, b.j
),
m{k} AS MATERIALIZED {norm(f'p{k}', 'p', 'i, j')}"""
        )
    parts.append(
        f""",
w AS MATERIALIZED (
  SELECT i, CAST(SUM(m * {sc}) AS BIGINT) AS w
  FROM m{squarings} GROUP BY i
),
v AS {norm('w', 'w', 'i')}
SELECT CAST(i AS BIGINT) AS dim, m AS component_q6 FROM v"""
    )
    return "".join(parts)
