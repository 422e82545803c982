"""Distributed quantized-exact Gram matrix (Xᵀ X) over an embedding
column — the linear-algebra primitive behind PCA/whitening/covariance
of a training-embedding corpus.

Design (the 100 TB shape): each partition folds its rows into ONE
d×d int64 accumulator inside an Arrow-batched ``mapInPandas`` kernel
(a numpy integer matmul per batch — no per-row Python, no exploded
(row × d²) intermediate), then emits its upper triangle as d(d+1)/2
partial rows. The only shuffle is the final sum over (i, j) — at
most ``partitions × d(d+1)/2`` rows regardless of corpus size, so a
1000-executor run over 10¹⁰ rows shuffles a few MB. Contrast the
naive double-explode formulation, which shuffles N·d² rows.

Why quantized: float partial sums depend on partition order, so a
float Gram matrix is neither deterministic across runs nor
hash-comparable across engines. Components are quantized once
(``floor(x·scale)`` — float→double widening is exact, the double
multiply and floor are single IEEE ops both engines perform
identically), and every downstream operation is integer multiply/add:
bit-exact under any partitioning, any engine. The DuckDB oracle is
the same quantization over an exploded self-join — algebraically the
same integers, so the driver hash-compares the full matrix.

Overflow contract (runtime-enforced, BOTH halves): |q| must stay
below 2²⁰ (checked per batch), and the per-accumulator sum bound
Σ_batches rows·max|q|² — an exact Python-int computation, so it can
never itself wrap — must stay below 2⁶³ (checked per batch; numpy
int64 addition would otherwise wrap silently). The final
cross-partition sum holds ~10¹⁰ unit-norm rows at scale=1000
(q ≤ scale ⇒ products ≤ 10⁶ ⇒ sums ≤ 10¹⁶ ≪ 2⁶³).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRAM_SCALE = 1000
_Q_BOUND = 1 << 20


def gram_matrix_quantized(
    emb: DataFrame, vec_col: str = "embedding", scale: int = GRAM_SCALE
) -> DataFrame:
    """Upper-triangle quantized Gram matrix: rows ``(i, j, gram_q)``
    with 1-based ``i ≤ j`` and ``gram_q = Σ_rows q_i·q_j`` exactly.

    The matrix is symmetric, so only the triangle is computed and
    shuffled; callers needing the full matrix mirror ``i ≠ j`` rows.
    """

    def fold_partition(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        acc = None
        sum_bound = 0  # exact Python int: Σ_batches rows·max|q|²
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Q = np.floor(X * float(scale)).astype(np.int64)
            max_q = int(np.abs(Q).max())
            if max_q >= _Q_BOUND:
                raise ValueError(
                    "gram_matrix_quantized: |component·scale| >= 2^20 "
                    "breaks the int64 overflow contract; lower scale"
                )
            # second half of the contract: an accumulator entry is
            # bounded by Σ rows·max|q|² — enforce it before numpy's
            # int64 addition can wrap silently
            sum_bound += len(Q) * max_q * max_q
            if sum_bound >= 1 << 63:
                raise ValueError(
                    "gram_matrix_quantized: accumulated rows x max|q|^2 "
                    "could exceed int64; lower scale or repartition "
                    "into smaller partitions"
                )
            G = Q.T @ Q
            acc = G if acc is None else acc + G
        if acc is not None:
            iu, ju = np.triu_indices(acc.shape[0])
            yield pd.DataFrame(
                {
                    "i": (iu + 1).astype("int32"),
                    "j": (ju + 1).astype("int32"),
                    "partial": acc[iu, ju],
                }
            )

    partials = emb.select(vec_col).mapInPandas(
        fold_partition, "i int, j int, partial long"
    )
    return partials.groupBy("i", "j").agg(F.sum("partial").alias("gram_q"))
