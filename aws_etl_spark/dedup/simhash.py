"""SimHash near-duplicate detection (Charikar's random-hyperplane
sketch specialized to token hashing, as used in web-scale dedup).

Signature: 64-bit fingerprint where bit j is the sign of
Σ_tokens (2·bit_j(xxhash64(token)) − 1). Near-dups = fingerprints
within Hamming distance d.

Scale design: candidate search does NOT compare all pairs — the
64-bit fingerprint splits into ``chunks`` equal chunks; by pigeonhole,
any pair within Hamming distance < chunks shares at least one exact
chunk, so candidates come from equi-joins on (chunk_idx, chunk_value)
— a hash-partitioned shuffle, linear in corpus size. All JVM-side
bitwise expressions; no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 64


def simhash_signature(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, simhash: bigint) per document.

    Token weights are term frequencies (repeat tokens count again) —
    the classic formulation.
    """
    tokens = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    h = tokens.withColumn("h", F.xxhash64("tok"))
    # per-bit contribution: +1 if bit set else -1, summed over tokens
    bit_sums = h.groupBy("doc").agg(
        *[
            F.sum(
                F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1
            ).alias(f"b{j}")
            for j in range(BITS)
        ]
    )
    sig = None
    for j in range(BITS):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(1 << j).cast("long") if j < 63 else (
            # bit 63 would overflow a positive literal; use shiftleft
            F.when(F.col("b63") > 0, F.shiftleft(F.lit(1).cast("long"), 63))
            .otherwise(F.lit(0).cast("long"))
        )
        sig = term if sig is None else sig + term
    return bit_sums.select("doc", sig.alias("simhash"))


def _hamming(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 3,
    chunks: int = 4,
    max_bucket: int = 1000,
) -> DataFrame:
    """Pairs (id_a < id_b) with Hamming(simhash) ≤ max_distance.

    Requires ``max_distance < chunks`` for the pigeonhole guarantee.
    """
    if max_distance >= chunks:
        raise ValueError("pigeonhole requires max_distance < chunks")
    width = BITS // chunks
    sigs = simhash_signature(df, id_col, text_col)

    chunk_keys = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned(F.col("simhash"), c * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("val"),
            )
            for c in range(chunks)
        ]
    )
    banded = sigs.withColumn("ck", F.explode(chunk_keys)).select(
        "doc", "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.val").alias("val")
    )
    from pyspark.sql import Window

    capped = banded.withColumn(
        "__rn",
        F.row_number().over(Window.partitionBy("chunk", "val").orderBy("doc")),
    ).filter(F.col("__rn") <= max_bucket)
    a_side = capped.select(
        "chunk", "val", F.col("doc").alias("id_a"), F.col("simhash").alias("sh_a")
    )
    b_side = capped.select(
        "chunk", "val", F.col("doc").alias("id_b"), F.col("simhash").alias("sh_b")
    )
    pairs = (
        a_side.join(b_side, ["chunk", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.withColumn("hamming", _hamming(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= max_distance)
        .select("id_a", "id_b", "hamming")
    )
