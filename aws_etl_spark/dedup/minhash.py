"""MinHash + LSH near-duplicate detection, pure DataFrame ops.

Pipeline (one linear pass + one bucket-grouped shuffle — the 100 TB
path, cf. Broder's resemblance sketches and the MinHashLSH design in
pyspark.ml, re-implemented here over SQL arrays so it works on plain
string columns without the ml Vector detour):

1. shingle each doc (word k-grams), hash each shingle to int64
   (xxhash64), fold into [0, p) with p = 2^31 − 1;
2. n_hashes universal-hash permutations h_i(x) = (a_i·x + b_i) mod p
   (a, b fixed by seed → results reproducible across runs/engines);
   signature_i = min over shingles — computed with JVM higher-order
   array fns (transform + array_min), no UDF;
3. split the signature into b bands of r rows; band key =
   (band_idx, xxhash64(band slice)); explode → groupBy band key:
   docs sharing any band key are candidates (p(collide) = 1−(1−J^r)^b);
4. verify candidates with exact shingle Jaccard (array_intersect on
   the already-carried shingle arrays) and keep pairs ≥ threshold.

Skew note: identical boilerplate docs create hot buckets; the group
size is capped (``max_bucket``) before pair expansion, which bounds
the quadratic blowup the same way document-frequency caps do.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_etl_spark.dedup.jaccard import jaccard_of_shingle_arrays, shingle_words

_P = (1 << 31) - 1  # Mersenne prime; a·h stays within int64


def _perm_coeffs(n_hashes: int, seed: int) -> tuple[list[int], list[int]]:
    rng = random.Random(seed)
    a = [rng.randrange(1, _P) for _ in range(n_hashes)]
    b = [rng.randrange(0, _P) for _ in range(n_hashes)]
    return a, b


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    n_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(doc, shingles, sig: array<bigint>[n_hashes]) per document."""
    a, b = _perm_coeffs(n_hashes, seed)
    sh = df.select(
        F.col(id_col).alias("doc"),
        shingle_words(F.col(text_col), k).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    hashes = F.transform(
        F.col("shingles"), lambda s: F.pmod(F.xxhash64(s), F.lit(_P))
    )
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("__h"),
                    lambda h: F.pmod(h * F.lit(a[i]) + F.lit(b[i]), F.lit(_P)),
                )
            )
            for i in range(n_hashes)
        ]
    )
    return (
        sh.withColumn("__h", hashes).withColumn("sig", sig).drop("__h")
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, exact jaccard ≥ threshold) found
    via LSH banding and verified exactly."""
    if n_hashes % bands != 0:
        raise ValueError(f"n_hashes={n_hashes} not divisible by bands={bands}")
    r = n_hashes // bands

    sigs = minhash_signatures(df, id_col, text_col, k, n_hashes, seed)

    band_keys = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda i: F.struct(
            i.alias("band"),
            F.xxhash64(F.concat_ws(",", F.slice(F.col("sig"), i * r + 1, r))).alias(
                "bucket"
            ),
        ),
    )
    banded = (
        sigs.withColumn("bk", F.explode(band_keys))
        .select("doc", "shingles", F.col("bk.band").alias("band"),
                F.col("bk.bucket").alias("bucket"))
    )

    # candidate pairs within each bucket (bounded expansion)
    grouped = (
        banded.groupBy("band", "bucket")
        .agg(F.slice(F.sort_array(F.collect_list(F.struct("doc", "shingles"))),
                     1, max_bucket).alias("members"))
        .filter(F.size("members") > 1)
    )
    pairs = (
        grouped.select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            F.col("members"),
                            lambda m1: F.transform(
                                F.col("members"),
                                lambda m2: F.struct(
                                    m1["doc"].alias("id_a"),
                                    m2["doc"].alias("id_b"),
                                    m1["shingles"].alias("sh_a"),
                                    m2["shingles"].alias("sh_b"),
                                ),
                            ),
                        )
                    ),
                    lambda s: s["id_a"] < s["id_b"],
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b", "p.sh_a", "p.sh_b")
        .dropDuplicates(["id_a", "id_b"])  # same pair from multiple bands
    )

    verified = (
        pairs.withColumn(
            "jaccard", jaccard_of_shingle_arrays(F.col("sh_a"), F.col("sh_b"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified
