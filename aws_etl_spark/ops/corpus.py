"""Corpus-assembly operators for training-data pipelines: deterministic
split assignment and source-mixture sampling.

A training corpus needs (a) a stable train/val/test partition that
never changes as the corpus grows (adding documents must not move an
existing document between splits), and (b) per-source sampling rates
that shape the final mixture (e.g. downweight a crawl source, keep all
of a curated one). Both reduce to the same primitive: a deterministic,
engine-portable hash bucket per document.

The bucket is the first 16 bits of ``md5(key)`` — md5 of the UTF-8
key bytes renders the same lowercase hex in Spark and in DuckDB, so
every assignment is reproducible across engines and across runs with
no RNG state. Everything stays JVM-side (md5/conv/substring builtins);
the operator is a narrow map with no shuffle, so it scales linearly:
at 100 TB the split assignment costs exactly one pass over the keys,
and the sampled subset is decided per-row with no coordination.

Reference parity note: the reference pipeline has no train/val/test or
mixture machinery at all (its ETL ends at curated parquet); these
operators extend the engine for LLM-corpus use per SURVEY.md §2.13.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 1 << 16  # md5's first 4 hex chars: buckets 0..65535


def hash_bucket(key: Column) -> Column:
    """Deterministic bucket in [0, 65536) from md5 of the key string.

    ``conv(hex, 16, 10)`` is exact for 4 hex digits (fits int), and
    md5 hex text is identical across engines — the portability
    property the whole module rests on (pinned by tests against
    DuckDB's md5 on the same keys).
    """
    return F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("int")


def duckdb_hex4_decode_sql(hash_expr: str, offset_expr: str = "0") -> str:
    """DuckDB SQL decoding 4 hex digits of ``hash_expr`` starting at
    0-based character offset ``offset_expr`` into an integer.

    DuckDB has no hex→int conversion builtin, so digits are decoded
    positionally via strpos arithmetic (verified equal to Spark's
    conv() for every key in the test corpus). The offset form lets
    one md5 yield eight independent 16-bit coins (stat_bootstrap_ci's
    amortization)."""
    digit = (
        f"(strpos('0123456789abcdef',"
        f" substr({hash_expr}, ({offset_expr}) + {{i}}, 1)) - 1)"
    )
    terms = " + ".join(
        digit.format(i=i) + f" * {16 ** (4 - i)}" for i in range(1, 5)
    )
    return f"({terms})"


def duckdb_bucket_sql(key_expr: str) -> str:
    """DuckDB SQL computing the same bucket as :func:`hash_bucket`."""
    return duckdb_hex4_decode_sql(f"md5({key_expr})")


def split_assign(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
) -> DataFrame:
    """Add ``bucket`` and ``split`` columns: a stable partition of the
    corpus into named splits with the given fractions (must sum to 1).

    Thresholds are cumulative over the fraction dict in insertion
    order; a document's split depends only on its own key, so growing
    the corpus never reassigns existing documents (the property that
    makes eval sets stable across corpus versions).
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out = df.withColumn("bucket", hash_bucket(F.col(key_col).cast("string")))
    expr: Column | None = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = F.col("bucket") < int(cum * N_BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(names[-1])
    )
    return out.withColumn("split", expr)


def split_case_sql(key_expr: str, fractions: dict[str, float]) -> str:
    """DuckDB CASE expression mirroring :func:`split_assign`."""
    bucket = duckdb_bucket_sql(key_expr)
    parts = []
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        parts.append(f"WHEN {bucket} < {int(cum * N_BUCKETS)} THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"


def mixture_sample(
    df: DataFrame,
    source_col: str,
    key_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
) -> DataFrame:
    """Keep each row with its source's target rate, decided by the
    row's own hash bucket — a deterministic per-source Bernoulli
    sample that composes the corpus mixture in one narrow pass.

    ``weights`` maps source value → keep-rate in [0, 1]; sources
    absent from the map keep ``default_weight``. Because the decision
    is (bucket < rate·65536) on a per-row hash, re-running on a grown
    corpus keeps exactly the previously-kept rows (append-only
    stability, same property as :func:`split_assign`).
    """
    out = df.withColumn("bucket", hash_bucket(F.col(key_col).cast("string")))
    rate: Column = F.lit(default_weight)
    for src, w in weights.items():
        rate = F.when(F.col(source_col) == src, F.lit(w)).otherwise(rate)
    return out.filter(F.col("bucket") < (rate * N_BUCKETS).cast("int"))


def mixture_rate_sql(source_expr: str, weights: dict[str, float],
                     default_weight: float = 1.0) -> str:
    """DuckDB CASE expression for the per-source keep-rate threshold."""
    whens = " ".join(
        f"WHEN {source_expr} = '{s}' THEN {int(w * N_BUCKETS)}"
        for s, w in weights.items()
    )
    return f"CASE {whens} ELSE {int(default_weight * N_BUCKETS)} END"


def shuffle_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "shuffle-epoch-0",
) -> DataFrame:
    """Deterministic training-order shuffle: ``shard`` + ``rank``
    (dense within shard) from a salted md5 of the key.

    A 100 TB corpus cannot be globally sorted into one sequence (a
    total order means one range-partitioned sort whose final
    concatenation is inherently serial to consume) — and training
    loaders don't want one: they read S shards in parallel, each
    internally ordered. So the operator emits the standard sharded
    shuffle: shard = hash mod S (balanced by construction), rank =
    row_number within shard ordered by the salted hash — each shard's
    window sorts independently in parallel, no global bottleneck.
    Changing ``salt`` re-deals the entire order (a new epoch);
    keeping it reproduces the exact order on every engine (md5
    portability, same property as :func:`hash_bucket`).
    """
    from pyspark.sql import Window

    skey = F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(key_col).cast("string")))
    out = df.withColumn("skey", skey).withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring(F.col("skey"), 1, 4), 16, 10).cast("int"),
            F.lit(n_shards),
        ).cast("long"),
    )
    w = Window.partitionBy("shard").orderBy("skey", key_col)
    return out.withColumn("rank", F.row_number().over(w).cast("long"))


def shuffle_shards_sql(key_expr: str, n_shards: int,
                       salt: str = "shuffle-epoch-0") -> tuple[str, str, str]:
    """DuckDB (skey, shard, rank) expressions mirroring
    :func:`shuffle_shards` for a query's oracle text."""
    skey = f"md5('{salt}:' || {key_expr})"
    bucket = duckdb_bucket_sql(f"'{salt}:' || {key_expr}")
    shard = f"CAST({bucket} % {n_shards} AS BIGINT)"
    rank = (
        f"CAST(ROW_NUMBER() OVER (PARTITION BY {bucket} % {n_shards} "
        f"ORDER BY {skey}, {key_expr}) AS BIGINT)"
    )
    return skey, shard, rank
