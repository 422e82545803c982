"""Corpus-assembly queries (§2.13 LLM-pipeline extensions, round 2):
deterministic splits, mixture sampling, chunking, Unicode
normalization, embedding column statistics, end-to-end dedup
survivors, and SemDeDup semantic dedup.

Every SQL-expressible entry carries a full DuckDB oracle; the split/
mixture pair rests on the md5-bucket portability property pinned in
tests/test_corpus.py (Spark conv(substr(md5,1,4),16,10) ≡ DuckDB
strpos-decoded hex, byte-for-byte the same md5 text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_spark.ops.corpus import (
    hash_bucket,
    mixture_rate_sql,
    mixture_sample,
    shuffle_shards,
    shuffle_shards_sql,
    split_assign,
    split_case_sql,
    duckdb_bucket_sql,
)
from aws_etl_spark.queries.registry import load_table, register, sql_query
from aws_etl_spark.text.normalize import chunk_starts, normalize_text

_SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}

_SPLIT_ORACLE = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       source,
       CAST({duckdb_bucket_sql("CAST(doc_id AS VARCHAR)")} AS BIGINT) AS bucket,
       {split_case_sql("CAST(doc_id AS VARCHAR)", _SPLIT_FRACTIONS)} AS split
FROM documents
"""


@register(
    "corpus_split_assign",
    oracle=_SPLIT_ORACLE,
    category="corpus",
    tables=("documents",),
)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable train/val/test assignment (80/10/10) from a per-doc md5
    bucket — adding documents never moves existing ones between
    splits. Narrow map, no shuffle; linear at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    out = split_assign(docs, "doc_id", _SPLIT_FRACTIONS)
    return out.select(
        "doc_id", "source", F.col("bucket").cast("long").alias("bucket"), "split"
    )


_MIX_WEIGHTS = {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25}
_MIX_DEFAULT = 0.1

_MIX_ORACLE = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       source,
       CAST({duckdb_bucket_sql("CAST(doc_id AS VARCHAR)")} AS BIGINT) AS bucket
FROM documents
WHERE {duckdb_bucket_sql("CAST(doc_id AS VARCHAR)")}
      < {mixture_rate_sql("source", _MIX_WEIGHTS, _MIX_DEFAULT)}
"""


@register(
    "corpus_mixture_sample",
    oracle=_MIX_ORACLE,
    category="corpus",
    tables=("documents",),
)
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source keep-rates composing a training mixture (keep all of
    src0, 75% of src1, … 10% of the long tail), decided row-locally by
    hash bucket — deterministic, append-stable, shuffle-free."""
    docs = load_table(spark, sf_dir, "documents")
    out = mixture_sample(docs, "source", "doc_id", _MIX_WEIGHTS, _MIX_DEFAULT)
    return out.select(
        "doc_id", "source", F.col("bucket").cast("long").alias("bucket")
    )


_CHUNK_SIZE, _CHUNK_STRIDE = 120, 80

_CHUNK_ORACLE = f"""
WITH c AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text), 1), {_CHUNK_STRIDE}))
           AS chunk_start
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST((chunk_start - 1) // {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(chunk_start AS BIGINT) AS chunk_start,
       substr(text, chunk_start, {_CHUNK_SIZE}) AS chunk_text,
       CAST(length(substr(text, chunk_start, {_CHUNK_SIZE})) AS BIGINT)
         AS chunk_len
FROM c
"""


@register(
    "text_chunking",
    oracle=_CHUNK_ORACLE,
    category="corpus",
    tables=("documents",),
)
def q_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size character windows (size 120, stride 80)
    — the context-window chunker for embedding/training pipelines.
    One Generate per doc (~len/stride rows), narrow, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.posexplode(chunk_starts(F.length("text"), _CHUNK_STRIDE)).alias(
            "chunk_idx", "chunk_start"
        ),
        "text",
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.substring(F.col("text"), F.col("chunk_start"), F.lit(_CHUNK_SIZE)
                    ).alias("chunk_text"),
        F.length(
            F.substring(F.col("text"), F.col("chunk_start"), F.lit(_CHUNK_SIZE))
        ).cast("long").alias("chunk_len"),
    )


_NORMALIZE_ORACLE = r"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       TRIM(REGEXP_REPLACE(LOWER(nfc_normalize(text)), '\s+', ' ', 'g'))
         AS norm_text,
       CAST(LENGTH(TRIM(REGEXP_REPLACE(LOWER(nfc_normalize(text)),
                                       '\s+', ' ', 'g'))) AS BIGINT)
         AS n_chars_norm
FROM documents
"""


@register(
    "text_normalize_unicode",
    oracle=_NORMALIZE_ORACLE,
    category="corpus",
    tables=("documents",),
)
def q_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC + lowercase + whitespace collapse — the canonical
    pre-dedup normalization. NFC runs as an Arrow-batched pandas UDF
    (no JVM builtin exists); oracle uses DuckDB's nfc_normalize,
    verified char-identical on composed/ligature/fullwidth cases."""
    docs = load_table(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    )


_DIM_STATS_ORACLE = """
WITH e AS (
  SELECT unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1e6) AS BIGINT)) AS BIGINT)
         AS sum_q6,
       CAST(MIN(CAST(FLOOR(CAST(v AS DOUBLE) * 1e6) AS BIGINT)) AS BIGINT)
         AS min_q6,
       CAST(MAX(CAST(FLOOR(CAST(v AS DOUBLE) * 1e6) AS BIGINT)) AS BIGINT)
         AS max_q6,
       CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE)
         / COUNT(*) / 1e6 AS mean_approx
FROM e
GROUP BY dim
"""


@register(
    "embeddings_dim_stats",
    oracle=_DIM_STATS_ORACLE,
    category="similarity",
    tables=("embeddings",),
)
def q_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension corpus statistics over the embedding column
    (drift/normalization monitoring). Values are quantized to 1e-6
    before summing so the aggregate is order-independent and exact on
    both engines (float sums are order-dependent; quantized integer
    sums are not). posexplode → one map-side-combined groupBy: the
    shuffle carries dim-count rows per partition, constant in N."""
    emb = load_table(spark, sf_dir, "embeddings")
    q6 = F.floor(F.col("val").cast("double") * F.lit(1e6)).cast("long")
    return (
        emb.select(F.posexplode("embedding").alias("pos", "val"))
        .select((F.col("pos") + 1).cast("long").alias("dim"), q6.alias("q6"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("q6").alias("sum_q6"),
            F.min("q6").alias("min_q6"),
            F.max("q6").alias("max_q6"),
            (F.sum("q6").cast("double") / F.count(F.lit(1)) / F.lit(1e6)).alias(
                "mean_approx"
            ),
        )
    )


_N_SHARDS = 8
_SHUF_SKEY, _SHUF_SHARD, _SHUF_RANK = shuffle_shards_sql(
    "CAST(doc_id AS VARCHAR)", _N_SHARDS
)

_SHUFFLE_ORACLE = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       {_SHUF_SKEY} AS skey,
       {_SHUF_SHARD} AS shard,
       {_SHUF_RANK} AS rank
FROM documents
"""


@register(
    "corpus_shuffle_shards",
    oracle=_SHUFFLE_ORACLE,
    category="corpus",
    tables=("documents",),
)
def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sharded training-order shuffle: salted-md5 sort
    key → shard (hash mod 8) + within-shard rank. Shards sort
    independently in parallel — the scale-safe alternative to a
    global ORDER BY (see ops/corpus.py shuffle_shards)."""
    docs = load_table(spark, sf_dir, "documents")
    out = shuffle_shards(docs, "doc_id", _N_SHARDS)
    return out.select("doc_id", "skey", "shard", "rank")


def _survivors_oracle() -> str:
    from aws_etl_spark.queries.dedup_queries import _CLUSTER_ORACLE

    return f"""
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    JOIN ({_CLUSTER_ORACLE}) cc ON d.doc_id = cc.doc_id
    WHERE cc.is_canonical
    """


@register(
    "dedup_survivors",
    oracle=_survivors_oracle(),
    category="dedup",
    tables=("documents",),
    bench=False,  # composition of dedup_minhash_lsh + dedup_clusters_cc,
    # both already timed standalone — avoids double-charging the corpus run
)
def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup removal: MinHash-LSH candidates → exact
    verification → connected components → keep the min-id doc per
    cluster. The output IS the deduplicated corpus — the operator a
    training-data pipeline actually ships."""
    from aws_etl_spark.dedup import dedup_clusters, minhash_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_dup_pairs(
        docs, "doc_id", "text", k=3, n_hashes=64, bands=16, threshold=0.5
    ).select("id_a", "id_b")
    clusters = dedup_clusters(pairs, docs, "doc_id")
    return (
        clusters.filter(F.col("is_canonical"))
        .select("doc_id")
        .join(docs, "doc_id")
        .select("doc_id", "lang", "source", "n_chars")
    )


@register(
    "dedup_semantic",
    oracle=None,  # k-means state is not SQL-expressible; cross-validated
    # against exact cosine pairs in tests/test_corpus.py
    category="dedup",
    tables=("embeddings",),
)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means-shard the embedding space, drop rows with a
    lower-id clustermate at cosine ≥ threshold. Bounds the quadratic
    pair work to within-cluster (Σc² ≪ N²) — the 100 TB semantic-dedup
    shape (see aws_etl_spark/similarity/semantic.py).

    Threshold 0.4 here (production uses ~0.95): the synthetic
    embeddings top out at pairwise cosine ≈0.51 (no planted near-dups),
    and 0.4 sits above the 99.9th percentile (≈0.38) so the query
    exercises real drop decisions — same rationale as the 0.3 used by
    ann_embedding_near_dup."""
    from aws_etl_spark.similarity.semantic import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    out = semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.4, n_centroids=16
    )
    return out.select(
        "vec_id",
        F.col("cluster").cast("long").alias("cluster"),
        "is_dup",
        "max_cosine_prior",
    )


def _semantic_exact_oracle(
    n_centroids: int = 16, threshold: float = 0.4, dim: int = 64, seed: int = 7
) -> str:
    """DuckDB oracle mirroring the WHOLE SemDeDup pipeline with a
    pinned quantizer: seeded unit centroids inlined as double
    literals, argmax-dot cell assignment with (dot DESC, cid) ties —
    exactly nearest_centroids_udf — then the within-cluster keep-min
    prune with the exact cosine expression shape. The same
    centroid-literal construction as _ivf_exact_oracle: float k-means
    training state is the ONLY non-portable part of SemDeDup, so
    pinning it makes every drop decision hash-provable."""
    from aws_etl_spark.similarity.topk import fixed_unit_centroids

    cents = fixed_unit_centroids(dim, n_centroids, seed)
    dot_selects = "\n  UNION ALL\n  ".join(
        f"SELECT vec_id, {cid} AS cid, "
        "list_dot_product(embedding::DOUBLE[], ["
        + ", ".join(repr(x) for x in cv)
        + "]::DOUBLE[]) AS dot FROM embeddings"
        for cid, cv in cents
    )
    return f"""
WITH dots AS (
  {dot_selects}
),
assign AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
    FROM dots) WHERE rn = 1
),
prior AS (
  SELECT hi.vec_id,
         MAX(list_dot_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) /
             (SQRT(list_dot_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[])) *
              SQRT(list_dot_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[])))
         ) AS max_cosine_prior
  FROM assign lo
  JOIN assign hi ON lo.cluster = hi.cluster AND lo.vec_id < hi.vec_id
  JOIN embeddings ea ON ea.vec_id = lo.vec_id
  JOIN embeddings eb ON eb.vec_id = hi.vec_id
  GROUP BY hi.vec_id
)
SELECT a.vec_id,
       CAST(a.cluster AS BIGINT) AS cluster,
       COALESCE(p.max_cosine_prior >= {threshold!r}, FALSE) AS is_dup,
       p.max_cosine_prior
FROM assign a LEFT JOIN prior p ON p.vec_id = a.vec_id
"""


@register(
    "dedup_semantic_exact",
    oracle=_semantic_exact_oracle(),
    category="dedup",
    tables=("embeddings",),
)
def q_dedup_semantic_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup, exact driver-provable twin of dedup_semantic: same
    shard-by-cell → within-cluster keep-min prune (threshold 0.4),
    but the quantizer is pinned to seeded unit-centroid literals
    (fixed_unit_centroids) and assignment uses the sequential-fold
    kernel, so the DuckDB oracle replicates every cell assignment and
    drop decision bit-for-bit (see _semantic_exact_oracle) — the
    centroid-literal analogue of ann_cosine_topk_lsh_exact. The
    trained production variant stays rows-only, cross-validated in
    tests/test_corpus.py."""
    from aws_etl_spark.similarity.semantic import semantic_dedup
    from aws_etl_spark.similarity.topk import fixed_unit_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    out = semantic_dedup(
        emb,
        "vec_id",
        "embedding",
        threshold=0.4,
        centroids=fixed_unit_centroids(dim=64, n_centroids=16, seed=7),
    )
    return out.select(
        "vec_id",
        F.col("cluster").cast("long").alias("cluster"),
        "is_dup",
        "max_cosine_prior",
    )


_DOMAIN_CAP_ORACLE = """
SELECT doc_id, source, lang, n_chars
FROM (
  SELECT doc_id, source, lang, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY n_chars DESC, doc_id ASC
         ) AS rn
  FROM documents
) WHERE rn <= 40
"""


@register(
    "corpus_domain_cap",
    oracle=_DOMAIN_CAP_ORACLE,
    category="corpus",
    tables=("documents",),
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (C4/RefinedWeb-style source budgeting):
    keep the top 40 docs per source by a quality proxy (length, id
    tiebreak) so no single domain dominates the training mixture.
    One hash-partitioned window per source — parallelism grows with
    domain count; at extreme per-domain skew switch to the two-phase
    per-partition top-k + merge (grouped_map_topk's shape)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        docs.select("doc_id", "source", "lang", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 40)
        .drop("rn")
    )


def _cluster_split_oracle() -> str:
    from aws_etl_spark.queries.dedup_queries import _CLUSTER_ORACLE

    return f"""
WITH clusters AS ({_CLUSTER_ORACLE})
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(cluster AS BIGINT) AS cluster,
       {split_case_sql("CAST(cluster AS VARCHAR)", _SPLIT_FRACTIONS)} AS split
FROM clusters
"""


@register(
    "corpus_cluster_safe_split",
    oracle=_cluster_split_oracle(),
    category="corpus",
    tables=("documents",),
    bench=False,  # composition of dedup_minhash_lsh + dedup_clusters_cc
    # (both timed standalone) + a narrow bucket map — same
    # double-charging exclusion as dedup_survivors
)
def q_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-AWARE train/val/test split: near-duplicate clusters are
    assigned to splits as a unit (bucket key = the cluster's canonical
    id), so no near-dup of a test doc can leak into train — the
    leakage mode a plain per-doc split cannot prevent and the reason
    dedup must run BEFORE splitting in an LLM data pipeline.
    Composition: LSH candidates → connected components → md5-bucket
    split on the cluster id, each stage individually oracle-proven;
    singleton docs are their own cluster, so coverage is total."""
    from aws_etl_spark.dedup import dedup_clusters
    from aws_etl_spark.dedup.minhash import minhash_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_dup_pairs(
        docs, "doc_id", "text", k=3, n_hashes=64, bands=16, threshold=0.5
    ).select("id_a", "id_b")
    clustered = dedup_clusters(pairs, docs, "doc_id").select("doc_id", "cluster")
    assigned = split_assign(clustered, "cluster", _SPLIT_FRACTIONS)
    return assigned.select(
        "doc_id", F.col("cluster").cast("bigint").alias("cluster"), "split"
    )


def _health_sql(pctl_expr: str) -> str:
    return f"""
WITH fp AS (
  SELECT doc_id, source, n_chars,
         MD5(LOWER(TRIM(text))) AS fp
  FROM documents
),
dup AS (SELECT fp, COUNT(*) AS c FROM fp GROUP BY fp)
SELECT f.source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN d.c > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact_dup_docs,
       CAST(SUM(f.n_chars) AS BIGINT) AS total_chars,
       {pctl_expr} AS median_chars
FROM fp f JOIN dup d ON d.fp = f.fp
GROUP BY f.source
"""


sql_query(
    "corpus_health_report",
    _health_sql("percentile(f.n_chars, 0.5)"),
    oracle=_health_sql(
        "PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY f.n_chars)"
    ),
    category="corpus",
    doc=(
        "Per-source corpus health report — the dashboard query a data "
        "team runs before/after a cleaning pass: document counts, how "
        "many docs are exact duplicates of something (normalized-md5 "
        "fingerprint membership in a >1 group), total and median "
        "chars (the percentile ≡ PERCENTILE_CONT seam). Two map-side "
        "aggregates + one fingerprint join; no quadratic anything."
    ),
    tables=("documents",),
)


# --------------------------------------------------------------------------
# Training-mix epoch planner: given target mixture weights and the
# per-source token supply the corpus actually has, emit the table an
# LLM data team plans a run from — tokens wanted per source for a
# fixed budget, how many epochs (full passes) of each source that
# demands, the shortfall a single epoch leaves, and the per-epoch
# sample rate. Complements corpus_mixture_sample (which SAMPLES rows
# by keep-rate) with the PLANNING arithmetic itself. The budget is
# pinned to 3x the corpus's own token supply so the plan exercises
# both the multi-epoch branch (upweighted sources) and the
# subsample branch. Everything is exact BIGINT algebra — weights are
# small integer literals, targets are one integer multiply/divide,
# ceil(a/b) is the classic (a+b-1) div b — with one IEEE division at
# the boundary for the epoch multiplier. Plan: one scan, one
# source-grouped agg (20 groups), one scalar total joined back by
# broadcast; linear at any corpus size.
# --------------------------------------------------------------------------

# Head-heavy target mixture (a curated head source dominates, the
# long tail is down-weighted): with the 3x-supply budget over 20
# equal-supply sources this exercises BOTH planner branches — head
# sources need multiple epochs, weight-1 tail sources get a <1
# multiplier (subsample).
_EPOCH_WEIGHT_CASE = (
    "CASE source WHEN 'src0' THEN 40 WHEN 'src1' THEN 20 "
    "WHEN 'src2' THEN 10 ELSE 1 END"
)


def _epoch_sql(nwords: str, intdiv) -> str:
    return f"""
WITH supply AS (
  SELECT source,
         {_EPOCH_WEIGHT_CASE} AS weight,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM({nwords}) AS BIGINT) AS supply_tokens
  FROM documents
  GROUP BY source
),
tot AS (
  SELECT CAST(SUM(weight) AS BIGINT) AS wsum,
         CAST(3 * SUM(supply_tokens) AS BIGINT) AS budget
  FROM supply
),
plan AS (
  SELECT s.source, s.weight, s.n_docs, s.supply_tokens,
         CAST({intdiv("s.weight * t.budget", "t.wsum")} AS BIGINT)
           AS target_tokens
  FROM supply s CROSS JOIN tot t
)
SELECT source, weight, n_docs, supply_tokens, target_tokens,
       CAST({intdiv("target_tokens + supply_tokens - 1", "supply_tokens")}
            AS BIGINT) AS epochs_needed,
       CAST(GREATEST(target_tokens - supply_tokens, 0) AS BIGINT)
         AS deficit_tokens,
       CAST(target_tokens AS DOUBLE) / supply_tokens AS epoch_multiplier
FROM plan
ORDER BY source
"""


sql_query(
    "corpus_epoch_planner",
    _epoch_sql(
        "size(split(trim(text), ' '))", lambda a, b: f"({a}) DIV ({b})"
    ),
    oracle=_epoch_sql(
        "LEN(STRING_SPLIT(TRIM(text), ' '))", lambda a, b: f"({a}) // ({b})"
    ),
    category="corpus",
    doc=(
        "Per-source training-mix epoch planner: target tokens = "
        "weight/wsum of a 3x-supply budget, epochs = ceil(target/"
        "supply) via (a+b-1) div b, single-epoch deficit, and the "
        "epoch multiplier (>1 means repeat the source, <1 means "
        "subsample). Exact BIGINT algebra over one source-grouped "
        "agg; the scalar budget row broadcasts back."
    ),
    tables=("documents",),
)


# --------------------------------------------------------------------------
# Temperature-scaled mixture sampling (round 10, queued for the r11
# window): the multilingual-LM corpus-balancing rule (alpha = 0.5) —
# sample source i proportionally to n_i^alpha so small sources are
# up-weighted relative to their raw share without ever dominating.
# Everything that crosses an aggregation boundary is exact: weights
# are floor-quantized sqrt(n) micro-units (one correctly-rounded SQRT
# of an exact integer per SOURCE, not per row), the per-source target
# under a fixed document budget is pure integer floor division
# (T·wq DIV total_q, capped at n_i), and the row-level keep decision
# is the shared md5 16-bit bucket against an integer threshold
# (target·65536 DIV n_i) — append-stable like every sampler in this
# module. Two passes by construction (count, then filter); at 100 TB
# pass one is a map-side-combined count per source and pass two is a
# narrow filtered scan — no shuffle of document rows at all.
# --------------------------------------------------------------------------

_TM_BUDGET = 1000

_TM_COUNTS = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)) * 1000000) AS BIGINT) AS wq
FROM documents GROUP BY source
"""


def _tm_tail(counts: str, totq: str, bucket, intdiv) -> str:
    thr = intdiv("t.target * 65536", "t.n_docs")
    tgt = intdiv(f"{_TM_BUDGET} * wq", totq)
    return f"""
WITH t AS (
  SELECT source, n_docs, wq,
         LEAST(n_docs, CAST({tgt} AS BIGINT)) AS target
  FROM {counts}
),
k AS (
  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM documents d
  JOIN t ON t.source = d.source
  WHERE {bucket("CAST(d.doc_id AS VARCHAR)")} < {thr}
  GROUP BY d.source
)
SELECT t.source, t.n_docs, t.wq,
       CAST(t.wq AS DOUBLE) / CAST({totq} AS DOUBLE) AS share,
       t.target,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM t LEFT JOIN k ON k.source = t.source
"""


def _register_temperature_mixture() -> None:
    from aws_etl_spark.queries.registry import staged_sql_query
    from aws_etl_spark.queries.stats_queries import _spark_bucket

    def spark_bucket(e: str) -> str:
        return _spark_bucket(e.replace("AS VARCHAR", "AS STRING"))

    duck_tail = _tm_tail(
        "c", "(SELECT SUM(wq) FROM c)", duckdb_bucket_sql,
        lambda a, b: f"({a}) // ({b})",
    )
    assert duck_tail.startswith("\nWITH ")
    staged_sql_query(
        "corpus_temperature_mixture",
        ops=(
            ("view", "tm_counts", _TM_COUNTS),
            ("scalar", "TMTOTQ", "SELECT CAST(SUM(wq) AS BIGINT) FROM tm_counts"),
        ),
        final=_tm_tail(
            "tm_counts", "{TMTOTQ}", spark_bucket,
            lambda a, b: f"({a}) DIV ({b})",
        ),
        oracle=f"WITH c AS ({_TM_COUNTS}),\n" + duck_tail[len("\nWITH ") :],
        category="corpus",
        doc=(
            "Temperature-scaled (alpha=0.5) mixture sampling under a "
            "fixed document budget: per-source weights as floor-"
            "quantized sqrt(n) micro-units, integer floor-division "
            "targets capped at source size, and append-stable md5-"
            "bucket keep decisions against an integer threshold. "
            "Reports per-source docs, weight, share, target, and the "
            "actually-kept count. One staged counts pass + one "
            "filtered scan; no row shuffle."
        ),
        tables=("documents",),
    )


_register_temperature_mixture()


# --------------------------------------------------------------------------
# Train/eval split-leakage audit (round 10, queued for the r11
# window): near-duplicate pairs that STRADDLE the train/val/test
# split — the leakage `dedup_decontaminate` (exact n-gram overlap vs
# an eval set) cannot see and a per-doc split cannot prevent. The
# pair discovery is the oracled exact 3-gram Jaccard machinery
# (ngram_jaccard_pairs — pair-cache-served, bucketed, never
# all-pairs); each pair's two splits come row-locally from the md5
# bucket (the corpus_split_assign rule), canonicalized by PIPELINE
# order (train < val < test). Per split-pair: the pair count and the
# distinct "redundant" docs — across splits that is the doc in the
# LATER split (the contaminated eval doc); within a split it is the
# larger id (min-id survivorship). Everything after the pair table
# is group-by-3 arithmetic; jaccard never re-enters.
# --------------------------------------------------------------------------


def _split_idx_case(bucket_sql: str) -> str:
    """split index by pipeline order (train=0, val=1, test=2) from a
    16-bit bucket expression — mirrors _SPLIT_FRACTIONS (80/10/10)."""
    return (
        f"CASE WHEN {bucket_sql} < 52428 THEN 0 "
        f"WHEN {bucket_sql} < 58982 THEN 1 ELSE 2 END"
    )


_SPLIT_NAME = "CASE {i} WHEN 0 THEN 'train' WHEN 1 THEN 'val' ELSE 'test' END"


def _leakage_tail(pairs: str, bucket_of) -> str:
    ia = _split_idx_case(bucket_of("CAST(id_a AS VARCHAR)"))
    ib = _split_idx_case(bucket_of("CAST(id_b AS VARCHAR)"))
    return f"""
WITH p AS (
  SELECT id_a, id_b,
         CAST({ia} AS BIGINT) AS sa,
         CAST({ib} AS BIGINT) AS sb
  FROM {pairs}
),
c AS (
  SELECT LEAST(sa, sb) AS lo, GREATEST(sa, sb) AS hi,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(COUNT(DISTINCT CASE
                WHEN sa = sb THEN GREATEST(id_a, id_b)
                WHEN sa < sb THEN id_b ELSE id_a END) AS BIGINT)
           AS n_redundant_docs
  FROM p GROUP BY LEAST(sa, sb), GREATEST(sa, sb)
)
SELECT {_SPLIT_NAME.format(i="lo")} AS split_lo,
       {_SPLIT_NAME.format(i="hi")} AS split_hi,
       n_pairs, n_redundant_docs,
       CAST(CASE WHEN lo = hi THEN 0 ELSE 1 END AS BIGINT) AS is_leak
FROM c
"""


def _register_split_leakage() -> None:
    from aws_etl_spark.ops.corpus import duckdb_bucket_sql
    from aws_etl_spark.queries.registry import register

    jaccard_pairs_cte = """
WITH sh AS (
  SELECT doc_id AS doc,
         list_distinct(
           list_transform(
             range(1, greatest(len(string_split(trim(text), ' ')) - 2, 0) + 1),
             i -> array_to_string(string_split(trim(text), ' ')[i:i+2], ' ')
           )
         ) AS shingles
  FROM documents
),
e AS (SELECT doc, len(shingles) AS n, unnest(shingles) AS s FROM sh),
jp AS (
  SELECT a.doc AS id_a, b.doc AS id_b
  FROM e a JOIN e b ON a.s = b.s AND a.doc < b.doc
  GROUP BY a.doc, b.doc
  HAVING COUNT(*) * 1.0
           / (ANY_VALUE(a.n) + ANY_VALUE(b.n) - COUNT(*)) >= 0.5
)"""
    tail = _leakage_tail("jp", duckdb_bucket_sql)
    assert tail.startswith("\nWITH ")
    oracle = jaccard_pairs_cte + ",\n" + tail[len("\nWITH ") :]

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from aws_etl_spark.dedup import ngram_jaccard_pairs
        from aws_etl_spark.queries.stats_queries import _spark_bucket

        docs = load_table(spark, sf_dir, "documents")
        pairs = ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5)
        pairs.select("id_a", "id_b").createOrReplaceTempView(
            "leakage_pairs"
        )

        def spark_bucket(e: str) -> str:
            return _spark_bucket(e.replace("AS VARCHAR", "AS STRING"))

        return spark.sql(_leakage_tail("leakage_pairs", spark_bucket))

    fn.__name__ = "q_corpus_split_leakage"
    register(
        "corpus_split_leakage",
        oracle=oracle,
        category="corpus",
        doc=(
            "Train/val/test split-leakage audit: exact 3-gram Jaccard "
            "near-dup pairs (the oracled pair machinery, pair-cache "
            "served) classified by the md5-bucket split of BOTH ends "
            "— per split-pair the pair count and the distinct "
            "redundant docs (the later-split doc across splits, the "
            "larger id within one), with cross-split rows flagged. "
            "The near-dup leakage a per-doc split cannot prevent and "
            "exact decontamination cannot see."
        ),
        tables=("documents",),
    )(fn)


_register_split_leakage()


# --------------------------------------------------------------------------
# N-gram contamination audit between splits (round 11 late batch,
# queued for the r12 window): dedup_decontaminate removes WHOLE-doc
# eval duplicates and corpus_split_leakage finds NEAR-dup pairs; the
# standard LLM-eval hygiene check (GPT-3/PaLM-style) is finer still —
# "what fraction of each eval document's word 5-grams also appear
# anywhere in the train split". Splits are the corpus's own stable
# md5-bucket assignment (identical thresholds to corpus_split_assign,
# so the audit reads the very splits the pipeline ships). One staged
# scan explodes every doc into (doc_id, split, 5-gram); the train
# side deduplicates to distinct grams, the eval side LEFT-joins it,
# and per-doc shares are one IEEE division over exact BIGINT counts
# with the >= 50 % flag decided in integer space (2c >= n). Empty
# tokens are filtered before gram construction (r11 ADVICE 2 —
# mirrors the RAKE token view's w <> '' filter), so consecutive
# spaces/newlines cannot inject empty 'words' into grams and inflate
# per-doc n_grams on whitespace-irregular corpora. Docs
# shorter than 5 words contribute no grams and drop out (documented).
# Scale: the gram join shuffles on the gram hash — linear in corpus
# token count; no doc x doc pairing anywhere.
# --------------------------------------------------------------------------

_CONTAM_TRAIN_LT = 52428  # int(0.8 * 65536) — corpus_split_assign's edge
_CONTAM_TEST_GE = 58982  # int(0.9 * 65536)

_CONTAM_GRAMS_SPARK = f"""
SELECT doc_id,
       CASE WHEN bucket < {_CONTAM_TRAIN_LT} THEN 'train'
            WHEN bucket >= {_CONTAM_TEST_GE} THEN 'test'
            ELSE 'val' END AS split,
       explode(CASE WHEN size(ws) >= 5
                    THEN transform(sequence(1, size(ws) - 4),
                                   i -> concat_ws(' ', slice(ws, i, 5)))
                    ELSE array() END) AS gram
FROM (
  SELECT doc_id,
         CAST(CONV(SUBSTRING(MD5(CAST(doc_id AS STRING)), 1, 4), 16, 10)
              AS INT) AS bucket,
         filter(split(trim(text), ' '), w -> w <> '') AS ws
  FROM documents
)
"""


def _contam_tail(grams: str) -> str:
    return f"""
WITH tr AS (SELECT DISTINCT gram FROM {grams} WHERE split = 'train'),
ev AS (SELECT doc_id, gram FROM {grams} WHERE split = 'test'),
j AS (
  SELECT e.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN t.gram IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_contaminated
  FROM ev e LEFT JOIN tr t ON t.gram = e.gram
  GROUP BY e.doc_id
)
SELECT doc_id, n_grams, n_contaminated,
       CAST(n_contaminated AS DOUBLE) / CAST(n_grams AS DOUBLE)
         AS contaminated_share,
       CAST(CASE WHEN 2 * n_contaminated >= n_grams THEN 1 ELSE 0 END
            AS BIGINT) AS flag_contaminated
FROM j
ORDER BY doc_id
"""


def _register_contamination() -> None:
    from aws_etl_spark.queries.registry import staged_sql_query

    duck_grams = f"""
SELECT doc_id,
       CASE WHEN bucket < {_CONTAM_TRAIN_LT} THEN 'train'
            WHEN bucket >= {_CONTAM_TEST_GE} THEN 'test'
            ELSE 'val' END AS split,
       UNNEST(LIST_TRANSFORM(
         RANGE(1, GREATEST(LEN(ws) - 4, 0) + 1),
         i -> ARRAY_TO_STRING(ws[i:i+4], ' ')
       )) AS gram
FROM (
  SELECT doc_id,
         {duckdb_bucket_sql("CAST(doc_id AS VARCHAR)")} AS bucket,
         LIST_FILTER(STRING_SPLIT(TRIM(text), ' '), w -> w <> '') AS ws
  FROM documents
)
"""
    duck_tail = _contam_tail("grams")
    assert duck_tail.startswith("\nWITH ")
    staged_sql_query(
        "corpus_ngram_contamination",
        ops=(("view", "contam_grams", _CONTAM_GRAMS_SPARK),),
        final=_contam_tail("contam_grams"),
        oracle=(
            f"WITH grams AS ({duck_grams}),\n" + duck_tail[len("\nWITH ") :]
        ),
        category="corpus",
        doc=(
            "Word-5-gram contamination of the test split against the "
            "train split (the GPT-3-style eval-hygiene audit) on the "
            "corpus's own stable md5-bucket split assignment: one "
            "staged gram explosion (empty tokens filtered before "
            "gram construction), distinct train grams LEFT-joined "
            "to test-gram occurrences, per-doc shares as one IEEE "
            "division over exact BIGINT counts and the 50% flag "
            "decided in integer space."
        ),
        tables=("documents",),
    )


_register_contamination()


# --------------------------------------------------------------------------
# Gini coefficient of document lengths (round 12, queued for the r13
# window): corpus_health_report reads length QUANTILES; the Gini of
# the length distribution is the single-number concentration readout
# a mixture planner watches — a corpus whose token mass concentrates
# in a few huge documents packs, shuffles, and caps differently from
# an even one, and a drift in length-Gini between snapshots flags a
# source change before any mean moves. Machinery is stat_gini_spend's
# sorted-prefix identity VERBATIM (imported tail): per-distinct-
# length counts off one staged documents scan, tied blocks contribute
# v*c*(2f+c-n) through the two-stage prefix sum (bucket offsets +
# within-bucket window — never a global rank), G one IEEE division of
# exact decimals, empty/zero-mass pinned to 0 in decimal space.
# --------------------------------------------------------------------------


def _register_doclen_gini() -> None:
    from aws_etl_spark.queries.registry import staged_sql_query
    from aws_etl_spark.queries.sql_seams import duck_declared, spark_declared
    from aws_etl_spark.queries.stats_queries import _gini_tail

    dl_t = """
SELECT CAST(n_chars AS BIGINT) AS x
FROM documents WHERE n_chars IS NOT NULL
"""
    kw = dict(n_label="n_docs", mean_div="", mean_label="mean_chars")
    duck_tail = _gini_tail("t", duck_declared, **kw)
    assert duck_tail.startswith("\nWITH ")
    staged_sql_query(
        "corpus_doclen_gini",
        ops=(("view", "dlg_t", dl_t),),
        final=_gini_tail("dlg_t", spark_declared, **kw),
        oracle=f"WITH t AS ({dl_t}),\n" + duck_tail[len("\nWITH ") :],
        category="corpus",
        doc=(
            "Gini coefficient of document lengths (n_chars): the "
            "stat_gini_spend sorted-prefix identity over one staged "
            "documents scan — tied length blocks contribute "
            "v*c*(2f+c-n) via the two-stage prefix sum, G one IEEE "
            "division of exact decimals, empty/zero-mass corpora "
            "pinned to 0 in decimal space. The length-concentration "
            "drift monitor beside corpus_health_report's quantiles."
        ),
        tables=("documents",),
    )


_register_doclen_gini()


# --------------------------------------------------------------------------
# Train-split source-balance KL audit (round 12 late batch, queued for
# the r13 window): the md5-bucket split is doc-random, so the TRAIN
# split's source mix should match the corpus's — but a skewed-bucket
# accident or a source of correlated doc_ids would silently shift the
# training mixture. KL(train source distribution || corpus source
# distribution) is the single-number drift readout, with a
# missing-source count for the hard failure (a source with zero train
# docs). Exact machinery: both distributions are exact integer counts
# off one documents scan (the split is the corpus's own stable
# md5-bucket assignment); each source's p*ln(p/q) term is one fixed
# IEEE chain nano-quantized (FLOOR x1e9 — terms can be negative,
# FLOOR floors on both engines) before the order-free BIGINT sum;
# empty train split pins KL to 0 with every source counted missing.
# --------------------------------------------------------------------------


def _split_kl_counts(bucket_expr: str) -> str:
    return f"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s,
       CAST(SUM(CASE WHEN {bucket_expr} < {_CONTAM_TRAIN_LT}
                     THEN 1 ELSE 0 END) AS BIGINT) AS m_s
FROM documents GROUP BY source
"""


def _split_kl_tail(s: str) -> str:
    term = (
        "(CAST(m_s AS DOUBLE) / CAST(mt.m AS DOUBLE))"
        " * LN((CAST(m_s AS DOUBLE) / CAST(mt.m AS DOUBLE))"
        "      / (CAST(n_s AS DOUBLE) / CAST(nt.n AS DOUBLE)))"
        " * CAST(1000000000 AS DOUBLE)"
    )
    return f"""
WITH nt AS (SELECT CAST(COALESCE(SUM(n_s), 0) AS BIGINT) AS n FROM {s}),
mt AS (SELECT CAST(COALESCE(SUM(m_s), 0) AS BIGINT) AS m FROM {s}),
k AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
         CAST(COALESCE(SUM(CASE WHEN m_s = 0 THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_missing,
         CAST(COALESCE(SUM(CASE WHEN m_s = 0 THEN CAST(0 AS BIGINT)
                                ELSE CAST(FLOOR({term}) AS BIGINT)
                           END), 0) AS BIGINT) AS kl_q
  FROM {s} CROSS JOIN nt CROSS JOIN mt
)
SELECT k.n_sources, k.n_missing AS n_sources_missing_in_train,
       mt.m AS n_train_docs, nt.n AS n_docs,
       CASE WHEN mt.m = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(k.kl_q AS DOUBLE) / CAST(1000000000 AS DOUBLE)
       END AS kl_train_vs_corpus
FROM k CROSS JOIN nt CROSS JOIN mt
"""


def _register_split_kl() -> None:
    from aws_etl_spark.queries.registry import staged_sql_query

    spark_bucket = (
        "CAST(CONV(SUBSTRING(MD5(CAST(doc_id AS STRING)), 1, 4), 16, 10)"
        " AS INT)"
    )
    duck_tail = _split_kl_tail("s")
    assert duck_tail.startswith("\nWITH ")
    # the per-source count table is the ONE documents reduction; the
    # plain-CTE draft re-derived documents x5 (textual expansion 10 —
    # the registration-time census caught it), the staged form reads
    # 0 base scans in the final plan
    staged_sql_query(
        "corpus_split_balance_kl",
        ops=(("view", "skl_s", _split_kl_counts(spark_bucket)),),
        final=_split_kl_tail("skl_s"),
        oracle=(
            "WITH s AS ("
            + _split_kl_counts(duckdb_bucket_sql("CAST(doc_id AS VARCHAR)"))
            + "),\n"
            + duck_tail[len("\nWITH ") :]
        ),
        category="corpus",
        doc=(
            "KL divergence of the train split's source distribution "
            "vs the whole corpus (the mixture-drift audit on the "
            "corpus's own stable md5-bucket split): exact integer "
            "counts from one documents scan, per-source p*ln(p/q) "
            "terms nano-quantized before the order-free BIGINT sum, "
            "plus the hard-failure count of sources with zero train "
            "docs; empty train split pins KL to 0."
        ),
        tables=("documents",),
    )


_register_split_kl()
