"""Similarity-search queries over the embeddings table (§2.13).

Exact variants carry full DuckDB oracles: the left-fold double dot
product is bit-identical to ``list_dot_product`` on DOUBLE[] and the
oracle mirrors the exact cosine expression shape. The sign-LSH family
is ALSO fully hash-oracled since round 5 — its oracle replicates the
algorithm itself (seeded hyperplanes inlined as literals, identical
sequential-fold dots), so the approximate pipeline is provable
bit-for-bit. Round 6 extended the same construction to IVF with a
pinned coarse quantizer (ann_cosine_topk_ivf_exact — seeded unit
CENTROIDS inlined as literals); only the trained production IVF
(float k-means state) remains rows-only, recall-checked against the
exact path in tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_spark.queries.registry import load_table, register
from aws_etl_spark.similarity import (
    cosine_pairs_above,
    cosine_topk,
    cosine_topk_lsh,
    ivf_topk,
)

_TOPK_ORACLE = """
WITH s AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
         (SQRT(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
          SQRT(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < 20
),
r AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, neighbor_id, rank, cosine FROM r WHERE rank <= 5
"""

_PAIRS_ORACLE = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
       (SQRT(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        SQRT(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
      (SQRT(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
       SQRT(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.3
"""


@register(
    "ann_cosine_topk_exact",
    oracle=_TOPK_ORACLE,
    category="similarity",
    tables=("embeddings",),
)
def q_ann_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 20 query vectors (self excluded)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.filter("vec_id < 20"), k=5)


@register(
    "ann_embedding_near_dup",
    oracle=_PAIRS_ORACLE,
    category="similarity",
    tables=("embeddings",),
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cosine ≥ 0.3 (synthetic embeddings are unclustered; max pairwise cosine ≈ 0.48)), exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs_above(emb, threshold=0.3)


# ann_cosine_topk_lsh is registered below, after _lsh_exact_oracle —
# its production parameterization (32 bits × 8 bands) is oracled by
# the same algorithm-mirroring construction as the 16-bit twin.


def _lsh_exact_oracle(
    bits: int = 16, bands: int = 8, dim: int = 64, seed: int = 42, k: int = 5
) -> str:
    """DuckDB oracle that mirrors the WHOLE sign-LSH pipeline, not a
    brute-force stand-in: the seeded hyperplanes are inlined as double
    literals (shortest-roundtrip repr — parses back to the identical
    IEEE value), sign bits come from the same sequential-fold dot
    product (list_dot_product ≡ pair_dot, the established bit-parity
    seam), banding/candidate-join/re-rank replicate topk.py's shapes.
    With both engines computing identical signatures, the approximate
    algorithm itself becomes hash-provable — recall misses and all."""
    from aws_etl_spark.similarity.topk import _hyperplanes

    planes = _hyperplanes(dim, bits, seed)
    r = bits // bands
    bit_exprs = ",\n    ".join(
        "CASE WHEN list_dot_product(embedding::DOUBLE[], ["
        + ", ".join(repr(x) for x in p)
        + "]::DOUBLE[]) >= 0 THEN 1 ELSE 0 END AS b" + str(i)
        for i, p in enumerate(planes)
    )
    band_selects = "\n  UNION ALL\n  ".join(
        f"SELECT vec_id, {b} AS band, "
        + " || ',' || ".join(f"CAST(b{b * r + j} AS VARCHAR)" for j in range(r))
        + " AS bucket FROM sig"
        for b in range(bands)
    )
    return f"""
WITH sig AS (
  SELECT vec_id,
    {bit_exprs}
  FROM embeddings
),
banded AS (
  {band_selects}
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM banded q JOIN banded c ON q.band = c.band AND q.bucket = c.bucket
  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
         (SQRT(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
          SQRT(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cosine
  FROM cand
  JOIN embeddings a ON a.vec_id = cand.query_id
  JOIN embeddings b ON b.vec_id = cand.neighbor_id
),
r AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cosine FROM r WHERE rank <= {k}
"""


@register(
    "ann_cosine_topk_lsh",
    oracle=_lsh_exact_oracle(bits=32, bands=8),
    category="similarity",
    tables=("embeddings",),
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH banded ANN top-5 (32 bits × 8 bands, the production
    parameterization) + exact re-rank. Upgraded from rows-only to
    hash-oracled: the DuckDB oracle replicates the algorithm itself
    (inlined seeded hyperplanes, identical sequential-fold dots,
    same banding/candidate join/re-rank — see _lsh_exact_oracle), so
    the approximate pipeline is provable bit-for-bit; the recall-vs-
    exact gate stays in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_lsh(emb, emb.filter("vec_id < 20"), k=5)


@register(
    "ann_cosine_topk_lsh_exact",
    oracle=_lsh_exact_oracle(),
    category="similarity",
    tables=("embeddings",),
)
def q_ann_lsh_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH ANN top-5, exact driver-provable twin of
    ann_cosine_topk_lsh: same banded pipeline (16 bits × 8 bands —
    bits ≥ log2(N) at every test scale — seed 42), but the DuckDB
    oracle REPLICATES the algorithm (inlined hyperplane literals,
    identical sequential-fold dots, same banding and re-rank) instead
    of parking the result as rows-only. Hash parity holds whatever the
    LSH recall is, because both engines make the same candidate
    choices bit-for-bit; ann_cosine_topk_lsh (32-bit production
    parameterization) is oracled by the same construction, and the
    recall-vs-exact gate stays in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_lsh(
        emb, emb.filter("vec_id < 20"), k=5, bits=16, bands=8, seed=42
    )


@register(
    "ann_cosine_topk_ivf",
    oracle=None,  # approximate; recall-gated in tests/test_similarity.py
    category="similarity",
    tables=("embeddings",),
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5 (16 lists, probe 4)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter("vec_id < 20"), k=5)


def _ivf_exact_oracle(
    n_centroids: int = 16, n_probe: int = 4, k: int = 5, dim: int = 64, seed: int = 7
) -> str:
    """DuckDB oracle that mirrors the WHOLE IVF pipeline with a pinned
    coarse quantizer: the seeded unit centroids are inlined as double
    literals, corpus assignment is argmax-dot with (dot DESC, cid)
    tie order — exactly nearest_centroids_udf's stable argsort — the
    query side probes its n_probe nearest lists, and candidates get
    the exact cosine re-rank. Same construction as _lsh_exact_oracle:
    with both engines computing identical dots over identical centroid
    literals, every cell-assignment and probe decision matches
    bit-for-bit, so the APPROXIMATE pipeline is hash-provable (recall
    misses and all). The float k-means training state — the only part
    of IVF that is not portable — stays in ann_cosine_topk_ivf."""
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
corpus_assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
    FROM dots) WHERE rn = 1
),
query_probe AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
    FROM dots WHERE vec_id < 20) WHERE rn <= {n_probe}
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM query_probe q JOIN corpus_assign c ON q.cid = c.cid
  WHERE q.vec_id <> c.vec_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
         (SQRT(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
          SQRT(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cosine
  FROM cand
  JOIN embeddings a ON a.vec_id = cand.query_id
  JOIN embeddings b ON b.vec_id = cand.neighbor_id
),
r AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cosine FROM r WHERE rank <= {k}
"""


@register(
    "ann_cosine_topk_ivf_exact",
    oracle=_ivf_exact_oracle(),
    category="similarity",
    tables=("embeddings",),
)
def q_ann_ivf_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5, exact driver-provable twin of
    ann_cosine_topk_ivf: same assignment → probe → exact-re-rank
    pipeline (16 lists, probe 4), but the coarse quantizer is pinned
    to seeded unit-centroid literals (fixed_unit_centroids) instead of
    float k-means state, and the DuckDB oracle REPLICATES the
    algorithm with the same centroid literals (see _ivf_exact_oracle)
    — the centroid-literal analogue of ann_cosine_topk_lsh_exact.
    Recall-vs-exact for the trained production variant stays gated in
    tests/test_similarity.py."""
    from aws_etl_spark.similarity.topk import fixed_unit_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb,
        emb.filter("vec_id < 20"),
        k=5,
        n_probe=4,
        centroids=fixed_unit_centroids(dim=64, n_centroids=16, seed=7),
    )


_QUANTIZE_ORACLE = """
WITH e AS (
  SELECT vec_id, r.i AS pos, CAST(embedding[r.i] AS DOUBLE) AS val
  FROM embeddings CROSS JOIN range(1, 1025) r(i)
  WHERE r.i <= LEN(embedding)
),
s AS (SELECT pos, MAX(ABS(val)) AS mx FROM e GROUP BY pos)
SELECT e.vec_id, e.pos,
       CASE WHEN s.mx = 0 THEN 0
            ELSE CAST(FLOOR(e.val / s.mx * 127 + 0.5) AS BIGINT) END AS q8
FROM e JOIN s USING (pos)
"""


@register(
    "embeddings_quantize_int8",
    oracle=_QUANTIZE_ORACLE,
    category="similarity",
    tables=("embeddings",),
)
def q_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension symmetric int8 quantization (q = round(x/max|x|
    ·127)) — the embedding-compression pass ANN indexes run before
    sharding (4× memory cut, dot products stay proportional).

    Two passes: a (dims)-sized max-abs aggregate (map-side combined,
    broadcast back — never a driver round-trip), then a scan-bound
    projection. FLOOR(x + 0.5) instead of ROUND: both engines
    half-up the same way; float32 inputs are cast to double BEFORE
    dividing (DuckDB would otherwise divide in float32 while Spark
    promotes to double). Output exploded (vec_id, pos, q8) — array
    cells would crash the driver's canonicalizer.
    """
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.posexplode("embedding").alias("p", "v")
    ).select(
        "vec_id",
        (F.col("p") + 1).cast("long").alias("pos"),
        F.col("v").cast("double").alias("val"),
    )
    scales = e.groupBy("pos").agg(F.max(F.abs(F.col("val"))).alias("mx"))
    return e.join(F.broadcast(scales), "pos").select(
        "vec_id",
        "pos",
        F.when(F.col("mx") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor(F.col("val") / F.col("mx") * 127 + F.lit(0.5)).cast("long")
        )
        .alias("q8"),
    )


_CENTROID_COS_ORACLE = """
WITH e AS (
  SELECT label, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
),
q AS (
  SELECT label, dim,
         CAST(FLOOR(CAST(v AS DOUBLE) * 1e6) AS BIGINT) AS q6
  FROM e
),
sums AS (
  SELECT label, dim, SUM(q6) AS s
  FROM q GROUP BY label, dim
),
dots AS (
  SELECT a.label AS label_a, b.label AS label_b,
         CAST(SUM(CAST(a.s AS DECIMAL(19,0))
                  * CAST(b.s AS DECIMAL(19,0))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(a.s AS DECIMAL(19,0))
                  * CAST(a.s AS DECIMAL(19,0))) AS DOUBLE) AS naa,
         CAST(SUM(CAST(b.s AS DECIMAL(19,0))
                  * CAST(b.s AS DECIMAL(19,0))) AS DOUBLE) AS nbb
  FROM sums a JOIN sums b ON a.dim = b.dim AND a.label < b.label
  GROUP BY a.label, b.label
)
SELECT CAST(label_a AS BIGINT) AS label_a,
       CAST(label_b AS BIGINT) AS label_b,
       dot / (sqrt(naa) * sqrt(nbb)) AS centroid_cosine
FROM dots
"""


@register(
    "embeddings_label_centroids",
    oracle=_CENTROID_COS_ORACLE,
    category="similarity",
    tables=("embeddings",),
)
def q_label_centroid_cosines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between per-label centroids (class-prototype
    similarity — the embedding-space confusion audit).

    Components quantize to 1e-6 before summing (order-independent
    exact integers, the dim-stats idiom); the per-label scale factors
    1/n cancel inside cosine, so the whole computation is exact
    integer/DECIMAL sums with one IEEE finish — bit-identical across
    engines. Shuffle inventory: one map-side-combined groupBy to
    (label, dim) — constant rows per partition — then a join over the
    tiny centroid table."""
    emb = load_table(spark, sf_dir, "embeddings")
    q6 = F.floor(F.col("val").cast("double") * F.lit(1e6)).cast("long")
    sums = (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .select(
            F.col("label"),
            (F.col("pos") + 1).alias("dim"),
            q6.alias("q6"),
        )
        .groupBy("label", "dim")
        .agg(F.sum("q6").alias("s"))
    )
    a = sums.select(
        F.col("label").alias("label_a"),
        F.col("dim").alias("dim"),
        F.col("s").cast("decimal(19,0)").alias("sa"),
    )
    b = sums.select(
        F.col("label").alias("label_b"),
        F.col("dim").alias("dim"),
        F.col("s").cast("decimal(19,0)").alias("sb"),
    )
    dots = (
        a.join(b, "dim")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("sa") * F.col("sb")).cast("double").alias("dot"),
            F.sum(F.col("sa") * F.col("sa")).cast("double").alias("naa"),
            F.sum(F.col("sb") * F.col("sb")).cast("double").alias("nbb"),
        )
    )
    return dots.select(
        F.col("label_a").cast("bigint").alias("label_a"),
        F.col("label_b").cast("bigint").alias("label_b"),
        (F.col("dot") / (F.sqrt("naa") * F.sqrt("nbb"))).alias(
            "centroid_cosine"
        ),
    )


_HARD_NEG_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, label AS query_label, embedding
  FROM embeddings WHERE vec_id < 30
),
s AS (
  SELECT q.query_id, q.query_label,
         c.vec_id AS neg_id, c.label AS neg_label,
         list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
         (SQRT(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
          SQRT(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS cosine
  FROM q JOIN embeddings c ON c.label <> q.query_label
),
r AS (
  SELECT query_id, query_label, neg_id, neg_label, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neg_id) AS rn
  FROM s
)
SELECT query_id, query_label, neg_id, neg_label, cosine
FROM r WHERE rn = 1
"""


@register(
    "embeddings_hard_negatives",
    oracle=_HARD_NEG_ORACLE,
    category="similarity",
    tables=("embeddings",),
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per query
    vector, the single most-similar corpus vector with a DIFFERENT
    label (the example most likely to confuse a model — the standard
    mining step for embedding/retrieval training data).

    Plan: queries broadcast (Q ≪ N), corpus streams past in one
    narrow crossJoin + label-inequality filter, cosine via the
    Arrow-batched sequential-fold ``pair_dot`` (bit-identical to
    DuckDB's list_dot_product), per-query top-1 window with id
    tiebreak. At 100 TB the same shape shards the corpus; for large Q
    route through the IVF path instead (probe clusters whose label
    mix differs)."""
    from pyspark.sql import Window

    from aws_etl_spark.similarity.topk import norm, pair_dot

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter("vec_id < 30").select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("q_vec"),
        norm(F.col("embedding")).alias("q_norm"),
    )
    c = emb.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        F.col("embedding").alias("c_vec"),
        norm(F.col("embedding")).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neg_label") != F.col("query_label"))
        .withColumn(
            "cosine",
            pair_dot(F.col("q_vec"), F.col("c_vec"))
            / (F.col("q_norm") * F.col("c_norm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neg_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "query_label", "neg_id", "neg_label", "cosine")
    )


def _kmeans_oracle(k: int, n_iter: int) -> str:
    """Unrolled Lloyd's rounds as CTE stages — identical integer
    arithmetic to similarity/kmeans.py (assignment argmin via grouped
    ROW_NUMBER, update via `//` integer division on the non-negative
    shifted quantization)."""

    def assign(name: str, cents: str) -> str:
        return f"""
{name} AS (
  SELECT id, cluster, dist FROM (
    SELECT e.id, c.cluster,
           SUM((e.q - c.c) * (e.q - c.c)) AS dist,
           ROW_NUMBER() OVER (
             PARTITION BY e.id
             ORDER BY SUM((e.q - c.c) * (e.q - c.c)) ASC, c.cluster ASC
           ) AS rn
    FROM ex e JOIN {cents} c USING (dim)
    GROUP BY e.id, c.cluster
  ) WHERE rn = 1
)"""

    parts = []
    for r in range(1, n_iter + 1):
        parts.append(assign(f"a{r}", f"c{r - 1}"))
        parts.append(f"""
c{r} AS (
  SELECT p.cluster, p.dim, COALESCE(u.c_new, p.c) AS c
  FROM c{r - 1} p LEFT JOIN (
    SELECT a.cluster, e.dim, SUM(e.q) // COUNT(*) AS c_new
    FROM a{r} a JOIN ex e USING (id)
    GROUP BY a.cluster, e.dim
  ) u ON u.cluster = p.cluster AND u.dim = p.dim
)""")
    parts.append(assign("afinal", f"c{n_iter}"))
    return f"""
WITH ex AS (
  SELECT vec_id AS id, generate_subscripts(embedding, 1) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT)
           + 2000000 AS q
  FROM embeddings
),
seeds AS (SELECT vec_id AS id FROM embeddings ORDER BY vec_id LIMIT {k}),
c0 AS (
  SELECT e.id AS cluster, e.dim, e.q AS c FROM ex e JOIN seeds s USING (id)
),{",".join(parts)}
SELECT CAST(id AS BIGINT) AS vec_id,
       CAST(cluster AS BIGINT) AS cluster,
       CAST(dist AS BIGINT) AS dist_q
FROM afinal
"""


@register(
    "embeddings_kmeans_quantized",
    oracle=_kmeans_oracle(8, 3),
    category="similarity",
    tables=("embeddings",),
)
def q_kmeans_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed quantized-exact k-means (k=8, 3 Lloyd rounds) —
    iterative ML with full cross-engine hash parity: components
    quantize to shifted non-negative 1e-6 integers, assignment is an
    integer-distance argmin (map-side-combinable max(struct), no
    windows), updates are integer means, empty clusters persist. The
    oracle unrolls the 3 rounds as CTE stages (pagerank_exact /
    label-propagation trick applied to Lloyd's). Per round: one
    broadcast join of the k·d centroid table against the exploded
    components + one shuffle — the textbook Spark k-means shape;
    production seeding (k-means||) changes only the seed table."""
    from aws_etl_spark.similarity.kmeans import kmeans_quantized

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_quantized(emb, "vec_id", "embedding", k=8, n_iter=3)


# --------------------------------------------------------------------------
# Product quantization + ADC (round 10) — completes the ANN ladder
# LSH (hash-provable) -> IVF (+exact twin) -> PQ next to
# embeddings_ann_recall's eval harness. Per-subspace quantized-exact
# k-means (the kmeans.py arithmetic with a carried ``sub`` key), so
# codebooks, codes, and the asymmetric-distance top-k are all exact
# BIGINTs and the ENTIRE index+search pipeline hash-matches an
# unrolled-CTE DuckDB oracle — not just its inputs.
# --------------------------------------------------------------------------


def _pq_oracle(
    m: int = 2,
    k: int = 8,
    n_iter: int = 2,
    n_queries: int = 5,
    topk: int = 3,
    recall: bool = False,
) -> str:
    """Unrolled per-subspace Lloyd rounds + encode + ADC top-k.

    Every chained CTE is AS MATERIALIZED (DuckDB inlines CTEs; an
    iterative chain re-evaluates exponentially otherwise — the
    pagerank oracle lesson)."""

    def assign(name: str, cents: str) -> str:
        return f"""
{name} AS MATERIALIZED (
  SELECT id, sub, cluster, dist FROM (
    SELECT e.id, e.sub, c.cluster,
           SUM((e.q - c.c) * (e.q - c.c)) AS dist,
           ROW_NUMBER() OVER (
             PARTITION BY e.id, e.sub
             ORDER BY SUM((e.q - c.c) * (e.q - c.c)) ASC, c.cluster ASC
           ) AS rn
    FROM ex e JOIN {cents} c ON c.sub = e.sub AND c.dim = e.dim
    GROUP BY e.id, e.sub, c.cluster
  ) WHERE rn = 1
)"""

    parts = []
    for r in range(1, n_iter + 1):
        parts.append(assign(f"a{r}", f"c{r - 1}"))
        parts.append(f"""
c{r} AS MATERIALIZED (
  SELECT p.sub, p.cluster, p.dim, COALESCE(u.c_new, p.c) AS c
  FROM c{r - 1} p LEFT JOIN (
    SELECT a.sub, a.cluster, e.dim, SUM(e.q) // COUNT(*) AS c_new
    FROM a{r} a JOIN ex e ON e.id = a.id AND e.sub = a.sub
    GROUP BY a.sub, a.cluster, e.dim
  ) u ON u.sub = p.sub AND u.cluster = p.cluster AND u.dim = p.dim
)""")
    parts.append(assign("afinal", f"c{n_iter}"))
    if recall:
        tail = _pq_recall_tail(n_queries, topk)
    else:
        tail = f"""
SELECT CAST(qid AS BIGINT) AS query_id,
       CAST(id AS BIGINT) AS neighbor_id,
       CAST(adc AS BIGINT) AS adc_dist_q,
       CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= {topk}
"""
    return f"""
WITH dd AS (SELECT MAX(len(embedding)) AS d FROM embeddings),
ex AS MATERIALIZED (
  SELECT vec_id AS id,
         ((generate_subscripts(embedding, 1) - 1) * {m}) // dd.d + 1 AS sub,
         generate_subscripts(embedding, 1) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT)
           + 2000000 AS q
  FROM embeddings CROSS JOIN dd
),
seeds AS (SELECT vec_id AS id FROM embeddings ORDER BY vec_id LIMIT {k}),
c0 AS (
  SELECT e.sub, e.id AS cluster, e.dim, e.q AS c
  FROM ex e JOIN seeds s USING (id)
),{",".join(parts)},
codes AS (SELECT id, sub, cluster FROM afinal),
qdist AS MATERIALIZED (
  SELECT e.id AS qid, e.sub, c.cluster,
         SUM((e.q - c.c) * (e.q - c.c)) AS dq
  FROM ex e JOIN c{n_iter} c ON c.sub = e.sub AND c.dim = e.dim
  WHERE e.id < {n_queries}
  GROUP BY e.id, e.sub, c.cluster
),
adc AS (
  SELECT q.qid, x.id, SUM(q.dq) AS adc
  FROM codes x JOIN qdist q ON q.sub = x.sub AND q.cluster = x.cluster
  WHERE x.id <> q.qid
  GROUP BY q.qid, x.id
),
ranked AS (
  SELECT qid, id, adc,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, id) AS rn
  FROM adc
){tail}"""


def _pq_recall_tail(n_queries: int, topk: int) -> str:
    return f""",
approx_top AS (SELECT qid, id FROM ranked WHERE rn <= {topk}),
exactd AS MATERIALIZED (
  SELECT qe.id AS qid, xe.id, SUM((qe.q - xe.q) * (qe.q - xe.q)) AS dist
  FROM ex qe JOIN ex xe ON xe.dim = qe.dim AND xe.id <> qe.id
  WHERE qe.id < {n_queries}
  GROUP BY qe.id, xe.id
),
exact_top AS (
  SELECT qid, id FROM (
    SELECT qid, id,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist, id) AS rn
    FROM exactd
  ) WHERE rn <= {topk}
)
SELECT CAST(e.qid AS BIGINT) AS query_id,
       CAST(SUM(CASE WHEN a.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       CAST(SUM(CASE WHEN a.id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST({topk} AS DOUBLE) AS recall
FROM exact_top e
LEFT JOIN approx_top a ON a.qid = e.qid AND a.id = e.id
GROUP BY e.qid
"""


@register(
    "embeddings_pq_adc",
    oracle=_pq_oracle(),
    category="similarity",
    tables=("embeddings",),
)
def q_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (similarity/pq.py): M=2 subspace codebooks trained by
    quantized-exact Lloyd rounds, every vector encoded as M codes, the
    5-query eval set searched by summing M precomputed
    (query, centroid) distances per candidate — the scan touches only
    codes, never raw vectors. Integer-exact end to end, so the FULL
    train+encode+search pipeline hash-matches the unrolled-CTE
    oracle. Production dials: M=8..16, K=256, IVF routing in front
    (compose with ann_cosine_topk_ivf's partitioner)."""
    from aws_etl_spark.similarity.pq import pq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_adc_topk(emb, "vec_id", "embedding")[0]


@register(
    "embeddings_pq_recall",
    oracle=_pq_oracle(recall=True, topk=5),
    category="similarity",
    tables=("embeddings",),
)
def q_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of the PQ/ADC ranking against the exact
    quantized-distance top-5 per eval query — the eval twin that
    makes embeddings_pq_adc's approximation measurable, completing
    the harness symmetry with embeddings_ann_recall (LSH) and
    ann_cosine_topk_ivf's exact twin. Both legs are integer-exact
    over the same shifted components, so the recall itself
    hash-matches the oracle; at scale the exact leg runs on the eval
    sample only."""
    from aws_etl_spark.similarity.pq import pq_recall

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_recall(emb, "vec_id", "embedding", topk=5)


# --------------------------------------------------------------------------
# MMR (maximal marginal relevance) diverse re-ranking. The greedy
# selection is inherently sequential in k, so both engines run the
# SAME k-step unrolled plan: relevance = cosine to the query vector,
# redundancy = max cosine to the already-selected set, score =
# lambda*rel - (1-lambda)*red, argmax per step with a vec_id
# tiebreak. Every cosine is the sequential-fold dot product
# (Spark AGGREGATE fold == DuckDB list_dot_product, the established
# bit-parity seam), MAX over doubles is order-independent, and the
# lambda arithmetic is identical IEEE — so the whole greedy algorithm
# is hash-provable, not just its inputs.
#
# Scale: the candidate pool is a top-P relevance cut (P=20 here; the
# 100 TB path computes it with ann_cosine_topk's blocked kernels),
# after which each greedy step touches only P rows x <=k selected —
# driver-free, collect-free, O(k * P * d) total.
# --------------------------------------------------------------------------


def _mmr_sql(dot, k: int = 5, pool: int = 20, query_id: int = 0) -> str:
    """Unrolled k-step MMR plan; ``dot(a, b)`` emits the dialect's
    sequential-fold dot-product fragment."""
    lam, one_minus = "0.7", "0.3"

    def cos(a_emb, a_nrm, b_emb, b_nrm):
        return f"{dot(a_emb, b_emb)} / ({a_nrm} * {b_nrm})"

    parts = [f"""
WITH qv AS (
  SELECT embedding AS qemb, SQRT({dot('embedding', 'embedding')}) AS qnrm
  FROM embeddings WHERE vec_id = {query_id}
),
scored AS (
  SELECT e.vec_id, e.embedding,
         SQRT({dot('e.embedding', 'e.embedding')}) AS nrm,
         {cos('e.embedding', f"SQRT({dot('e.embedding', 'e.embedding')})",
              'qv.qemb', 'qv.qnrm')} AS rel
  FROM embeddings e CROSS JOIN qv
  WHERE e.vec_id <> {query_id}
),
pool AS (
  SELECT vec_id, embedding, nrm, rel FROM scored
  ORDER BY rel DESC, vec_id LIMIT {pool}
),
sel1 AS (
  SELECT vec_id, embedding, nrm, rel, CAST(NULL AS DOUBLE) AS red,
         {lam} * rel AS score
  FROM pool ORDER BY rel DESC, vec_id LIMIT 1
),
acc1 AS (SELECT vec_id, embedding, nrm FROM sel1)"""]

    for i in range(2, k + 1):
        p = i - 1
        parts.append(f""",
red{i} AS (
  SELECT p.vec_id,
         MAX({cos('p.embedding', 'p.nrm', 's.embedding', 's.nrm')}) AS red
  FROM pool p CROSS JOIN acc{p} s
  WHERE p.vec_id NOT IN (SELECT vec_id FROM acc{p})
  GROUP BY p.vec_id
),
sel{i} AS (
  SELECT p.vec_id, p.embedding, p.nrm, p.rel, r.red,
         {lam} * p.rel - {one_minus} * r.red AS score
  FROM pool p JOIN red{i} r ON r.vec_id = p.vec_id
  ORDER BY score DESC, p.vec_id LIMIT 1
),
acc{i} AS (
  SELECT vec_id, embedding, nrm FROM acc{p}
  UNION ALL SELECT vec_id, embedding, nrm FROM sel{i}
)""")

    finals = "\nUNION ALL ".join(
        f"SELECT {i} AS step, vec_id, rel AS relevance, red AS redundancy, "
        f"score AS mmr_score FROM sel{i}"
        for i in range(1, k + 1)
    )
    parts.append("\n" + finals)
    return "".join(parts)


def _spark_fold_dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _duck_fold_dot(a: str, b: str) -> str:
    return f"list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def mmr_rerank(
    emb: DataFrame,
    k: int = 5,
    pool_n: int = 20,
    query_id: int = 0,
) -> DataFrame:
    """DataFrame-side MMR: same algorithm as :func:`_mmr_sql`, but the
    top-``pool_n`` relevance pool is CACHED (20 rows) so the interpreted
    fold over the full embedding table runs once — the pure-SQL form
    re-derives the pool at every one of its ~2k CTE references (Spark
    CTEs are not materialized), measured 9 s vs <1 s at sf0.1. Cosines
    go through :func:`pair_dot` (Arrow-batched, bit-identical to the
    SQL fold), so the DuckDB oracle built from ``_mmr_sql`` still
    hash-matches. Lambda constants are written literally (0.7 / 0.3):
    computing ``1 - lam`` in Python would yield 0.30000000000000004 and
    break IEEE parity with the oracle's literal."""
    from aws_etl_spark.similarity.topk import pair_dot

    e = F.col("embedding")
    qv = emb.filter(F.col("vec_id") == query_id).select(
        e.alias("qemb"),
        F.sqrt(pair_dot(e, e)).alias("qnrm"),
    )
    scored = (
        emb.filter(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "embedding",
            F.sqrt(pair_dot(e, e)).alias("nrm"),
            (
                pair_dot(e, F.col("qemb"))
                / (F.sqrt(pair_dot(e, e)) * F.col("qnrm"))
            ).alias("rel"),
        )
    )
    # The relevance cut (the one data-sized pass) stays distributed;
    # the greedy selection then touches only the pool_n collected rows
    # — a CONSTANT-bounded working set (P=20 rows x d doubles), so it
    # runs on the driver (round-13 optimization; the bounded-collect
    # pattern of the k-means centroid rounds). Replaces k-1
    # localCheckpoint'd 1-row Spark jobs (measured 2.1-4.2 s of pure
    # job latency at sf0.1) with microseconds of Python. Bit-parity
    # with the unrolled-CTE oracle holds because every float op is
    # replicated exactly: the sequential-fold dot (pair_dot's own
    # accumulation order), cos = dot/(nrm*nrm), score = 0.7*rel -
    # 0.3*red as single IEEE ops over collected (exact) doubles, MAX
    # and the (score DESC, vec_id) tie-break order-independent.
    from pyspark.sql import types as T

    pool_rows = scored.orderBy(F.desc("rel"), "vec_id").limit(pool_n).collect()

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    chosen = []  # (step, vec_id, rel, red, score)
    acc_sel = []  # (vec_id, embedding, nrm)
    if pool_rows:
        # step 1: ORDER BY rel DESC, vec_id LIMIT 1
        first = min(pool_rows, key=lambda r: (-r["rel"], r["vec_id"]))
        chosen.append(
            (1, first["vec_id"], first["rel"], None, 0.7 * first["rel"])
        )
        acc_sel.append((first["vec_id"], first["embedding"], first["nrm"]))
    for step in range(2, k + 1):
        taken = {v for v, _, _ in acc_sel}
        best = None
        for r in pool_rows:
            if r["vec_id"] in taken:
                continue
            red = max(
                fold_dot(r["embedding"], s_emb) / (r["nrm"] * s_nrm)
                for _, s_emb, s_nrm in acc_sel
            )
            score = 0.7 * r["rel"] - 0.3 * red
            key = (-score, r["vec_id"])
            if best is None or key < best[0]:
                best = (key, r, red, score)
        if best is None:
            # pool exhausted before k picks — the unrolled plan's
            # later sel_i CTEs are empty rows, so later steps simply
            # do not appear
            break
        _, r, red, score = best
        chosen.append((step, r["vec_id"], r["rel"], red, score))
        acc_sel.append((r["vec_id"], r["embedding"], r["nrm"]))

    id_type = emb.schema["vec_id"].dataType
    from aws_etl_spark.ops.scale import bounded_rows_df

    return bounded_rows_df(
        emb.sparkSession,
        chosen,
        T.StructType(
            [
                T.StructField("step", T.IntegerType(), False),
                T.StructField("vec_id", id_type, True),
                T.StructField("relevance", T.DoubleType(), True),
                T.StructField("redundancy", T.DoubleType(), True),
                T.StructField("mmr_score", T.DoubleType(), True),
            ]
        ),
    )


@register(
    "similarity_mmr_rerank",
    oracle=_mmr_sql(_duck_fold_dot),
    category="similarity",
    tables=("embeddings",),
)
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance diverse top-5 over a top-20
    relevance pool (lambda=0.7): the RAG/retrieval re-ranking step
    that trades relevance against redundancy. The greedy k-step
    selection is unrolled into one declarative plan; identical
    sequential-fold cosines end-to-end (pair_dot == list_dot_product)
    make the greedy algorithm itself hash-provable against the
    unrolled-CTE DuckDB oracle. Scale: after the top-P relevance cut
    (the ann_cosine_topk path at 100 TB), every greedy step touches
    only P cached rows x <=k selected — collect-free, O(k*P*d)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return mmr_rerank(emb, k=5, pool_n=20, query_id=0)


# --------------------------------------------------------------------------
# Distributed quantized-exact Gram matrix — the covariance/PCA/whitening
# primitive. The Spark side folds each partition into ONE d x d int64
# accumulator (numpy matmul per Arrow batch) and shuffles only
# partitions x d(d+1)/2 triangle rows; the oracle is the same
# quantization over an exploded self-join — algebraically identical
# integers, so the full matrix hash-matches bit for bit.
# --------------------------------------------------------------------------

_GRAM_ORACLE = """
WITH e AS (
  SELECT vec_id, r.i AS i,
         CAST(FLOOR(CAST(embedding[r.i] AS DOUBLE) * 1000) AS BIGINT) AS q
  FROM embeddings CROSS JOIN range(1, 1025) r(i)
  WHERE r.i <= LEN(embedding)
)
SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
       CAST(SUM(a.q * b.q) AS BIGINT) AS gram_q
FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY a.i, b.i
"""


@register(
    "embeddings_gram_matrix",
    oracle=_GRAM_ORACLE,
    category="similarity",
    tables=("embeddings",),
)
def q_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized-exact Gram matrix Xt X over the embedding corpus
    (upper triangle, 1-based (i, j, gram_q)) — the one-pass
    linear-algebra reduction behind covariance, PCA and whitening of
    a training-embedding table. Components quantize once
    (floor(x*1000): float->double widening exact, one IEEE multiply +
    floor per cell), then everything is integer multiply/add —
    bit-exact under any partitioning, any engine. Scale: each
    partition emits d(d+1)/2 partial rows no matter how many vectors
    it holds, so the only shuffle is a few MB of triangle partials
    even at 10^10 rows; the naive explode-join the oracle uses would
    shuffle N*d^2 rows. Overflow contract (|q| < 2^20, ~2^23 rows per
    accumulator, 10^10 unit-norm rows at the final sum) is
    runtime-enforced in the kernel."""
    from aws_etl_spark.similarity.gram import gram_matrix_quantized

    emb = load_table(spark, sf_dir, "embeddings")
    return gram_matrix_quantized(emb).select(
        F.col("i").cast("long").alias("i"),
        F.col("j").cast("long").alias("j"),
        "gram_q",
    )


@register(
    "embeddings_pca_power",
    oracle=__import__(
        "aws_etl_spark.similarity.pca", fromlist=["pca_power_oracle_sql"]
    ).pca_power_oracle_sql(),
    category="similarity",
    tables=("embeddings",),
)
def q_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal component of the embedding corpus by
    quantized-exact REPEATED SQUARING of the distributed Gram matrix
    (10 squarings ~ 1024 power steps; near-isotropic embedding
    spectra defeat plain power iteration). The corpus is touched
    exactly ONCE (the localCheckpoint-ed Gram reduction: one d x d
    int64 accumulator per partition, a few-MB triangle shuffle);
    every squaring then runs on the d^2 = 4096 Gram rows —
    data-size-independent, so 100 TB and 60 k rows pay identical
    per-step cost. Cosine vs numpy eigh >= 0.9999 at every sf
    (pinned in tests). Hash-provable: every float is a single IEEE
    op over exactly-equal int64s (casts round identically, max-norm
    needs no sqrt and no double summation), so the unrolled-CTE
    DuckDB oracle replays all squarings bit for bit. Past the first
    normalization |M| <= 1e6, so products are bounded by d*1e12 —
    no data-dependent overflow exists."""
    from aws_etl_spark.similarity.pca import pca_power_component

    emb = load_table(spark, sf_dir, "embeddings")
    return pca_power_component(emb)


# --------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection: d=64 -> k=16 with a seeded
# +-1 matrix derived from the shared md5 16-bit bucket (engine-portable,
# no RNG state). Components quantize once, so every projected cell is
# an exact integer sum — order-independent, hash-provable.
# --------------------------------------------------------------------------

def _rp_oracle() -> str:
    from aws_etl_spark.ops.corpus import duckdb_bucket_sql

    coin = duckdb_bucket_sql(
        "CONCAT(CAST(t.t AS VARCHAR), '_', CAST(d.i AS VARCHAR))"
    )
    return f"""
WITH e AS (
  SELECT vec_id, r.i AS i,
         CAST(FLOOR(CAST(embedding[r.i] AS DOUBLE) * 1000) AS BIGINT) AS q
  FROM embeddings CROSS JOIN range(1, 1025) r(i)
  WHERE r.i <= LEN(embedding)
),
d AS (SELECT DISTINCT i FROM e),
s AS (
  SELECT d.i, t.t,
         CASE WHEN ({coin} % 2) = 0 THEN 1 ELSE -1 END AS sgn
  FROM d CROSS JOIN range(0, 16) t(t)
)
SELECT e.vec_id, CAST(s.t AS BIGINT) AS t,
       CAST(SUM(e.q * s.sgn) AS BIGINT) AS y_q
FROM e JOIN s ON s.i = e.i
GROUP BY e.vec_id, s.t
"""


@register(
    "embeddings_random_projection",
    oracle=_rp_oracle(),
    category="similarity",
    tables=("embeddings",),
)
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss +-1 random projection d->16 — the
    dimensionality-reduction pass ANN/dedup pipelines run before
    index build (distance-preserving within (1 +- eps), 4x fewer
    dims). The sign matrix comes from the shared salted-md5 bucket
    (engine-portable, no RNG state to ship), built once from the
    distinct-dims spine and broadcast; components quantize once at
    1000 so each projected cell is an exact +-q_i integer sum —
    order-independent under any partitioning. Plan: posexplode ->
    broadcast sign join -> one map-side-combinable groupBy; shuffle
    is N*k rows (the OUTPUT size), never N*d*k."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.posexplode("embedding").alias("p", "v")
    ).select(
        "vec_id",
        (F.col("p") + 1).cast("long").alias("i"),
        F.floor(F.col("v").cast("double") * 1000).cast("long").alias("q"),
    )
    sgn = (
        e.select("i")
        .distinct()
        .select(
            "i",
            F.explode(F.sequence(F.lit(0), F.lit(15))).alias("t"),
        )
        .select(
            "i",
            F.col("t").cast("long").alias("t"),
            F.when(
                F.expr(
                    "CAST(CONV(SUBSTRING(MD5(CONCAT(CAST(t AS STRING), '_', "
                    "CAST(i AS STRING))), 1, 4), 16, 10) AS INT) % 2"
                )
                == 0,
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("sgn"),
        )
    )
    return (
        e.join(F.broadcast(sgn), "i")
        .groupBy("vec_id", "t")
        .agg(F.sum(F.col("q") * F.col("sgn")).alias("y_q"))
    )


# --------------------------------------------------------------------------
# Embedding isotropy audit — the corpus-level embedding-health check
# (Ethayarajh-style anisotropy: if all vectors share a dominant
# direction, mean pairwise cosine >> 0 and contrastive training /
# cosine ANN degrade). Identity: sum over ALL ordered pairs of
# dot(x_i, x_j) equals ||sum_i x_i||^2 - sum_i ||x_i||^2, so the mean
# pairwise dot needs only the per-dimension component sums and the
# total squared norm — two map-side-combined aggregations over one
# explode, no pair enumeration ever. On quantized components every
# input to the final IEEE chain is an exact BIGINT. Overflow bound:
# |q| <= scale=1000, so per-dim sums need n*scale < 2^31.5 per unit
# component — fine to ~10^15 rows for unit-norm embeddings; the
# squared dim-sum is the binding term, exact while n*scale < ~3e9
# (document: scale down for corpora beyond ~3e6 rows at scale 1000).
# --------------------------------------------------------------------------

def _isotropy_sql(comp: str) -> str:
    return f"""
WITH comp AS ({comp}),
dims AS (SELECT d, CAST(SUM(q) AS BIGINT) AS s FROM comp GROUP BY d),
tot AS (SELECT CAST(SUM(q * q) AS BIGINT) AS t FROM comp),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
ns AS (SELECT CAST(SUM(s * s) AS BIGINT) AS ss FROM dims)
SELECT nn.n AS n_vectors,
       tot.t AS sum_sq_norm_q,
       ns.ss AS norm_of_sum_sq,
       CAST(ns.ss - tot.t AS BIGINT) AS pair_dot_num_q,
       (CAST(ns.ss - tot.t AS DOUBLE) / (nn.n * (nn.n - 1)))
         / (CAST(tot.t AS DOUBLE) / nn.n) AS isotropy_ratio
FROM nn CROSS JOIN tot CROSS JOIN ns
"""


from aws_etl_spark.queries.registry import sql_query  # noqa: E402

sql_query(
    "embeddings_isotropy_audit",
    _isotropy_sql(
        "SELECT vec_id, pos AS d, "
        "CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS q "
        "FROM (SELECT vec_id, posexplode(embedding) AS (pos, x) "
        "FROM embeddings)"
    ),
    oracle=_isotropy_sql(
        "SELECT vec_id, generate_subscripts(embedding, 1) AS d, "
        "CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q "
        "FROM embeddings"
    ),
    category="similarity",
    doc=(
        "Corpus anisotropy audit: mean pairwise dot over ALL ordered "
        "vector pairs via the ||sum x||^2 - sum ||x||^2 identity — "
        "two grouped integer aggregations over one component explode, "
        "never a pair join; isotropy_ratio = mean pair dot / mean "
        "squared norm as a single IEEE chain over exact BIGINTs. "
        "The 1-row cross joins are broadcast-scalar normalizers."
    ),
    tables=("embeddings",),
)


# --------------------------------------------------------------------------
# Centroid-distance outlier pruning — the curation pass that drops the
# farthest examples from each class prototype (mislabeled / off-
# distribution candidates) before training. Division-free exactness:
# with q the 1e-6-quantized vector, s the label's component sum and n
# its count, n^2 * ||x - centroid||^2 == sum_dim (n*q - s)^2 exactly,
# and the (label)-monotone n^2 factor never reorders ranks within a
# label — so the top-5 per label is decided by exact DECIMAL integers,
# no IEEE op anywhere. Shuffle inventory: one map-side-combined
# (label, dim) reduce, one broadcast join of the tiny (labels x d)
# stats back onto the exploded corpus, one per-vector reduce, then a
# label-partitioned top-5 rank window (parallelism grows with labels).
# --------------------------------------------------------------------------

_OUTLIER_ORACLE = """
WITH e AS (
  SELECT vec_id, label, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
),
q AS (
  SELECT vec_id, label, dim,
         CAST(FLOOR(CAST(v AS DOUBLE) * 1e6) AS BIGINT) AS q6
  FROM e
),
s AS (SELECT label, dim, CAST(SUM(q6) AS BIGINT) AS s FROM q GROUP BY label, dim),
c AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM embeddings GROUP BY label),
d AS (
  SELECT q.vec_id, q.label,
         SUM(CAST(c.n * q.q6 - s.s AS HUGEINT)
             * CAST(c.n * q.q6 - s.s AS HUGEINT)) AS d2
  FROM q
  JOIN s ON s.label = q.label AND s.dim = q.dim
  JOIN c ON c.label = q.label
  GROUP BY q.vec_id, q.label
),
r AS (
  SELECT vec_id, label, d2,
         CAST(ROW_NUMBER() OVER (PARTITION BY label
              ORDER BY d2 DESC, vec_id) AS BIGINT) AS rnk
  FROM d
)
SELECT CAST(label AS BIGINT) AS label, vec_id,
       CAST(d2 AS DOUBLE) AS d2_scaled, rnk
FROM r WHERE rnk <= 5
"""


@register(
    "embeddings_outlier_prune",
    oracle=_OUTLIER_ORACLE,
    category="similarity",
    tables=("embeddings",),
)
def q_embeddings_outlier_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 centroid-distance outliers per label (module comment
    above): the prune list a curation pipeline feeds back as
    mislabeled/off-distribution candidates. d2_scaled = n_label^2 *
    quantized squared distance — ranks decided on the exact DECIMAL /
    HUGEINT integer, cast to double only at the output boundary (the
    identical round-to-nearest both engines apply to exact ints)."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.select("vec_id", "label", F.posexplode("embedding").alias("pos", "val"))
        .select(
            "vec_id",
            "label",
            (F.col("pos") + 1).alias("dim"),
            F.floor(F.col("val").cast("double") * F.lit(1e6))
            .cast("long")
            .alias("q6"),
        )
    )
    sums = q.groupBy("label", "dim").agg(F.sum("q6").alias("s"))
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("n"))
    dev = (F.col("n") * F.col("q6") - F.col("s")).cast("decimal(19,0)")
    d2 = (
        q.join(F.broadcast(sums), ["label", "dim"])
        .join(F.broadcast(counts), "label")
        .select("vec_id", "label", (dev * dev).alias("sq"))
        .groupBy("vec_id", "label")
        .agg(F.sum("sq").alias("d2"))
    )
    w = Window.partitionBy("label").orderBy(F.col("d2").desc(), F.col("vec_id"))
    return (
        d2.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 5)
        .select(
            F.col("label").cast("bigint").alias("label"),
            "vec_id",
            F.col("d2").cast("double").alias("d2_scaled"),
            "rnk",
        )
    )


# --------------------------------------------------------------------------
# Supervised class-separation audit (two-class Fisher ratio per
# dimension): how well each embedding dimension separates label 0
# from label 1 — (mean gap)^2 / (within-class scatter). The complement
# of the geometry-only isotropy audit: it needs labels. Division-free
# exactness: with q the 1e-3-quantized component, n/S1/S2 the exact
# per-(dim,label) count/sum/sum-of-squares, multiply every mean and
# variance through by the class sizes:
#     num   = (S1a*nb - S1b*na)^2
#     den   = nb^2*(na*S2a - S1a^2) + na^2*(nb*S2b - S1b^2)
# — all DECIMAL integer algebra (two-factor products only, each factor
# re-based to DECIMAL(18,0); exact while class sizes stay under ~1e6
# at this quantization — beyond that, lower the quantization scale),
# then ONE double division at the output boundary. Plan: one component
# explode filtered to the two classes, one (dim,label) grouped agg
# (map-side combined, 128 rows), a 64-row self-join — nothing scales
# with corpus size after the first agg.
# --------------------------------------------------------------------------

def _fisher_sql(exp: str) -> str:
    return f"""
WITH e AS ({exp}),
stats AS (
  SELECT d, label,
         CAST(COUNT(*) AS DECIMAL(18,0)) AS n,
         CAST(SUM(q) AS DECIMAL(18,0)) AS s1,
         CAST(SUM(q * q) AS DECIMAL(18,0)) AS s2
  FROM e WHERE label IN (0, 1) GROUP BY d, label
),
ab AS (
  SELECT a.d,
         a.n AS na, a.s1 AS s1a, a.s2 AS s2a,
         b.n AS nb, b.s1 AS s1b, b.s2 AS s2b
  FROM stats a JOIN stats b
    ON a.d = b.d AND a.label = 0 AND b.label = 1
),
parts AS (
  SELECT d,
         CAST(s1a * nb - s1b * na AS DECIMAL(18,0)) AS gap,
         CAST(na * s2a - s1a * s1a AS DECIMAL(18,0)) AS wa,
         CAST(nb * s2b - s1b * s1b AS DECIMAL(18,0)) AS wb,
         CAST(na * na AS DECIMAL(18,0)) AS na2,
         CAST(nb * nb AS DECIMAL(18,0)) AS nb2
  FROM ab
),
fin AS (
  SELECT d, gap * gap AS num, nb2 * wa + na2 * wb AS den FROM parts
)
SELECT CAST(d AS BIGINT) AS d,
       CASE WHEN den = 0 THEN 0.0
            ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END
         AS fisher_ratio
FROM fin
"""


sql_query(
    "embeddings_fisher_separation",
    _fisher_sql(
        "SELECT label, pos + 1 AS d, "
        "CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS q "
        "FROM (SELECT label, posexplode(embedding) AS (pos, x) "
        "FROM embeddings)"
    ),
    oracle=_fisher_sql(
        "SELECT label, generate_subscripts(embedding, 1) AS d, "
        "CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q "
        "FROM embeddings"
    ),
    category="similarity",
    doc=(
        "Two-class Fisher separation per embedding dimension "
        "(labels 0 vs 1): squared mean gap over summed within-class "
        "scatter, computed division-free on exact DECIMAL integers "
        "with one IEEE division at the boundary. The supervised "
        "feature-audit complement to the isotropy (geometry) audit — "
        "flags which dimensions carry label signal before training a "
        "probe."
    ),
    tables=("embeddings",),
)


# --------------------------------------------------------------------------
# ANN recall@k evaluation (round 9, queued for the r10 window): the
# quality number every approximate index is judged by, as a registry
# row — per query point, |LSH top-5 ∩ exact top-5| / 5 for the
# production 32-bit×8-band parameterization. Both legs are already
# hash-proven queries (ann_cosine_topk_exact, ann_cosine_topk_lsh);
# this row eval-joins them on ids only, so the oracle is the literal
# composition of their two oracle texts — doubles never enter the
# join or the recall ratio (exact-int hit counts, one boundary
# division). The in-repo recall GATE (tests/test_similarity.py)
# asserts a floor; this row publishes the measured value per query.
# --------------------------------------------------------------------------

_ANN_RECALL_ORACLE = f"""
WITH exact_r AS (
  SELECT query_id, neighbor_id FROM ({_TOPK_ORACLE}) x
),
lsh_r AS (
  SELECT query_id, neighbor_id FROM ({_lsh_exact_oracle(bits=32, bands=8)}) y
)
SELECT e.query_id,
       CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits,
       CAST(COUNT(*) AS BIGINT) AS k,
       CAST(COUNT(l.neighbor_id) AS DOUBLE) / COUNT(*) AS recall_at_k
FROM exact_r e
LEFT JOIN lsh_r l
  ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
GROUP BY e.query_id
"""


@register(
    "embeddings_ann_recall",
    oracle=_ANN_RECALL_ORACLE,
    category="similarity",
    tables=("embeddings",),
)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the production sign-LSH ANN vs the exact top-5,
    per query point — id-only eval join of two hash-proven legs."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 20")
    exact = cosine_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    lsh = (
        cosine_topk_lsh(emb, queries, k=5)
        .select(
            F.col("query_id").alias("l_qid"),
            F.col("neighbor_id").alias("l_nid"),
        )
    )
    return (
        exact.join(
            lsh,
            (F.col("query_id") == F.col("l_qid"))
            & (F.col("neighbor_id") == F.col("l_nid")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("l_nid").cast("bigint").alias("n_hits"),
            F.count("*").cast("bigint").alias("k"),
            (F.count("l_nid").cast("double") / F.count("*")).alias(
                "recall_at_k"
            ),
        )
    )


# --------------------------------------------------------------------------
# k-center greedy diversity sampling (round 10, queued for the r11
# window): farthest-point coreset selection (Gonzalez 1985) — the
# data-curation primitive that picks k examples COVERING the
# embedding space instead of k random ones oversampling dense
# regions. Fully hash-provable: quantized integer distances, argmax
# tiebroken on smallest id, integer LEAST for the running
# min-distance; the oracle unrolls the k rounds as MATERIALIZED CTEs
# (the kmeans/markov convention). When the corpus has fewer than k
# points the trace repeats the seed with dist 0 — identically on
# both engines (all-zero argmax ties resolve to the smallest id).
# --------------------------------------------------------------------------

_KCENTER_K = 6


def _kcenter_oracle(k: int) -> str:
    dist = (
        "SELECT e.id, SUM((e.q - c.q) * (e.q - c.q)) AS d\n"
        "    FROM ex e JOIN ex c ON c.dim = e.dim AND c.id = ({center})\n"
        "    GROUP BY e.id"
    )
    parts = [
        f"""
m1 AS MATERIALIZED (
  {dist.format(center="SELECT MIN(id) FROM ex")}
)"""
    ]
    for r in range(2, k + 1):
        parts.append(f"""
p{r} AS MATERIALIZED (
  SELECT id, d FROM m{r - 1} ORDER BY d DESC, id ASC LIMIT 1
)""")
        if r < k:
            parts.append(f"""
m{r} AS MATERIALIZED (
  SELECT m.id, LEAST(m.d, x.d) AS d
  FROM m{r - 1} m JOIN (
    {dist.format(center=f"SELECT id FROM p{r}")}
  ) x ON x.id = m.id
)""")
    selects = [
        "SELECT CAST(1 AS BIGINT) AS sel_order,"
        " CAST((SELECT MIN(id) FROM ex) AS BIGINT) AS vec_id,"
        " CAST(0 AS BIGINT) AS dist_q"
        " WHERE (SELECT COUNT(*) FROM ex) > 0"
    ]
    for r in range(2, k + 1):
        selects.append(
            f"SELECT CAST({r} AS BIGINT),"
            f" CAST((SELECT id FROM p{r}) AS BIGINT),"
            f" CAST((SELECT d FROM p{r}) AS BIGINT)"
            " WHERE (SELECT COUNT(*) FROM ex) > 0"
        )
    return f"""
WITH ex AS MATERIALIZED (
  SELECT vec_id AS id, generate_subscripts(embedding, 1) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT)
           + 2000000 AS q
  FROM embeddings
),{",".join(parts)}
{" UNION ALL ".join(selects)}
ORDER BY sel_order
"""


@register(
    "embeddings_kcenter_diverse",
    oracle=_kcenter_oracle(_KCENTER_K),
    category="similarity",
    tables=("embeddings",),
)
def q_kcenter_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-center greedy diversity sampling (k=6): farthest-point
    coreset selection with exact quantized integer distances —
    returns the selection trace (order, id, distance-to-selected at
    pick time). Per round: one broadcast of the new center's d
    components, one grouped distance agg, one integer LEAST merge —
    linear per round, no pairwise blow-up; only the 1-row argmax is
    collected (bounded driver work, the markov/IVF-seed convention)."""
    from aws_etl_spark.similarity.kcenter import kcenter_greedy_quantized

    emb = load_table(spark, sf_dir, "embeddings")
    return kcenter_greedy_quantized(emb, k=_KCENTER_K)


# --------------------------------------------------------------------------
# Simplified silhouette per label (round 11 late batch, queued for the
# r12 window): label_centroids reads how close class PROTOTYPES are;
# the silhouette reads the per-VECTOR verdict — "is each embedding
# closer to its own label's centroid than to the nearest other" — the
# standard cluster-quality audit (the simplified/centroid variant, the
# one that scales: a(i) and b(i) are centroid distances, never the
# O(n^2) pairwise means). Exactness: components quantize to 1e-6
# integers (the dim-stats idiom); squared centroid distances use the
# count-scaled identity dist^2 * cnt^2 = sum_d (q6*cnt - S_d)^2 — an
# exact DECIMAL(38,0) per (vector, label) — so the only IEEE ops are
# one SQRT/cnt chain per candidate label, the (b-a)/max(a,b) per
# vector (nano-quantized before the order-free per-label sum), and
# the final mean division. Degenerates in integer space: a single
# label (b undefined) or a zero max(a,b) pin s to 0.
# Scale: the join is vectors x dims x labels — linear in the corpus
# with a bounded label fan-out; one staged embeddings scan.
# Contract: (q6*cnt)^2 * dims < 1e38 (cnt to ~1e9 at 64 dims).
# --------------------------------------------------------------------------

_SIL_Q_SPARK = """
SELECT vec_id, CAST(label AS BIGINT) AS label, pos + 1 AS dim,
       CAST(FLOOR(CAST(col AS DOUBLE) * 1000000) AS BIGINT) AS q6
FROM (SELECT vec_id, label, posexplode(embedding) FROM embeddings)
"""

_SIL_Q_DUCK = """
SELECT vec_id, CAST(label AS BIGINT) AS label,
       generate_subscripts(embedding, 1) AS dim,
       CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
         AS q6
FROM embeddings
"""

_SIL_C = """
SELECT label, dim, CAST(SUM(q6) AS BIGINT) AS s,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM {q} GROUP BY label, dim
"""


def _silhouette_tail(q: str, c: str) -> str:
    diff = "CAST(q.q6 * c.cnt - c.s AS DECIMAL(19,0))"
    return f"""
WITH d AS (
  SELECT q.vec_id, q.label AS own_label, c.label AS cand_label,
         CAST(MAX(c.cnt) AS BIGINT) AS cnt,
         CAST(SUM({diff} * {diff}) AS DECIMAL(38,0)) AS num
  FROM {q} q JOIN {c} c ON c.dim = q.dim
  GROUP BY q.vec_id, q.label, c.label
),
dist AS (
  SELECT vec_id, own_label, cand_label,
         SQRT(CAST(num AS DOUBLE)) / CAST(cnt AS DOUBLE) AS dist
  FROM d
),
ab AS (
  SELECT vec_id, own_label,
         MAX(CASE WHEN cand_label = own_label THEN dist END) AS a,
         MIN(CASE WHEN cand_label <> own_label THEN dist END) AS b
  FROM dist GROUP BY vec_id, own_label
),
sq AS (
  SELECT vec_id, own_label,
         CASE WHEN b IS NULL OR GREATEST(a, b) = CAST(0 AS DOUBLE)
              THEN CAST(0 AS BIGINT)
              ELSE CAST(FLOOR((b - a) / GREATEST(a, b)
                              * CAST(1000000000 AS DOUBLE)) AS BIGINT)
         END AS s_q
  FROM ab
)
SELECT own_label AS label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       (CAST(SUM(s_q) AS DOUBLE) / CAST(1000000000 AS DOUBLE))
         / CAST(COUNT(*) AS DOUBLE) AS mean_silhouette
FROM sq GROUP BY own_label ORDER BY own_label
"""


def _register_silhouette() -> None:
    from aws_etl_spark.queries.registry import staged_sql_query

    duck_tail = _silhouette_tail("qv", "cv")
    assert duck_tail.startswith("\nWITH ")
    staged_sql_query(
        "embeddings_silhouette",
        ops=(
            ("view", "sil_q", _SIL_Q_SPARK),
            ("view", "sil_c", _SIL_C.format(q="sil_q")),
        ),
        final=_silhouette_tail("sil_q", "sil_c"),
        oracle=(
            f"WITH qv AS ({_SIL_Q_DUCK}),\n"
            f"cv AS ({_SIL_C.format(q='qv')}),\n"
            + duck_tail[len("\nWITH ") :]
        ),
        category="similarity",
        doc=(
            "Simplified (centroid) silhouette per label: 1e-6 "
            "component quantization, exact DECIMAL(38,0) squared "
            "centroid distances via the count-scaled identity, one "
            "SQRT chain per candidate label, per-vector scores "
            "nano-quantized before order-free per-label means; "
            "single-label and zero-distance degenerates pinned to 0 "
            "in integer space. One staged embeddings scan; the join "
            "fan-out is vectors x dims x labels (bounded labels)."
        ),
        tables=("embeddings",),
    )


_register_silhouette()


# --------------------------------------------------------------------------
# Participation ratio — closed-form effective dimensionality (round 12
# late batch, queued for the r13 window): the PCA query extracts the
# DOMINANT direction and the isotropy audit reads the extremes; the
# participation ratio PR = tr(C)^2 / tr(C^2) is the single-number
# effective-dimension readout (PR = d for isotropic, -> 1 for rank-1
# collapse) that needs NO eigensolve at all — both traces are closed
# forms of the covariance entries. Spark computes the second moments
# with the partition-folding Gram kernel (the gram_matrix_quantized
# 100 TB shape: one d x d int64 accumulator per partition, a
# triangle-row shuffle), per-dimension sums ride one narrow
# posexplode agg, and n is one counted scalar; covariance cells
# num_ij = n*P_ij - S_i*S_j are exact BIGINTs (contract:
# n^2 * q_bar^2 < 9.2e18 => n <= ~3e6 at the unit-norm 1e3
# quantization; the kernel's own overflow rails cover P_ij). The two
# traces quantize per cell before order-free sums (FLOOR(c*1e6) for
# tr, FLOOR(c^2*1e3) with the symmetric x2 multiplier for tr(C^2) —
# unit-norm rows bound the sums at ~1e15), PR is one IEEE division.
# The DuckDB oracle is the same quantization over the explode
# self-join (the embeddings_gram_matrix oracle pattern).
# --------------------------------------------------------------------------

_PR_ORACLE = """
WITH e AS (
  SELECT vec_id, r.i AS i,
         CAST(FLOOR(CAST(embedding[r.i] AS DOUBLE) * 1000) AS BIGINT) AS q
  FROM embeddings CROSS JOIN range(1, 1025) r(i)
  WHERE r.i <= LEN(embedding)
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
s AS (SELECT i, CAST(SUM(q) AS BIGINT) AS s_i FROM e GROUP BY i),
p AS (
  SELECT a.i, b.i AS j, CAST(SUM(a.q * b.q) AS BIGINT) AS pq
  FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY a.i, b.i
),
c AS (
  SELECT p.i, p.j,
         CAST(nn.n * p.pq - sa.s_i * sb.s_i AS DOUBLE)
           / (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)) AS cv
  FROM p JOIN s sa ON sa.i = p.i JOIN s sb ON sb.i = p.j CROSS JOIN nn
),
t AS (
  SELECT CAST(MAX(j) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN i = j THEN CAST(FLOOR(cv * 1000000) AS BIGINT)
                       ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS tr_q,
         CAST(SUM((CASE WHEN i = j THEN 1 ELSE 2 END)
                  * CAST(FLOOR(cv * cv * 1000) AS BIGINT)) AS BIGINT)
           AS tr2_q
  FROM c
)
SELECT nn.n AS n_vectors, t.d AS n_dims,
       CAST(t.tr_q AS DOUBLE) / CAST(1000000 AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS trace_cov,
       CASE WHEN t.tr2_q <= 0 THEN CAST(0 AS DOUBLE)
            ELSE (CAST(t.tr_q AS DOUBLE) / CAST(1000000 AS DOUBLE))
                 * (CAST(t.tr_q AS DOUBLE) / CAST(1000000 AS DOUBLE))
                 / (CAST(t.tr2_q AS DOUBLE) / CAST(1000 AS DOUBLE))
       END AS participation_ratio
FROM t CROSS JOIN nn
"""


@register(
    "embeddings_participation_ratio",
    oracle=_PR_ORACLE,
    category="similarity",
    tables=("embeddings",),
)
def q_participation_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Participation ratio tr(C)^2/tr(C^2) of the embedding covariance
    — closed-form effective dimensionality, no eigensolve. Second
    moments from the partition-folding Gram kernel (triangle-row
    shuffle, the 100 TB shape), dimension sums from one narrow
    posexplode agg, n one counted scalar; covariance cells exact
    BIGINTs, traces quantized per cell before order-free sums, PR one
    IEEE division. Hash-matches the explode-self-join DuckDB oracle
    because every integer is algebraically identical."""
    from aws_etl_spark.similarity.gram import gram_matrix_quantized

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()  # bounded driver scalar (the staged-literal idiom)
    g = gram_matrix_quantized(emb)
    q = F.floor(F.col("val").cast("double") * F.lit(1000)).cast("long")
    s = (
        emb.select(F.posexplode("embedding").alias("pos", "val"))
        .select((F.col("pos") + 1).cast("long").alias("i"), q.alias("q"))
        .groupBy("i")
        .agg(F.sum("q").alias("s_i"))
    )
    sa = s.select(F.col("i").alias("i_a"), F.col("s_i").alias("s_a"))
    sb = s.select(F.col("i").alias("i_b"), F.col("s_i").alias("s_b"))
    cells = (
        g.join(F.broadcast(sa), g.i == sa.i_a)
        .join(F.broadcast(sb), g.j == sb.i_b)
        .select(
            "i",
            "j",
            (
                (F.lit(n) * F.col("gram_q") - F.col("s_a") * F.col("s_b"))
                .cast("double")
                / F.lit(float(n) * float(n))
            ).alias("cv"),
        )
    )
    t = cells.agg(
        F.max("j").cast("long").alias("d"),
        F.sum(
            F.when(
                F.col("i") == F.col("j"),
                F.floor(F.col("cv") * F.lit(1000000.0)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        ).cast("long").alias("tr_q"),
        F.sum(
            F.when(F.col("i") == F.col("j"), F.lit(1))
            .otherwise(F.lit(2))
            .cast("long")
            * F.floor(F.col("cv") * F.col("cv") * F.lit(1000.0)).cast("long")
        ).cast("long").alias("tr2_q"),
    )
    return t.select(
        F.lit(n).cast("long").alias("n_vectors"),
        F.col("d").alias("n_dims"),
        (F.col("tr_q").cast("double") / F.lit(1e6) / F.lit(1e6)).alias(
            "trace_cov"
        ),
        F.when(F.col("tr2_q") <= 0, F.lit(0.0))
        .otherwise(
            (F.col("tr_q").cast("double") / F.lit(1e6))
            * (F.col("tr_q").cast("double") / F.lit(1e6))
            / (F.col("tr2_q").cast("double") / F.lit(1e3))
        )
        .alias("participation_ratio"),
    )
