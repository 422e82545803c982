"""Dup-graph structure queries: triangles, neighborhood similarity,
label-propagation communities — all exact and DuckDB-oracled.

Complements dedup_queries' CC/PageRank family (SURVEY.md §2.13 graph
extensions). Edges come from the EXACT bucketed shingle self-join
(ngram_jaccard_pairs) rather than LSH: like dedup_graph_degrees,
these metrics are sensitive to every individual edge, so a
probabilistically missed borderline pair would break oracle parity.
The oracles re-derive the same edge list in SQL and evaluate the
graph metric relationally (label propagation unrolled as fixed-round
CTEs — the pagerank_exact trick applied to community detection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_spark.dedup.graph_metrics import (
    label_propagation,
    neighborhood_jaccard,
    triangle_counts,
)
from aws_etl_spark.dedup.jaccard import ngram_jaccard_pairs
from aws_etl_spark.queries.dedup_queries import _JACCARD_ORACLE
from aws_etl_spark.queries.registry import load_table, register


def _edge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5).select(
        "id_a", "id_b"
    )


_TRIANGLE_ORACLE = f"""
WITH pairs AS ({_JACCARD_ORACLE}),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs),
sym AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY u),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.v
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
),
pn AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
),
tc AS (SELECT node, COUNT(*) AS triangles FROM pn GROUP BY node)
SELECT CAST(d.u AS BIGINT) AS node,
       CAST(d.deg AS BIGINT) AS degree,
       CAST(COALESCE(tc.triangles, 0) AS BIGINT) AS triangles
FROM deg d LEFT JOIN tc ON tc.node = d.u
"""


@register(
    "dedup_graph_triangles",
    oracle=_TRIANGLE_ORACLE,
    category="graph",
    tables=("documents",),
)
def q_dedup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the near-dup graph — the
    clique-density signal separating true boilerplate families
    (near-cliques) from template-drift chains. Degree-ordered
    compact-forward orientation bounds wedge fanout at hub nodes
    (O(E^1.5), skew-immune); the oracle enumerates each triangle once
    via the u<v canonical edge list."""
    return triangle_counts(_edge_pairs(spark, sf_dir))


_NBR_JACCARD_ORACLE = f"""
WITH pairs AS ({_JACCARD_ORACLE}),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs),
sym AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY u),
common AS (
  SELECT l.u AS id_a, r.u AS id_b, COUNT(*) AS n_common
  FROM sym l JOIN sym r ON l.v = r.v AND l.u < r.u
  GROUP BY l.u, r.u
)
SELECT CAST(c.id_a AS BIGINT) AS id_a,
       CAST(c.id_b AS BIGINT) AS id_b,
       CAST(c.n_common AS BIGINT) AS n_common,
       CAST(da.deg AS BIGINT) AS deg_a,
       CAST(db.deg AS BIGINT) AS deg_b,
       c.n_common * 1.0 / (da.deg + db.deg - c.n_common) AS nbr_jaccard
FROM common c
JOIN deg da ON da.u = c.id_a
JOIN deg db ON db.u = c.id_b
"""


@register(
    "dedup_graph_nbr_jaccard",
    oracle=_NBR_JACCARD_ORACLE,
    category="graph",
    tables=("documents",),
)
def q_dedup_graph_nbr_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order (neighbor-set) Jaccard for co-neighbor pairs —
    the link-prediction signal that heals threshold-boundary splits
    in dup families. Wedge join over the symmetrized edge list +
    degree join; int/int double division is bit-deterministic.

    Runs THROUGH the mutual-top-k hub cap (the 100 TB skew defense)
    with a cap far above any test-scale degree, so the capped code
    path itself is what the oracle hash-verifies — the plain SQL is
    the uncapped metric, and cap ≥ max degree makes them identical
    (the cap-semantics unit tests pin the truncating case)."""
    return neighborhood_jaccard(_edge_pairs(spark, sf_dir), max_neighbors=10_000)


def _lpa_oracle(n_rounds: int) -> str:
    its = []
    for k in range(n_rounds):
        its.append(f"""
it{k + 1} AS (
  SELECT node, label FROM (
    SELECT e.u AS node, r.label AS label,
           ROW_NUMBER() OVER (
             PARTITION BY e.u
             ORDER BY COUNT(*) DESC, r.label ASC
           ) AS rn
    FROM sym e JOIN it{k} r ON e.v = r.node
    GROUP BY e.u, r.label
  ) WHERE rn = 1
)""")
    return f"""
WITH pairs AS ({_JACCARD_ORACLE}),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs),
sym AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
it0 AS (SELECT DISTINCT u AS node, u AS label FROM sym),{",".join(its)}
SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label
FROM it{n_rounds}
"""


@register(
    "dedup_graph_label_propagation",
    oracle=_lpa_oracle(4),
    category="graph",
    tables=("documents",),
)
def q_dedup_graph_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-round deterministic synchronous label propagation —
    community detection that does NOT transitively merge everything
    (unlike CC): one borderline edge can't glue two boilerplate
    families. Most-frequent-neighbor-label vote, ties to the smallest
    label; per round one join + one map-side-combinable argmax agg
    (max(struct(cnt, -label))), no windows. Oracle = the iteration
    unrolled as 4 CTE stages with ROW_NUMBER argmax — identical
    integer semantics."""
    return label_propagation(_edge_pairs(spark, sf_dir), n_rounds=4)


def _kcore_oracle(k: int, n_rounds: int) -> str:
    parts = []
    for r in range(1, n_rounds + 1):
        parts.append(f"""
d{r} AS (
  SELECT u, COUNT(*) AS c FROM (
    SELECT u, v FROM e{r - 1} UNION SELECT v, u FROM e{r - 1}
  ) GROUP BY u
),
k{r} AS (SELECT u FROM d{r} WHERE c >= {k}),
e{r} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{r - 1} e
  JOIN k{r} a ON e.u = a.u
  JOIN k{r} b ON e.v = b.u
)""")
    # e{r} is referenced three times per round (two degree scans +
    # the next filter); DuckDB inlines plain CTEs, which would
    # re-evaluate the expensive shingle join 3^n_rounds times —
    # MATERIALIZED pins each round's edge set (oracle-only keyword;
    # Spark-side rounds are localCheckpoint'ed for the same reason)
    return f"""
WITH pairs AS MATERIALIZED ({_JACCARD_ORACLE}),
e0 AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pairs),
s0 AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
deg0 AS (SELECT u, COUNT(*) AS deg FROM s0 GROUP BY u),{",".join(parts)},
fin AS (
  SELECT u FROM (
    SELECT u, COUNT(*) AS c FROM (
      SELECT u, v FROM e{n_rounds} UNION SELECT v, u FROM e{n_rounds}
    ) GROUP BY u
  ) WHERE c >= {k}
)
SELECT CAST(d.u AS BIGINT) AS node,
       CAST(d.deg AS BIGINT) AS degree,
       (f.u IS NOT NULL) AS in_core
FROM deg0 d LEFT JOIN fin f ON f.u = d.u
"""


@register(
    "dedup_graph_kcore",
    oracle=_kcore_oracle(2, 5),
    category="graph",
    tables=("documents",),
)
def q_dedup_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core membership after 5 synchronous peel rounds — separates
    structurally-dense dup families (every member ≥2 links) from
    pendant/bridge nodes that near-dup chains attach spuriously.
    Fixed-round contract makes the iterative peel hash-comparable
    (oracle = 5 unrolled CTE rounds); per round one degree agg + two
    semi-joins, lineage truncated per round."""
    from aws_etl_spark.dedup.graph_metrics import k_core_membership

    return k_core_membership(_edge_pairs(spark, sf_dir), k=2, n_rounds=5)
