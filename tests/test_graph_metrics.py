"""Unit tests for dup-graph structure metrics (graph_metrics.py) on
hand-computed graphs, plus span-dedup kernels (spans.py). The corpus
queries built on these are oracle-checked in test_oracle_corpus.py;
these tests pin the semantics on graphs small enough to verify by
hand."""

from __future__ import annotations

import pytest

from aws_etl_spark.dedup.graph_metrics import (
    label_propagation,
    neighborhood_jaccard,
    triangle_counts,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_triangle_counts_known_graph(spark):
    # K4 on {1,2,3,4} (4 triangles, each node in 3) plus pendant 5-1
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges.append((1, 5))
    out = {
        r["node"]: (r["degree"], r["triangles"])
        for r in triangle_counts(_pairs(spark, edges)).collect()
    }
    assert out == {
        1: (4, 3),
        2: (3, 3),
        3: (3, 3),
        4: (3, 3),
        5: (1, 0),
    }


def test_triangle_counts_orientation_invariance(spark):
    # same triangle regardless of the order/duplication pairs arrive in
    out = triangle_counts(
        _pairs(spark, [(2, 1), (3, 2), (1, 3), (3, 1)])
    ).collect()
    assert {r["triangles"] for r in out} == {1}
    assert {r["degree"] for r in out} == {2}


def test_neighborhood_jaccard_known_graph(spark):
    # path 1-2-3: nodes 1 and 3 share neighbor 2; N(1)={2}, N(3)={2}
    rows = neighborhood_jaccard(_pairs(spark, [(1, 2), (2, 3)])).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (1, 3)
    assert r["n_common"] == 1 and r["deg_a"] == 1 and r["deg_b"] == 1
    assert r["nbr_jaccard"] == pytest.approx(1.0)


def test_neighborhood_jaccard_counts_shared_only(spark):
    # square 1-2-3-4-1: opposite corners share both neighbors (J=1),
    # adjacent corners share none (no row)
    rows = neighborhood_jaccard(
        _pairs(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["nbr_jaccard"] for r in rows}
    assert set(got) == {(1, 3), (2, 4)}
    assert all(v == pytest.approx(1.0) for v in got.values())


def test_neighborhood_jaccard_cap_at_max_degree_is_exact(spark):
    # K4 + pendant (max degree 4): cap == max degree ⇒ identical output
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges.append((1, 5))
    base = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["deg_a"], r["deg_b"])
        for r in neighborhood_jaccard(_pairs(spark, edges)).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["deg_a"], r["deg_b"])
        for r in neighborhood_jaccard(
            _pairs(spark, edges), max_neighbors=4
        ).collect()
    }
    assert base == capped and len(base) > 0


def test_neighborhood_jaccard_hub_cap_bounds_wedges(spark):
    # star: hub 0 — leaves 1..10. Uncapped, the hub's wedge group is
    # all 10 leaves (C(10,2)=45 pairs). With mutual cap 3 the hub keeps
    # leaves {1,2,3} and only they keep the hub back, so exactly
    # C(3,2)=3 pairs survive — the cap provably bounds group width.
    edges = [(0, i) for i in range(1, 11)]
    uncapped = neighborhood_jaccard(_pairs(spark, edges)).collect()
    assert len(uncapped) == 45
    rows = neighborhood_jaccard(_pairs(spark, edges), max_neighbors=3).collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert got == {(1, 2), (1, 3), (2, 3)}
    # degrees come from the capped graph: each surviving leaf has
    # exactly one (mutual) neighbor, the hub
    assert all(r["deg_a"] == 1 and r["deg_b"] == 1 and r["n_common"] == 1 for r in rows)


def test_label_propagation_two_cliques(spark):
    # two triangles bridged by one edge: LPA keeps them as two
    # communities (CC would merge them) — labels = each clique's min id
    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    bridge = [(3, 10)]
    out = {
        r["node"]: r["label"]
        for r in label_propagation(
            _pairs(spark, tri1 + tri2 + bridge), n_rounds=4
        ).collect()
    }
    assert out[1] == out[2] == out[3]
    assert out[10] == out[11] == out[12]
    assert out[1] != out[10]


def test_spans_census_and_profile(spark):
    from aws_etl_spark.dedup.spans import doc_span_profile, duplicated_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),  # spans: "a b c d e", "b c d e f"
            (2, "a b c d e x"),  # shares "a b c d e"
            (3, "q r s t u v"),  # unique spans
            (4, "q"),  # shorter than k → no spans
        ],
        "doc_id long, text string",
    )
    census = {
        r["span"]: (r["n_docs"], r["n_occurrences"], r["first_doc"])
        for r in duplicated_spans(docs, k=5).collect()
    }
    assert census == {"a b c d e": (2, 2, 1)}

    prof = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_fraction"])
        for r in doc_span_profile(docs, k=5).collect()
    }
    assert prof[1] == (2, 1, pytest.approx(0.5))
    assert prof[2] == (2, 1, pytest.approx(0.5))
    assert prof[3] == (2, 0, pytest.approx(0.0))
    assert prof[4] == (0, 0, pytest.approx(0.0))


def test_k_core_peels_pendants_transitively(spark):
    from aws_etl_spark.dedup.graph_metrics import k_core_membership

    # triangle {1,2,3} + chain 3-4-5: 5 peels first, THEN 4 (its
    # degree only drops below 2 after 5 leaves) — needs >1 round,
    # which is exactly what the fixed-round synchronous peel covers
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    out = {
        r["node"]: (r["degree"], r["in_core"])
        for r in k_core_membership(
            _pairs(spark, edges), k=2, n_rounds=5
        ).collect()
    }
    assert out == {
        1: (2, True),
        2: (2, True),
        3: (3, True),
        4: (2, False),
        5: (1, False),
    }
