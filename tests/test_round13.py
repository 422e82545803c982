"""Round-13 engine-hardening checks.

1. ml_pauc_fpr10 budget-literal derivation (r12 verdict item 4): the
   three budget-dependent literals in the tail must all derive from
   the single _PAUC_FPR_BUDGET Fraction and satisfy 1/c, c^2/2 and
   c - c^2/2 exactly — editing any one alone stayed hash-green in r12
   (both engines share the text) while silently computing a different
   metric than documented.
2. The driver-order window math for the r13 rotation.
"""

from __future__ import annotations

from fractions import Fraction

from aws_etl_spark.queries import ml_queries
from aws_etl_spark.queries.registry import (
    REGISTRY,
    _DRIVER_ORDER,
    _driver_sorted,
    _ensure_loaded,
)
from aws_etl_spark.queries.sql_seams import duck_declared

_ensure_loaded()


def test_pauc_literals_derive_from_one_budget():
    c = ml_queries._PAUC_FPR_BUDGET
    assert isinstance(c, Fraction)
    tail = ml_queries._pauc_tail("g", duck_declared)
    inv = 1 / c
    assert inv.denominator == 1
    # the budget row count N * c is written as N / (1/c)
    assert f"/ CAST({inv.numerator} AS DOUBLE)" in tail
    # McClish standardization bounds: lower = c^2/2, span = c - c^2/2
    lower = ml_queries._exact_decimal(c * c / 2)
    span = ml_queries._exact_decimal(c - c * c / 2)
    assert f"- CAST({lower} AS DOUBLE))" in tail
    assert f"/ CAST({span} AS DOUBLE))" in tail
    # the pinned relationship at the shipped budget c = 1/10 — the
    # exact literals the r12 evidence was certified against
    if c == Fraction(1, 10):
        assert (inv.numerator, lower, span) == (10, "0.005", "0.095")


def test_exact_decimal_rendering():
    f = ml_queries._exact_decimal
    assert f(Fraction(1, 200)) == "0.005"
    assert f(Fraction(19, 200)) == "0.095"
    assert f(Fraction(1, 4)) == "0.25"
    assert f(Fraction(3, 1)) == "3"
    assert f(Fraction(1, 8)) == "0.125"
    try:
        f(Fraction(1, 3))
        raised = False
    except AssertionError:
        raised = True
    assert raised, "non-terminating decimal must refuse to render"


def test_r14_driver_window_math():
    """Round-14 rotation (r13 verdict item 10): block 1 = the 4
    round-13 late additions (never driver-checked), block 2 = this
    round's rewrites + every r13-optimizer-touched name without a
    driver hash row, block 3 = r7-vintage re-confirmations; every
    ranked name exists, and rows-only names inside the window are the
    three contract-documented ones."""
    assert len(_DRIVER_ORDER) == 50
    window = _driver_sorted(list(REGISTRY))[:50]
    late_r13_additions = (
        "events_markov_entropy_chunked",
        "text_repetition_profile",
        "stat_tukey_fences",
        "events_sessionization_chunked",
    )
    assert tuple(window[:4]) == late_r13_additions
    # this round's riskiest rewrites are driver-visible
    assert {
        "dedup_clusters_cc", "corpus_split_leakage",
        "dedup_ngram_jaccard", "customers_golden_record",
        "join_fuzzy_blocked", "dedup_containment",
    } <= set(window)
    rows_only_in_window = {
        n for n in window if REGISTRY[n].oracle is None
    }
    assert rows_only_in_window == {
        "ann_cosine_topk_ivf", "dedup_semantic", "dedup_graph_pagerank"
    }
    for name in _DRIVER_ORDER:
        assert name in REGISTRY
        assert REGISTRY[name].oracle is not None or name in window
