"""Edge-input DIFFERENTIAL tests for the round-9 queries: full
Spark-vs-DuckDB oracle comparisons (`oracle.check_query`) on crafted
parquet the synthetic corpus never produces — multi-paragraph and
duplicate-paragraph documents (the corpus has no newlines at all),
multibyte byte-length vs char-length splits, agreement groups where
the kappa pe=1 guard fires, single-day and even-pair-count Theil–Sen
spines, a dimension with zero bloom-join keys, and a vocabulary
smaller than every coverage K."""

from __future__ import annotations

import hashlib
import os

import pandas as pd

from aws_etl_spark.oracle import check_query

SF0001 = "/root/testdata/sf0.001"


def _mk_sf(tmp_path, **frames) -> str:
    from aws_etl_spark.queries.registry import ALL_TABLES

    d = tmp_path / "sf_edge"
    d.mkdir()
    for t in ALL_TABLES:
        os.symlink(f"{SF0001}/{t}.parquet", d / f"{t}.parquet")
    for t, pdf in frames.items():
        os.remove(d / f"{t}.parquet")
        pdf.to_parquet(d / f"{t}.parquet")
    return str(d)


def _docs(texts, doc_ids=None):
    ids = list(doc_ids) if doc_ids is not None else list(range(len(texts)))
    return pd.DataFrame(
        {
            "doc_id": ids,
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": [f"src{i % 3}" for i in range(len(texts))],
            "n_chars": [len(t) for t in texts],
        }
    )


def _events(rows):
    return pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]),
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [float(r[4]) for r in rows],
            "props": ["{}"] * len(rows),
        }
    )


def _coin(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:4], 16)


# -- text_paragraph_dup -------------------------------------------------------


def test_paragraph_dup_multi_paragraph_cross_engine(spark, tmp_path):
    """Cross-doc dup paragraphs, within-doc dup paragraphs,
    whitespace-only paragraphs (dropped), empty docs (no output row),
    and unicode paragraphs must hash-match — the branches the
    newline-free synthetic corpus never fires."""
    shared = "this paragraph appears in two documents"
    sf = _mk_sf(
        tmp_path,
        documents=_docs(
            [
                f"unique lead\n\n{shared}\n\ntrailing bit",
                f"{shared}\n\nanother unique paragraph",
                "twice inside\n\ntwice inside\n\nsolo",
                "\n\n   \n\nonly real paragraph",
                "",
                "naïve café\n\nnaïve café",
            ]
        ),
    )
    r = check_query("text_paragraph_dup", spark, sf)
    assert r.ok, str(r)
    assert r.rows_spark == 5  # the empty doc yields no paragraphs

    from aws_etl_spark.queries.registry import REGISTRY

    out = {
        row["doc_id"]: row
        for row in (
            REGISTRY["text_paragraph_dup"]
            .fn(spark, sf)
            .collect()
        )
    }
    assert out[0]["n_paragraphs"] == 3 and out[0]["n_dup_paragraphs"] == 1
    assert out[2]["n_dup_paragraphs"] == 2  # within-doc dup counts both
    assert out[3]["n_paragraphs"] == 1  # whitespace paragraphs dropped
    assert out[5]["dup_para_frac"] == 1.0


# -- text_tokenizer_fertility -------------------------------------------------


def test_tokenizer_fertility_multibyte_and_empty_cross_engine(spark, tmp_path):
    """Multibyte text (bytes ≠ chars: Spark octet_length vs DuckDB
    strlen must agree), empty/whitespace docs, and an all-OOV
    language must hash-match."""
    filler = " ".join(f"w{i:02d}" for i in range(16)) + " "
    docs = _docs(
        [
            "naïve café résumé naïve café",  # multibyte, fr
            "",
            "   ",
            "zzz yyy xxx www vvv uuu",  # freq-1 words: OOV vs top-16
            filler * 10,  # 16 high-frequency types fill the vocabulary
        ]
    )
    docs["lang"] = ["fr", "en", "en", "qq", "en"]
    sf = _mk_sf(tmp_path, documents=docs)
    r = check_query("text_tokenizer_fertility", spark, sf)
    assert r.ok, str(r)
    # languages whose docs have no words drop out of the join
    from aws_etl_spark.queries.registry import REGISTRY

    rows = {
        row["lang"]: row
        for row in REGISTRY["text_tokenizer_fertility"].fn(spark, sf).collect()
    }
    assert "qq" in rows and rows["qq"]["fertility"] > 1.0
    assert rows["fr"]["n_bytes"] > len("naïve café résumé naïve café")


# -- ml_calibration_ece -------------------------------------------------------


def test_calibration_ece_sparse_bins_and_pure_labels_cross_engine(
    spark, tmp_path
):
    """A 4-row orders table (most decile bins absent) with all-one
    labels must produce identical sparse bin rows on both engines."""
    orders = pd.read_parquet(f"{SF0001}/orders.parquet").head(4).copy()
    orders["o_orderpriority"] = "1-URGENT"
    sf = _mk_sf(tmp_path, orders=orders)
    r = check_query("ml_calibration_ece", spark, sf)
    assert r.ok, str(r)
    assert 0 < r.rows_spark <= 4


# -- ml_annotator_kappa -------------------------------------------------------


def test_annotator_kappa_pe_one_guard_cross_engine(spark, tmp_path):
    """A language where NEITHER annotator ever flips and every doc has
    the same base label makes both marginals degenerate (pe = 1);
    the guard must return kappa = 0 identically on both engines."""
    ids = [
        i
        for i in range(4000)
        if _coin(f"annA#{i}") >= 6554 and _coin(f"annB#{i}") >= 13107
    ][:6]
    assert len(ids) == 6
    docs = _docs(["short text"] * 6, doc_ids=ids)  # n_chars < 300 ⇒ base 0
    sf = _mk_sf(tmp_path, documents=docs)
    r = check_query("ml_annotator_kappa", spark, sf)
    assert r.ok, str(r)

    from aws_etl_spark.queries.registry import REGISTRY

    row = REGISTRY["ml_annotator_kappa"].fn(spark, sf).collect()[0]
    assert row["pe"] == 1.0 and row["kappa"] == 0.0


# -- events_theilsen_trend ----------------------------------------------------


def test_theilsen_single_day_and_even_pairs_cross_engine(spark, tmp_path):
    """One-day spine (zero pairs → NULL slope) and a 4-day spine
    (6 pairs — the EVEN middle-two-average branch) must hash-match."""
    one_day = _mk_sf(
        tmp_path,
        events=_events(
            [
                (1, "2024-01-01 01:00:00", 1, "view", 1),
                (2, "2024-01-01 02:00:00", 2, "click", 2),
            ]
        ),
    )
    r = check_query("events_theilsen_trend", spark, one_day)
    assert r.ok, str(r)

    four_dir = tmp_path / "four"
    four_dir.mkdir()
    four = _mk_sf(
        four_dir,
        events=_events(
            [
                (1, "2024-01-01 01:00:00", 1, "view", 1),
                (2, "2024-01-02 01:00:00", 1, "view", 1),
                (3, "2024-01-02 02:00:00", 2, "view", 1),
                (4, "2024-01-03 01:00:00", 1, "view", 1),
                (5, "2024-01-04 01:00:00", 1, "view", 1),
                (6, "2024-01-04 02:00:00", 2, "view", 1),
                (7, "2024-01-04 03:00:00", 3, "view", 1),
            ]
        ),
    )
    r2 = check_query("events_theilsen_trend", spark, four)
    assert r2.ok, str(r2)

    from aws_etl_spark.queries.registry import REGISTRY

    row = REGISTRY["events_theilsen_trend"].fn(spark, four).collect()[0]
    assert row["n_pairs"] == 6  # even: slope = mean of ranks 3 and 4


# -- join_bloom_pruned --------------------------------------------------------


def test_bloom_pruned_join_empty_dim_cross_engine(spark, tmp_path):
    """No supplier in the pruning nation: the bloom bitmap is empty,
    every probe must fail, and both engines return zero rows."""
    supp = pd.read_parquet(f"{SF0001}/supplier.parquet")
    supp = supp[supp["s_nationkey"] != 19]
    sf = _mk_sf(tmp_path, supplier=supp)
    r = check_query("join_bloom_pruned", spark, sf)
    assert r.ok, str(r)
    assert r.rows_spark == 0


# -- text_vocab_coverage ------------------------------------------------------


def test_vocab_coverage_tiny_vocabulary_cross_engine(spark, tmp_path):
    """Fewer word types than every K (the LEAST cap) must yield
    coverage 1.0 on all spine rows, identically on both engines."""
    sf = _mk_sf(tmp_path, documents=_docs(["aa bb aa", "bb aa bb aa"]))
    r = check_query("text_vocab_coverage", spark, sf)
    assert r.ok, str(r)
    from aws_etl_spark.queries.registry import REGISTRY

    rows = REGISTRY["text_vocab_coverage"].fn(spark, sf).collect()
    assert len(rows) == 4 and all(row["coverage"] == 1.0 for row in rows)


# -- text_lang_confusion ------------------------------------------------------


def test_lang_confusion_unpredicted_classes_cross_engine(spark, tmp_path):
    """Stopword-free docs (everything predicted 'und'): every actual
    class has n_pred=0 (precision guard) and 'und' has n_actual=0
    (recall guard) — the full-outer marginal branches, both engines."""
    docs = _docs(["xyzzy plugh grault", "zork frotz blorb", ""])
    docs["lang"] = ["zh", "ko", "zh"]
    sf = _mk_sf(tmp_path, documents=docs)
    r = check_query("text_lang_confusion", spark, sf)
    assert r.ok, str(r)

    from aws_etl_spark.queries.registry import REGISTRY

    rows = {
        row["lang"]: row
        for row in REGISTRY["text_lang_confusion"].fn(spark, sf).collect()
    }
    assert rows["und"]["n_actual"] == 0 and rows["und"]["recall"] == 0.0
    assert rows["zh"]["n_pred"] == 0 and rows["zh"]["precision"] == 0.0
    assert all(row["f1"] == 0.0 for row in rows.values())


# -- stat_mann_whitney --------------------------------------------------------


def test_mann_whitney_degenerate_guards_cross_engine(spark, tmp_path):
    """All values tied (var=0) and an empty second half (n2=0): the
    integer-space guards must pin z_score to 0 on both engines — the
    unguarded form produces 0/0 NaNs."""
    tied = _mk_sf(
        tmp_path,
        events=_events(
            [
                (1, "2024-01-02 00:00:00", 1, "view", 42),
                (2, "2024-01-03 00:00:00", 1, "view", 42),
                (3, "2024-01-20 00:00:00", 2, "view", 42),
                (4, "2024-01-21 00:00:00", 2, "view", 42),
            ]
        ),
    )
    r = check_query("stat_mann_whitney", spark, tied)
    assert r.ok, str(r)

    from aws_etl_spark.queries.registry import REGISTRY

    row = REGISTRY["stat_mann_whitney"].fn(spark, tied).collect()[0]
    assert row["z_score"] == 0.0

    half_dir = tmp_path / "half"
    half_dir.mkdir()
    half = _mk_sf(
        half_dir,
        events=_events(
            [
                (1, "2024-01-02 00:00:00", 1, "view", 10),
                (2, "2024-01-03 00:00:00", 1, "view", 20),
                (3, "2024-01-04 00:00:00", 2, "view", 30),
            ]
        ),
    )
    r2 = check_query("stat_mann_whitney", spark, half)
    assert r2.ok, str(r2)
    row2 = REGISTRY["stat_mann_whitney"].fn(spark, half).collect()[0]
    assert row2["n2"] == 0 and row2["z_score"] == 0.0


# -- events_markov_stationary -------------------------------------------------


def test_markov_stationary_degenerate_chains_cross_engine(spark, tmp_path):
    """No transitions at all (one event per user → empty chain, zero
    rows) and a single absorbing self-loop state (pi = 1e6) must
    hash-match."""
    empty_chain = _mk_sf(
        tmp_path,
        events=_events(
            [
                (1, "2024-01-02 00:00:00", 1, "view", 1),
                (2, "2024-01-03 00:00:00", 2, "click", 1),
            ]
        ),
    )
    r = check_query("events_markov_stationary", spark, empty_chain)
    assert r.ok, str(r)
    assert r.rows_spark == 0

    loop_dir = tmp_path / "loop"
    loop_dir.mkdir()
    loop = _mk_sf(
        loop_dir,
        events=_events(
            [
                (1, "2024-01-02 00:00:00", 1, "view", 1),
                (2, "2024-01-03 00:00:00", 1, "view", 1),
                (3, "2024-01-04 00:00:00", 1, "view", 1),
            ]
        ),
    )
    r2 = check_query("events_markov_stationary", spark, loop)
    assert r2.ok, str(r2)

    from aws_etl_spark.queries.registry import REGISTRY

    row = REGISTRY["events_markov_stationary"].fn(spark, loop).collect()[0]
    assert row["event_type"] == "view" and row["pi_micro"] == 1_000_000


# -- embeddings_ann_recall ----------------------------------------------------


def test_ann_recall_identical_vectors_cross_engine(spark, tmp_path):
    """All-identical embeddings: every cosine ties at 1.0, so top-5
    membership is decided purely by the neighbor_id tiebreak — the
    same five ids on both engines and on both legs (recall 1.0)."""
    import numpy as np

    n = 30
    vec = np.arange(64, dtype=np.float32) / 64.0
    emb = pd.DataFrame(
        {
            "vec_id": range(n),
            "embedding": [vec.tolist()] * n,
            "label": [1] * n,
        }
    )
    sf = _mk_sf(tmp_path, embeddings=emb)
    r = check_query("embeddings_ann_recall", spark, sf)
    assert r.ok, str(r)

    from aws_etl_spark.queries.registry import REGISTRY

    rows = REGISTRY["embeddings_ann_recall"].fn(spark, sf).collect()
    assert len(rows) == 20
    assert all(row["recall_at_k"] == 1.0 for row in rows)


# -- r3-vintage window names: crafted-input differentials ----------------------
# These names lead the round-9 driver window; each test fires a guard
# branch the synthetic corpus cannot (constant series, sub-bin
# cardinality, zero-norm vectors, empty corpora, tied maxima) and
# requires full cross-engine hash parity on it.


def test_anomaly_zscore_constant_series_cross_engine(spark, tmp_path):
    """Constant daily volume: variance is exactly 0 — the z-score's
    zero-spread guard must agree across engines."""
    rows = [
        (i, f"2024-01-{(i % 10) + 1:02d} 0{i % 9}:00:00", i % 3, "view", 5)
        for i in range(30)
    ]
    sf = _mk_sf(tmp_path, events=_events(rows))
    r = check_query("events_anomaly_zscore", spark, sf)
    assert r.ok, str(r)


def test_equidepth_histogram_fewer_values_than_bins_cross_engine(
    spark, tmp_path
):
    """Two distinct values cannot fill the bin spine — edge collapse
    must be identical on both engines."""
    rows = [
        (i, f"2024-01-{(i % 28) + 1:02d} 03:00:00", i % 5, "view",
         10 if i % 2 else 250)
        for i in range(40)
    ]
    sf = _mk_sf(tmp_path, events=_events(rows))
    r = check_query("stat_equidepth_histogram", spark, sf)
    assert r.ok, str(r)


def test_quantize_int8_zero_vector_cross_engine(spark, tmp_path):
    """A zero embedding has max|w| = 0 — the quantizer's zero-norm
    guard (no 0/0) must hash-match."""
    import numpy as np

    vecs = [np.zeros(64, dtype=np.float32).tolist()] + [
        (np.arange(64, dtype=np.float32) * (i + 1) / 64.0).tolist()
        for i in range(9)
    ]
    emb = pd.DataFrame(
        {"vec_id": range(10), "embedding": vecs, "label": [1] * 10}
    )
    sf = _mk_sf(tmp_path, embeddings=emb)
    r = check_query("embeddings_quantize_int8", spark, sf)
    assert r.ok, str(r)


def test_inverted_index_and_chunking_empty_corpus_cross_engine(
    spark, tmp_path
):
    """Empty and whitespace-only documents: the index has no postings,
    chunking emits nothing — zero-row parity on both engines."""
    sf = _mk_sf(tmp_path, documents=_docs(["", "   ", ""]))
    for q in ("text_inverted_index", "text_chunking", "text_top_ngrams"):
        r = check_query(q, spark, sf)
        assert r.ok, f"{q}: {r}"


def test_table_diff_reconcile_identical_tables_cross_engine(spark, tmp_path):
    """Zero-diff reconciliation (the null report) must hash-match."""
    sf = _mk_sf(tmp_path)  # untouched sf0.001 symlinks: compares as-is
    r = check_query("table_diff_reconcile", spark, sf)
    assert r.ok, str(r)


def test_transition_and_sequence_single_events_cross_engine(spark, tmp_path):
    """One event per user: no transitions, no sequences — empty-result
    parity for the chain family."""
    sf = _mk_sf(
        tmp_path,
        events=_events(
            [
                (1, "2024-01-02 00:00:00", 1, "view", 1),
                (2, "2024-01-03 00:00:00", 2, "click", 1),
                (3, "2024-01-04 00:00:00", 3, "purchase", 1),
            ]
        ),
    )
    for q in ("events_transition_matrix", "events_sequence_pattern"):
        r = check_query(q, spark, sf)
        assert r.ok, f"{q}: {r}"


def test_rfm_single_customer_cross_engine(spark, tmp_path):
    """One customer with one order: every RFM quantile collapses to
    one value — the degenerate segmentation must agree."""
    orders = pd.read_parquet(f"{SF0001}/orders.parquet").head(1).copy()
    sf = _mk_sf(tmp_path, orders=orders)
    r = check_query("stat_rfm_segmentation", spark, sf)
    assert r.ok, str(r)


def test_tpch_q15_revenue_tie_cross_engine(spark, tmp_path):
    """Two suppliers with EXACTLY equal max revenue: the top-supplier
    selection must resolve the tie identically (both engines emit both
    rows, or the same deterministic pick — whichever the query
    defines, parity is the contract)."""
    li = pd.read_parquet(f"{SF0001}/lineitem.parquet")
    li = li.head(40).copy()
    # force two suppliers with identical single-line revenues
    li.loc[li.index[:2], "l_suppkey"] = [7001, 7002]
    li.loc[li.index[:2], "l_extendedprice"] = 1000.0
    li.loc[li.index[:2], "l_discount"] = 0.0
    li.loc[li.index[:2], "l_shipdate"] = li["l_shipdate"].iloc[5]
    sf = _mk_sf(tmp_path, lineitem=li)
    r = check_query("tpch_q15_top_supplier", spark, sf)
    assert r.ok, str(r)


def test_sketches_empty_and_tiny_inputs_cross_engine(spark, tmp_path):
    """Count-min and equi-depth machinery over a 2-event table: sparse
    sketch rows must agree exactly."""
    sf = _mk_sf(
        tmp_path,
        events=_events(
            [
                (1, "2024-01-02 00:00:00", 1, "view", 10),
                (2, "2024-01-03 00:00:00", 1, "view", 10),
            ]
        ),
    )
    r = check_query("sketch_count_min", spark, sf)
    assert r.ok, str(r)


def test_grouped_map_topk_ties_cross_engine(spark, tmp_path):
    """Orders with identical totalprice within a segment: the grouped
    top-k must tiebreak deterministically on both engines."""
    orders = pd.read_parquet(f"{SF0001}/orders.parquet").head(20).copy()
    orders["o_totalprice"] = 5000.0  # all tied
    sf = _mk_sf(tmp_path, orders=orders)
    r = check_query("grouped_map_topk", spark, sf)
    assert r.ok, str(r)


def test_rollup_daily_single_day_cross_engine(spark, tmp_path):
    """A one-day event table: single-row rollup, no gaps to fill."""
    sf = _mk_sf(
        tmp_path,
        events=_events(
            [
                (1, "2024-01-05 01:00:00", 1, "view", 1),
                (2, "2024-01-05 02:00:00", 2, "click", 2),
            ]
        ),
    )
    for q in ("events_rollup_daily",):
        r = check_query(q, spark, sf)
        assert r.ok, f"{q}: {r}"


def test_quality_expectations_extreme_rows_cross_engine(spark, tmp_path):
    """Rows violating every expectation at once (negative totals,
    far-future dates) must produce identical violation counts."""
    orders = pd.read_parquet(f"{SF0001}/orders.parquet").head(10).copy()
    orders.loc[orders.index[:3], "o_totalprice"] = -1.0
    sf = _mk_sf(tmp_path, orders=orders)
    r = check_query("quality_expectations", spark, sf)
    assert r.ok, str(r)


# -- r4-vintage names (round-10 window block 3): pre-hardening -----------------
# These re-confirm next round; firing their guard branches now means
# the r10 window carries no surprises.


def test_basket_affinity_single_item_orders_cross_engine(spark, tmp_path):
    """Every order has exactly one line item: zero co-purchase pairs."""
    li = pd.read_parquet(f"{SF0001}/lineitem.parquet")
    li = li.drop_duplicates(subset=["l_orderkey"]).head(30)
    sf = _mk_sf(tmp_path, lineitem=li)
    r = check_query("basket_affinity_pairs", spark, sf)
    assert r.ok, str(r)


def test_multitouch_attribution_single_touch_cross_engine(spark, tmp_path):
    """One touch per converting user: first/last/linear credit all
    collapse onto the same event — weight algebra must agree."""
    sf = _mk_sf(
        tmp_path,
        events=_events(
            [
                (1, "2024-01-02 00:00:00", 1, "click", 10),
                (2, "2024-01-02 01:00:00", 1, "purchase", 300),
                (3, "2024-01-03 00:00:00", 2, "view", 5),
                (4, "2024-01-03 00:30:00", 2, "purchase", 400),
            ]
        ),
    )
    r = check_query("events_attribution_multitouch", spark, sf)
    assert r.ok, str(r)


def test_lateral_topn_all_tied_cross_engine(spark, tmp_path):
    """Every candidate tied on the ranking value: the unique-key
    tiebreak decides membership identically."""
    orders = pd.read_parquet(f"{SF0001}/orders.parquet").head(30).copy()
    orders["o_totalprice"] = 777.0
    sf = _mk_sf(tmp_path, orders=orders)
    r = check_query("join_lateral_topn", spark, sf)
    assert r.ok, str(r)


def test_gopher_rules_pathological_docs_cross_engine(spark, tmp_path):
    """Symbol-only, one-word, and extremely repetitive docs hit the
    Gopher thresholds from every side."""
    sf = _mk_sf(
        tmp_path,
        documents=_docs(
            [
                "### $$$ %%% !!!",
                "word",
                "same same same same same same same same same same",
                "",
                "a " * 200,
            ]
        ),
    )
    for q in ("text_gopher_rules", "text_c4_filter"):
        r = check_query(q, spark, sf)
        assert r.ok, f"{q}: {r}"


def test_word_ngrams_short_docs_cross_engine(spark, tmp_path):
    """Docs shorter than the n-gram width emit nothing — UDTF and
    oracle agree on the empty expansion."""
    sf = _mk_sf(tmp_path, documents=_docs(["one", "two words", ""]))
    r = check_query("udtf_word_ngrams", spark, sf)
    assert r.ok, str(r)


def test_window_distribution_constant_values_cross_engine(spark, tmp_path):
    """All-equal order totals: percent_rank/cume_dist hit their
    whole-partition-tie branch."""
    orders = pd.read_parquet(f"{SF0001}/orders.parquet").head(25).copy()
    orders["o_totalprice"] = 123.45
    sf = _mk_sf(tmp_path, orders=orders)
    r = check_query("window_distribution", spark, sf)
    assert r.ok, str(r)


def test_sort_limit_offset_beyond_end_cross_engine(spark, tmp_path):
    """An offset past the table's end returns zero rows on both
    engines (no partial-page divergence)."""
    orders = pd.read_parquet(f"{SF0001}/orders.parquet").head(3)
    sf = _mk_sf(tmp_path, orders=orders)
    r = check_query("sort_limit_offset", spark, sf)
    assert r.ok, str(r)


def test_span_census_short_docs_cross_engine(spark, tmp_path):
    """Docs shorter than the span width produce no spans; mixed with
    one long doc the census stays exact."""
    sf = _mk_sf(
        tmp_path,
        documents=_docs(["a b", "", "x " * 40 + "y z w q r t u v"]),
    )
    for q in ("dedup_span_census", "dedup_span_doc_profile"):
        r = check_query(q, spark, sf)
        assert r.ok, f"{q}: {r}"


def test_hard_negatives_single_label_cross_engine(spark, tmp_path):
    """Every embedding shares one label: there are no cross-label
    negatives — empty result parity."""
    import numpy as np

    emb = pd.DataFrame(
        {
            "vec_id": range(12),
            "embedding": [
                (np.arange(64, dtype=np.float32) * (i + 1) / 64).tolist()
                for i in range(12)
            ],
            "label": [3] * 12,
        }
    )
    sf = _mk_sf(tmp_path, embeddings=emb)
    r = check_query("embeddings_hard_negatives", spark, sf)
    assert r.ok, str(r)


def test_linear_regression_degenerate_x_cross_engine(spark, tmp_path):
    """A single distinct x per group (zero x-variance): the OLS slope
    guard must agree — the unguarded form is 0/0."""
    sf = _mk_sf(
        tmp_path,
        events=_events(
            [
                (1, "2024-01-05 10:00:00", 1, "view", 10),
                (2, "2024-01-05 11:00:00", 2, "view", 20),
                (3, "2024-01-05 12:00:00", 3, "view", 30),
                (4, "2024-01-06 10:00:00", 1, "click", 7),
            ]
        ),
    )
    r = check_query("stat_linear_regression", spark, sf)
    assert r.ok, str(r)


def test_exp_smoothing_single_point_cross_engine(spark, tmp_path):
    """A one-observation series: the fold's base case only."""
    sf = _mk_sf(
        tmp_path,
        events=_events([(1, "2024-01-05 10:00:00", 1, "view", 42)]),
    )
    r = check_query("events_exp_smoothing", spark, sf)
    assert r.ok, str(r)


def test_domain_cap_single_dominant_source_cross_engine(spark, tmp_path):
    """One source holding ~all documents: the cap fires maximally and
    the survivor choice is deterministic on both engines."""
    docs = _docs(["text " + str(i) for i in range(30)])
    docs["source"] = ["src0"] * 28 + ["src1", "src2"]
    sf = _mk_sf(tmp_path, documents=docs)
    r = check_query("corpus_domain_cap", spark, sf)
    assert r.ok, str(r)


def test_decontaminate_zero_overlap_cross_engine(spark, tmp_path):
    """A corpus with no benchmark overlap at all: nothing is removed,
    and the pass-through set hash-matches."""
    docs = _docs([f"totally unique doc number {i} with fresh words" for i in range(12)])
    sf = _mk_sf(tmp_path, documents=docs)
    r = check_query("dedup_decontaminate", spark, sf)
    assert r.ok, str(r)


def test_grouping_flags_with_data_nulls_cross_engine(spark, tmp_path):
    """Real NULL group keys alongside grouping-set NULLs: GROUPING()
    is the only disambiguator, and both engines must agree on every
    (flag, key) combination."""
    orders = pd.read_parquet(f"{SF0001}/orders.parquet").head(20).copy()
    orders["o_orderpriority"] = orders["o_orderpriority"].astype(object)
    orders.loc[orders.index[:5], "o_orderpriority"] = None
    sf = _mk_sf(tmp_path, orders=orders)
    r = check_query("agg_grouping_flags", spark, sf)
    assert r.ok, str(r)


def test_variant_json_malformed_props_cross_engine(spark, tmp_path):
    """Malformed / empty / deeply-typed JSON props: the VARIANT parse
    path must degrade identically (lenient NULLs, no errors)."""
    ev = _events(
        [
            (1, "2024-01-02 00:00:00", 1, "view", 1),
            (2, "2024-01-02 01:00:00", 2, "view", 1),
            (3, "2024-01-02 02:00:00", 3, "view", 1),
            (4, "2024-01-02 03:00:00", 4, "view", 1),
        ]
    )
    ev["props"] = [
        '{"a": 1, "b": {"c": [1, 2, 3]}}',
        "not json at all",
        "",
        '{"a": null}',
    ]
    sf = _mk_sf(tmp_path, events=ev)
    r = check_query("func_variant_json", spark, sf)
    assert r.ok, str(r)


def test_variant_json_nonint_values_cross_engine(spark, tmp_path):
    """Non-integer k values ({"k": 3.7}, {"k": true}, {"k": "5"},
    {"k": "x"}): Spark's bare 'int' typed get would truncate 3.7 to 3
    and cast true to 1 while the oracle NULLs both — the round-10
    normalization (string typed get + TRY_CAST) must NULL/keep them
    identically on both engines (r9 advice item 3)."""
    ev = _events(
        [
            (1, "2024-01-02 00:00:00", 1, "view", 1),
            (2, "2024-01-02 01:00:00", 2, "view", 1),
            (3, "2024-01-02 02:00:00", 3, "view", 1),
            (4, "2024-01-02 03:00:00", 4, "view", 1),
            (5, "2024-01-02 04:00:00", 5, "view", 1),
            (6, "2024-01-02 05:00:00", 6, "view", 1),
        ]
    )
    ev["props"] = [
        '{"k": 3.7}',
        '{"k": true}',
        '{"k": "5"}',
        '{"k": "x"}',
        '{"k": 42}',
        '{"k": -7}',
    ]
    sf = _mk_sf(tmp_path, events=ev)
    r = check_query("func_variant_json", spark, sf)
    assert r.ok, str(r)


def test_cluster_safe_split_one_giant_cluster_cross_engine(spark, tmp_path):
    """Every document near-identical (one cluster spanning the whole
    corpus): the split must place ALL of them in one fold — the
    leakage guard's extreme case."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = _docs([base + f" tail{i}" if i % 2 else base for i in range(12)])
    sf = _mk_sf(tmp_path, documents=docs)
    r = check_query("corpus_cluster_safe_split", spark, sf)
    assert r.ok, str(r)


def test_scd2_pointintime_boundary_orders_cross_engine(spark, tmp_path):
    """Order dates exactly on SCD2 validity boundaries: the
    inclusive/exclusive convention must match across engines."""
    orders = pd.read_parquet(f"{SF0001}/orders.parquet").head(12).copy()
    # collapse to two distinct dates so boundary rows are guaranteed;
    # keep the column MICROS (a bare assignment re-types it to nanos,
    # which Spark reads as BIGINT under the nanosAsLong escape)
    dates = sorted(orders["o_orderdate"].unique())
    orders["o_orderdate"] = pd.Series(
        [dates[0], dates[-1]] * 6, index=orders.index
    ).astype("datetime64[us]")
    sf = _mk_sf(tmp_path, orders=orders)
    r = check_query("join_scd2_pointintime", spark, sf)
    assert r.ok, str(r)


def test_rollup_incremental_duplicate_hours_cross_engine(spark, tmp_path):
    """Many events in a single hour bucket plus an empty day gap: the
    rollup-of-partials must equal the oracle's direct aggregation."""
    rows = [(i, f"2024-01-0{1 + (i > 20) * 3}" + f" 0{i % 3}:15:00", i % 4, "view", i)
            for i in range(30)]
    sf = _mk_sf(tmp_path, events=_events(
        [(e, t.replace("2024-01-04", "2024-01-04 ") if False else t, u, ty, v)
         for e, t, u, ty, v in rows]))
    r = check_query("events_rollup_incremental", spark, sf)
    assert r.ok, str(r)
