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
