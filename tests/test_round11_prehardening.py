"""PRE-HARDENING differentials for round-11's re-confirmation block:
the r5-vintage names rotate into the next driver window, and none of
them had crafted-parquet edge differentials (their evidence is oracle
hashes on the synthetic corpus + unit tests). Each test here runs the
full Spark-vs-DuckDB hash comparison on inputs the corpus never
produces, so next round's window carries no known surprises — the
r9→r10 pattern the verdict endorsed."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from aws_etl_spark.oracle import check_query
from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

SF0001 = "/root/testdata/sf0.001"

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _mk_sf(tmp_path, **frames) -> str:
    sf = tmp_path / "sf"
    sf.mkdir(parents=True, exist_ok=True)
    for t in _TABLES:
        dst = sf / f"{t}.parquet"
        if t in frames:
            frames[t].to_parquet(str(dst))
        elif not dst.exists():
            os.symlink(f"{SF0001}/{t}.parquet", str(dst))
    return str(sf)


def _docs(texts):
    return pd.DataFrame(
        {
            "doc_id": pd.array(range(len(texts)), dtype="int64"),
            "text": pd.array(texts, dtype="string"),
            "lang": pd.array(["en"] * len(texts), dtype="string"),
            "source": pd.array(
                [f"src{i % 3}" for i in range(len(texts))], dtype="string"
            ),
            "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
        }
    )


def test_winsorized_constant_column(spark, tmp_path):
    """All-equal values: p05 = p95, every row sits inside the clip
    band, zero clips — the degenerate band the corpus never hits."""
    li = pd.read_parquet(f"{SF0001}/lineitem.parquet")
    li["l_extendedprice"] = 1234.56
    sf = _mk_sf(tmp_path, lineitem=li)
    r = check_query("stat_winsorized_robust", spark, sf)
    assert r.ok, str(r)


def test_mode_exact_frequency_tie(spark, tmp_path):
    """Two quantities with exactly equal counts in one group: the
    composite (count, value) argmax must pick the same winner on both
    engines (native mode() would not)."""
    li = pd.read_parquet(f"{SF0001}/lineitem.parquet").head(40).copy()
    li["l_returnflag"] = "A"
    li["l_quantity"] = [7.0] * 20 + [9.0] * 20  # exact tie
    sf = _mk_sf(tmp_path, lineitem=li)
    r = check_query("agg_mode_deterministic", spark, sf)
    assert r.ok, str(r)
    row = REGISTRY["agg_mode_deterministic"].fn(spark, sf).collect()[0]
    assert row["mode_qty"] == 9  # tie resolves to the larger value


def test_gap_histogram_zero_gaps_and_singletons(spark, tmp_path):
    """Users with all-identical timestamps (zero-second gaps) and
    single-event users (no gaps at all)."""
    rows = []
    for i in range(5):
        rows.append((i, "2024-01-05 12:00:00", 1, "view", 1.0))
    rows.append((10, "2024-01-06 09:00:00", 2, "view", 1.0))
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    ev["ts"] = pd.to_datetime(ev["ts"])
    ev["props"] = "{}"
    sf = _mk_sf(tmp_path, events=ev)
    r = check_query("events_gap_histogram", spark, sf)
    assert r.ok, str(r)


def test_null_safe_join_all_null_and_no_null_buckets(spark, tmp_path):
    """Every priority in the null bucket (maximal NULL=NULL matching)
    and none in it (the <=> degenerates to plain =)."""
    od = pd.read_parquet(f"{SF0001}/orders.parquet").head(60).copy()
    od["o_orderkey"] = range(1, 61)
    od["o_orderpriority"] = "5-LOW"
    od["o_orderstatus"] = "O"
    sf = _mk_sf(tmp_path, orders=od)
    r = check_query("join_null_safe", spark, sf)
    assert r.ok, str(r)
    assert REGISTRY["join_null_safe"].fn(spark, sf).count() == 60 * 59 // 2
    od["o_orderpriority"] = "1-URGENT"
    sf2 = _mk_sf(tmp_path / "b", orders=od)
    r2 = check_query("join_null_safe", spark, sf2)
    assert r2.ok, str(r2)


def test_try_arithmetic_numeric_status_and_zero_price(spark, tmp_path):
    """A NUMERIC o_orderstatus makes TRY_CAST finally return non-NULL
    (the corpus statuses are always O/F/P), and zero prices ride
    through TRY_DIVIDE."""
    od = pd.read_parquet(f"{SF0001}/orders.parquet").head(20).copy()
    od["o_orderstatus"] = ["2"] * 10 + ["X"] * 10
    od.loc[od.index[:5], "o_totalprice"] = 0.0
    sf = _mk_sf(tmp_path, orders=od)
    r = check_query("func_try_arithmetic", spark, sf)
    assert r.ok, str(r)
    rows = REGISTRY["func_try_arithmetic"].fn(spark, sf).collect()
    assert any(x["status_as_int"] == 2 for x in rows)
    assert any(x["status_as_int"] is None for x in rows)


def test_set_all_variants_extreme_multiplicity(spark, tmp_path):
    """All projected rows identical: EXCEPT ALL / INTERSECT ALL
    reduce to pure multiplicity arithmetic."""
    od = pd.read_parquet(f"{SF0001}/orders.parquet").head(30).copy()
    od["o_orderstatus"] = "O"
    od["o_orderpriority"] = "3-MEDIUM"
    sf = _mk_sf(tmp_path, orders=od)
    for name in ("set_except_all", "set_intersect_all"):
        r = check_query(name, spark, sf)
        assert r.ok, (name, str(r))


def test_listagg_duplicate_names(spark, tmp_path):
    """Duplicate n_name values in one region: the WITHIN GROUP order
    has ties and concatenation must still agree across engines."""
    na = pd.read_parquet(f"{SF0001}/nation.parquet").copy()
    na.loc[na.index[:3], "n_name"] = "SAMENAME"
    na.loc[na.index[:3], "n_regionkey"] = na["n_regionkey"].iloc[0]
    sf = _mk_sf(tmp_path, nation=na)
    r = check_query("agg_listagg_sorted", spark, sf)
    assert r.ok, str(r)


def test_ngram_novelty_subwidth_and_repeated_docs(spark, tmp_path):
    """Docs shorter than the 3-gram width (zero shingles) plus a doc
    that repeats an earlier doc verbatim (novelty 0)."""
    sf = _mk_sf(
        tmp_path,
        documents=_docs(
            ["one two", "x", "alpha beta gamma delta", "alpha beta gamma delta"]
        ),
    )
    r = check_query("text_ngram_novelty", spark, sf)
    assert r.ok, str(r)


def test_phrase_search_boundary_and_overlap(spark, tmp_path):
    """The phrase at doc start, doc end, and self-overlapping
    ('table table scan table scan') — adjacency positions the corpus
    layout never exercises."""
    sf = _mk_sf(
        tmp_path,
        documents=_docs(
            [
                "table scan begins the doc",
                "the doc ends with table scan",
                "table table scan table scan",
                "no phrase here at all",
                "table without its partner",
            ]
        ),
    )
    r = check_query("text_phrase_search", spark, sf)
    assert r.ok, str(r)
    out = REGISTRY["text_phrase_search"].fn(spark, sf).toPandas()
    assert set(out["doc_id"]) == {0, 1, 2}


def test_skipgram_single_word_docs(spark, tmp_path):
    """Single-word docs produce no pairs; a 2-word doc produces the
    minimal window — edge clipping on both sides."""
    sf = _mk_sf(
        tmp_path,
        documents=_docs(["solo", "alone", "two words", "a b c d e"]),
    )
    r = check_query("text_skipgram_pairs", spark, sf)
    assert r.ok, str(r)


def test_stratified_exact_single_stratum(spark, tmp_path):
    """Every order in one status: only that stratum's keep-rate
    branch executes."""
    od = pd.read_parquet(f"{SF0001}/orders.parquet").copy()
    od["o_orderstatus"] = "F"
    sf = _mk_sf(tmp_path, orders=od)
    r = check_query("sample_stratified_exact", spark, sf)
    assert r.ok, str(r)


def test_health_report_all_duplicates_and_empty_texts(spark, tmp_path):
    """A corpus where every doc is a dup of something plus empty-text
    docs — the health metrics' extreme ends."""
    sf = _mk_sf(
        tmp_path,
        documents=_docs(["same text here"] * 4 + ["", "  "]),
    )
    r = check_query("corpus_health_report", spark, sf)
    assert r.ok, str(r)


def test_shuffle_deterministic_single_doc(spark, tmp_path):
    """A one-document corpus: one shard, rank 1 — the smallest
    well-formed shuffle."""
    sf = _mk_sf(tmp_path, documents=_docs(["only doc"]))
    r = check_query("corpus_shuffle_deterministic", spark, sf)
    assert r.ok, str(r)
    row = REGISTRY["corpus_shuffle_deterministic"].fn(spark, sf).collect()
    assert len(row) == 1 and row[0]["pos_in_shard"] == 1
