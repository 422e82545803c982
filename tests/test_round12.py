"""Round-12 differentials: the r11 verdict items turned into checked
behavior.

- stat_jarque_bera's unit-contract tripwire (verdict "What's wrong" 1):
  a raw spread below the whole-dollar quantization unit must announce
  itself in the output, not only in ADVICE prose.
- ml_pr_auc's quantization-budget tripwire (same item): continuous
  scores with rare positives (n_thresholds > 1000*P) leave the stated
  1e-6 error budget and must flag.
- stat_kendall_tau_daily's spine-size guard (verdict item 4): the
  spine^2 pair join fails loudly past 100k spine rows instead of
  silently going quadratic.
- _acf_daily_sql's ts IS NOT NULL spine filter (r11 ADVICE 1): a NULL
  ts must not create a NULL day-group whose ORDER BY position differs
  across engines for the order-sensitive consumers.
- corpus_ngram_contamination's empty-token filter (r11 ADVICE 2):
  consecutive whitespace cannot inject empty 'words' into grams.
- text_rake_keywords' canonical word scoring (r11 ADVICE 3): word
  freq/degree over ALL candidate phrases, the 4-word cap only at the
  readout (Rose et al. semantics).

Fixture rule (round-11 lesson): crafted timestamp columns other than
events.ts are written datetime64[us]."""

from __future__ import annotations

import pandas as pd
import pytest

from aws_etl_spark.oracle import check_query
from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
from tests.test_round11_late import (
    SF0001,
    _docs,
    _events,
    _mk_sf,
    _orders,
)

_ensure_loaded()


# ---------------------------------------------------------------------------
# stat_jarque_bera: unit_contract_violated tripwire
# ---------------------------------------------------------------------------


def test_jarque_bera_unit_tripwire_fires_on_subdollar_spread(spark, tmp_path):
    """0 < raw spread < 1 dollar: every row floors to the same integer,
    the moments read the constant-column pin (JB = 0) — and the flag
    announces the regime. Hash parity holds (the flag is computed
    identically on both engines)."""
    prices = [100.10, 100.20, 100.90, 100.40, 100.55]
    sf = _mk_sf(tmp_path, orders=_orders(prices))
    r = check_query("stat_jarque_bera", spark, sf)
    assert r.ok, str(r)
    row = REGISTRY["stat_jarque_bera"].fn(spark, sf).collect()[0]
    assert row.jb_stat == 0.0 and row.skewness == 0.0
    assert row.unit_contract_violated == 1


def test_jarque_bera_unit_tripwire_quiet_on_constant_and_corpus(
    spark, tmp_path
):
    """An exactly-constant raw column is NOT a violation (the pinned 0
    is the true answer), and the synthetic corpus is comfortably above
    the unit."""
    sf = _mk_sf(tmp_path, orders=_orders([250.25] * 4))
    assert check_query("stat_jarque_bera", spark, sf).ok
    row = REGISTRY["stat_jarque_bera"].fn(spark, sf).collect()[0]
    assert row.jb_stat == 0.0
    assert row.unit_contract_violated == 0

    corpus = REGISTRY["stat_jarque_bera"].fn(spark, SF0001).collect()[0]
    assert corpus.unit_contract_violated == 0
    assert corpus.jb_stat > 0.0  # the corpus has real shape


# ---------------------------------------------------------------------------
# ml_pr_auc: quant_budget_exceeded tripwire
# ---------------------------------------------------------------------------


def test_pr_auc_quant_budget_tripwire_fires_on_continuous_scores(
    spark, tmp_path
):
    """1 positive among 1500 distinct-score negatives: n_thresholds =
    1501 > 1000 * P — outside the stated 1e-6 budget, flag = 1. The
    positive holds the top score, so AP itself is exactly 1.0 (the
    single term is 1*1/1, nano-quantization exact)."""
    rows = [("e0", "2024-01-01 00:00:00", "u0", "purchase", 999999.0)]
    rows += [
        (f"e{i}", "2024-01-01 01:00:00", f"u{i}", "view", float(i))
        for i in range(1, 1501)
    ]
    sf = _mk_sf(tmp_path, events=_events(rows))
    r = check_query("ml_pr_auc", spark, sf)
    assert r.ok, str(r)
    row = REGISTRY["ml_pr_auc"].fn(spark, sf).collect()[0]
    assert (row.n_pos, row.n_neg, row.n_thresholds) == (1, 1500, 1501)
    assert row.avg_precision == 1.0
    assert row.quant_budget_exceeded == 1


def test_pr_auc_quant_budget_quiet_on_corpus(spark):
    """The corpus's coarse score grid sits far inside the budget."""
    row = REGISTRY["ml_pr_auc"].fn(spark, SF0001).collect()[0]
    assert row.quant_budget_exceeded == 0
    assert row.n_thresholds <= 1000 * row.n_pos


# ---------------------------------------------------------------------------
# stat_kendall_tau_daily: spine-size guard
# ---------------------------------------------------------------------------


def test_kendall_spine_guard_trips_past_bound(spark, tmp_path):
    """100_001 distinct order days exceed KENDALL_MAX_SPINE_ROWS: the
    staged guard raises BEFORE the pair join is built, with the
    contract named in the message."""
    from aws_etl_spark.queries.timeseries_queries import (
        KENDALL_MAX_SPINE_ROWS,
    )

    n = KENDALL_MAX_SPINE_ROWS + 1
    dates = pd.date_range("1800-01-01", periods=n, freq="D")
    orders = _orders([100.0 + (i % 997) for i in range(n)], dates=dates)
    sf = _mk_sf(tmp_path, orders=orders)
    with pytest.raises(ValueError) as ei:
        REGISTRY["stat_kendall_tau_daily"].fn(spark, sf)
    msg = str(ei.value)
    assert "kt_spine_rows" in msg
    assert str(KENDALL_MAX_SPINE_ROWS) in msg
    assert "stat_kendall_tau_daily" in msg


def test_kendall_guard_quiet_on_corpus(spark):
    """The corpus spine (<= 31 days) is far below the bound; the query
    still runs and matches its oracle."""
    assert check_query("stat_kendall_tau_daily", spark, SF0001).ok


# ---------------------------------------------------------------------------
# _acf_daily_sql: ts IS NOT NULL spine filter
# ---------------------------------------------------------------------------


def test_daily_spine_null_ts_differential(spark, tmp_path):
    """A NULL ts row must vanish from the daily spine on BOTH engines —
    before the filter, Spark ordered the NULL dn group FIRST and DuckDB
    LAST, breaking the order-sensitive consumers (runs test, Pettitt).
    All five _acf_daily_sql consumers hash-match on a NULL-laced
    calendar."""
    rows = []
    eid = 0
    # 10 days with varying volume so runs/pettitt/acf are non-degenerate
    for d in range(1, 11):
        for k in range((d * 3) % 7 + 1):
            rows.append(
                (f"e{eid}", f"2024-02-{d:02d} 0{k}:15:00", f"u{k}",
                 "view", float(k))
            )
            eid += 1
    rows.append(("enull", None, "u0", "view", 1.0))
    rows.append(("enull2", None, "u1", "purchase", 2.0))
    sf = _mk_sf(tmp_path, events=_events(rows))
    for name in (
        "events_acf_daily",
        "stat_ljung_box",
        "stat_runs_test",
        "stat_pettitt_change",
        "events_forecast_eval",
    ):
        r = check_query(name, spark, sf)
        assert r.ok, f"{name}: {r}"
    # the NULL rows are really excluded: 10 spine days, not 11
    row = REGISTRY["stat_runs_test"].fn(spark, sf).collect()[0]
    assert row.n_days == 10


# ---------------------------------------------------------------------------
# corpus_ngram_contamination: empty-token filter
# ---------------------------------------------------------------------------


def test_contamination_whitespace_irregular_tokens(spark, tmp_path):
    """A test-split doc with doubled/tripled spaces produces the SAME
    grams as its single-spaced train twin — empty tokens are filtered
    before gram construction, so whitespace irregularity can no longer
    deflate the contaminated share."""
    from tests.test_round11_late import _split_of

    assert _split_of(1) == "train" and _split_of(3) == "test"
    train_text = "alpha beta gamma delta epsilon zeta"
    messy_twin = "alpha  beta gamma   delta epsilon  zeta"
    docs = _docs([train_text, messy_twin], ids=[1, 3])
    sf = _mk_sf(tmp_path, documents=docs)
    r = check_query("corpus_ngram_contamination", spark, sf)
    assert r.ok, str(r)
    out = REGISTRY["corpus_ngram_contamination"].fn(spark, sf).collect()
    assert len(out) == 1 and out[0].doc_id == 3
    assert out[0].n_grams == 2  # 6 real words -> 2 five-grams
    assert out[0].contaminated_share == 1.0
    assert out[0].flag_contaminated == 1


# ---------------------------------------------------------------------------
# text_rake_keywords: canonical (Rose et al.) word scoring
# ---------------------------------------------------------------------------


def test_rake_word_stats_cover_uncapped_phrases(spark, tmp_path):
    """'red' appears in a 2-word phrase AND a 6-word phrase: canonical
    RAKE scores it over BOTH (freq 2, degree 2+6=8 -> word score 4.0),
    so 'red fox' reads 4.0+2.0 = 6.0. The capped-scoring form this
    replaces would have read 4.0. The 6-word phrase itself stays out
    of the readout."""
    docs = _docs(["red fox and red one two three four five"])
    sf = _mk_sf(tmp_path, documents=docs)
    r = check_query("text_rake_keywords", spark, sf)
    assert r.ok, str(r)
    out = {
        row.phrase: row
        for row in REGISTRY["text_rake_keywords"].fn(spark, sf).collect()
    }
    assert "red one two three four five" not in out
    assert out["red fox"].rake_score == 6.0
