"""PII redaction, C4-style quality filtering, benchmark
decontamination — unit semantics + plan discipline. (The oracle sweep
in test_oracle_corpus.py already hash-checks the registry entries;
these tests pin the operator semantics on hand-built rows where the
expected answer is known by construction.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_spark.text import c4_filter_flags, pii_counts, pii_redact


def test_pii_redact_all_classes(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-corp.io, ssn 123-45-6789, tel 555-123-4567, host 10.0.0.1 ok"),
            (2, "no pii here at all"),
        ],
        ["id", "t"],
    )
    out = df.select(
        "id",
        pii_redact(F.col("t")).alias("r"),
        *[v.alias(k) for k, v in pii_counts(F.col("t")).items()],
    ).collect()
    r1 = {row.id: row for row in out}
    assert r1[1].r == "mail <EMAIL>, ssn <SSN>, tel <PHONE>, host <IPV4> ok"
    assert (r1[1].email, r1[1].ssn, r1[1].phone, r1[1].ipv4) == (1, 1, 1, 1)
    assert r1[2].r == "no pii here at all"
    assert (r1[2].email, r1[2].ssn, r1[2].phone, r1[2].ipv4) == (0, 0, 0, 0)


def test_pii_ssn_not_eaten_by_phone(spark):
    # 123-45-6789 (3-2-4) and 555-123-4567 (3-3-4) must bind to their
    # own classes even when adjacent
    df = spark.createDataFrame([(1, "123-45-6789 555-123-4567")], ["id", "t"])
    row = df.select(pii_redact(F.col("t")).alias("r")).first()
    assert row.r == "<SSN> <PHONE>"


def test_c4_flags_by_construction(spark):
    good = " ".join(["the quick brown fox jumps over that lazy dog again"] * 6)
    df = spark.createDataFrame(
        [
            (1, good),  # 54 words, stopwords present, clean
            (2, "short text only"),  # fails ok_len
            (3, good + " lorem ipsum dolor"),  # boilerplate
            (4, good + " x{y}"),  # brace leakage
        ],
        ["id", "t"],
    )
    flags = c4_filter_flags(F.col("t"))
    rows = {
        r.id: r
        for r in df.select(
            "id", *[v.alias(k) for k, v in flags.items()]
        ).collect()
    }
    assert all(
        getattr(rows[1], k)
        for k in ("ok_len", "ok_word_len", "ok_stopwords", "ok_no_lorem", "ok_no_brace")
    )
    assert not rows[2].ok_len
    assert not rows[3].ok_no_lorem and rows[3].ok_len
    assert not rows[4].ok_no_brace


def test_decontaminate_drops_only_overlapping_docs(spark):
    from aws_etl_spark.dedup.jaccard import shingle_rows

    bench_text = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (0, bench_text, "bench"),
            # shares the 5-gram "alpha beta gamma delta epsilon"
            (1, "x y alpha beta gamma delta epsilon q r", "web"),
            # same words, order broken → no shared 5-gram
            (2, "alpha beta gamma q delta epsilon zeta", "web"),
        ],
        ["doc_id", "text", "source"],
    )
    bench = docs.filter(F.col("source") == "bench")
    corpus = docs.filter(F.col("source") != "bench")
    bench_sh = shingle_rows(bench, "doc_id", "text", k=5).select("shingle").distinct()
    corp_sh = shingle_rows(corpus, "doc_id", "text", k=5, distinct=False)
    contaminated = (
        corp_sh.join(F.broadcast(bench_sh), "shingle")
        .select(F.col("doc").alias("doc_id"))
        .distinct()
    )
    kept = corpus.join(F.broadcast(contaminated), "doc_id", "left_anti")
    assert [r.doc_id for r in kept.collect()] == [2]


def test_decontaminate_plan_broadcasts_benchmark(spark, sf_dir):
    from aws_etl_spark.plans import formatted_plan
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    plan = formatted_plan(REGISTRY["dedup_decontaminate"].fn(spark, sf_dir))
    # both the shingle semi-join and the final anti-join must be
    # broadcasts: the (big) corpus never shuffles
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_pii_and_c4_plans_are_scan_bound(spark, sf_dir):
    """Pure per-row map pipelines must not SHUFFLE DATA BY KEY — the
    round-13 widen dial adds exactly one round-robin repartition (the
    measured map-parallelism fix for the single-row-group local scan;
    a no-op at production scale where scans are already split), and
    that must remain the ONLY exchange in the plan."""
    import re

    from aws_etl_spark.plans import formatted_plan
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    for name in ("text_pii_redaction", "text_c4_filter"):
        plan = formatted_plan(REGISTRY[name].fn(spark, sf_dir))
        exchanges = re.findall(r"Exchange (\w+)", plan)
        assert all(p == "RoundRobinPartitioning" for p in exchanges), (
            f"{name} shuffles by key:\n{plan}"
        )
        assert len(set(exchanges)) <= 1 and len(exchanges) <= 2, (
            f"{name} has more than the widen exchange:\n{plan}"
        )


def test_packing_single_shuffle_and_quantize_broadcast(spark, sf_dir):
    from aws_etl_spark.plans import formatted_plan
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    pack = formatted_plan(REGISTRY["text_sequence_packing"].fn(spark, sf_dir))
    # one hash partition on shard feeding the window — no second
    # exchange (formatted mode prints each node twice: tree + detail)
    assert pack.count("+- Exchange") == 1, pack
    quant = formatted_plan(REGISTRY["embeddings_quantize_int8"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in quant, quant
    assert "SortMergeJoin" not in quant, quant


def test_packing_bins_are_contiguous(spark, sf_dir):
    """Within a shard, start offsets tile the token stream exactly:
    next start = prev start + prev n_tokens (no gaps, no overlap)."""
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = (
        REGISTRY["text_sequence_packing"].fn(spark, sf_dir)
        .orderBy("shard", "doc_id")
        .collect()
    )
    by_shard = {}
    for r in rows:
        prev = by_shard.get(r.shard)
        if prev is not None:
            assert r.start_offset == prev.start_offset + prev.n_tokens
        assert r.bin_id == r.start_offset // 2048
        assert r.offset_in_bin == r.start_offset % 2048
        by_shard[r.shard] = r


def test_quantize_int8_range_and_sign(spark, sf_dir):
    import math

    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    out = REGISTRY["embeddings_quantize_int8"].fn(spark, sf_dir)
    stats = out.agg(
        F.min("q8").alias("mn"), F.max("q8").alias("mx"), F.count("*").alias("n")
    ).first()
    assert -127 <= stats.mn and stats.mx <= 127 and stats.mx == 127
    # the per-dimension argmax element must quantize to ±127 exactly
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    first = emb.select("vec_id", F.posexplode("embedding").alias("p", "v")).filter(
        F.col("p") == 0
    )
    top = max(first.collect(), key=lambda r: abs(r.v))
    got = out.filter((F.col("vec_id") == top.vec_id) & (F.col("pos") == 1)).first()
    assert abs(got.q8) == 127 and (got.q8 > 0) == (top.v > 0)


def test_pii_redaction_is_idempotent(spark, sf_dir):
    """redact(redact(x)) == redact(x): placeholders contain no digits
    or @, so a second pass is a no-op — the property that makes the
    operator safe to re-run over partially-processed partitions."""
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    once = REGISTRY["text_pii_redaction"].fn(spark, sf_dir)
    twice = once.select(
        "doc_id", pii_redact(F.col("redacted")).alias("redacted")
    )
    a = {r.doc_id: r.redacted for r in once.select("doc_id", "redacted").collect()}
    b = {r.doc_id: r.redacted for r in twice.collect()}
    assert a == b


def test_table_diff_identity_and_disjoint(spark, sf_dir):
    from aws_etl_spark.ops.quality import table_diff
    from aws_etl_spark.queries.registry import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    same = table_diff(orders, orders, ["o_orderkey"])
    assert same.filter(F.col("status") != "same").count() == 0
    shifted = orders.withColumn(
        "o_orderkey", F.col("o_orderkey") + 100_000_000
    )
    disj = (
        table_diff(orders, shifted, ["o_orderkey"])
        .groupBy("status").count().collect()
    )
    counts = {r.status: r["count"] for r in disj}
    n = orders.count()
    assert counts == {"removed": n, "added": n}


def test_decontaminate_is_idempotent(spark, sf_dir):
    """Running decontamination on an already-clean corpus removes
    nothing more (the kept set is a fixed point)."""
    from aws_etl_spark.dedup.jaccard import shingle_rows
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded, load_table

    _ensure_loaded()
    kept = REGISTRY["dedup_decontaminate"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    bench_sh = shingle_rows(bench, "doc_id", "text", k=5).select("shingle").distinct()
    kept_docs = docs.join(
        kept.select("doc_id"), "doc_id", "left_semi"
    )
    again = kept_docs.join(
        shingle_rows(kept_docs, "doc_id", "text", k=5, distinct=False)
        .join(F.broadcast(bench_sh), "shingle")
        .select(F.col("doc").alias("doc_id"))
        .distinct(),
        "doc_id",
        "left_anti",
    )
    assert again.count() == kept.count()


def test_bpe_merge_matches_python_reference(spark):
    """Fixed-round BPE training == the shared canonical Python
    reference (tests/bpe_reference.py). The corpus is built to
    exercise the tricky cases: same-symbol runs (odd/even lengths —
    greedy takes odd offsets only), adjacent non-overlapping matches,
    and merged symbols pairing in later rounds."""
    from bpe_reference import canonical_bpe

    from aws_etl_spark.text.bpe import bpe_train

    texts = [
        "aaa aaaa abab low lower lowest",
        "abab abab low low newest newest",
        "aaa banana low lowest newest",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    expected_merges, expected_vocab = canonical_bpe(texts, n_rounds=3)

    merges, vocab = bpe_train(df, "text", n_rounds=3)
    got_merges = [
        (r.round, r.sym_a, r.sym_b, r.merged, r.pair_count)
        for r in merges.orderBy("round").collect()
    ]
    assert got_merges == expected_merges
    got_vocab = {r.sym: r.n_occurrences for r in vocab.collect()}
    assert got_vocab == expected_vocab


def test_bpe_stops_when_fully_merged(spark):
    """A corpus whose every word collapses to one symbol before
    n_rounds must stop early with the shorter rule list and keep the
    merged vocabulary — not wipe the state through an empty-rule
    crossJoin (regression: best_pair of a pairless sequence is
    empty)."""
    from aws_etl_spark.text.bpe import bpe_train

    df = spark.createDataFrame([(0, "a a a")], ["doc_id", "text"])
    merges, vocab = bpe_train(df, "text", n_rounds=5)
    got = [(r.round, r.merged) for r in merges.orderBy("round").collect()]
    # 'a</w>' after round 1; no pairs remain → exactly one rule
    assert got == [(1, "a</w>")]
    assert {r.sym: r.n_occurrences for r in vocab.collect()} == {"a</w>": 3}


def test_bpe_oracle_matches_engine_on_fully_merged_corpus(spark, tmp_path):
    """The unrolled-CTE oracle must share the early-stop semantics:
    on a corpus that fully merges before n_rounds, the empty best{r}
    rule LEFT-JOINs through (sequence unchanged, no rule row) instead
    of wiping the state (review finding: the Spark-side fix alone left
    query and oracle divergent on exactly this input class)."""
    import duckdb
    import pandas as pd

    from aws_etl_spark.queries.llm_text import (
        _bpe_merges_oracle,
        _bpe_vocab_oracle,
    )
    from aws_etl_spark.text.bpe import bpe_train

    pdf = pd.DataFrame(
        {
            "doc_id": [0],
            "text": ["a a a"],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [5],
        }
    )
    pdf.to_parquet(f"{tmp_path}/documents.parquet")
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    ora_merges = con.sql(_bpe_merges_oracle(3)).fetchall()
    ora_vocab = dict(con.sql(_bpe_vocab_oracle(3)).fetchall())

    df = spark.createDataFrame([(0, "a a a")], ["doc_id", "text"])
    merges, vocab = bpe_train(df, "text", n_rounds=3)
    got_merges = [
        tuple(r) for r in merges.orderBy("round").collect()
    ]
    got_vocab = {r.sym: r.n_occurrences for r in vocab.collect()}

    assert got_merges == sorted(ora_merges)
    assert got_vocab == ora_vocab == {"a</w>": 3}


def test_heaps_law_matches_python_reference(spark, sf_dir):
    """Replay the 20-checkpoint vocabulary-growth curve and the
    integer OLS in pure Python; demand exact equality."""
    import math

    from aws_etl_spark.queries.registry import (
        REGISTRY,
        _ensure_loaded,
        load_table,
    )

    _ensure_loaded()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    per_doc = {}
    first = {}
    for r in docs:
        words = [w for w in r["text"].strip().lower().split(" ") if w != ""]
        per_doc[r["doc_id"]] = len(words)
        for w in words:
            if w not in first or r["doc_id"] < first[w]:
                first[w] = r["doc_id"]
    n_docs = max(per_doc) + 1
    pts = []
    for k in range(1, 21):
        cut = math.floor(n_docs * k / 20.0)
        nt = sum(c for d, c in per_doc.items() if d < cut)
        vb = sum(1 for d in first.values() if d < cut)
        pts.append((k, cut, nt, vb,
                    math.floor(math.log(nt) * 1e6),
                    math.floor(math.log(vb) * 1e6)))
    kk = len(pts)
    sx = sum(p[4] for p in pts)
    sy = sum(p[5] for p in pts)
    sxy = sum(p[4] * p[5] for p in pts)
    sxx = sum(p[4] * p[4] for p in pts)
    beta = float(kk * sxy - sx * sy) / float(kk * sxx - sx * sx)
    rows = REGISTRY["text_heaps_law"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    for row, p in zip(sorted(rows, key=lambda r: r["k"]), pts):
        assert (row["k"], row["cut"], row["n_tokens"], row["vocab"],
                row["ln_n_q6"], row["ln_v_q6"]) == p
        assert row["beta"] == beta
    # the synthetic corpus is templated: its 31-word vocabulary
    # saturates within the first checkpoint, so the fitted exponent
    # is exactly 0 — far outside natural text's 0.4-0.6 band, which
    # is precisely the signal the health check exists to raise
    assert beta == 0.0
    assert len({p[3] for p in pts}) == 1


def test_heaps_law_nonzero_slope_on_growing_vocab(spark):
    """Hand-built corpus whose vocabulary actually grows pins the
    non-degenerate OLS path (the parquet corpus saturates at beta=0)."""
    import math

    from aws_etl_spark.queries.llm_text import (
        _HEAPS_SPARK_BINS,
        _HEAPS_SPARK_TOK,
        _heaps_sql,
    )

    rows = []
    for d in range(40):
        words = [f"w{j}" for j in range(2 * d + 1)] + ["the", "and"]
        rows.append((d, " ".join(words)))
    spark.createDataFrame(rows, ["doc_id", "text"]).createOrReplaceTempView(
        "documents"
    )
    sql = _heaps_sql(_HEAPS_SPARK_TOK).replace(
        "bins)", _HEAPS_SPARK_BINS + ")"
    )
    try:
        got = sorted(spark.sql(sql).collect(), key=lambda r: r["k"])
    finally:
        spark.catalog.dropTempView("documents")

    per_doc = {d: 2 * d + 3 for d in range(40)}
    first = {"the": 0, "and": 0}
    for d in range(40):
        for j in range(2 * d + 1):
            first.setdefault(f"w{j}", d)
    pts = []
    for k in range(1, 21):
        cut = math.floor(40 * k / 20.0)
        nt = sum(c for d, c in per_doc.items() if d < cut)
        vb = sum(1 for d in first.values() if d < cut)
        pts.append((math.floor(math.log(nt) * 1e6), math.floor(math.log(vb) * 1e6)))
    kk = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    beta = float(kk * sxy - sx * sy) / float(kk * sxx - sx * sx)
    assert got[0]["beta"] == beta
    assert 0.5 < beta < 1.5  # near-linear vocab growth by construction
    assert [r["ln_v_q6"] for r in got] == [y for _, y in pts]
