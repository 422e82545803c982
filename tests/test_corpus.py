"""Corpus-assembly operator tests: md5-bucket engine portability,
split stability, mixture determinism, Unicode normalization kernels,
chunking properties, embedding dim stats, and SemDeDup
cross-validation against exact cosine pairs."""

from __future__ import annotations

import unicodedata

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_etl_spark.ops.corpus import (
    N_BUCKETS,
    duckdb_bucket_sql,
    hash_bucket,
    mixture_sample,
    split_assign,
)
from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded, load_table
from aws_etl_spark.text.normalize import normalize_text, strip_html

_ensure_loaded()


# ---------------------------------------------------------------- buckets


def test_hash_bucket_matches_duckdb(spark):
    """The portability property everything rests on: Spark's
    conv(substr(md5,1,4),16,10) equals the strpos-decoded DuckDB
    expression for the same key strings."""
    keys = spark.range(500).select(F.col("id").cast("string").alias("k"))
    got = {
        r.k: r.b
        for r in keys.select("k", hash_bucket(F.col("k")).alias("b")).collect()
    }
    con = duckdb.connect()
    expr = duckdb_bucket_sql("k")
    want = dict(
        con.execute(
            f"SELECT k, {expr} FROM (SELECT CAST(range AS VARCHAR) k FROM range(500))"
        ).fetchall()
    )
    assert got == want
    assert all(0 <= b < N_BUCKETS for b in got.values())


def test_split_assign_stable_under_growth(spark):
    """A document's split depends only on its own key: assigning over
    a subset and over the full corpus gives identical labels."""
    frac = {"train": 0.8, "val": 0.1, "test": 0.1}
    full = split_assign(
        spark.range(2000).withColumnRenamed("id", "k"), "k", frac
    )
    sub = split_assign(
        spark.range(500).withColumnRenamed("id", "k"), "k", frac
    )
    full_map = {r.k: r.split for r in full.collect()}
    for r in sub.collect():
        assert full_map[r.k] == r.split
    # fractions land near target (binomial tolerance at n=2000)
    counts = {r["split"]: r["count"] for r in full.groupBy("split").count().collect()}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    assert abs(counts["test"] / 2000 - 0.1) < 0.03


def test_split_assign_rejects_bad_fractions(spark):
    with pytest.raises(ValueError):
        split_assign(
            spark.range(5).withColumnRenamed("id", "k"), "k", {"a": 0.5, "b": 0.4}
        )


def test_mixture_sample_rates_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    weights = {"src0": 1.0, "src1": 0.5}
    kept = mixture_sample(docs, "source", "doc_id", weights, default_weight=0.0)
    rows = kept.select("doc_id", "source").collect()
    again = kept.select("doc_id", "source").collect()
    assert sorted(r.doc_id for r in rows) == sorted(r.doc_id for r in again)
    by_src: dict[str, int] = {}
    for r in rows:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    total = {
        r["source"]: r["count"]
        for r in docs.groupBy("source").count().collect()
    }
    assert by_src.get("src0", 0) == total["src0"]  # rate 1.0 keeps all
    assert 0 < by_src.get("src1", 0) < total["src1"]  # rate .5 keeps some
    assert set(by_src) <= {"src0", "src1"}  # default 0 drops the rest


# ---------------------------------------------------------- normalization

_UNICODE_CASES = [
    "école",  # decomposed é → composed under NFC
    "école",  # already composed
    "ﬁn de siècle",  # ﬁ ligature survives NFC (it is NFKC-only)
    "Ｈello ｗorld",  # fullwidth letters survive NFC
    "각 han",  # Hangul jamo compose under NFC
    "  spaced\t\tout\n\nlines  ",
    "MIXED Case ÅNGSTRÖM Å",  # U+212B ANGSTROM SIGN → U+00C5 under NFC
]


def test_normalize_matches_python_and_duckdb(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(_UNICODE_CASES)], "i int, t string")
    got = {r.i: r.n for r in df.select("i", normalize_text(F.col("t")).alias("n")).collect()}
    con = duckdb.connect()
    for i, t in enumerate(_UNICODE_CASES):
        py = " ".join(unicodedata.normalize("NFC", t).lower().split())
        dk = con.execute(
            r"SELECT TRIM(REGEXP_REPLACE(LOWER(nfc_normalize($t)), '\s+', ' ', 'g'))",
            {"t": t},
        ).fetchone()[0]
        assert got[i] == py == dk, (t, got[i], py, dk)


def test_strip_html(spark):
    cases = [
        ("<p>Hello <b>world</b></p>", "Hello world"),
        ("<script>var x = '<p>';</script>text", "text"),
        ("<style>p { color: red; }</style>body", "body"),
        ("A &amp; B &#64; C", "A B C"),
        ("no markup here", "no markup here"),
        ("<div class='x'>nested <span>tags</span></div>", "nested tags"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i int, h string"
    )
    got = {r.i: r.s for r in df.select("i", strip_html(F.col("h")).alias("s")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)


# --------------------------------------------------------------- chunking


def test_chunking_covers_text(spark, sf_dir):
    chunks = REGISTRY["text_chunking"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    texts = {r.doc_id: r.text for r in docs.collect()}
    rows = chunks.collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(texts)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_idx)
        text = texts[doc_id]
        # stride positions: 1, 81, 161, …; every chunk is the real substring
        for j, r in enumerate(rs):
            assert r.chunk_start == 1 + 80 * j
            assert r.chunk_text == text[r.chunk_start - 1 : r.chunk_start - 1 + 120]
            assert r.chunk_len == len(r.chunk_text)
        # consecutive chunks overlap by size−stride = 40 chars
        for a, b in zip(rs, rs[1:]):
            if a.chunk_len == 120:
                assert a.chunk_text[80:] == b.chunk_text[: a.chunk_len - 80]
        # non-overlapping prefixes reconstruct the document
        assert "".join(r.chunk_text[:80] for r in rs) == text


# -------------------------------------------------------------- dim stats


def test_dim_stats_match_numpy(spark, sf_dir):
    out = {r.dim: r for r in REGISTRY["embeddings_dim_stats"].fn(spark, sf_dir).collect()}
    emb = load_table(spark, sf_dir, "embeddings").collect()
    M = np.array([[float(x) for x in r.embedding] for r in emb], dtype=np.float64)
    Q = np.floor(M * 1e6).astype(np.int64)
    for d in range(M.shape[1]):
        r = out[d + 1]
        assert r.n == M.shape[0]
        assert r.sum_q6 == int(Q[:, d].sum())
        assert r.min_q6 == int(Q[:, d].min())
        assert r.max_q6 == int(Q[:, d].max())
        assert r.mean_approx == pytest.approx(Q[:, d].sum() / M.shape[0] / 1e6)


# --------------------------------------------------------- shuffle shards


def test_shuffle_shards_properties(spark, sf_dir):
    """Deterministic, balanced, dense ranks per shard; a different
    salt re-deals the order."""
    from aws_etl_spark.ops.corpus import shuffle_shards

    docs = load_table(spark, sf_dir, "documents")
    a = shuffle_shards(docs, "doc_id", 8).select("doc_id", "shard", "rank")
    b = shuffle_shards(docs, "doc_id", 8).select("doc_id", "shard", "rank")
    rows_a = sorted(map(tuple, a.collect()))
    assert rows_a == sorted(map(tuple, b.collect()))  # deterministic
    by_shard: dict[int, list[int]] = {}
    for _, shard, rank in rows_a:
        by_shard.setdefault(shard, []).append(rank)
    assert set(by_shard) == set(range(8))
    n = len(rows_a)
    for shard, ranks in by_shard.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))  # dense
        assert len(ranks) > n / 16  # no empty/starved shard at n=500
    other = shuffle_shards(docs, "doc_id", 8, salt="shuffle-epoch-1")
    rows_o = sorted(map(tuple, other.select("doc_id", "shard", "rank").collect()))
    assert rows_a != rows_o  # new salt ⇒ new deal


# --------------------------------------------------------- streaming dedup


def test_dedup_documents_stream_equals_batch(spark, sf_dir, tmp_path):
    """Planted exact duplicates arriving as a stream: one survivor per
    distinct content fingerprint, matching the batch dropDuplicates
    over the same arrivals."""
    import uuid

    from aws_etl_spark.streaming.dedup_stream import (
        content_fingerprint,
        dedup_documents_stream,
    )

    docs = load_table(spark, sf_dir, "documents").limit(100)
    dups = docs.limit(30).withColumn("doc_id", F.col("doc_id") + 100000)
    arrivals = docs.unionByName(dups).withColumn(
        "ts", F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id") % 1000)
    )
    path = f"{tmp_path}/docs_stream_src"
    arrivals.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(
        spark.read.parquet(path).schema
    ).parquet(path)
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        dedup_documents_stream(stream, watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(f"SELECT fp FROM {name}").collect()
    want = (
        arrivals.withColumn("fp", content_fingerprint(F.col("text")))
        .select("fp")
        .distinct()
        .collect()
    )
    assert sorted(r.fp for r in got) == sorted(r.fp for r in want)
    # every planted duplicate collapsed: 130 arrivals → 100 survivors
    assert len(got) == 100


# --------------------------------------------------------- semantic dedup


def test_semantic_dedup_cross_validates_exact(spark, sf_dir):
    """Every dropped row has a genuine lower-id near-dup at the same
    threshold (soundness: no false drops); output is deterministic;
    labels cover the corpus exactly once."""
    out = REGISTRY["dedup_semantic"].fn(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings").collect()
    ids = [r.vec_id for r in emb]
    M = np.array([[float(x) for x in r.embedding] for r in emb], dtype=np.float64)
    U = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = U @ U.T
    pos = {v: i for i, v in enumerate(ids)}
    assert sorted(r.vec_id for r in out) == sorted(ids)
    dropped = [r for r in out if r.is_dup]
    assert dropped, "threshold should drop at least one row on this corpus"
    for r in dropped:
        i = pos[r.vec_id]
        lower = [pos[v] for v in ids if v < r.vec_id]
        assert max(S[i, j] for j in lower) >= 0.4 - 1e-9, r
    again = REGISTRY["dedup_semantic"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_semantic_dedup_recall_within_cluster(spark, sf_dir):
    """Within a cluster the pair scan is exhaustive: any row whose
    best LOWER-ID CLUSTERMATE clears the threshold must be flagged
    (completeness of step 3 given the clustering of step 2)."""
    out = REGISTRY["dedup_semantic"].fn(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings").collect()
    M = np.array([[float(x) for x in r.embedding] for r in emb], dtype=np.float64)
    U = M / np.linalg.norm(M, axis=1, keepdims=True)
    pos = {r.vec_id: i for i, r in enumerate(emb)}
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r.cluster, []).append(r)
    for members in by_cluster.values():
        members.sort(key=lambda r: r.vec_id)
        for j, r in enumerate(members[1:], start=1):
            best = max(
                float(U[pos[r.vec_id]] @ U[pos[m.vec_id]]) for m in members[:j]
            )
            assert r.is_dup == (best >= 0.4 - 1e-9), (r, best)


# ------------------------------------------------------ streaming near-dup


def _perturbed(text_col):
    """Change one word (token #5) — a genuine near-dup with a tiny
    signature drift, not an exact copy. Pure JVM expression (a Python
    UDF defined in a test module cannot be imported by workers)."""
    return F.array_join(
        F.transform(
            F.split(F.trim(text_col), r"\s+"),
            lambda w, i: F.when(i == 5, F.lit("zzznear")).otherwise(w),
        ),
        " ",
    )


def test_near_dup_apply_batch_incremental(spark, sf_dir, tmp_path):
    """Three arrival waves through the incremental filter: planted
    near-copies arriving later are dropped against the store; the
    final emitted set is pairwise Hamming > d (the operator's
    invariant), and wave 1 matches the batch keep-min rule exactly."""
    from aws_etl_spark.dedup.simhash import simhash_near_dup_pairs, simhash_signature
    from aws_etl_spark.streaming.neardup_stream import near_dup_apply_batch

    store = f"{tmp_path}/sig_store"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    wave1 = docs.filter(F.col("doc_id") < 60)
    # wave 2: fresh docs + near-copies of wave-1 docs (higher ids)
    copies2 = (
        wave1.filter(F.col("doc_id") < 20)
        .select((F.col("doc_id") + 10_000).alias("doc_id"),
                _perturbed(F.col("text")).alias("text"))
    )
    wave2 = docs.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 120)).unionByName(copies2)
    # wave 3: near-copies of wave-2 survivors-to-be
    copies3 = (
        docs.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 80))
        .select((F.col("doc_id") + 20_000).alias("doc_id"),
                _perturbed(F.col("text")).alias("text"))
    )

    kept1 = near_dup_apply_batch(spark, wave1, store).collect()
    kept2 = near_dup_apply_batch(spark, wave2, store).collect()
    kept3 = near_dup_apply_batch(spark, copies3, store).collect()

    # wave 1 == the batch keep-min rule on the same docs
    from aws_etl_spark.dedup.components import dedup_clusters

    pairs = simhash_near_dup_pairs(wave1, "doc_id", "text").select("id_a", "id_b")
    want1 = {
        r.doc_id
        for r in dedup_clusters(pairs, wave1, "doc_id")
        .filter(F.col("is_canonical"))
        .collect()
    }
    assert {r.doc_id for r in kept1} == want1

    # planted near-copies must be dropped iff their signature is
    # actually within distance of the original's (perturbation is
    # near-guaranteed to stay ≤3 bits; verify rather than assume)
    all_in = wave1.unionByName(wave2).unionByName(copies3)
    sig = {r.doc: r.simhash for r in simhash_signature(all_in, "doc_id", "text").collect()}
    emitted = {r.doc_id for r in kept1} | {r.doc_id for r in kept2} | {r.doc_id for r in kept3}

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    n_close_copies = 0
    for cid in list(range(10_000, 10_020)) + list(range(20_060, 20_080)):
        orig = cid % 10_000 if cid < 20_000 else cid - 20_000
        if orig in emitted and ham(sig[cid], sig[orig]) <= 3:
            n_close_copies += 1
            assert cid not in emitted, (cid, orig, ham(sig[cid], sig[orig]))
    assert n_close_copies >= 30  # the perturbation really is a near-dup

    # operator invariant: emitted set pairwise Hamming > 3
    em = sorted(emitted)
    for i, a in enumerate(em):
        for b in em[i + 1 :]:
            assert ham(sig[a], sig[b]) > 3, (a, b)


def test_near_dup_filter_stream_wiring(spark, sf_dir, tmp_path):
    """The foreachBatch wiring end-to-end on a real stream: survivors
    land in the sink, signatures land in the store, and a second
    availableNow run of pure re-arrivals is filtered by the store.
    Doc sets are built with deterministic id filters (``limit`` is
    plan-nondeterministic across re-evaluations)."""
    from aws_etl_spark.streaming.neardup_stream import near_dup_filter_stream

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 80)
    dups = docs.filter(F.col("doc_id") < 20).withColumn(
        "doc_id", F.col("doc_id") + 50_000
    )
    src = f"{tmp_path}/nd_src"
    base.unionByName(dups).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(base.schema).parquet(src)
    q = near_dup_filter_stream(
        stream, f"{tmp_path}/nd_store", f"{tmp_path}/nd_out", f"{tmp_path}/nd_ckpt"
    )
    q.awaitTermination()
    out = spark.read.parquet(f"{tmp_path}/nd_out")
    n_store = spark.read.parquet(f"{tmp_path}/nd_store").count()
    assert out.count() == n_store
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    assert kept
    # an exact copy and its original can never BOTH be emitted
    # (distance 0; either within-batch CC or the store catches it)
    for cid in range(50_000, 50_020):
        assert not (cid in kept and cid - 50_000 in kept), cid
    # second run: re-arrivals (exact copies of round-1 docs) are
    # filtered against the store
    from aws_etl_spark.dedup.simhash import simhash_signature

    store_sigs = [
        r.simhash
        for r in spark.read.parquet(f"{tmp_path}/nd_store").collect()
    ]
    rerun = docs.filter(F.col("doc_id") < 80).withColumn(
        "doc_id", F.col("doc_id") + 60_000
    )
    rerun.write.mode("overwrite").parquet(f"{tmp_path}/nd_src2")
    stream2 = spark.readStream.schema(base.schema).parquet(f"{tmp_path}/nd_src2")
    q2 = near_dup_filter_stream(
        stream2, f"{tmp_path}/nd_store", f"{tmp_path}/nd_out", f"{tmp_path}/nd_ckpt2"
    )
    q2.awaitTermination()
    out2 = {r.doc_id for r in spark.read.parquet(f"{tmp_path}/nd_out").collect()}
    emitted2 = {i for i in out2 if i >= 60_000}
    # exact copies of round-1 emitted docs MUST be dropped
    assert not {i + 60_000 for i in kept} & emitted2
    # and anything emitted is > d from every pre-run-2 store signature
    sig2 = {
        r.doc: r.simhash
        for r in simhash_signature(rerun, "doc_id", "text").collect()
    }

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    for i in emitted2:
        assert min(ham(sig2[i], s) for s in store_sigs) > 3, i
