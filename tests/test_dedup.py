"""Cross-validation of the sketch-based dedup paths against the exact
path (the sketches have no SQL oracle — this is their correctness
gate, per queries/dedup_queries.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_spark.dedup import (
    dedup_exact,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from aws_etl_spark.queries.registry import load_table


def test_minhash_pairs_subset_of_exact_with_high_recall(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.5).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_near_dup_pairs(
            docs, "doc_id", "text", k=3, n_hashes=64, bands=16, threshold=0.5
        ).collect()
    }
    assert lsh <= exact  # verify stage guarantees no false positives
    assert len(exact) > 0
    # Corpus-specific pin: the synthetic near-dup pairs are high-Jaccard
    # enough that 16×4 banding catches every one (verified by hand at
    # sf0.01 and sf0.1 too). dedup_clusters_cc's exact-SQL oracle
    # RELIES on this — it feeds the CC from LSH candidates while the
    # oracle recomputes pairs exactly. If this ever fails on new test
    # data, raise bands (recall) before touching the oracle.
    assert lsh == exact, (
        f"LSH recall {len(lsh)}/{len(exact)} < 1.0 on the test corpus; "
        "dedup_clusters_cc's oracle depends on full recall here"
    )


def test_minhash_deterministic_across_runs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(
        map(tuple, minhash_near_dup_pairs(docs, "doc_id", "text").collect())
    )
    b = sorted(
        map(tuple, minhash_near_dup_pairs(docs, "doc_id", "text").collect())
    )
    assert a == b


def test_simhash_identical_docs_distance_zero(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "completely different words entirely here now"),
        ],
        ["doc_id", "text"],
    )
    pairs = simhash_near_dup_pairs(df, "doc_id", "text", max_distance=3).collect()
    assert {(r.id_a, r.id_b, r.hamming) for r in pairs} == {(1, 2, 0)}


def test_dedup_exact_survivor_is_min(spark):
    df = spark.createDataFrame(
        [(5, "x", "a"), (2, "x", "a"), (9, "y", "b")], ["id", "c1", "c2"]
    )
    out = dedup_exact(df, ["c1", "c2"], "id")
    assert {r.id for r in out.collect()} == {2, 9}
    out_max = dedup_exact(df, ["c1", "c2"], "id", keep="max")
    assert {r.id for r in out_max.collect()} == {5, 9}


def test_dedup_exact_no_separator_ambiguity(spark):
    # ("a b", "c") must not collide with ("a", "b c")
    df = spark.createDataFrame([(1, "a b", "c"), (2, "a", "b c")], ["id", "c1", "c2"])
    assert dedup_exact(df, ["c1", "c2"], "id").count() == 2


def test_minhash_plan_has_no_python_udf(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = minhash_near_dup_pairs(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan



def test_minhash_band_join_carries_no_shingles_measured(spark, sf_dir):
    """Quantitative pin of the round-2 restructure: total shuffle
    volume of the full LSH pipeline stays within a small multiple of
    ONE doc→shingles aggregation (the unavoidable linear cost). The
    pre-restructure plan carried each doc's shingle set through the
    band self-join ×bands ×2 sides — an order of magnitude more."""
    from aws_etl_spark.dedup.minhash import (
        minhash_near_dup_pairs,
        minhash_signatures,
    )
    from aws_etl_spark.plans import executed_shuffle_bytes
    from aws_etl_spark.queries.registry import load_table

    # earlier tests cache the identical signatures plan; a cache hit
    # would read zero shuffle bytes and void the measurement
    spark.catalog.clearCache()
    docs = load_table(spark, sf_dir, "documents")
    base = executed_shuffle_bytes(
        minhash_signatures(docs, "doc_id", "text", k=3, n_hashes=64)
    )
    full = executed_shuffle_bytes(
        minhash_near_dup_pairs(
            docs, "doc_id", "text", k=3, n_hashes=64, bands=16, threshold=0.5
        )
    )
    assert base > 0
    assert full < 3 * base, (full, base)


def test_pagerank_matches_exact_power_iteration(spark, sf_dir):
    """Distributed PageRank must agree with an exact driver-side power
    iteration (same damping/iterations) to float tolerance, and ranks
    must sum to ~1."""
    from aws_etl_spark.dedup.minhash import minhash_near_dup_pairs
    from aws_etl_spark.dedup.pagerank import DAMPING, N_ITER, pagerank
    from aws_etl_spark.queries.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_dup_pairs(
        docs, "doc_id", "text", k=3, n_hashes=64, bands=16, threshold=0.5
    ).select("id_a", "id_b")
    got = {r.node: r.rank for r in pagerank(pairs).collect()}
    assert got, "empty dup graph in fixture"
    assert abs(sum(got.values()) - 1.0) < 1e-9

    edges = [(r.id_a, r.id_b) for r in pairs.collect()]
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    n = len(adj)
    ranks = {u: 1.0 / n for u in adj}
    for _ in range(N_ITER):
        contrib = {u: 0.0 for u in adj}
        for u, nbrs in adj.items():
            share = ranks[u] / len(nbrs)
            for v in nbrs:
                contrib[v] += share
        ranks = {u: (1 - DAMPING) / n + DAMPING * contrib[u] for u in adj}
    assert set(got) == set(ranks)
    for u in ranks:
        assert abs(got[u] - ranks[u]) <= 1e-9 + 1e-6 * abs(ranks[u]), u


def test_quantized_pagerank_tracks_float(spark, sf_dir):
    """The oracle-able integer-unit PageRank must agree with the float
    variant to quantization tolerance (1e-9 of rank mass per node)."""
    from aws_etl_spark.dedup.minhash import minhash_near_dup_pairs
    from aws_etl_spark.dedup.pagerank import Q_SCALE, pagerank, pagerank_quantized
    from aws_etl_spark.queries.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_dup_pairs(
        docs, "doc_id", "text", k=3, n_hashes=64, bands=16, threshold=0.5
    ).select("id_a", "id_b")
    fl = {r.node: r.rank for r in pagerank(pairs).collect()}
    qz = {r.node: r.rank_q / Q_SCALE for r in pagerank_quantized(pairs).collect()}
    assert set(fl) == set(qz)
    for n in fl:
        assert abs(fl[n] - qz[n]) < 1e-7, (n, fl[n], qz[n])


def test_oversize_bucket_count_detects_truncation(spark):
    """The banded Hamming join's max_bucket cap silently truncates
    degenerate buckets; oversize_bucket_count is the audit that lets
    exact-parity callers detect it (advice item). 0 oversize buckets
    ⇒ banded result is exact; an oversize bucket ⇒ pairs were
    dropped."""
    from pyspark.sql import functions as F

    from aws_etl_spark.dedup.simhash import (
        hamming_near_dup_pairs,
        oversize_bucket_count,
    )

    # 12 identical signatures: every bucket holds 12 members
    sigs = spark.range(12).select(
        F.col("id").alias("doc"), F.lit(0).cast("long").alias("simhash")
    )
    assert oversize_bucket_count(sigs, max_bucket=1000) == 0
    assert oversize_bucket_count(sigs, max_bucket=5) == 4  # all 4 chunks

    # with the cap at 5, only the 5 lowest ids survive per bucket:
    # C(5,2)=10 pairs instead of C(12,2)=66 — truncation is real, and
    # the audit flagged it
    n_capped = hamming_near_dup_pairs(sigs, max_bucket=5).count()
    n_full = hamming_near_dup_pairs(sigs, max_bucket=1000).count()
    assert (n_capped, n_full) == (10, 66)


def test_simhash_banded_equals_bruteforce(spark, sf_dir):
    """SimHash text near-dup: the banded Hamming join over real
    document signatures finds EXACTLY the pairs a brute-force
    all-pairs scan finds — with the exactness precondition (zero
    truncated buckets) ASSERTED via oversize_bucket_count rather than
    assumed (advice item: the pin silently relied on test-scale
    buckets staying under the cap)."""
    from itertools import combinations

    from aws_etl_spark.dedup.simhash import (
        hamming_near_dup_pairs,
        oversize_bucket_count,
        simhash_signature,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = simhash_signature(docs, "doc_id", "text").cache()
    assert oversize_bucket_count(sigs) == 0, (
        "banded==brute precondition violated: oversize bucket(s) truncated"
    )
    banded = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_near_dup_pairs(sigs, max_distance=3).collect()
    }
    local = {r.doc: r.simhash for r in sigs.collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    brute = {
        (a, b): ham(local[a], local[b])
        for a, b in combinations(sorted(local), 2)
        if ham(local[a], local[b]) <= 3
    }
    assert banded == brute
