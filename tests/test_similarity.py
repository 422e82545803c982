"""Recall gates for the approximate ANN paths (no SQL oracle) against
the exact brute-force path, plus determinism checks."""

from __future__ import annotations

from aws_etl_spark.queries.registry import load_table
from aws_etl_spark.similarity import cosine_topk, cosine_topk_lsh, ivf_topk


def _pairs(rows):
    return {(r.query_id, r.neighbor_id) for r in rows}


def test_lsh_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 20")
    exact = _pairs(cosine_topk(emb, queries, k=5).collect())
    approx = _pairs(cosine_topk_lsh(emb, queries, k=5).collect())
    recall = len(exact & approx) / len(exact)
    # sign-LSH on unclustered 64-d data is a coarse filter; the gate
    # asserts it beats random candidate selection by a wide margin
    assert recall >= 0.3, f"LSH recall {recall}"


def test_ivf_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 20")
    exact = _pairs(cosine_topk(emb, queries, k=5).collect())
    approx = _pairs(ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=4).collect())
    recall = len(exact & approx) / len(exact)
    # spherical-k-means-trained quantizer: measured 0.84 (sf0.01) /
    # 0.92 (sf0.1); gate well below to absorb data-seed variance but
    # far above the untrained-centroid regime
    assert recall >= 0.6, f"IVF recall {recall}"


def test_exact_topk_rank_contract(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = cosine_topk(emb, emb.filter("vec_id < 3"), k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, 6))
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r.neighbor_id != q for r in rows)


def test_exact_topk_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter("vec_id < 5")
    a = sorted(map(tuple, cosine_topk(emb, q, k=3).collect()))
    b = sorted(map(tuple, cosine_topk(emb, q, k=3).collect()))
    assert a == b


def test_kmeans_quantization_guard_raises_out_of_range(spark):
    """The OFFSET shift only keeps cross-engine integer division exact
    while floor(v*1e6)+OFFSET >= 0; components <= -2.0 must raise, not
    silently diverge from the DuckDB oracle (advice item)."""
    import pytest

    from aws_etl_spark.similarity.kmeans import kmeans_quantized

    ok = spark.createDataFrame(
        [(1, [0.5, -1.9]), (2, [0.1, 0.2])],
        "vec_id long, embedding array<double>",
    )
    assert kmeans_quantized(ok, k=1, n_iter=1).count() == 2

    bad = spark.createDataFrame(
        [(1, [0.5, -2.5]), (2, [0.1, 0.2])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="out of quantization range"):
        kmeans_quantized(bad, k=1, n_iter=1).count()


def test_lsh_oracle_builder_generalizes(spark, sf_dir):
    """_lsh_exact_oracle must mirror cosine_topk_lsh for ANY
    parameterization, not just the two registered ones — pin a third
    (8 bits × 4 bands, different seed) end-to-end through DuckDB so a
    future edit to either side can't silently specialize them."""
    import duckdb

    from aws_etl_spark.queries.similarity_queries import _lsh_exact_oracle
    from aws_etl_spark.similarity.topk import cosine_topk_lsh

    emb_path = f"{sf_dir}/embeddings.parquet"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{emb_path}'")
    ora = {
        (r[0], r[1], r[2]): r[3]
        for r in con.sql(
            _lsh_exact_oracle(bits=8, bands=4, seed=7, k=3)
        ).fetchall()
    }

    emb = spark.read.parquet(emb_path)
    got = {
        (r.query_id, r.neighbor_id, r.rank): r.cosine
        for r in cosine_topk_lsh(
            emb, emb.filter("vec_id < 20"), k=3, bits=8, bands=4, seed=7
        ).collect()
    }
    assert got.keys() == ora.keys()
    for k_, v in got.items():
        assert v == ora[k_], (k_, v, ora[k_])  # bit-identical doubles


def test_ivf_exact_oracle_builder_alternate_parameterization(spark, sf_dir):
    """_ivf_exact_oracle must mirror the pinned-centroid ivf_topk for
    ANY parameterization, not just the registered one — pin a second
    (8 lists, probe 2, different seed, k=3) end-to-end through DuckDB
    so a future edit to either side can't silently specialize them."""
    import duckdb

    from aws_etl_spark.queries.similarity_queries import _ivf_exact_oracle
    from aws_etl_spark.similarity.topk import fixed_unit_centroids, ivf_topk

    emb_path = f"{sf_dir}/embeddings.parquet"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{emb_path}'")
    ora = {
        (r[0], r[1], r[2]): r[3]
        for r in con.sql(
            _ivf_exact_oracle(n_centroids=8, n_probe=2, k=3, seed=11)
        ).fetchall()
    }

    emb = spark.read.parquet(emb_path)
    got = {
        (r.query_id, r.neighbor_id, r.rank): r.cosine
        for r in ivf_topk(
            emb,
            emb.filter("vec_id < 20"),
            k=3,
            n_probe=2,
            centroids=fixed_unit_centroids(dim=64, n_centroids=8, seed=11),
        ).collect()
    }
    assert got.keys() == ora.keys()
    for k_, v in got.items():
        assert v == ora[k_], (k_, v, ora[k_])  # bit-identical doubles


def test_semantic_exact_oracle_builder_alternate_parameterization(spark, sf_dir):
    """_semantic_exact_oracle must mirror the pinned-centroid
    semantic_dedup for ANY parameterization — pin a second (8 cells,
    threshold 0.35, different seed) end-to-end through DuckDB."""
    import duckdb
    import math

    from aws_etl_spark.queries.corpus_queries import _semantic_exact_oracle
    from aws_etl_spark.similarity.semantic import semantic_dedup
    from aws_etl_spark.similarity.topk import fixed_unit_centroids

    emb_path = f"{sf_dir}/embeddings.parquet"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{emb_path}'")
    ora = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(
            _semantic_exact_oracle(n_centroids=8, threshold=0.35, seed=11)
        ).fetchall()
    }

    emb = spark.read.parquet(emb_path)
    got = {
        r.vec_id: (r.cluster, r.is_dup, r.max_cosine_prior)
        for r in semantic_dedup(
            emb,
            "vec_id",
            "embedding",
            threshold=0.35,
            centroids=fixed_unit_centroids(dim=64, n_centroids=8, seed=11),
        ).collect()
    }
    assert got.keys() == ora.keys()
    n_dup = 0
    for k_, (cl, dup, mx) in got.items():
        ocl, odup, omx = ora[k_]
        assert (cl, dup) == (ocl, odup), (k_, (cl, dup), (ocl, odup))
        if mx is None:
            assert omx is None, k_
        else:
            assert mx == omx, (k_, mx, omx)  # bit-identical doubles
        n_dup += bool(dup)
    assert n_dup > 0  # threshold 0.35 must exercise real drop decisions
