"""Spark-4 extension points: Python UDTF + custom Python DataSource."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_udtf_lateral_ngrams(spark):
    from aws_etl_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "a b c d"), (2, "x y"), (3, None)], ["id", "t"]
    ).createOrReplaceTempView("udtf_in")
    rows = spark.sql(
        "SELECT id, n.pos, n.ngram FROM udtf_in, LATERAL word_ngrams(t, 3) n"
    ).collect()
    got = sorted((r.id, r.pos, r.ngram) for r in rows)
    # 2-word and NULL docs emit nothing; 4-word doc emits two 3-grams
    assert got == [(1, 0, "a b c"), (1, 1, "b c d")]


def test_udtf_matches_jvm_shingles(spark, sf_dir):
    """The Python UDTF and the JVM shingle pipeline agree exactly."""
    from aws_etl_spark.dedup.jaccard import shingle_rows
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded, load_table

    _ensure_loaded()
    udtf_out = REGISTRY["udtf_word_ngrams"].fn(spark, sf_dir)
    jvm = shingle_rows(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", k=3,
        distinct=False,
    )
    a = {(r.doc_id, r.ngram) for r in udtf_out.collect()}
    b = {(r.doc, r.shingle) for r in jvm.collect()}
    assert a == b


def test_python_datasource_partition_parallel(spark):
    from aws_etl_spark.io.pydatasource import register_python_datasources

    register_python_datasources(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n", 200).option("partitions", 7).load()
    )
    assert df.count() == 200
    assert df.select("part").distinct().count() == 7
    assert df.schema.simpleString() == (
        "struct<doc_id:bigint,text:string,part:int>"
    )
    # scan runs as 7 real tasks
    assert df.rdd.getNumPartitions() == 7


def test_python_datasource_content_partition_invariant(spark):
    """Content is a function of (seed, doc_id) only — re-planning the
    scan with a different partition count yields the same corpus."""
    from aws_etl_spark.io.pydatasource import register_python_datasources

    register_python_datasources(spark)

    def corpus(parts: int) -> dict[int, str]:
        df = (
            spark.read.format("synthetic_docs")
            .option("n", 150).option("partitions", parts).load()
        )
        return {r.doc_id: r.text for r in df.collect()}

    assert corpus(3) == corpus(11)


def test_python_streaming_datasource_available_now(spark, tmp_path):
    """The Python STREAMING source drains deterministically across
    micro-batches (PythonMicroBatchStream does not support
    Trigger.AvailableNow — drive the default trigger and stop once the
    bounded offset range is consumed)."""
    import time

    from aws_etl_spark.io.pydatasource import register_python_datasources

    register_python_datasources(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", 7).option("max_rows", 23).load()
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT * FROM pyds_stream").count() >= 23:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    rows = spark.sql("SELECT v, batch_no FROM pyds_stream").collect()
    got = sorted((r.v, r.batch_no) for r in rows)
    assert got == [(i, i // 7) for i in range(23)]


def test_python_datasource_composes_with_engine_ops(spark):
    """The custom source is a first-class scan: engine operators run
    on top of it unchanged."""
    from aws_etl_spark.io.pydatasource import register_python_datasources
    from aws_etl_spark.text import whitespace_token_count

    register_python_datasources(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n", 300).option("words_per_doc", 17).load()
    )
    out = df.select(whitespace_token_count(F.col("text")).alias("n")).agg(
        F.min("n"), F.max("n")
    ).first()
    assert out == (17, 17)


def test_mllib_minhash_lsh_agrees_with_engine_jaccard(spark, sf_dir):
    """Stock pyspark.ml MinHashLSH (SURVEY §2.13 named it as the
    library alternative to the hand-rolled minhash) runs against the
    same documents and its approxSimilarityJoin candidates at Jaccard
    distance <= 0.5 must (a) be a SUPERSET of the exact n-gram-Jaccard
    pairs at similarity >= 0.5 restricted to candidate recall — here
    asserted the practical way: every exact pair the engine finds is
    recovered by the ML pipeline, and (b) every ML pair's distance
    agrees with the engine's exact Jaccard to float tolerance. Proves
    a stock-Spark user can swap their MinHashLSH stage in without the
    engine disagreeing with it."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH
    from pyspark.sql import functions as F

    from aws_etl_spark.dedup.jaccard import ngram_jaccard_pairs
    from aws_etl_spark.queries.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # engine-side exact pairs (3-gram Jaccard >= 0.5)
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=0.5
        ).collect()
    }

    # stock ML pipeline over the SAME 3-gram shingle sets
    grams = docs.select(
        "doc_id",
        F.expr(
            "transform(sequence(1, greatest(size(split(lower(text),"
            " '\\\\s+')) - 2, 0)), i -> concat_ws(' ',"
            " slice(split(lower(text), '\\\\s+'), i, 3)))"
        ).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    cv = CountVectorizer(
        inputCol="shingles", outputCol="features", binary=True
    ).fit(grams)
    feats = cv.transform(grams)
    # drop all-zero vectors (MinHashLSH requires >= 1 nonzero)
    feats = feats.filter(
        F.udf(lambda v: v.numNonzeros() > 0, "boolean")("features")
    )
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=42
    ).fit(feats)
    ml_pairs = {
        (min(r.ida, r.idb), max(r.ida, r.idb)): r.dist
        for r in mh.approxSimilarityJoin(feats, feats, 0.5)
        .filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("ida"),
            F.col("datasetB.doc_id").alias("idb"),
            F.col("distCol").alias("dist"),
        )
        .collect()
    }

    missed = set(exact) - set(ml_pairs)
    assert not missed, f"ML pipeline missed exact pairs: {missed}"
    for pair, dist in ml_pairs.items():
        if pair in exact:
            assert abs((1.0 - dist) - exact[pair]) < 1e-9, (pair, dist)
