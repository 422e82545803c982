"""Streaming NEAR-duplicate filter: incremental SimHash dedup with a
persistent signature store (foreachBatch pattern).

``dedup_stream`` drops exact-content repeats; this operator drops
*near*-duplicates (Hamming(simhash) ≤ d) as documents arrive:

per micro-batch
  1. signature each incoming doc (SimHash-64, the batch kernel —
     bit-identical to the batch dedup family);
  2. WITHIN-BATCH dedup with exactly the batch semantics: pigeonhole
     chunk-banded candidate pairs → connected components → keep the
     min-id doc per cluster (the same rule as ``dedup_survivors``);
  3. CROSS-BATCH dedup: banded join of the batch's survivors against
     the signature STORE (every previously-emitted survivor's 16-byte
     sig row); survivors within distance of any stored sig are
     dropped;
  4. emit the remainder and append their signatures to the store.

Semantics: the emitted set is pairwise > d apart (within-batch CC
keep-min guarantees it inside a batch; step 3 guarantees it across
batches — tested invariant). Cluster membership that straddles a
micro-batch boundary is decided conservatively (each batch dedups
itself first), the standard horizon semantics of any streaming
dedup.

Why foreachBatch + a table store rather than
``applyInPandasWithState``: a near-dup decision needs candidates from
FOUR band buckets per doc plus a cross-band OR — per-key stream state
cannot see across keys, but a banded JOIN against a store table can,
and the join IS the batch operator (one code path, cross-validated).
At 100 TB-ingest the store is a bucketed table on (chunk, val) — the
join prunes to colliding buckets; store size is O(emitted survivors),
16 bytes each, and the pattern is the same incremental-merge shape as
``streaming/cdc.py``.

Reference note: the reference has no streaming or dedup at all (its
daily batch appends blindly — etl_aws_vini.py); this is §2.13
north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_etl_spark.dedup.components import dedup_clusters
from aws_etl_spark.dedup.simhash import (
    BITS,
    _hamming,
    simhash_signature,
)

_STORE_SCHEMA = T.StructType(
    [
        T.StructField("doc", T.LongType()),
        T.StructField("simhash", T.LongType()),
    ]
)


def _banded(sigs: DataFrame, chunks: int) -> DataFrame:
    width = BITS // chunks
    keys = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned(F.col("simhash"), c * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("val"),
            )
            for c in range(chunks)
        ]
    )
    return sigs.withColumn("ck", F.explode(keys)).select(
        "doc", "simhash", F.col("ck.chunk").alias("chunk"),
        F.col("ck.val").alias("val"),
    )


def _within_batch_survivors(
    sigs: DataFrame, id_col: str, max_distance: int, chunks: int
) -> DataFrame:
    """Batch-rule dedup of one micro-batch: banded pairs → CC →
    keep-min. Returns the surviving (doc, simhash) rows."""
    banded = _banded(sigs, chunks)
    a = banded.select("chunk", "val", F.col("doc").alias("id_a"),
                      F.col("simhash").alias("sh_a"))
    b = banded.select("chunk", "val", F.col("doc").alias("id_b"),
                      F.col("simhash").alias("sh_b"))
    pairs = (
        a.join(b, ["chunk", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .filter(_hamming(F.col("sh_a"), F.col("sh_b")) <= max_distance)
        .select("id_a", "id_b")
    )
    clusters = dedup_clusters(
        pairs, sigs.select(F.col("doc").alias(id_col)), id_col
    )
    keep = clusters.filter(F.col("is_canonical")).select(
        F.col(id_col).alias("doc")
    )
    return sigs.join(keep, "doc")


def near_dup_apply_batch(
    spark: SparkSession,
    batch_docs: DataFrame,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_distance: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """One incremental step: near-dup-filter ``batch_docs`` against
    the signature store, RETURN the surviving doc rows, and append
    their signatures to the store. Deterministic given arrival order.
    """
    sigs = simhash_signature(batch_docs, id_col, text_col).localCheckpoint(
        eager=True
    )
    batch_kept = _within_batch_survivors(sigs, id_col, max_distance, chunks)
    # probe the store path through the Hadoop FS API (a speculative
    # read+count logs a scary FileNotFoundException stack on batch 0)
    jpath = spark._jvm.org.apache.hadoop.fs.Path(store_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jpath):
        store = spark.read.schema(_STORE_SCHEMA).parquet(store_path)
        cand = (
            _banded(batch_kept, chunks)
            .join(
                _banded(store, chunks)
                .select("chunk", "val", F.col("simhash").alias("sh_prev")),
                ["chunk", "val"],
            )
            .filter(_hamming(F.col("simhash"), F.col("sh_prev")) <= max_distance)
            .select("doc")
            .distinct()
        )
        batch_kept = batch_kept.join(cand, "doc", "left_anti")
    # materialize BEFORE appending to the store the survivors feed
    batch_kept = batch_kept.localCheckpoint(eager=True)
    batch_kept.select("doc", "simhash").write.mode("append").parquet(store_path)
    return batch_docs.join(
        batch_kept.select(F.col("doc").alias(id_col)), id_col
    )


def near_dup_filter_stream(
    docs: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_distance: int = 3,
    chunks: int = 4,
):
    """Attach the incremental filter to a streaming document source:
    every micro-batch is near-dup-filtered against all previously
    emitted survivors; survivors land in ``out_path``. Returns the
    StreamingQuery."""

    def step(batch_df: DataFrame, batch_id: int) -> None:
        kept = near_dup_apply_batch(
            batch_df.sparkSession, batch_df, store_path,
            id_col, text_col, max_distance, chunks,
        )
        kept.write.mode("append").parquet(out_path)

    return (
        docs.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
