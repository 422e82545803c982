"""Streaming CDC apply: merge a change stream into a keyed target with
``foreachBatch`` — the streaming face of :func:`aws_etl_spark.ops.upsert`.

Each micro-batch:

1. reduce the batch to its LATEST row per key (a change stream can
   carry several updates for one key per batch) — window row_number
   over (key, ts desc);
2. MERGE into the target keeping the greater-ts row per key (union +
   latest-per-key, one shuffle) — NOT a blind upsert: file streams do
   not order across files, so a later micro-batch can carry an older
   change and must not regress the key;
3. atomically replace the target (write to a staging dir, swap via
   rename) so concurrent readers never see a half-written table.

On a transactional table format (Delta/Iceberg) step 3 collapses into
``MERGE INTO``; plain-parquet swap semantics are provided so the
pattern runs anywhere. State is entirely in the target — the stream
needs no Spark state store, so a restart (with checkpoints) resumes
cleanly.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F




def latest_per_key(
    batch: DataFrame, keys: list[str], ts_col: str
) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).desc())
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_cdc_batch(
    spark: SparkSession,
    batch: DataFrame,
    target_path: str,
    keys: list[str],
    ts_col: str,
) -> None:
    """One merge round: latest-per-key reduce → upsert → atomic swap."""
    changes = latest_per_key(batch, keys, ts_col)
    target = Path(target_path)
    if target.exists():
        current = spark.read.parquet(str(target))
        # out-of-order protection: a later micro-batch may carry an
        # OLDER change for a key (file streams don't order across
        # files) — the merge keeps whichever row has the greater ts,
        # not blindly the newest batch (blind upsert regresses keys)
        merged = latest_per_key(
            current.unionByName(changes.select(*current.columns)), keys, ts_col
        )
    else:
        merged = changes
    staging = str(target) + ".staging"
    merged.write.mode("overwrite").parquet(staging)
    if target.exists():
        shutil.rmtree(str(target))
    Path(staging).rename(target)


def cdc_writer(
    stream: DataFrame,
    target_path: str,
    keys: list[str],
    ts_col: str,
    checkpoint: str,
):
    """writeStream handle applying each micro-batch to the target;
    caller starts it (``.trigger(availableNow=True).start()`` for
    batch-incremental runs)."""

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        apply_cdc_batch(batch_df.sparkSession, batch_df, target_path, keys, ts_col)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
