"""Custom Python data source (Spark 4 DataSource API, SURVEY §2.1).

The reference ingests from an HTTP endpoint via a hand-rolled
operator (aws_modules/zip_file.py); Spark 4's Python DataSource API
is the engine-native way to mount such an external feed as a real,
partition-parallel scan — each InputPartition fetches its slice on an
executor, so ingest scales with the cluster instead of a driver loop.

``SyntheticDocsDataSource`` is the in-repo instance: a deterministic
document generator (seeded per partition, no I/O) used to exercise
the full API surface — name registration, schema declaration,
partition planning, per-partition iteration — plus as a load source
for tests that need corpora bigger than the fixtures.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_WORDS = (
    "the data spark table row scan filter join agg window value key "
    "batch stream merge sort hash shuffle broadcast column"
).split()


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("n", ...)``.

    Options: ``n`` total docs (default 1000), ``partitions`` scan
    tasks (default 8), ``words_per_doc`` (default 40), ``seed``.
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, part int"

    def reader(self, schema) -> "SyntheticDocsReader":
        return SyntheticDocsReader(self.options)


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.num_parts = int(options.get("partitions", 8))
        self.words_per_doc = int(options.get("words_per_doc", 40))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        return [InputPartition(i) for i in range(self.num_parts)]

    def read(self, partition):
        import random

        pid = partition.value
        for doc_id in range(pid, self.n, self.num_parts):
            # seed per doc (not per partition) → the corpus content is
            # identical regardless of the partition count
            rng = random.Random((self.seed << 20) ^ doc_id)
            text = " ".join(
                rng.choice(_WORDS) for _ in range(self.words_per_doc)
            )
            yield doc_id, text, pid


def register_python_datasources(spark) -> None:
    """Register all custom Python data sources (idempotent)."""
    spark.dataSource.register(SyntheticDocsDataSource)
    spark.dataSource.register(SyntheticEventsStreamDataSource)


class SyntheticEventsStreamDataSource(DataSource):
    """``spark.readStream.format("synthetic_events")`` — a Python
    STREAMING data source (Spark 4 SimpleDataSourceStreamReader):
    deterministic event batches with replayable offsets, the
    engine-native mount point for external feeds (queues, ticking
    APIs) the reference polled with sensor operators.

    Options: ``rows_per_batch`` (default 10), ``max_rows`` (default
    50 — the source reports caught-up after this, so
    ``Trigger.AvailableNow`` terminates).
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "v bigint, batch_no bigint"

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self.rows_per_batch = int(options.get("rows_per_batch", 10))
        self.max_rows = int(options.get("max_rows", 50))

    def initialOffset(self):
        return {"offset": 0}

    def _rows(self, start: int, end: int):
        return iter(
            [(i, i // self.rows_per_batch) for i in range(start, end)]
        )

    def read(self, start):
        s = start["offset"]
        e = min(s + self.rows_per_batch, self.max_rows)
        return self._rows(s, e), {"offset": e}

    def readBetweenOffsets(self, start, end):
        # exactly-once replay on recovery: rows are a pure function of
        # the offset range
        return self._rows(start["offset"], end["offset"])
