"""SparkSession factory.

Re-expresses the reference's session-config block
(``k8s/codes/transformation.py:57-75``, duplicated at
``k8s/codes/csv-to-parquet.py:50-68`` and as spark-submit conf at
``k8s/dags/etl_aws_vini.py:153-168``) as a single shared factory — the
reference copies the same ~15 conf keys into three places; here there is
exactly one.

Differences from the reference, deliberate (100 TB discipline):

* ``spark.sql.session.timeZone`` pinned to UTC so results are stable
  across hosts and comparable to external oracles.
* Arrow enabled for the pandas-UDF extension operators.
* shuffle partitions default to the local core count instead of 200
  (AQE coalescing then right-sizes them at runtime, as the reference's
  ``advisoryPartitionSizeInBytes=128m`` already intended).
* no ``coalesce(1)`` anywhere — output sizing is AQE's job.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Conf shared by every session this engine creates. Mirrors the
# reference's tuning block (transformation.py:57-75) where a key makes
# sense off-EMR; EMR-isms (dynamicAllocation, external shuffle service)
# are cluster-submit-time concerns, not session code.
ENGINE_CONF: dict[str, str] = {
    # --- reference-parity keys (transformation.py:60-74) ---
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128m",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.speculation": "false",
    "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
    # --- engine additions ---
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # driver testdata stores TIMESTAMP(NANOS); Spark reads them as long
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.files.maxPartitionBytes": "128m",
    # NOTE: runtime Bloom-filter join pruning
    # (spark.sql.optimizer.runtime.bloomFilter.enabled) is left at its
    # default (on since Spark 3.5). Setting it explicitly at
    # builder-config time deadlocks getOrCreate on this Spark build —
    # verified empirically; do not re-add.
    # decimal aggregation wider than default so exact-arithmetic
    # aggregates used by the oracle corpus never overflow silently
    "spark.sql.ansi.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}


def default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            pass
    return os.cpu_count() or 8


# Cloud object-store write path (SURVEY §1.2/§2.2): the reference
# writes to S3 through EMRFS (variables.py:1-3 bucket URIs +
# EMR-provided committer). Off-EMR, the public equivalent is the s3a
# connector + the S3A "magic" committer — a task-commit protocol with
# no rename (S3 has no atomic rename; the classic FileOutputCommitter
# v1/v2 is both slow AND unsafe there). The surface is split in two:
# the spark.hadoop.* connector keys below (inert without hadoop-aws +
# credentials, always safe to set) land at builder time; the two
# spark.sql.* committer-protocol keys (CLOUD_COMMITTER_SQL_CONF) are
# applied post-build ONLY when their classes resolve — see the
# deadlock note there. tests/test_session_conf.py asserts the keys
# LAND in a built session's conf (subprocess-isolated, since
# spark.hadoop.* keys don't apply to an already-running session),
# that the SQL keys are withheld on this cloud-module-less classpath,
# and that unknown store names raise; the rest is cluster-runtime
# behavior.
OBJECT_STORE_CONF: dict[str, dict[str, str]] = {
    "s3a": {
        "spark.hadoop.mapreduce.outputcommitter.factory.scheme.s3a": (
            "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory"
        ),
        "spark.hadoop.fs.s3a.committer.name": "magic",
        "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
        # upload/IO tuning: multipart parallelism dominates large
        # parquet write throughput; vectored/seekable read policy
        # dominates scan throughput
        "spark.hadoop.fs.s3a.fast.upload": "true",
        "spark.hadoop.fs.s3a.multipart.size": "128M",
        "spark.hadoop.fs.s3a.connection.maximum": "96",
        "spark.hadoop.fs.s3a.experimental.input.fadvise": "random",
        # directory-marker retention avoids LIST-amplifying deletes
        "spark.hadoop.fs.s3a.directory.marker.retention": "keep",
    },
}

# Spark-side half of the magic committer: route FileFormatWriter
# through the cloud-safe PathOutputCommitProtocol (task output goes to
# a __magic path; multipart uploads complete at job commit — no copy,
# no rename, safe under speculative execution). These classes live in
# the optional spark-hadoop-cloud module. CRITICAL: they must NOT be
# set when that module is absent — on this stock PySpark build,
# setting either key on a session whose classpath lacks the class
# deadlocks the first SessionState/RuntimeConfig access (verified
# empirically: spark.conf.get hangs forever; same family of set-time
# hazard as the bloomFilter note in ENGINE_CONF). get_session therefore
# applies them POST-build, gated on cloud_committer_available().
CLOUD_COMMITTER_SQL_CONF: dict[str, str] = {
    "spark.sql.sources.commitProtocolClass": (
        "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
    ),
    "spark.sql.parquet.output.committer.class": (
        "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
    ),
}


def cloud_committer_available(spark: SparkSession) -> bool:
    """True iff the spark-hadoop-cloud committer classes are loadable
    in this session's JVM (they ship in the optional
    ``spark-hadoop-cloud`` module, present on EMR/Dataproc images and
    ``--packages org.apache.spark:spark-hadoop-cloud_2.13`` installs,
    absent from stock pip PySpark). Same runtime-probe pattern as the
    Pillow codec seam and ``tws_available()``."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            CLOUD_COMMITTER_SQL_CONF["spark.sql.sources.commitProtocolClass"]
        )
        return True
    except Exception:
        return False


def get_session(
    app_name: str = "aws_etl_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
    hive_metastore: bool = False,
    object_store: str | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[N]`` where N comes from
    ``$SPARK_GRAFT_CPUS`` (driver contract) or the machine core count.
    On a real cluster, pass ``master=None`` with a spark-submit-provided
    master URL, or set it explicitly.

    ``hive_metastore=True`` maps the reference's
    ``enableHiveSupport()`` + Glue catalog (transformation.py:59): a
    persistent Hive metastore so ``saveAsTable`` registrations outlive
    the session (embedded Derby metastore locally — exercised for real
    by tests/test_hive_catalog.py, which proves a table registered in
    one process is readable from a second one; on a cluster the same
    flag plugs into the real metastore via hive.metastore.uris, or the
    Glue catalog implementation on EMR). Off by default — the
    in-memory catalog has identical query semantics and no metastore
    lock-file lifecycle.

    ``object_store="s3a"`` layers the s3a connector conf
    (OBJECT_STORE_CONF) under any ``extra_conf``: magic-committer
    hadoop keys + upload/scan tuning at builder time, then the
    rename-free Spark committer protocol (CLOUD_COMMITTER_SQL_CONF)
    post-build IF the spark-hadoop-cloud classes are on the classpath
    (``cloud_committer_available``; setting them without the module
    hangs the session — see the note there). Pass ``fs.s3a.*``
    credentials or endpoint overrides through ``extra_conf`` (every
    ``spark.hadoop.fs.s3a.*`` key passes straight through to the
    Hadoop connector).
    """
    cores = default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    if hive_metastore:
        builder = builder.enableHiveSupport()
    resolved_master = master or f"local[{cores}]"
    builder = builder.master(resolved_master)
    conf = dict(ENGINE_CONF)
    if resolved_master.startswith("local"):
        # local mode: driver JVM IS the executor. Spark's 1g default
        # heap OOMs wide object aggregations at modest scale; 4g
        # absorbs 10× the bench scale by spilling. Deliberately NOT
        # larger: measured on this corpus, a 16–48g heap is 1.5–2×
        # SLOWER per query (GC over a huge young gen) than 4g.
        # driver.memory must be set before JVM launch → belongs here.
        conf.setdefault(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g"),
        )
        conf.setdefault("spark.driver.maxResultSize", "4g")
    # shuffle partitions ~ cores locally; a 1000-executor cluster would
    # set this (or rely on AQE initialPartitionNum) much higher.
    conf.setdefault("spark.sql.shuffle.partitions", str(max(cores, 8)))
    if os.environ.get("SPARK_LOCAL_DIRS") is None:
        conf.setdefault("spark.local.dir", "/tmp/spark-local")
    if object_store is not None:
        try:
            conf.update(OBJECT_STORE_CONF[object_store])
        except KeyError:
            raise ValueError(
                f"unknown object_store {object_store!r}; "
                f"known: {sorted(OBJECT_STORE_CONF)}"
            ) from None
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if object_store is not None:
        # getOrCreate may have RETURNED AN EXISTING session, in which
        # case the spark.hadoop.* connector keys above were silently
        # dropped (builder conf only applies at real build). Setting
        # the SQL committer-protocol keys on such a session would
        # half-configure it: PathOutputCommitProtocol without the s3a
        # magic-committer factory routes writes through the default
        # rename-based file committer — slow AND unsafe on S3. So the
        # SQL keys are applied only when (a) the committer classes
        # resolve and (b) the hadoop keys verifiably landed.
        # probe with one of the store's own keys (not an s3a-specific
        # literal) so adding another store to OBJECT_STORE_CONF keeps
        # this branch correct
        probe_key = next(iter(OBJECT_STORE_CONF[object_store]))
        hadoop_landed = (
            spark.sparkContext.getConf().get(probe_key, None) is not None
        )
        if not hadoop_landed:
            import warnings

            warnings.warn(
                "get_session(object_store=...) reused an existing "
                "SparkSession: the spark.hadoop.* object-store keys "
                "cannot be applied post-build, so the committer "
                "protocol was NOT switched. Stop the session first "
                "(or configure the cluster submit conf) to get the "
                "cloud committer.",
                RuntimeWarning,
                stacklevel=2,
            )
        elif cloud_committer_available(spark):
            for k, v in CLOUD_COMMITTER_SQL_CONF.items():
                if extra_conf is None or k not in extra_conf:
                    spark.conf.set(k, v)
        else:
            import warnings

            warnings.warn(
                "object_store committer protocol NOT enabled: the "
                "spark-hadoop-cloud classes are not on this "
                "classpath (PathOutputCommitProtocol unresolvable), "
                "so writes will use the default rename-based "
                "committer — slow and unsafe on object stores. Add "
                "the spark-hadoop-cloud module (bundled on "
                "EMR/Dataproc; `--packages org.apache.spark:"
                "spark-hadoop-cloud_2.13` elsewhere) to get the "
                "rename-free magic committer.",
                RuntimeWarning,
                stacklevel=2,
            )
    return spark


def stop_session() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
