"""Session-factory conf surface: the cloud object-store path
(``get_session(object_store="s3a")``, SURVEY §2.2) must actually land
its committer/tuning keys in a BUILT session's conf, and reject
unknown stores.

The landing test runs in a subprocess because the pytest suite shares
one session-scoped SparkSession: ``getOrCreate`` against an existing
session applies only runtime SQL confs (``spark.hadoop.*`` keys would
be silently dropped), so an in-process assertion would prove nothing.
The keys are inert without hadoop-aws on the classpath — landing in
the conf is exactly the testable contract in this sandbox.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

_S3A_PROBE = """
import sys, warnings
sys.path.insert(0, {repo!r})
from aws_etl_spark.session import (
    CLOUD_COMMITTER_SQL_CONF,
    OBJECT_STORE_CONF,
    cloud_committer_available,
    get_session,
)

with warnings.catch_warnings(record=True) as caught:
    warnings.simplefilter("always")
    spark = get_session(
        "s3a-conf-probe",
        master="local[2]",
        object_store="s3a",
        extra_conf={{
            "spark.ui.enabled": "false",
            # user-supplied extra_conf must layer OVER the object-store
            # block (credentials/endpoint overrides ride this path)
            "spark.hadoop.fs.s3a.connection.maximum": "7",
        }},
    )
try:
    # every documented s3a key lands except the one extra_conf overrode
    for key, want in OBJECT_STORE_CONF["s3a"].items():
        if key == "spark.hadoop.fs.s3a.connection.maximum":
            continue
        got = spark.conf.get(key)
        assert got == want, (key, got, want)
    assert spark.conf.get("spark.hadoop.fs.s3a.committer.name") == "magic"
    assert (
        spark.conf.get("spark.hadoop.fs.s3a.connection.maximum") == "7"
    ), "extra_conf must win over OBJECT_STORE_CONF"
    # the SQL committer-protocol keys follow the classpath probe: set
    # when spark-hadoop-cloud is present, WITHHELD when it isn't
    # (setting them without the module deadlocks SessionState init —
    # the bug this gate exists to prevent). Stock pip PySpark lacks
    # the module, so this sandbox exercises the withheld branch.
    avail = cloud_committer_available(spark)
    for key, want in CLOUD_COMMITTER_SQL_CONF.items():
        got = spark.conf.get(key, None)
        if avail:
            assert got == want, (key, got, want)
        else:
            assert got is None, (key, got, "must be withheld: class absent")
    if not avail:
        # withholding must be LOUD (review finding: the silent
        # degradation left users on the unsafe rename committer while
        # believing the magic committer was active)
        assert any(
            "committer protocol NOT enabled" in str(w.message)
            for w in caught
        ), [str(w.message) for w in caught]
    print("COMMITTER_AVAILABLE=%s" % avail)
    print("S3A_CONF_OK")
finally:
    spark.stop()
"""


def test_object_store_s3a_conf_lands_in_built_session(tmp_path):
    code = _S3A_PROBE.format(repo=str(REPO))
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "S3A_CONF_OK" in proc.stdout, proc.stdout


def test_object_store_unknown_raises_before_session_build():
    """An unknown store name fails fast with the known set in the
    message — and raises BEFORE getOrCreate, so no session is built or
    mutated (safe to assert in-process even with the shared fixture
    session live)."""
    from aws_etl_spark.session import get_session

    with pytest.raises(ValueError, match="unknown object_store.*'s3a'"):
        get_session("nope-probe", object_store="gcs-nope")


_S3A_REUSE_PROBE = """
import sys, warnings
sys.path.insert(0, {repo!r})
from aws_etl_spark.session import CLOUD_COMMITTER_SQL_CONF, get_session

# first build WITHOUT the object store — this is the live session
spark = get_session(
    "reuse-base", master="local[2]",
    extra_conf={{"spark.ui.enabled": "false"}},
)
try:
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        again = get_session("reuse-s3a", master="local[2]",
                            object_store="s3a")
    assert again is spark or again.sparkContext is spark.sparkContext
    # hadoop keys could NOT land on the reused session -> the SQL
    # committer keys must be withheld (half-config guard) and the
    # caller warned
    for key in CLOUD_COMMITTER_SQL_CONF:
        got = again.conf.get(key, None)
        assert got is None, (key, got, "must be withheld on session reuse")
    assert any(
        "reused an existing SparkSession" in str(w.message) for w in caught
    ), [str(w.message) for w in caught]
    print("S3A_REUSE_GUARD_OK")
finally:
    spark.stop()
"""


def test_object_store_on_reused_session_withholds_and_warns(tmp_path):
    """Review finding: getOrCreate can return a pre-existing session,
    where the spark.hadoop.* connector keys are silently dropped —
    setting the SQL committer-protocol keys there would route writes
    through PathOutputCommitProtocol WITHOUT the magic committer
    (rename-based, unsafe on S3). The guard must withhold them and
    warn."""
    code = _S3A_REUSE_PROBE.format(repo=str(REPO))
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "S3A_REUSE_GUARD_OK" in proc.stdout, proc.stdout
