"""Manifest-layer mechanics (io/manifest.py) and the structural
invariants the lake_vacuum_plan literal oracle columns rely on."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from aws_etl_spark.io.manifest import (
    commit_snapshot,
    list_versions,
    read_snapshot,
    snapshot_files,
    vacuum_plan,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["k", "v"]).repartition(1)


def test_snapshot_isolation_and_copy_on_write(spark, tmp_path):
    """An old snapshot's content never changes, no matter what later
    commits replace — the property that makes time travel correct."""
    root = tmp_path / "t"
    v1 = commit_snapshot(_df(spark, [(1, 10), (2, 20)]), root)
    before = sorted(map(tuple, read_snapshot(spark, root, v1).collect()))
    v2 = commit_snapshot(
        _df(spark, [(1, 11), (2, 21)]),
        root,
        replace=snapshot_files(root, v1),
    )
    assert sorted(map(tuple, read_snapshot(spark, root, v1).collect())) == before
    assert sorted(map(tuple, read_snapshot(spark, root, v2).collect())) == [
        (1, 11), (2, 21),
    ]
    assert list_versions(root) == [v1, v2]


def test_replace_rejects_files_not_in_previous_snapshot(spark, tmp_path):
    root = tmp_path / "t"
    commit_snapshot(_df(spark, [(1, 10)]), root)
    with pytest.raises(ValueError, match="not in the previous snapshot"):
        commit_snapshot(
            _df(spark, [(1, 11)]), root, replace=["/no/such/file.parquet"]
        )


def test_vacuum_plan_and_refusal(spark, tmp_path):
    root = tmp_path / "t"
    v1 = commit_snapshot(_df(spark, [(1, 10)]), root)
    v2 = commit_snapshot(
        _df(spark, [(1, 11)]), root, replace=snapshot_files(root, v1)
    )
    plan = vacuum_plan(root, retain_from=v2)
    assert set(plan["live"]) == set(snapshot_files(root, v2))
    assert set(plan["orphans"]) == set(snapshot_files(root, v1))
    # retaining v1 as well keeps everything live
    plan_all = vacuum_plan(root, retain_from=v1)
    assert plan_all["orphans"] == []
    with pytest.raises(ValueError, match="every snapshot"):
        vacuum_plan(root, retain_from=v2 + 1)


def test_commit_is_atomic_pointer(spark, tmp_path):
    """The manifest lands via tmp-file rename: no .tmp residue and
    the committed JSON is complete/parseable."""
    root = tmp_path / "t"
    v = commit_snapshot(_df(spark, [(1, 10)]), root)
    mdir = root / "manifests"
    assert not list(mdir.glob("*.tmp"))
    m = json.loads((mdir / f"v{v:06d}.json").read_text())
    assert m["version"] == v and len(m["files"]) == 1


def test_vacuum_query_structural_invariants(spark, sf_dir):
    """Licenses lake_vacuum_plan's literal oracle columns: the
    3-commit builder yields exactly 3 versions, 2 live files and 1
    orphan at ANY sf (one file per commit by construction), and the
    orphan is precisely commit 2's file."""
    from aws_etl_spark.queries.lakehouse_queries import (
        build_versioned_table,
    )

    root = build_versioned_table(spark, sf_dir)
    assert list_versions(root) == [1, 2, 3]
    plan = vacuum_plan(root, retain_from=3)
    assert len(plan["live"]) == 2 and len(plan["orphans"]) == 1
    v1f, v2f = set(snapshot_files(root, 1)), set(snapshot_files(root, 2))
    assert set(plan["orphans"]) == v2f - v1f
    # and the live set is exactly snapshot 3
    assert set(plan["live"]) == set(snapshot_files(root, 3))
