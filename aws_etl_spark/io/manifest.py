"""Manifest-pointer snapshot versioning over plain parquet — the
lakehouse table-format core (Iceberg/Delta's mechanism, reduced to
its essentials) on nothing but files.

The reference lake is bare S3 prefixes re-crawled by Glue
(k8s/resources/glue-crawler.tf) — readers see whatever half-written
state the prefix holds. The manifest pattern fixes that with two
invariants:

* **Immutability**: data files are write-once; an update writes NEW
  files (copy-on-write) and never touches existing ones.
* **Atomic pointer**: a snapshot is a JSON manifest listing exactly
  the data files it contains; committing = writing manifest N+1.
  Readers resolve a version to its file list and read only those —
  concurrent writers can add files freely because unreferenced files
  are invisible.

Everything here is metadata-scale driver work (a JSON file naming a
few paths per snapshot — at 100 TB the manifests are KBs while the
data is TBs); the data reads/writes stay fully distributed. Time
travel = read an old manifest. Vacuum = delete files no retained
manifest references, a pure metadata set-difference planned before
any delete executes.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(root: Path, version: int) -> Path:
    return root / "manifests" / f"v{version:06d}.json"


def list_versions(root: str | Path) -> list[int]:
    mdir = Path(root) / "manifests"
    if not mdir.is_dir():
        return []
    return sorted(
        int(p.stem[1:]) for p in mdir.glob("v*.json")
    )


def _data_files(d: Path) -> list[str]:
    return sorted(
        str(p) for p in d.rglob("*.parquet") if p.is_file()
    )


def commit_snapshot(
    df: DataFrame,
    root: str | Path,
    replace: list[str] | None = None,
    stats_cols: list[str] | None = None,
) -> int:
    """Write ``df`` as new immutable data files and commit the next
    snapshot: previous snapshot's files, minus ``replace`` (paths
    being superseded — copy-on-write), plus the new files. Returns
    the committed version number.

    ``stats_cols``: record per-file min/max zone maps for these
    columns in the manifest (one distributed pass over the new files,
    grouped by ``input_file_name``) — the Iceberg/Delta file-stats
    mechanism that lets a reader prune whole files from a predicate
    before any data I/O. Stats inherit from the previous snapshot for
    carried-over files."""
    root = Path(root)
    versions = list_versions(root)
    prev_files: list[str] = []
    prev_stats: dict = {}
    if versions:
        prev = json.loads(_manifest_path(root, versions[-1]).read_text())
        prev_files = prev["files"]
        prev_stats = prev.get("stats", {})
    version = (versions[-1] + 1) if versions else 1

    write_dir = root / "data" / f"w{version:06d}"
    df.write.mode("error").parquet(str(write_dir))
    new_files = _data_files(write_dir)

    dropped = set(replace or [])
    unknown = dropped - set(prev_files)
    if unknown:
        raise ValueError(
            f"replace lists files not in the previous snapshot: {unknown}"
        )
    files = [f for f in prev_files if f not in dropped] + new_files

    stats = {f: prev_stats[f] for f in files if f in prev_stats}
    if stats_cols:
        from pyspark.sql import functions as F

        spark = df.sparkSession
        back = spark.read.parquet(str(write_dir)).withColumn(
            "__f", F.input_file_name()
        )
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for c in stats_cols:
            aggs += [F.min(c).alias(f"min__{c}"), F.max(c).alias(f"max__{c}")]
        for row in back.groupBy("__f").agg(*aggs).collect():
            path = row["__f"]
            if path.startswith("file:"):
                path = path[len("file:"):]
                while path.startswith("//"):
                    path = path[1:]
            stats[path] = {
                c: [row[f"min__{c}"], row[f"max__{c}"]] for c in stats_cols
            }
            stats[path]["__rows"] = row["__rows"]

    mpath = _manifest_path(root, version)
    mpath.parent.mkdir(parents=True, exist_ok=True)
    tmp = mpath.with_suffix(".tmp")
    tmp.write_text(
        json.dumps({"version": version, "files": files, "stats": stats})
    )
    tmp.rename(mpath)  # atomic pointer publish
    return version


def compaction_plan(
    root: str | Path, version: int, target_rows: int
) -> dict[str, int]:
    """Small-file compaction assignment for snapshot ``version``:
    ``{file: group_id}`` where ``group_id = (rows before this file in
    manifest order) DIV target_rows`` — the cumulative-quota rule, a
    pure function of the manifest metadata that any engine (or the
    DuckDB oracle) reproduces from the same per-file row counts. A
    group holds ≥ target_rows except possibly the last, and never
    exceeds target + the largest member file. Manifest order is
    commit order — the locality the writer produced. The executor
    rewrites each group as one file and commits with
    ``replace=group``. Files without recorded row counts are skipped
    (compacting them blind could build an oversized file)."""
    m = json.loads(_manifest_path(Path(root), version).read_text())
    out: dict[str, int] = {}
    prior = 0
    for f in m["files"]:
        rows = m.get("stats", {}).get(f, {}).get("__rows")
        if rows is None:
            continue
        out[f] = prior // target_rows
        prior += rows
    return out


def zone_map_prune(
    root: str | Path, version: int, col: str, lo, hi
) -> dict[str, list[str]]:
    """Metadata-only file pruning: split snapshot ``version``'s files
    into those whose recorded [min, max] for ``col`` overlaps
    [lo, hi] (``read``) and those provably predicate-free
    (``pruned``). Files with no recorded stats are conservatively
    read — zone maps may only ever SKIP provably-empty files."""
    m = json.loads(_manifest_path(Path(root), version).read_text())
    read, pruned = [], []
    for f in m["files"]:
        st = m.get("stats", {}).get(f, {}).get(col)
        if st is None or st[0] is None:
            read.append(f)
        elif st[0] <= hi and st[1] >= lo:
            read.append(f)
        else:
            pruned.append(f)
    return {"read": sorted(read), "pruned": sorted(pruned)}


def snapshot_files(root: str | Path, version: int) -> list[str]:
    return json.loads(
        _manifest_path(Path(root), version).read_text()
    )["files"]


def read_snapshot(
    spark: SparkSession, root: str | Path, version: int
) -> DataFrame:
    """Time travel: the table exactly as snapshot ``version`` saw it."""
    files = snapshot_files(root, version)
    if not files:
        raise ValueError(f"snapshot v{version} is empty")
    return spark.read.parquet(*files)


def vacuum_plan(
    root: str | Path, retain_from: int
) -> dict[str, list[str]]:
    """Files safe to delete once every snapshot < ``retain_from`` is
    expired: on-disk data files referenced ONLY by expired snapshots.
    Pure metadata set-difference; nothing is deleted here — the plan
    is returned for audit (and the executor deletes ``orphans``)."""
    root = Path(root)
    versions = list_versions(root)
    retained = [v for v in versions if v >= retain_from]
    if not retained:
        raise ValueError("refusing to vacuum every snapshot")
    live: set[str] = set()
    for v in retained:
        live.update(snapshot_files(root, v))
    on_disk = _data_files(root / "data")
    return {
        "live": sorted(live),
        "orphans": sorted(set(on_disk) - live),
    }
