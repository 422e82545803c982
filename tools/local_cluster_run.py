"""Run the full registry under local-cluster[2,4,*] — real
multi-process executors, real serialization and shuffle transport.

Everything else in this repo runs single-JVM local[32], where three
whole classes of 100 TB failure cannot occur: Python kernels that
only import because the driver's cwd is the repo (worker processes
here inherit nothing — the `addPyFile` package zip must carry every
kernel), closures that accidentally capture driver-local state, and
plan shapes that depend on same-process block-manager shortcuts.
This script is the cheapest available de-risk of the multi-executor
story: every query runs end-to-end on a 2-executor cluster and the
oracled ones hash-compare against DuckDB exactly as the driver does.

Usage (from anywhere — a NON-repo cwd is the point):

    python /root/repo/tools/local_cluster_run.py [sf_dir] [out_json]

Defaults: sf_dir=/root/testdata/sf0.001, out=/tmp/local_cluster_run.json.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/local_cluster_run.json"
    sys.path.insert(0, "/root/repo")

    from pyspark.sql import SparkSession

    from aws_etl_spark.oracle import check_query
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    # A deliberately VANILLA builder (the driver does not use our
    # session factory) apart from the cluster master and memory: the
    # registry wrapper must set everything a query needs.
    spark = (
        SparkSession.builder.master("local-cluster[2,4,4096]")
        .appName("aws-etl-spark-local-cluster")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    _ensure_loaded()

    results: dict[str, dict] = {}
    fails = 0
    for name in sorted(REGISTRY):
        t0 = time.monotonic()
        try:
            r = check_query(name, spark, sf)
            ok = bool(r.ok) if r is not None else True
            row = {
                "ok": ok,
                "detail": str(r) if r is not None else "rows-only: ran",
            }
        except Exception as e:  # noqa: BLE001 — census run, record all
            ok, row = False, {"ok": False, "detail": f"{type(e).__name__}: {e}"}
        row["sec"] = round(time.monotonic() - t0, 3)
        results[name] = row
        fails += not ok
        print(("OK  " if ok else "FAIL"), name, row["sec"], flush=True)

    summary = {
        "master": "local-cluster[2,4,4096]",
        "sf_dir": sf,
        "queries": len(results),
        "fails": fails,
        "failed_names": [n for n, v in results.items() if not v["ok"]],
    }
    with open(out, "w") as f:
        json.dump({"summary": summary, "results": results}, f, indent=1)
    print(json.dumps(summary), flush=True)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
