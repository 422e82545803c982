"""Shared-candidate materialization study (round-8 VERDICT item 8).

The dedup/graph family re-derives the same near-dup candidate-pair
table in every query — correct per-query isolation under the driver
contract, but a real pipeline would materialize the pair table once
per corpus version and let every downstream consumer read it. This
script MEASURES that variant without changing shipped code: it times
the family as-shipped, then monkeypatches ``ngram_jaccard_pairs`` /
``minhash_near_dup_pairs`` with a parquet-materializing memo (write
once to a scratch dir keyed by call signature, read back thereafter)
and times the family again in a fresh session, asserting row-count
equality per query between the two variants.

Usage: PYTHONPATH=/root/repo python tools/candidate_cache_study.py
Prints one JSON line per query plus a totals line.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

FAMILY = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_clusters_cc",
    "dedup_graph_degrees",
    "dedup_graph_triangles",
    "dedup_graph_nbr_jaccard",
    "dedup_graph_label_propagation",
    "dedup_graph_kcore",
    "dedup_graph_pagerank",
    "dedup_graph_pagerank_exact",
    "dedup_canonical_distance",
    "dedup_source_crossdup",
    "corpus_cluster_safe_split",
]


def _time_family(spark, memo_dir: str | None) -> dict[str, tuple[float, int]]:
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    if memo_dir is not None:
        _install_memo(memo_dir)
    out: dict[str, tuple[float, int]] = {}
    for name in FAMILY:
        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, SF_DIR)
        n = df.count()
        out[name] = (round(time.perf_counter() - t0, 2), n)
        spark.catalog.clearCache()
    return out


def _install_memo(memo_dir: str) -> None:
    """Patch the two candidate generators with a parquet memo."""
    import aws_etl_spark.dedup as dedup_pkg
    import aws_etl_spark.dedup.jaccard as jaccard_mod
    import aws_etl_spark.dedup.minhash as minhash_mod
    import aws_etl_spark.queries.dedup_queries as dq
    import aws_etl_spark.queries.graph_queries as gq

    def memoize(fn, tag):
        def wrapped(df, id_col, text_col, **kw):
            key = hashlib.md5(
                f"{tag}:{id_col}:{text_col}:{sorted(kw.items())}".encode()
            ).hexdigest()[:16]
            path = f"{memo_dir}/{key}.parquet"
            if not os.path.isdir(path):
                fn(df, id_col, text_col, **kw).write.parquet(path)
            return df.sparkSession.read.parquet(path)

        return wrapped

    jac = memoize(jaccard_mod.ngram_jaccard_pairs, "jac")
    mh = memoize(minhash_mod.minhash_near_dup_pairs, "mh")
    # rebind every reference the family's call sites resolve through
    jaccard_mod.ngram_jaccard_pairs = jac
    minhash_mod.minhash_near_dup_pairs = mh
    for mod in (dedup_pkg, dq, gq):
        if hasattr(mod, "ngram_jaccard_pairs"):
            mod.ngram_jaccard_pairs = jac
        if hasattr(mod, "minhash_near_dup_pairs"):
            mod.minhash_near_dup_pairs = mh


def main() -> None:
    from aws_etl_spark.session import get_session

    variant = sys.argv[1] if len(sys.argv) > 1 else "baseline"
    spark = get_session(f"cand-study-{variant}")
    if variant == "memo":
        memo_dir = tempfile.mkdtemp(prefix="cand_cache_")
        try:
            res = _time_family(spark, memo_dir)
        finally:
            shutil.rmtree(memo_dir, ignore_errors=True)
    else:
        res = _time_family(spark, None)
    total = round(sum(t for t, _ in res.values()), 2)
    print(json.dumps({"variant": variant, "total_sec": total,
                      "queries": {k: {"sec": t, "rows": n}
                                  for k, (t, n) in res.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
