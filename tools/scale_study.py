"""10× scale-up study harness (BASELINE.md method, made reproducible).

Builds a scratch dataset = sf0.1 replicated ``COPIES`` times with
shifted keys (documents get a per-copy text perturbation so each
original doc becomes a realistic near-dup cluster of ``COPIES``),
then times the requested registry queries on the 1× and N× dirs in
the same warm session and prints one JSON line per query with the
wall ratio. A ratio ≤ COPIES means sub-linear scaling on ×COPIES
input.

Usage:
    python tools/scale_study.py [query ...]       # default: new-op set
    SCALE_COPIES=10 SCALE_DIR=/tmp/scale10 python tools/scale_study.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import duckdb

SF_DIR = os.environ.get("SCALE_BASE", "/root/testdata/sf0.1")
OUT_DIR = os.environ.get("SCALE_DIR", "/tmp/scale10")
COPIES = int(os.environ.get("SCALE_COPIES", "10"))

DEFAULT_QUERIES = [
    "dedup_span_census",
    "dedup_span_doc_profile",
    "dedup_graph_triangles",
    "dedup_graph_nbr_jaccard",
    "dedup_graph_label_propagation",
    "events_click_attribution",
    "events_rollup_incremental",
    "join_skew_salted",
    "basket_affinity_pairs",
    "embeddings_hard_negatives",
    "multimodal_phash_neardup",
    "window_distribution",
]

# key-shift per copy keeps every id space disjoint
SHIFT = 100_000_000


def build_scratch() -> None:
    out = Path(OUT_DIR)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    specs = {
        # table: (id shift columns, extra per-copy mutation SQL)
        "documents": (
            ["doc_id"],
            # perturb ~1 token per copy c>0: replace the word at a
            # copy-dependent position marker — copies of one doc stay
            # near-dups of each other (clusters of COPIES)
            "CASE WHEN {c} = 0 THEN text "
            "ELSE text || ' copytag{c}' END AS text",
        ),
        "events": (["event_id", "user_id"], None),
        "orders": (["o_orderkey", "o_custkey"], None),
        "lineitem": (["l_orderkey", "l_partkey"], None),
        "customer": (["c_custkey"], None),
        "supplier": ([], None),  # dim kept fixed: fact fan-in grows ×N
        "embeddings": (["vec_id"], None),
        # r6: the curated 6-table chain (serve_reconcile /
        # plan_broadcast_audit) also reads these. part shifts with
        # lineitem.l_partkey so the join keys keep resolving; region
        # and nation are fixed dims like supplier.
        "part": (["p_partkey"], None),
        "region": ([], None),
        "nation": ([], None),
    }
    for table, (shift_cols, mutation) in specs.items():
        out_file = Path(OUT_DIR) / f"{table}.parquet"
        if out_file.exists():  # incremental: fill in newly-specced tables
            continue
        src = f"{SF_DIR}/{table}.parquet"
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        selects = []
        # a table with no shift columns is a FIXED dimension: one copy
        # (replicating it verbatim would duplicate every dim row
        # COPIES× and quadratically corrupt any join measurement)
        n_copies = COPIES if shift_cols or mutation else 1
        for c in range(n_copies):
            exprs = []
            for col in cols:
                if col in shift_cols and c > 0:
                    exprs.append(f"{col} + {c * SHIFT} AS {col}")
                elif mutation and mutation.split(" AS ")[-1] == col:
                    exprs.append(mutation.format(c=c))
                else:
                    exprs.append(col)
            selects.append("SELECT " + ", ".join(exprs) + f" FROM '{src}'")
        q = " UNION ALL ".join(selects)
        con.sql(
            f"COPY ({q}) TO '{OUT_DIR}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(
            f"SELECT COUNT(*) FROM '{OUT_DIR}/{table}.parquet'"
        ).fetchone()[0]
        print(f"built {table}: {n} rows", file=sys.stderr)


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    build_scratch()  # incremental: builds only missing tables

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from aws_etl_spark.session import get_session
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    spark = get_session("scale-study")
    _ensure_loaded()

    for name in names:
        spec = REGISTRY[name]
        # warm once at 1× (codegen/cache), then measure both scales
        spec.fn(spark, SF_DIR).count()
        t0 = time.time()
        n1 = spec.fn(spark, SF_DIR).count()
        t1 = time.time() - t0
        t0 = time.time()
        n10 = spec.fn(spark, OUT_DIR).count()
        t10 = time.time() - t0
        print(
            json.dumps(
                {
                    "query": name,
                    "sec_1x": round(t1, 2),
                    "sec_10x": round(t10, 2),
                    "ratio": round(t10 / max(t1, 1e-9), 1),
                    "rows_1x": n1,
                    "rows_10x": n10,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
