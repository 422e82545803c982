"""Hot-key skew study (round-13 verdict item: every 10x/100x probe so
far scales data UNIFORMLY; this one measures the engine's behavior
when one key holds ~30% of the rows — the shape that actually breaks
partitioned work at 100 TB).

Builds a skewed twin of the uniform 10x scratch (same row counts, same
schema): ~30% of events rows reassigned to ONE hot user_id, ~30% of
orders rows to ONE hot o_custkey, ~30% of lineitem rows to ONE hot
l_partkey (the md5-coin row selection keeps it deterministic). Then
times a query set on BOTH dirs in one warm session and prints one
JSON line per query with wall times and the skew amplification ratio
wall(skewed)/wall(uniform).

What the ratio means: the row counts are identical, so any ratio
materially above ~1.2 is serial-tail cost concentrated in the hot
key's partition — user-partitioned windows cannot split one user's
partition (AQE skew handling applies to JOINS and AGGREGATIONS, not
window partitions), while salted/AQE-covered joins should hold flat.

Usage:
    python tools/skew_study.py [query ...]   # default set below
    SKEW_BASE=/tmp/scale10 SKEW_DIR=/tmp/skew10 SKEW_PCT=30 ...
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import duckdb

BASE = os.environ.get("SKEW_BASE", "/tmp/scale10")
OUT = os.environ.get("SKEW_DIR", "/tmp/skew10")
PCT = int(os.environ.get("SKEW_PCT", "30"))

# ~PCT% of rows (selected by a deterministic md5 coin on the row's own
# id) move to one hot key that already exists in the data
_SKEW_SPECS = {
    "events": ("user_id", "event_id", 1),
    "orders": ("o_custkey", "o_orderkey", 1),
    "lineitem": ("l_partkey", "l_orderkey", 1),
}

DEFAULT_QUERIES = [
    # user-partitioned windows / sessionization on the hot user
    "events_sessionization",
    "events_markov_entropy",
    "events_dau_mau",
    "events_click_attribution",
    # custkey-partitioned windows on the hot customer
    "window_running_sum",
    "window_lag_lead",
    # joins across the skewed keys (AQE skew-split territory)
    "join_inner_multiway",
    "join_composite_key",
    "join_skew_salted",
    # aggregation over the skewed key
    "events_tumbling_hourly",
]


def build_skewed() -> None:
    out = Path(OUT)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for f in sorted(Path(BASE).glob("*.parquet")):
        table = f.stem
        dst = out / f.name
        if dst.exists():
            continue
        if table in _SKEW_SPECS:
            key, coin_col, hot = _SKEW_SPECS[table]
            cols = [
                r[0]
                for r in con.sql(f"DESCRIBE SELECT * FROM '{f}'").fetchall()
            ]
            exprs = [
                (
                    f"CASE WHEN (hash(CAST({coin_col} AS VARCHAR)) % 100)"
                    f" < {PCT} THEN {hot} ELSE {c} END AS {c}"
                    if c == key
                    else c
                )
                for c in cols
            ]
            q = f"SELECT {', '.join(exprs)} FROM '{f}'"
        else:
            q = f"SELECT * FROM '{f}'"
        con.sql(f"COPY ({q}) TO '{dst}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT COUNT(*) FROM '{dst}'").fetchone()[0]
        print(f"built {table}: {n} rows", file=sys.stderr)


def main() -> None:
    if not Path(BASE, "events.parquet").exists():
        sys.exit(f"uniform scratch missing at {BASE} — run scale_study first")
    names = sys.argv[1:] or DEFAULT_QUERIES
    build_skewed()

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from aws_etl_spark.session import get_session

    spark = get_session("skew-study")
    _ensure_loaded()

    for name in names:
        spec = REGISTRY[name]
        spec.fn(spark, BASE).count()  # warm plan shape
        t0 = time.time()
        n_u = spec.fn(spark, BASE).count()
        t_u = time.time() - t0
        t0 = time.time()
        n_s = spec.fn(spark, OUT).count()
        t_s = time.time() - t0
        print(
            json.dumps(
                {
                    "query": name,
                    "sec_uniform10x": round(t_u, 2),
                    "sec_skewed10x": round(t_s, 2),
                    "skew_ratio": round(t_s / t_u, 1) if t_u else None,
                    "rows_uniform": n_u,
                    "rows_skewed": n_s,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
