"""Round-over-round bench comparison over ALL queries.

The r6 regression (two non-headliner queries silently 7x slower)
shipped because the per-query comparison only covered the 20 headline
names. This tool compares EVERY query: give it the previous round's
BENCH_DETAIL.json and one or more fresh detail files (two idle
back-to-back runs per the bench protocol; the per-query MIN across
them is the contention-free signal), and it prints every query whose
ratio exceeds the threshold. The certification gate is "no query
over threshold without a named cause in STATUS.md".

Usage:
    python tools/bench_compare.py BASE.json NEW1.json [NEW2.json ...] \
        [--threshold 2.0]

Exit status 1 when any query exceeds the threshold (so the cert
sweep can gate on it), 0 otherwise. New queries (absent from BASE)
and removed queries are listed informationally, never flagged.
"""

from __future__ import annotations

import json
import sys


def load_queries(path: str) -> dict[str, float]:
    return json.load(open(path))["queries"]


def main(argv: list[str]) -> int:
    thresh = 2.0
    if "--threshold" in argv:
        i = argv.index("--threshold")
        thresh = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    base_path, *new_paths = argv
    if not new_paths:
        raise SystemExit("need at least one fresh detail file")
    base = load_queries(base_path)
    runs = [load_queries(p) for p in new_paths]
    fresh: dict[str, float] = {}
    for r in runs:
        for k, v in r.items():
            fresh[k] = min(fresh.get(k, v), v)

    added = sorted(set(fresh) - set(base))
    removed = sorted(set(base) - set(fresh))
    flagged: list[tuple[float, str, float, float]] = []
    for name in sorted(set(fresh) & set(base)):
        old, new = base[name], fresh[name]
        # sub-100ms timings are timer noise; compare above a floor
        ratio = new / max(old, 0.1)
        if ratio > thresh and new - old > 0.25:
            flagged.append((ratio, name, old, new))

    flagged.sort(reverse=True)
    for ratio, name, old, new in flagged:
        print(f"FLAG {name}: {old:.2f}s -> {new:.2f}s ({ratio:.1f}x)")
    if added:
        print(f"new queries (no baseline): {', '.join(added)}")
    if removed:
        print(f"removed since baseline: {', '.join(removed)}")
    n = len(set(fresh) & set(base))
    print(
        f"compared {n} queries vs {base_path}; "
        f"{len(flagged)} over {thresh}x (min over {len(runs)} run(s))"
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
