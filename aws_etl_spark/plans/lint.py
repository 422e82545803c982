"""Static rescan lint over every plain-SQL registry query.

The defect class: a single WITH-chain whose CTEs reference a base
table (directly or through earlier CTEs) many times. Catalyst inlines
CTEs into every consumer, so a CTE referenced k times re-derives its
whole subtree — including base scans — k times in the expressed plan.
``staged_sql_query`` is the fix; this lint is the registration-time
tripwire that the round-10 judge census was not: it caught
``stat_benford_digits`` (orders x5) only AFTER the round shipped,
because the executed census was a session gate run before the late
batch landed. Expanding CTE references textually reproduces exactly
what the optimizer's inlining does, with no Spark session needed, so
the full registry sweeps in milliseconds inside pytest.

The count is an upper bound on logical re-derivations: runtime
exchange/subquery reuse dedupes some of it, but reused exchanges
still re-read shuffle files per consumer — the plan you would not
want at 100 TB (SCALING.md, rescan-family section).
"""

from __future__ import annotations

import re

_IDENT = r"[A-Za-z_][A-Za-z_0-9]*"


def _strip_comments(sql: str) -> str:
    return re.sub(r"--[^\n]*", "", sql)


def _match_paren(sql: str, open_idx: int) -> int:
    """Index just past the ')' matching the '(' at open_idx."""
    depth = 0
    i = open_idx
    n = len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            # skip string literal ('' escapes)
            i += 1
            while i < n:
                if sql[i] == "'":
                    if i + 1 < n and sql[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced parentheses in SQL")


def split_ctes(sql: str) -> tuple[dict[str, str], str]:
    """Split ``WITH a AS (...), b AS (...) <final>`` into
    ({name: body}, final). A query with no top-level WITH returns
    ({}, sql). WITH RECURSIVE is returned as-is with an empty dict
    (reference counting diverges for self-references)."""
    s = _strip_comments(sql)
    m = re.match(r"\s*WITH\s+", s, re.IGNORECASE)
    if not m or re.match(r"\s*WITH\s+RECURSIVE\b", s, re.IGNORECASE):
        return {}, s
    ctes: dict[str, str] = {}
    i = m.end()
    while True:
        hm = re.match(
            rf"\s*({_IDENT})\s+AS\s*(?:MATERIALIZED\s*)?\(",
            s[i:],
            re.IGNORECASE,
        )
        if not hm:
            break
        name = hm.group(1)
        open_idx = i + hm.end() - 1
        close = _match_paren(s, open_idx)
        ctes[name.lower()] = s[open_idx + 1 : close - 1]
        i = close
        cm = re.match(r"\s*,", s[i:])
        if not cm:
            break
        i += cm.end()
    return ctes, s[i:]


def _refs(text: str, name: str) -> int:
    """Count relation references to ``name``: the identifier preceded
    by FROM/JOIN/, (a relation position), not a column/alias use."""
    pat = rf"(?i)(?:\bFROM|\bJOIN|,)\s+{re.escape(name)}\b"
    return len(re.findall(pat, text))


def effective_scans(sql: str, bases: tuple[str, ...]) -> dict[str, int]:
    """Effective base-table derivation count after full CTE inlining.

    effective(final) = direct base refs + sum over CTE c of
    refs(c) * effective(c), computed bottom-up (a CTE may only
    reference earlier CTEs, so one forward pass suffices)."""
    ctes, final = split_ctes(sql)
    # per-CTE expanded base counts, in definition order
    expanded: dict[str, dict[str, int]] = {}

    def expand(text: str, visible: list[str]) -> dict[str, int]:
        counts = {b: _refs(text, b) for b in bases}
        for c in visible:
            k = _refs(text, c)
            if k:
                for b, v in expanded[c].items():
                    counts[b] = counts.get(b, 0) + k * v
        return {b: v for b, v in counts.items() if v}

    order: list[str] = []
    for name, body in ctes.items():
        # nested WITH inside a CTE body: recurse
        if re.match(r"\s*WITH\s+", body, re.IGNORECASE):
            expanded[name] = effective_scans(body, bases)
        else:
            expanded[name] = expand(body, order)
        order.append(name)
    return expand(final, order)


def lint_registry(max_scans: int = 4) -> list[str]:
    """Return 'name: table xN' for every plain sql_query whose Spark
    SQL would re-derive one base table more than ``max_scans`` times
    after CTE inlining. Empty list = clean."""
    from aws_etl_spark.queries.registry import (
        ALL_TABLES,
        PLAIN_SQL,
        _ensure_loaded,
    )

    _ensure_loaded()
    bad: list[str] = []
    for name, sql in sorted(PLAIN_SQL.items()):
        for t, n in effective_scans(sql, ALL_TABLES).items():
            if n > max_scans:
                bad.append(f"{name}: {t} x{n}")
    return bad
