"""CAPABILITIES.md must not drift from the registry: every query name
it claims exists, and every registry query is mentioned."""

from __future__ import annotations

import re
from pathlib import Path

from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

DOC = Path(__file__).resolve().parent.parent / "CAPABILITIES.md"


def test_capabilities_doc_matches_registry():
    _ensure_loaded()
    text = DOC.read_text()
    claimed = set(re.findall(r"`([a-z0-9_]+)`", text)) & set(REGISTRY)
    missing_from_doc = sorted(set(REGISTRY) - claimed)
    assert not missing_from_doc, f"queries not documented: {missing_from_doc}"
    # and the oracle split stated in the doc matches reality
    n_oracled = sum(1 for s in REGISTRY.values() if s.oracle is not None)
    m = re.search(r"(\d+) registry queries: (\d+) SQL-oracled, (\d+) rows-only", text)
    assert m, "summary line missing"
    assert (int(m[1]), int(m[2]), int(m[3])) == (
        len(REGISTRY), n_oracled, len(REGISTRY) - n_oracled,
    ), f"doc says {m.groups()}, registry has {len(REGISTRY)}/{n_oracled}"
