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


def test_driver_window_marker_sits_at_position_50():
    """The '---- end of the 50-query round-N window ----' comment in
    registry.py must sit exactly after the 50th ranked name — the
    driver records CORRECTNESS for the first 50 of queries(), and a
    drifted marker misleads the next round's rotation (this drifted
    three times during round 5 alone as queries were inserted)."""
    import re
    from pathlib import Path

    import aws_etl_spark.queries.registry as registry_mod
    from aws_etl_spark.queries.registry import _DRIVER_ORDER

    src = Path(registry_mod.__file__).read_text()
    m = re.search(
        r'"([a-z0-9_]+)",\s*\n\s*# ---- end of the 50-query', src
    )
    assert m, "window marker comment not found in registry.py"
    name_before_marker = m.group(1)
    assert name_before_marker == _DRIVER_ORDER[49], (
        f"marker sits after {name_before_marker!r} but the 50th ranked "
        f"name is {_DRIVER_ORDER[49]!r} — move the marker (or the "
        "names) so the documented window matches the driver's actual "
        "50-query record"
    )


def test_driver_order_has_no_duplicates():
    """rank = {n: i for i, n in enumerate(_DRIVER_ORDER)} keeps the
    LAST index for a duplicated name, silently moving it out of its
    documented window slot (func_variant_json in round 9 sorted at
    position 82 instead of its block-1 slot). The module-level assert
    guards imports; this test makes the failure visible in CI."""
    from aws_etl_spark.queries.registry import _DRIVER_ORDER

    dupes = {n for n in _DRIVER_ORDER if _DRIVER_ORDER.count(n) > 1}
    assert not dupes, f"duplicate names in _DRIVER_ORDER: {sorted(dupes)}"
