"""Text normalization and chunking for LLM-corpus preparation.

- :func:`normalize_text` — Unicode NFC + lowercase + whitespace
  collapse, the canonical pre-dedup normalization pass. NFC has no
  JVM builtin in Spark, so this is an Arrow-batched pandas UDF over
  Python's ``unicodedata`` (the one genuinely Python-only kernel in
  the text family); everything downstream of it stays JVM-side. The
  DuckDB oracle uses ``nfc_normalize`` — verified char-identical to
  ``unicodedata.normalize('NFC', ·)`` on composed/decomposed,
  ligature, fullwidth and Hangul cases (tests/test_corpus.py).
- :func:`strip_html` — tag/entity removal via JVM regexp_replace
  chain (no Python in the hot path).
- :func:`chunk_starts` — 1-based start offsets of overlapping
  fixed-size character windows, the explode side of document
  chunking. Chunking multiplies rows ~len/stride× but stays a narrow
  Generate (no shuffle): at 100 TB it streams.

Scale note: normalize_text is the slow path by construction (Arrow
round-trip); on an all-ASCII corpus a cheap JVM pre-filter could skip
the UDF entirely, but correctness requires the UDF wherever non-ASCII
appears, so the operator keeps the uniform path and documents the
optimization for the 100 TB deployment (SCALING.md).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _nfc_impl(texts: pd.Series) -> pd.Series:
    return texts.map(
        lambda t: unicodedata.normalize("NFC", t) if t is not None else None
    )


def nfc(col: Column) -> Column:
    """Unicode NFC normalization (Arrow-batched pandas UDF). UDF
    creation is deferred to call time — module import must not require
    an active SparkSession (same pattern as similarity.topk.pair_dot);
    the kernel is a module-level function so cloudpickle ships it by
    reference and the worker imports the package zip."""
    return F.pandas_udf("string")(_nfc_impl)(col)


def normalize_text(col: Column) -> Column:
    """NFC → lowercase → collapse runs of whitespace → trim."""
    return F.trim(F.regexp_replace(F.lower(nfc(col)), r"\s+", " "))


def strip_html(col: Column) -> Column:
    """Remove script/style blocks, tags, and entities; collapse the
    leftover whitespace. A heuristic boilerplate cleaner (real HTML
    parsing is out of scope for a SQL engine), all JVM regexps.
    """
    no_blocks = F.regexp_replace(
        col, r"(?is)<(script|style)[^>]*>.*?</\1>", " "
    )
    no_tags = F.regexp_replace(no_blocks, r"<[^>]*>", " ")
    no_entities = F.regexp_replace(no_tags, r"&[a-zA-Z]{2,8};|&#\d{1,7};", " ")
    return F.trim(F.regexp_replace(no_entities, r"\s+", " "))


def chunk_starts(length: Column, stride: int) -> Column:
    """1-based window start positions: 1, 1+stride, … ≤ max(len, 1).

    ``greatest(len, 1)`` guards the empty-document edge (Spark's
    sequence() errors and DuckDB's generate_series() descends when
    start > stop — a portability trap pinned in STATUS.md).
    """
    return F.sequence(
        F.lit(1), F.greatest(length, F.lit(1)), F.lit(stride)
    )
