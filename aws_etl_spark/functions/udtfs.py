"""Python UDTFs (Spark 4 table functions) — the row-generating
extension point of the engine's UDF surface (SURVEY §2.11).

A UDTF is the slow path (row-at-a-time Python), kept for semantics
the set-based operators can't express: one input row → variable
number of typed output rows with per-row Python logic. Everything
here is also implemented JVM-side (shingle_rows, explode pipelines);
the UDTF exists as the user-facing escape hatch and is oracle-checked
so the two paths are provably equivalent.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos: bigint, ngram: string")
class WordNgrams:
    """LATERAL word-n-gram generator: (pos, ngram) per window.

    ``pos`` is 0-based; whitespace runs collapse (Python ``split``,
    matching the engine's ``\\s+`` convention).
    """

    def eval(self, text: str, k: int):  # noqa: D401
        words = (text or "").split()
        for i in range(len(words) - k + 1):
            yield i, " ".join(words[i : i + k])


def register_udtfs(spark) -> None:
    """Register all engine UDTFs on a session (idempotent)."""
    spark.udtf.register("word_ngrams", WordNgrams)
