"""BPE tokenizer-vocabulary induction (byte-pair-encoding merge
rounds) over a document corpus — the missing third leg of the text
stack next to token counting (analysis.py) and packing: token COUNTS
assume a vocabulary; this operator LEARNS one, the way LLM tokenizers
(BPE, Sennrich et al. 2016 — public algorithm) are trained.

Reference scope note: the reference pipeline has no text operators at
all (its queries end at the curated SQL, k8s/codes/variables.py:18-89);
this extends SURVEY.md §2.13's text-analysis north star.

Canonical semantics, engine-exact:

1. Word inventory: lowercase whitespace words restricted to
   ``^[a-z]{1,20}$`` (clean symbol alphabet, bounded sequence length),
   weighted by corpus frequency. THE KEY SCALE PROPERTY of BPE
   training: every later stage runs on this distinct-word table
   (vocabulary-sized, orders of magnitude smaller than the corpus),
   never on the corpus again.
2. Initial symbols: the word's characters plus a terminal ``</w>``
   marker (so merges can't cross word boundaries and suffixes stay
   distinguishable — the canonical construction).
3. Per round: count adjacent symbol pairs weighted by word frequency
   (every adjacent position counts, canonical), pick the single most
   frequent pair (ties: smaller ``sym_a`` then ``sym_b`` — total
   order, engine-portable on ASCII), and merge it LEFT-TO-RIGHT
   GREEDILY in every word.

The left-to-right greedy merge is the subtle part: for a chosen pair
(A, B) with A ≠ B adjacent matches can never overlap, but A == B runs
("aaaa") merge at odd offsets only. Both cases reduce to
gaps-and-islands over match positions: within each maximal block of
consecutive match starts, a match is REAL iff its offset in the block
is odd (1-based). That formulation is pure windows/joins — identical
in Spark and DuckDB — so fixed-round BPE training is hash-provable
cross-engine (the unrolled-CTE oracle lives in queries/llm_text.py).

Scale shape per round: one map-side-combinable pair count over the
exploded word inventory, one global top-1 (TakeOrdered, 1 row,
broadcast back), one per-word window pass (partitions bounded by the
21-symbol max sequence). Rounds are Python-driven like every iterative
operator here (kmeans/pagerank), with a localCheckpoint per round so
the plan does not grow with the merge count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WORD_RE = "^[a-z]{1,20}$"
END_MARK = "</w>"


def word_inventory(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq): lowercase whitespace words matching WORD_RE,
    weighted by corpus occurrence count. The one corpus-sized pass."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.col("word").rlike(WORD_RE))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def initial_symbols(words: DataFrame) -> DataFrame:
    """(word, freq, pos, sym): characters + terminal END_MARK. The
    char split is a SQL-text transform (substring(word, i, 1)) so the
    oracle uses the identical expression shape."""
    seq = words.select(
        "word",
        "freq",
        F.concat(
            F.expr(
                "transform(sequence(1, length(word)),"
                " i -> substring(word, i, 1))"
            ),
            F.array(F.lit(END_MARK)),
        ).alias("syms"),
    )
    return seq.select(
        "word", "freq", F.posexplode("syms").alias("pos0", "sym")
    ).select("word", "freq", (F.col("pos0") + 1).alias("pos"), "sym")


def pair_counts(seq: DataFrame) -> DataFrame:
    """(sym_a, sym_b, pair_count): adjacent pairs weighted by word
    freq — map-side combinable; every adjacent position counts."""
    w = Window.partitionBy("word").orderBy("pos")
    return (
        seq.withColumn("nxt", F.lead("sym").over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("sym").alias("sym_a"), F.col("nxt").alias("sym_b"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def best_pair(pairs: DataFrame) -> DataFrame:
    """The round's merge rule: 1 row, (sym_a, sym_b, pair_count),
    max count with (sym_a, sym_b) tiebreak — a TakeOrdered top-1."""
    return pairs.orderBy(
        F.col("pair_count").desc(), F.col("sym_a"), F.col("sym_b")
    ).limit(1)


def apply_merge(seq: DataFrame, best: DataFrame) -> DataFrame:
    """Left-to-right greedy merge of the (broadcast, 1-row) best pair
    in every word sequence; returns the renumbered (word, freq, pos,
    sym) state for the next round.

    Gaps-and-islands: ``mstart`` marks candidate match positions
    (sym = A ∧ next = B); within each maximal run of consecutive
    candidates, odd offsets are REAL merges (for A ≠ B runs have
    length 1 and this is a no-op; for A == B it implements the
    canonical odd-offset merge of "aaaa" → "aa","aa"); the position
    after a real merge is consumed."""
    w = Window.partitionBy("word").orderBy("pos")
    b = F.broadcast(best.select("sym_a", "sym_b"))
    marked = (
        seq.crossJoin(b)
        .withColumn("nxt", F.lead("sym").over(w))
        .withColumn(
            "mcand",
            # coalesce: the last position's nxt is NULL → must be
            # FALSE (not NULL) so the (word, mcand) window partitions
            # agree across engines
            F.coalesce(
                (F.col("sym") == F.col("sym_a"))
                & (F.col("nxt") == F.col("sym_b")),
                F.lit(False),
            ),
        )
        # islands of consecutive candidate positions: pos - rank among
        # candidates is constant within a maximal run
        .withColumn(
            "blk",
            F.when(
                F.col("mcand"),
                F.col("pos")
                - F.row_number().over(
                    Window.partitionBy("word", "mcand").orderBy("pos")
                ),
            ),
        )
        .withColumn(
            "offset",
            F.when(
                F.col("mcand"),
                F.row_number().over(
                    Window.partitionBy("word", "mcand", "blk").orderBy("pos")
                ),
            ),
        )
        .withColumn(
            "mstart",
            F.col("mcand") & F.coalesce(F.col("offset") % 2 == 1, F.lit(False)),
        )
        .withColumn("consumed", F.coalesce(F.lag("mstart").over(w), F.lit(False)))
    )
    merged = (
        marked.filter(~F.col("consumed"))
        .select(
            "word",
            "freq",
            "pos",
            F.when(
                F.col("mstart"), F.concat(F.col("sym"), F.col("nxt"))
            )
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
        .withColumn("pos", F.row_number().over(w))
    )
    return merged


# process-scoped trained-state memo (round-13; the trained-quantizer
# memo of similarity/topk.py applied to BPE): text_bpe_merges,
# text_bpe_vocab and text_bpe_encode each ran the SAME 3-round merge
# training (per-round pair-count + argmax + merge jobs) on the same
# corpus. Keyed on (session identity, pair-cache input fingerprint,
# text_col, n_rounds) — the cached values are session-owned
# checkpointed DataFrames, so the session id must be part of the key.
# A fresh process is cold and bit-identical; SPARK_GRAFT_NO_PAIR_CACHE
# disables.
_TRAIN_MEMO: dict = {}


def _train_rounds(
    docs: DataFrame, text_col: str, n_rounds: int
) -> tuple[DataFrame, list[DataFrame]]:
    """(final seq state, per-round 1-row merge-rule DataFrames);
    served from ``_TRAIN_MEMO`` on a repeat (corpus, params) in one
    session."""
    import os

    memo_key = None
    if not os.environ.get("SPARK_GRAFT_NO_PAIR_CACHE"):
        from aws_etl_spark.ops.pair_cache import _fingerprint

        fp = _fingerprint(
            "bpe_train", docs, {"text": text_col, "rounds": n_rounds}
        )
        if fp is not None:
            try:
                sid = (
                    docs.sparkSession.sparkContext.applicationId,
                    id(docs.sparkSession),
                )
            except Exception:
                sid = None
            if sid is not None:
                memo_key = (sid, fp)
                hit = _TRAIN_MEMO.get(memo_key)
                if hit is not None:
                    return hit
    result = _train_rounds_driver(docs, text_col, n_rounds)
    if result is None:
        result = _train_rounds_distributed(docs, text_col, n_rounds)
    if memo_key is not None:
        _TRAIN_MEMO[memo_key] = result
    return result


def _train_rounds_driver(
    docs: DataFrame, text_col: str, n_rounds: int
) -> tuple[DataFrame, list[DataFrame]] | None:
    """Bounded-state driver fast path (round-13 session 5 — the
    markov/pagerank bounded-collect dial applied to BPE training).

    THE key scale property of BPE training is that after the one
    corpus-sized word-inventory pass, every round runs on the
    vocabulary-sized distinct-word table — state whose size is a
    property of the LANGUAGE, not the corpus. Below
    ``SPARK_GRAFT_BPE_DRIVER_WORDS`` distinct words the 3 rounds ×
    (pair-count + top-1 + merge + checkpoint) driver-coordinated
    Spark jobs collapse to pure-Python integer arithmetic on the
    collected inventory; above the dial (or when the inventory limit
    probe overflows) the distributed loop runs untouched. The replay
    is bit-exact: pair counts are integer sums of BIGINT frequencies,
    the rule argmax tiebreak (count DESC, sym_a, sym_b) compares
    ASCII strings (WORD_RE admits only [a-z], plus the </w> marker),
    and the left-to-right greedy scan implements exactly the
    odd-offset island rule (merge-and-skip can never merge an even
    offset of a same-symbol run). Returns None when the dial says
    "too big" — the caller falls through to the distributed loop.
    """
    import os

    cap = int(os.environ.get("SPARK_GRAFT_BPE_DRIVER_WORDS", "200000"))
    if cap <= 0:
        return None
    inv = word_inventory(docs, text_col).limit(cap + 1).collect()
    if len(inv) > cap:
        return None

    from aws_etl_spark.ops.scale import bounded_rows_df

    spark = docs.sparkSession
    words: list[tuple[str, int, list[str]]] = [
        (r["word"], r["freq"], list(r["word"]) + [END_MARK]) for r in inv
    ]
    merge_rows: list[DataFrame] = []
    merge_schema = (
        "round bigint, sym_a string, sym_b string, "
        "merged string, pair_count bigint"
    )
    for rnd in range(1, n_rounds + 1):
        counts: dict[tuple[str, str], int] = {}
        for _, freq, syms in words:
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + freq
        if not counts:
            break  # degenerate corpus: fully merged before n_rounds
        (sym_a, sym_b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = sym_a + sym_b
        merge_rows.append(
            bounded_rows_df(
                spark, [(rnd, sym_a, sym_b, merged, cnt)], merge_schema
            )
        )
        nxt = []
        for word, freq, syms in words:
            out = []
            i = 0
            n = len(syms)
            while i < n:
                if i + 1 < n and syms[i] == sym_a and syms[i + 1] == sym_b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append((word, freq, out))
        words = nxt
    seq_rows = [
        (word, freq, pos + 1, sym)
        for word, freq, syms in words
        for pos, sym in enumerate(syms)
    ]
    seq = bounded_rows_df(
        spark, seq_rows, "word string, freq bigint, pos int, sym string"
    )
    return seq, merge_rows


def _train_rounds_distributed(
    docs: DataFrame, text_col: str, n_rounds: int
) -> tuple[DataFrame, list[DataFrame]]:
    seq = initial_symbols(word_inventory(docs, text_col)).localCheckpoint(
        eager=True
    )
    merge_rows = []
    for r in range(1, n_rounds + 1):
        best = best_pair(pair_counts(seq)).localCheckpoint(eager=True)
        if best.isEmpty():
            # degenerate corpus: every word fully merged to a single
            # symbol before n_rounds — stop (an empty rule would
            # otherwise wipe seq through the crossJoin)
            break
        merge_rows.append(
            best.select(
                F.lit(r).cast("bigint").alias("round"),
                "sym_a",
                "sym_b",
                F.concat("sym_a", "sym_b").alias("merged"),
                F.col("pair_count").cast("bigint").alias("pair_count"),
            )
        )
        seq = apply_merge(seq, best).localCheckpoint(eager=True)
    return seq, merge_rows


def bpe_final_state(
    docs: DataFrame,
    text_col: str = "text",
    n_rounds: int = 3,
) -> DataFrame:
    """The trained (word, freq, pos, sym) segmentation after
    ``n_rounds`` merges — what encoding joins against (the per-word
    token table); the corpus itself is never re-segmented per merge."""
    seq, _ = _train_rounds(docs, text_col, n_rounds)
    return seq


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_rounds: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Run ``n_rounds`` of BPE training; returns (merges, vocab):

    * merges — one row per round: (round, sym_a, sym_b, merged,
      pair_count), the learned merge rules in order;
    * vocab  — the final symbol inventory: (sym, n_occurrences)
      weighted by word frequency — what the tokenizer's vocabulary
      (beyond the byte alphabet) would be seeded with.
    """
    seq, merge_rows = _train_rounds(docs, text_col, n_rounds)
    if not merge_rows:
        # corpus with no eligible words at all: empty rule table with
        # the declared schema
        merges = docs.sparkSession.createDataFrame(
            [],
            "round bigint, sym_a string, sym_b string, "
            "merged string, pair_count bigint",
        )
    else:
        merges = merge_rows[0]
        for m in merge_rows[1:]:
            merges = merges.unionByName(m)
    vocab = seq.groupBy("sym").agg(
        F.sum("freq").cast("bigint").alias("n_occurrences")
    )
    return merges, vocab
