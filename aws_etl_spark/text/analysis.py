"""Text analysis operators for LLM-data pipelines (north-star §2.13):
token counting, quality scoring, language ID, fingerprinting.

Everything is built from JVM-side builtins (split / regexp /
higher-order array fns) — no Python in the hot path, so throughput is
bound by scan speed, not serde. Each operator is a Column factory so
it composes into any projection without forcing extra passes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-overlap
# language heuristic. Deliberately small and ASCII so the same lists
# embed in the SQL oracle verbatim.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "una"],
    "fr": ["le", "la", "de", "et", "un", "une", "du", "des", "est", "dans"],
    "de": ["der", "die", "das", "und", "ist", "von", "ein", "eine", "mit", "zu"],
}

TOKEN_REGEX = r"\w+|[^\w\s]"  # BPE-ish: words + standalone punctuation

# PII patterns shared by Spark (Java regex) and the DuckDB oracle
# (RE2) — restricted to the syntax both engines interpret identically.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def words(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def whitespace_token_count(text: Column) -> Column:
    return F.size(words(text))


def regex_token_count(text: Column) -> Column:
    """Token count under a BPE-ish word/punct regex."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0)))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_ratio(text: Column) -> Column:
    """Fraction of non-space characters that are punctuation."""
    nonspace = F.length(F.regexp_replace(text, r"\s", ""))
    punct = F.length(F.regexp_replace(text, r"[\w\s]", ""))
    return F.when(nonspace > 0, punct / nonspace).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    w = words(text)
    total = F.aggregate(
        w, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    return F.when(F.size(w) > 0, total / F.size(w)).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are (any-language) stopwords — a
    classic fluency signal; near zero for word salad / non-text."""
    sw = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    w = words(F.lower(text))
    hits = F.size(F.filter(w, lambda x: F.array_contains(sw, x)))
    return F.when(F.size(w) > 0, hits / F.size(w)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword
    presence − punctuation excess. Deterministic scalar math."""
    n = F.length(text)
    length_ok = F.when((n >= 50) & (n <= 10000), F.lit(0.4)).otherwise(F.lit(0.0))
    sw = stopword_ratio(text)
    sw_term = F.least(sw * 2, F.lit(0.4))
    punct_term = F.greatest(F.lit(0.2) - punct_ratio(text), F.lit(0.0))
    return length_ok + sw_term + punct_term


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language distinct-stopword-overlap counts."""
    w = F.array_distinct(words(F.lower(text)))
    return {
        lang: F.size(F.array_intersect(w, F.array(*[F.lit(s) for s in sws])))
        for lang, sws in STOPWORDS.items()
    }


def lang_id(text: Column) -> Column:
    """Predicted language = argmax stopword overlap; 'und' when no
    stopwords of any language appear; ties → alphabetical-first."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    return F.when(best > 0, pred).otherwise(F.lit("und"))


def pii_counts(text: Column) -> dict[str, Column]:
    """Match count per PII class (emails, SSNs, phones, IPv4s)."""
    return {
        name: F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        for name, pat in PII_PATTERNS.items()
    }


def pii_redact(text: Column) -> Column:
    """Replace every PII match with a ``<CLASS>`` placeholder.

    Order matters: emails go first (their local part may contain
    digit runs a later pattern would half-match), then SSN before
    phone (both are dash-digit shapes of different arity).
    """
    out = text
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def c4_filter_flags(text: Column, stopwords_min: float = 0.05) -> dict[str, Column]:
    """C4/Gopher-style document-quality rule flags (each independently
    reported so downstream can audit WHY a doc was dropped):

    - ``ok_len``: 50–100k words;
    - ``ok_word_len``: mean word length in [3, 10] (outside ≈ code /
      minified / DNA-like strings);
    - ``ok_stopwords``: stopword ratio ≥ ``stopwords_min`` (fluency);
    - ``ok_no_lorem``: no 'lorem ipsum' boilerplate;
    - ``ok_no_brace``: no '{' (code / templating leakage).
    """
    n_words = F.size(words(text))
    mwl = mean_word_length(text)
    return {
        "ok_len": (n_words >= 50) & (n_words <= 100_000),
        "ok_word_len": (mwl >= 3.0) & (mwl <= 10.0),
        "ok_stopwords": stopword_ratio(text) >= stopwords_min,
        "ok_no_lorem": ~F.contains(F.lower(text), F.lit("lorem ipsum")),
        "ok_no_brace": ~F.contains(text, F.lit("{")),
    }


def fingerprint_md5(text: Column) -> Column:
    """Whitespace-normalized md5 content fingerprint."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def fingerprint_min_shingle(text: Column, k: int = 3) -> Column:
    """Winnowing-style robust fingerprint: lexicographic min of the
    md5s of word-k-gram shingles (stable under small edits away from
    the minimizing shingle).

    Column form (interpreted higher-order lambdas) — for whole-table
    fingerprinting use :func:`min_shingle_fingerprints`, which computes
    the same value via a codegen'd row pipeline.
    """
    w = words(F.lower(text))
    n = F.size(w)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(w, i, k))),
    )
    return F.array_min(shingles)


def tf_idf(
    df,
    id_col: str,
    text_col: str,
    min_df: int = 1,
):
    """(id, token, tf, df, tfidf) — classic TF-IDF, pure DataFrame ops
    (SURVEY.md §2.13 text-analysis row).

    tfidf = tf · ln(N/df): term count × inverse-document-frequency.
    Physical shape: one explode → two map-side-combined aggregations
    (term counts per doc; doc frequency per token) joined on token —
    both shuffles are on high-cardinality keys (no skew beyond stopword
    tokens, which ``min_df`` does not bound; cap hot tokens upstream if
    a corpus is stopword-degenerate). N arrives via a broadcast
    one-row cross join, not a driver round-trip.
    """
    tokens = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    tf = tokens.groupBy("doc", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = df.select(F.count("*").alias("n_docs"))
    return (
        tf.join(dfreq.filter(F.col("df") >= min_df), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col("doc"),
            "token",
            "tf",
            "df",
            (
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df"))
            ).alias("tfidf"),
        )
    )


def min_shingle_fingerprints(
    df, id_col: str, text_col: str, k: int = 3
):
    """(id, fp_min_shingle) per document — row-wise formulation:
    posexplode/lead shingling → md5 → one map-side-combined min()
    aggregate. Whole-stage-codegen'd end to end; the shuffle carries
    one 32-char row per doc. Docs with fewer than k words yield NULL
    (join back on the caller side keeps them).
    """
    from aws_etl_spark.dedup.jaccard import shingle_rows

    lowered = df.select(F.col(id_col), F.lower(F.col(text_col)).alias("__t"))
    sh = shingle_rows(lowered, id_col, "__t", k, distinct=False)
    return sh.groupBy(F.col("doc").alias(id_col)).agg(
        F.min(F.md5("shingle")).alias("fp_min_shingle")
    )


def repetition_ratio(df, id_col: str, text_col: str, k: int = 2):
    """(id, n_grams, n_distinct, rep_ratio) per document.

    rep_ratio = 1 − distinct/total word-k-grams: the Gopher/RefinedWeb
    within-document repetition quality signal — boilerplate and
    degenerate generations repeat n-grams heavily. One shingling pass
    + one map-side-combined aggregate; the division is an IEEE double
    op on two exact ints, bit-identical across engines.
    """
    from aws_etl_spark.dedup.jaccard import shingle_rows

    sh = shingle_rows(df, id_col, text_col, k, distinct=False)
    return sh.groupBy(F.col("doc").alias(id_col)).agg(
        F.count("*").alias("n_grams"),
        F.count_distinct("shingle").alias("n_distinct"),
    ).select(
        id_col,
        "n_grams",
        "n_distinct",
        (
            F.lit(1.0) - F.col("n_distinct") / F.col("n_grams")
        ).alias("rep_ratio"),
    )


def top_ngrams(df, id_col: str, text_col: str, k: int = 2, n: int = 50):
    """Corpus-wide top-n word-k-grams: (ngram, n_docs, n_occurrences),
    ordered (count desc, ngram asc) so top-k is deterministic.

    Shape: shingle rows → one map-side-combined agg keyed by the gram
    (high cardinality, no skew beyond stop-grams) → TakeOrderedAndProject
    (no global sort materialization). The corpus-frequency view drives
    contamination checks and stop-gram caps for the dedup family.
    """
    from aws_etl_spark.dedup.jaccard import shingle_rows

    sh = shingle_rows(df, id_col, text_col, k, distinct=False)
    return (
        sh.groupBy(F.col("shingle").alias("ngram"))
        .agg(
            F.count_distinct("doc").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(n)
    )


def word_entropy(df, id_col: str, text_col: str):
    """(id, n_tokens, n_distinct, entropy) — Shannon entropy of each
    document's word distribution (nats), a vocabulary-diversity quality
    signal (degenerate/templated docs score low).

    Cross-engine determinism: H = ln(T) − (Σ c·ln c)/T is a sum of
    doubles, and float sums are order-dependent — so each term c·ln c
    is quantized to an exact BIGINT at 1e6 before summing (integer sum
    is associative → bit-identical regardless of partitioning), and the
    final expression rounds to 6 decimals. The ~1e-6 quantization bias
    is documented and irrelevant for a quality signal.
    """
    tokens = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    counts = tokens.groupBy("doc", "w").agg(F.count("*").alias("c"))
    per_doc = counts.groupBy(F.col("doc").alias(id_col)).agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.sum(
            F.floor(F.col("c") * F.log(F.col("c").cast("double")) * 1e6).cast("long")
        ).alias("qsum"),
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        "n_distinct",
        F.round(
            F.log(F.col("n_tokens").cast("double"))
            - (F.col("qsum") / 1e6) / F.col("n_tokens"),
            6,
        ).alias("entropy"),
    )
