"""Text-analysis queries over the documents table (§2.13), each with a
full DuckDB oracle mirroring the exact expression shapes (integer
divisions and scalar double math only — bit-deterministic)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_spark.ops.widen import widen_if_narrow
from aws_etl_spark.queries.registry import load_table, register, staged_sql_query
from aws_etl_spark.text import (
    c4_filter_flags,
    fingerprint_md5,
    pii_counts,
    pii_redact,
    min_shingle_fingerprints,
    tf_idf,
    lang_id,
    mean_word_length,
    punct_ratio,
    quality_score,
    regex_token_count,
    stopword_ratio,
    whitespace_token_count,
)

_SW = "['the','and','of','to','a','in','is','it','that','for']"

_TOKENS_ORACLE = """
SELECT doc_id,
       LEN(STRING_SPLIT(TRIM(text), ' ')) AS n_tokens_ws,
       LEN(REGEXP_EXTRACT_ALL(text, '\\w+|[^\\w\\s]')) AS n_tokens_re,
       LENGTH(text) AS n_chars_computed,
       n_chars AS n_chars_stored
FROM documents
"""


@register(
    "text_token_counts", oracle=_TOKENS_ORACLE, category="text", tables=("documents",)
)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish-regex token counting."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        whitespace_token_count(F.col("text")).alias("n_tokens_ws"),
        regex_token_count(F.col("text")).alias("n_tokens_re"),
        F.length("text").alias("n_chars_computed"),
        F.col("n_chars").alias("n_chars_stored"),
    )


_QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text,
         STRING_SPLIT(TRIM(LOWER(text)), ' ') AS w,
         LENGTH(REGEXP_REPLACE(text, '\\s', '', 'g')) AS nonspace,
         LENGTH(REGEXP_REPLACE(text, '[\\w\\s]', '', 'g')) AS punct
  FROM documents
),
m AS (
  SELECT doc_id,
         CASE WHEN LEN(w) > 0
              THEN LEN(LIST_FILTER(w, x -> LIST_CONTAINS({_SW}, x))) * 1.0 / LEN(w)
              ELSE 0.0 END AS stopword_ratio,
         CASE WHEN nonspace > 0 THEN punct * 1.0 / nonspace ELSE 0.0 END AS punct_ratio,
         CASE WHEN LEN(w) > 0
              THEN LIST_SUM(LIST_TRANSFORM(w, x -> LENGTH(x))) * 1.0 / LEN(w)
              ELSE 0.0 END AS mean_word_len,
         LENGTH(text) AS n
  FROM t
)
SELECT doc_id, stopword_ratio, punct_ratio, mean_word_len,
       (CASE WHEN n >= 50 AND n <= 10000 THEN 0.4 ELSE 0.0 END)
       + LEAST(stopword_ratio * 2, 0.4)
       + GREATEST(0.2 - punct_ratio, 0.0) AS quality
FROM m
"""


@register(
    "text_quality_score", oracle=_QUALITY_ORACLE, category="text", tables=("documents",)
)
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/stopword/punctuation quality heuristics + composite score."""
    docs = widen_if_narrow(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        stopword_ratio(F.col("text")).alias("stopword_ratio"),
        punct_ratio(F.col("text")).alias("punct_ratio"),
        mean_word_length(F.col("text")).alias("mean_word_len"),
        quality_score(F.col("text")).alias("quality"),
    )


_LANGID_ORACLE = """
WITH t AS (
  SELECT doc_id, lang AS lang_actual,
         LIST_DISTINCT(STRING_SPLIT(TRIM(LOWER(text)), ' ')) AS w
  FROM documents
),
s AS (
  SELECT doc_id, lang_actual,
    LEN(LIST_INTERSECT(w, ['the','and','of','to','a','in','is','it','that','for'])) AS s_en,
    LEN(LIST_INTERSECT(w, ['el','la','de','que','y','en','un','por','con','una'])) AS s_es,
    LEN(LIST_INTERSECT(w, ['le','la','de','et','un','une','du','des','est','dans'])) AS s_fr,
    LEN(LIST_INTERSECT(w, ['der','die','das','und','ist','von','ein','eine','mit','zu'])) AS s_de
  FROM t
)
SELECT doc_id, lang_actual,
       CASE WHEN GREATEST(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
            WHEN s_de = GREATEST(s_en, s_es, s_fr, s_de) THEN 'de'
            WHEN s_en = GREATEST(s_en, s_es, s_fr, s_de) THEN 'en'
            WHEN s_es = GREATEST(s_en, s_es, s_fr, s_de) THEN 'es'
            ELSE 'fr' END AS lang_pred
FROM s
"""


@register(
    "text_lang_id", oracle=_LANGID_ORACLE, category="text", tables=("documents",)
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language heuristic vs the stored lang label."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        lang_id(F.col("text")).alias("lang_pred"),
    )


_TFIDF_ORACLE = """
WITH tok AS (
  SELECT doc_id AS doc, UNNEST(STRING_SPLIT(TRIM(LOWER(text)), ' ')) AS token
  FROM documents
),
tf AS (
  SELECT doc, token, COUNT(*) AS tf FROM tok WHERE token <> ''
  GROUP BY doc, token
),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT tf.doc, tf.token, tf.tf, dfreq.df,
       ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) AS tfidf
FROM tf JOIN dfreq USING (token) CROSS JOIN n
WHERE dfreq.df >= 2
"""


@register(
    "text_tf_idf", oracle=_TFIDF_ORACLE, category="text", tables=("documents",)
)
def q_tf_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-corpus TF-IDF (min_df=2) via explode + double aggregation.

    tfidf is rounded to 6 decimals at the output boundary only: Spark's
    Math.log and DuckDB's ln differ in the last ulp, which the driver's
    exact hash would flag as a mismatch (the library function stays
    unrounded)."""
    docs = load_table(spark, sf_dir, "documents")
    return tf_idf(docs, "doc_id", "text", min_df=2).withColumn(
        "tfidf", F.round("tfidf", 6)
    )


_FP_ORACLE = """
SELECT doc_id,
       MD5(LOWER(REGEXP_REPLACE(TRIM(text), '\\s+', ' ', 'g'))) AS fp_md5,
       LIST_AGGREGATE(
         LIST_TRANSFORM(
           RANGE(1, GREATEST(LEN(STRING_SPLIT(TRIM(LOWER(text)), ' ')) - 2, 0) + 1),
           i -> MD5(ARRAY_TO_STRING(STRING_SPLIT(TRIM(LOWER(text)), ' ')[i:i+2], ' '))
         ), 'min') AS fp_min_shingle
FROM documents
"""


@register(
    "text_fingerprint", oracle=_FP_ORACLE, category="text", tables=("documents",)
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized md5 + min-shingle-md5 document fingerprints (row-wise
    codegen pipeline; left join keeps <k-word docs with NULL)."""
    docs = load_table(spark, sf_dir, "documents")
    mins = min_shingle_fingerprints(docs, "doc_id", "text", k=3)
    return docs.select(
        "doc_id",
        fingerprint_md5(F.col("text")).alias("fp_md5"),
    ).join(mins, "doc_id", "left")


_REPETITION_ORACLE = """
WITH w AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS ws FROM documents),
g AS (
  SELECT doc_id,
         LIST_TRANSFORM(
           RANGE(1, GREATEST(LEN(ws) - 1, 0) + 1),
           i -> ARRAY_TO_STRING(ws[i:i+1], ' ')
         ) AS grams
  FROM w
)
SELECT doc_id,
       CAST(LEN(grams) AS BIGINT) AS n_grams,
       CAST(LEN(LIST_DISTINCT(grams)) AS BIGINT) AS n_distinct,
       1.0 - CAST(LEN(LIST_DISTINCT(grams)) AS DOUBLE) / LEN(grams) AS rep_ratio
FROM g
WHERE LEN(grams) > 0
"""


@register(
    "text_repetition_ratio",
    oracle=_REPETITION_ORACLE,
    category="text",
    tables=("documents",),
)
def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc duplicate-2-gram fraction (Gopher/RefinedWeb-style
    repetition quality signal); IEEE-exact int/int division."""
    from aws_etl_spark.text import repetition_ratio

    docs = load_table(spark, sf_dir, "documents")
    return repetition_ratio(docs, "doc_id", "text", k=2)


_TOP_NGRAMS_ORACLE = """
WITH w AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS ws FROM documents),
g AS (
  SELECT doc_id,
         UNNEST(LIST_TRANSFORM(
           RANGE(1, GREATEST(LEN(ws) - 1, 0) + 1),
           i -> ARRAY_TO_STRING(ws[i:i+1], ' ')
         )) AS ngram
  FROM w
)
SELECT ngram,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       COUNT(*) AS n_occurrences
FROM g
GROUP BY ngram
ORDER BY n_occurrences DESC, ngram
LIMIT 50
"""


@register(
    "text_top_ngrams",
    oracle=_TOP_NGRAMS_ORACLE,
    category="text",
    tables=("documents",),
)
def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-50 2-grams (contamination / stop-gram analysis);
    deterministic (count desc, ngram asc) top-k."""
    from aws_etl_spark.text import top_ngrams

    docs = widen_if_narrow(load_table(spark, sf_dir, "documents"))
    return top_ngrams(docs, "doc_id", "text", k=2, n=50)


_ENTROPY_ORACLE = """
WITH tok AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(LOWER(text)), ' ')) AS w
  FROM documents
),
c AS (
  SELECT doc_id, w, COUNT(*) AS c FROM tok WHERE w <> '' GROUP BY doc_id, w
),
q AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         COUNT(*) AS n_distinct,
         CAST(SUM(CAST(FLOOR(c * LN(CAST(c AS DOUBLE)) * 1000000) AS BIGINT))
              AS BIGINT) AS qsum
  FROM c GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct,
       ROUND(LN(CAST(n_tokens AS DOUBLE)) - (qsum / 1000000.0) / n_tokens, 6)
         AS entropy
FROM q
"""


@register(
    "text_word_entropy",
    oracle=_ENTROPY_ORACLE,
    category="text",
    tables=("documents",),
)
def q_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc word-distribution Shannon entropy (vocab-diversity
    quality signal). Per-term c·ln c quantized to BIGINT at 1e6 before
    summing so the aggregate is order-independent (float sums are not)
    and bit-identical across engines/partitionings."""
    from aws_etl_spark.text import word_entropy

    docs = load_table(spark, sf_dir, "documents")
    return word_entropy(docs, "doc_id", "text")


# PII is synthesized deterministically from doc_id (the test corpus
# contains none) so the redaction rules are genuinely exercised and
# both engines transform identical inputs.
_PII_INJECT_SQL = (
    "'ping user' || CAST(doc_id AS VARCHAR) || '@mail.example or 10.0.' || "
    "CAST(doc_id % 256 AS VARCHAR) || '.7 call 555-867-' || "
    "LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || "
    "' ssn 123-45-6789 ' || text"
)

_PII_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_PII_INJECT_SQL} AS pt FROM documents
)
SELECT doc_id,
  CAST(LEN(REGEXP_EXTRACT_ALL(pt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_email,
  CAST(LEN(REGEXP_EXTRACT_ALL(pt, '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b')) AS BIGINT) AS n_ssn,
  CAST(LEN(REGEXP_EXTRACT_ALL(pt, '\\b\\d{{3}}-\\d{{3}}-\\d{{4}}\\b')) AS BIGINT) AS n_phone,
  CAST(LEN(REGEXP_EXTRACT_ALL(pt, '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS BIGINT) AS n_ipv4,
  REGEXP_REPLACE(
    REGEXP_REPLACE(
      REGEXP_REPLACE(
        REGEXP_REPLACE(pt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
        '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b', '<SSN>', 'g'),
      '\\b\\d{{3}}-\\d{{3}}-\\d{{4}}\\b', '<PHONE>', 'g'),
    '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IPV4>', 'g') AS redacted
FROM t
"""


@register(
    "text_pii_redaction", oracle=_PII_ORACLE, category="text", tables=("documents",)
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (emails/SSNs/phones/IPv4 →
    ``<CLASS>`` placeholders) — the scrubbing pass every training-data
    pipeline runs before tokenization. Pure regexp builtins: scan-bound,
    no shuffle, trivially partition-parallel at 100 TB."""
    docs = widen_if_narrow(load_table(spark, sf_dir, "documents"))
    injected = F.concat(
        F.lit("ping user"), F.col("doc_id").cast("string"),
        F.lit("@mail.example or 10.0."),
        (F.col("doc_id") % 256).cast("string"), F.lit(".7 call 555-867-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ssn 123-45-6789 "), F.col("text"),
    )
    pt = docs.select("doc_id", injected.alias("pt"))
    counts = pii_counts(F.col("pt"))
    return pt.select(
        "doc_id",
        counts["email"].cast("long").alias("n_email"),
        counts["ssn"].cast("long").alias("n_ssn"),
        counts["phone"].cast("long").alias("n_phone"),
        counts["ipv4"].cast("long").alias("n_ipv4"),
        pii_redact(F.col("pt")).alias("redacted"),
    )


_C4_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, STRING_SPLIT(TRIM(LOWER(text)), ' ') AS w
  FROM documents
),
m AS (
  SELECT doc_id, text,
         LEN(w) AS n_words,
         CASE WHEN LEN(w) > 0
              THEN LIST_SUM(LIST_TRANSFORM(w, x -> LENGTH(x))) * 1.0 / LEN(w)
              ELSE 0.0 END AS mean_word_len,
         CASE WHEN LEN(w) > 0
              THEN LEN(LIST_FILTER(w, x -> LIST_CONTAINS({_SW}, x))) * 1.0 / LEN(w)
              ELSE 0.0 END AS stopword_ratio
  FROM t
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, mean_word_len, stopword_ratio,
       n_words BETWEEN 50 AND 100000 AS ok_len,
       mean_word_len BETWEEN 3.0 AND 10.0 AS ok_word_len,
       stopword_ratio >= 0.05 AS ok_stopwords,
       NOT CONTAINS(LOWER(text), 'lorem ipsum') AS ok_no_lorem,
       NOT CONTAINS(text, '{{') AS ok_no_brace,
       (n_words BETWEEN 50 AND 100000)
       AND (mean_word_len BETWEEN 3.0 AND 10.0)
       AND (stopword_ratio >= 0.05)
       AND NOT CONTAINS(LOWER(text), 'lorem ipsum')
       AND NOT CONTAINS(text, '{{') AS kept
FROM m
"""


@register(
    "text_c4_filter", oracle=_C4_ORACLE, category="text", tables=("documents",)
)
def q_c4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style quality filter: per-rule boolean flags + the
    composite keep decision, so downstream can audit WHY a document
    was dropped (the shape used to debias web-scale filtering). All
    JVM scalar/array builtins — scan-bound, no shuffle."""
    docs = widen_if_narrow(load_table(spark, sf_dir, "documents"))
    flags = c4_filter_flags(F.col("text"))
    kept = flags["ok_len"]
    for name in ("ok_word_len", "ok_stopwords", "ok_no_lorem", "ok_no_brace"):
        kept = kept & flags[name]
    from aws_etl_spark.text import mean_word_length, stopword_ratio, whitespace_token_count

    return docs.select(
        "doc_id",
        whitespace_token_count(F.col("text")).cast("long").alias("n_words"),
        mean_word_length(F.col("text")).alias("mean_word_len"),
        stopword_ratio(F.col("text")).alias("stopword_ratio"),
        *[flags[n].alias(n) for n in ("ok_len", "ok_word_len", "ok_stopwords", "ok_no_lorem", "ok_no_brace")],
        kept.alias("kept"),
    )


_PACKING_ORACLE = """
WITH t AS (
  SELECT doc_id, doc_id % 8 AS shard,
         CAST(LEN(STRING_SPLIT(TRIM(text), ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, shard, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM t
)
SELECT doc_id, shard, n_tokens, cum - n_tokens AS start_offset,
       (cum - n_tokens) // 2048 AS bin_id,
       (cum - n_tokens) % 2048 AS offset_in_bin
FROM c
"""


@register(
    "text_sequence_packing",
    oracle=_PACKING_ORACLE,
    category="text",
    tables=("documents",),
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: lay documents head-to-tail
    per shard (ordered by doc_id) and chunk the stream into 2048-token
    context windows — each doc gets (bin, offset), docs may straddle
    bins, zero padding waste (GPT-style pretraining packing).

    Scale shape: sharding by doc_id % N makes the running sum
    per-shard — N independent window partitions instead of one global
    ordering, which is exactly how distributed packing runs at 100 TB
    (per-worker streams). Integer arithmetic only → hash-exact.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        whitespace_token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    return c.select(
        "doc_id", "shard", "n_tokens",
        (F.col("cum") - F.col("n_tokens")).alias("start_offset"),
        F.expr("(cum - n_tokens) DIV 2048").alias("bin_id"),
        ((F.col("cum") - F.col("n_tokens")) % 2048).alias("offset_in_bin"),
    )


def _gopher_sql(tok_from: str) -> str:
    """Gopher-style quality rule bundle over the token stream.

    ``tok_from`` is the dialect-specific tokenizing FROM clause; all
    downstream math is engine-shared (integer counts, one int/int
    division per ratio — deterministic doubles).
    """
    return f"""
WITH tok AS (
  SELECT doc_id, w FROM ({tok_from}) t WHERE w <> ''
),
wc AS (
  SELECT doc_id,
         COUNT(*) AS n_words,
         SUM(LENGTH(w)) AS total_chars,
         SUM(CASE WHEN w IN ('the','and','of','to','a','in','is','it',
                             'that','for') THEN 1 ELSE 0 END) AS n_stop
  FROM tok GROUP BY doc_id
),
dom AS (
  SELECT doc_id, MAX(c) AS top_word_n
  FROM (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w) x
  GROUP BY doc_id
),
flags AS (
  SELECT w.doc_id,
         CAST(w.n_words AS BIGINT) AS n_words,
         CASE WHEN w.n_words >= 50 AND w.n_words <= 100000
              THEN 1 ELSE 0 END AS ok_word_count,
         CASE WHEN w.n_words > 0
               AND CAST(w.total_chars AS DOUBLE) / w.n_words >= 3
               AND CAST(w.total_chars AS DOUBLE) / w.n_words <= 10
              THEN 1 ELSE 0 END AS ok_mean_word_len,
         CASE WHEN w.n_stop >= 2 THEN 1 ELSE 0 END AS ok_stopwords,
         CASE WHEN CAST(d.top_word_n AS DOUBLE) / w.n_words <= 0.2
              THEN 1 ELSE 0 END AS ok_dominance
  FROM wc w JOIN dom d ON w.doc_id = d.doc_id
)
SELECT doc_id, n_words,
       CAST(ok_word_count AS BIGINT) AS ok_word_count,
       CAST(ok_mean_word_len AS BIGINT) AS ok_mean_word_len,
       CAST(ok_stopwords AS BIGINT) AS ok_stopwords,
       CAST(ok_dominance AS BIGINT) AS ok_dominance,
       CAST(ok_word_count * ok_mean_word_len * ok_stopwords
            * ok_dominance AS BIGINT) AS keep
FROM flags
"""


_GOPHER_SPARK_TOK = (
    "SELECT doc_id, EXPLODE(SPLIT(TRIM(text), ' ')) AS w FROM documents"
)
_GOPHER_DUCK_TOK = (
    "SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS w FROM documents"
)

from aws_etl_spark.queries.registry import sql_query  # noqa: E402

sql_query(
    "text_gopher_rules",
    _gopher_sql(_GOPHER_SPARK_TOK),
    oracle=_gopher_sql(_GOPHER_DUCK_TOK),
    category="text",
    doc=(
        "Gopher-style quality rule bundle: word-count band, mean word "
        "length band, minimum stopword evidence, single-word dominance "
        "cap — named boolean flags plus the composite keep decision. "
        "One explode + two stacked aggs on doc_id (map-side combined); "
        "ratios are single int/int divisions — deterministic doubles."
    ),
    tables=("documents",),
)


_SURPRISAL_ORACLE = """
WITH tok AS (
  SELECT doc_id AS doc, UNNEST(STRING_SPLIT(TRIM(LOWER(text)), ' ')) AS token
  FROM documents
),
t AS (SELECT doc, token FROM tok WHERE token <> ''),
cnt AS (SELECT token, COUNT(*) AS c FROM t GROUP BY token),
n AS (SELECT COUNT(*) AS total FROM t),
scored AS (
  SELECT t.doc,
         CAST(FLOOR(LN(CAST(n.total AS DOUBLE) / cnt.c) * 1000000)
              AS BIGINT) AS s_q
  FROM t JOIN cnt USING (token) CROSS JOIN n
)
SELECT doc AS doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(s_q) AS BIGINT) AS surprisal_q6_sum,
       (CAST(SUM(s_q) AS DOUBLE) / COUNT(*)) / 1000000.0 AS avg_surprisal
FROM scored
GROUP BY doc
"""


@register(
    "text_unigram_surprisal",
    oracle=_SURPRISAL_ORACLE,
    category="text",
    tables=("documents",),
)
def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram-LM surprisal (the perplexity-proxy quality
    signal of CCNet-style filtering, with the LM trained on the corpus
    itself): token surprisal −ln p(w) = ln(total/count_w), QUANTIZED
    to 1e-6 integers per token BEFORE the per-doc sum (the word-entropy
    idiom — Math.log and DuckDB ln can differ in the last ulp, so the
    only portable aggregate is an integer one); the mean is two IEEE
    divisions at the end. Plan: one token explode feeds both the
    count table and the scoring join (hash join on token — Zipf head
    is exactly the AQE skew-join case); the 1-row total rides a
    broadcast crossJoin. Low avg_surprisal ⇒ repetitive/boilerplate
    doc; high ⇒ rare-token soup — both filter tails."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            F.col("doc_id").alias("doc"),
            F.explode(F.split(F.trim(F.lower("text")), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    cnt = tok.groupBy("token").agg(F.count("*").alias("c"))
    total = tok.select(F.count("*").alias("total"))
    scored = (
        tok.join(cnt, "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc",
            F.floor(
                F.log(F.col("total").cast("double") / F.col("c")) * 1_000_000
            )
            .cast("long")
            .alias("s_q"),
        )
    )
    return scored.groupBy(F.col("doc").alias("doc_id")).agg(
        F.count("*").alias("n_tokens"),
        F.sum("s_q").alias("surprisal_q6_sum"),
        (
            (F.sum("s_q").cast("double") / F.count("*")) / F.lit(1_000_000.0)
        ).alias("avg_surprisal"),
    )


# --------------------------------------------------------------------------
# BPE tokenizer-vocabulary induction (text/bpe.py): fixed-round merge
# training, hash-proven cross-engine via an unrolled-CTE oracle — the
# kmeans/pagerank_exact idiom applied to tokenizer training. The
# left-to-right greedy merge is pure windows (gaps-and-islands over
# candidate positions, odd offsets are real merges), so both engines
# make identical merge decisions including same-symbol runs.
# --------------------------------------------------------------------------

_BPE_ROUNDS = 3


def _bpe_round_ctes(r: int) -> str:
    """One merge round as oracle CTEs: pair count → top-1 rule →
    greedy merge (windows over the filtered sequence).

    The rule joins in via LEFT JOIN ... ON TRUE, not CROSS JOIN: when
    a round's best-pair CTE is EMPTY (corpus fully merged before
    n_rounds), every mcand coalesces to FALSE and the sequence passes
    through unchanged — exactly the Spark side's early-stop semantics
    (bpe_train breaks; the merges output likewise has no row for the
    round because it selects FROM best{r}). A CROSS JOIN would wipe
    the sequence instead and diverge from the engine."""
    return f"""
pairs{r} AS (
  SELECT a.sym AS sym_a, b.sym AS sym_b,
         CAST(SUM(a.freq) AS BIGINT) AS pair_count
  FROM seq{r - 1} a JOIN seq{r - 1} b
    ON b.word = a.word AND b.pos = a.pos + 1
  GROUP BY a.sym, b.sym
),
best{r} AS (
  SELECT sym_a, sym_b, pair_count FROM pairs{r}
  ORDER BY pair_count DESC, sym_a, sym_b LIMIT 1
),
seq{r} AS (
  SELECT word, freq,
         ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS pos,
         CASE WHEN mstart THEN sym || nxt ELSE sym END AS sym
  FROM (
    SELECT *,
           COALESCE(LAG(mstart) OVER (PARTITION BY word ORDER BY pos),
                    FALSE) AS consumed
    FROM (
      SELECT *,
             mcand AND COALESCE(
               (ROW_NUMBER() OVER (
                  PARTITION BY word, mcand, blk ORDER BY pos)) % 2 = 1,
               FALSE) AS mstart
      FROM (
        SELECT *,
               CASE WHEN mcand THEN pos - ROW_NUMBER() OVER (
                 PARTITION BY word, mcand ORDER BY pos) END AS blk
        FROM (
          SELECT s.word, s.freq, s.pos, s.sym,
                 LEAD(s.sym) OVER (
                   PARTITION BY s.word ORDER BY s.pos) AS nxt,
                 COALESCE(
                   s.sym = b.sym_a AND LEAD(s.sym) OVER (
                     PARTITION BY s.word ORDER BY s.pos) = b.sym_b,
                   FALSE) AS mcand
          FROM seq{r - 1} s LEFT JOIN best{r} b ON TRUE
        )
      )
    )
  ) WHERE NOT consumed
)"""


def _bpe_base_ctes() -> str:
    return """
WITH words AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (
    SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
    FROM documents
  )
  WHERE regexp_matches(word, '^[a-z]{1,20}$')
  GROUP BY word
),
seq0 AS (
  SELECT word, freq, generate_subscripts(syms, 1) AS pos, unnest(syms) AS sym
  FROM (
    SELECT word, freq,
           list_append(
             list_transform(generate_series(1, length(word)),
                            i -> substring(word, i, 1)),
             '</w>') AS syms
    FROM words
  )
)"""


def _bpe_merges_oracle(n_rounds: int = _BPE_ROUNDS) -> str:
    rounds = ",".join(_bpe_round_ctes(r) for r in range(1, n_rounds + 1))
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS round, sym_a, sym_b,"
        f" sym_a || sym_b AS merged, pair_count FROM best{r}"
        for r in range(1, n_rounds + 1)
    )
    return f"{_bpe_base_ctes()},{rounds}\n{selects}"


def _bpe_vocab_oracle(n_rounds: int = _BPE_ROUNDS) -> str:
    rounds = ",".join(_bpe_round_ctes(r) for r in range(1, n_rounds + 1))
    return (
        f"{_bpe_base_ctes()},{rounds}\n"
        f"SELECT sym, CAST(SUM(freq) AS BIGINT) AS n_occurrences\n"
        f"FROM seq{n_rounds} GROUP BY sym"
    )


@register(
    "text_bpe_merges",
    oracle=_bpe_merges_oracle(),
    category="text",
    tables=("documents",),
)
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, the learned merge rules: 3 rounds of
    (most-frequent adjacent symbol pair → corpus-wide left-to-right
    greedy merge) over the frequency-weighted word inventory — how LLM
    tokenizer vocabularies are induced (public BPE algorithm, Sennrich
    et al. 2016). Hash-exact across engines: pair counts are integer,
    the rule argmax has a total-order tiebreak, and the greedy merge
    is the gaps-and-islands window formulation (odd offsets in each
    candidate run are real merges — handles same-symbol runs
    canonically). Scale: after the single corpus pass that builds the
    word inventory, every round runs on the vocabulary-sized distinct
    word table (pair count map-side combinable; rule = 1-row
    TakeOrdered broadcast back; merge = per-word bounded windows) —
    the reason BPE training is tractable at 100 TB."""
    from aws_etl_spark.text.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges, _ = bpe_train(docs, "text", n_rounds=_BPE_ROUNDS)
    return merges


@register(
    "text_bpe_vocab",
    oracle=_bpe_vocab_oracle(),
    category="text",
    tables=("documents",),
)
def q_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The symbol inventory after 3 BPE merge rounds, weighted by word
    frequency — the induced vocabulary seed (chars + earned merges).
    Same unrolled-CTE oracle construction as text_bpe_merges; the
    vocabulary hash proves every per-word merge decision, not just the
    3 chosen rules."""
    from aws_etl_spark.text.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    _, vocab = bpe_train(docs, "text", n_rounds=_BPE_ROUNDS)
    return vocab


def _bpe_encode_oracle(n_rounds: int = _BPE_ROUNDS) -> str:
    rounds = ",".join(_bpe_round_ctes(r) for r in range(1, n_rounds + 1))
    return f"""{_bpe_base_ctes()},{rounds},
wordlen AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n_toks
  FROM seq{n_rounds} GROUP BY word
),
docwords AS (
  SELECT doc_id, word FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
    FROM documents
  ) WHERE regexp_matches(word, '^[a-z]{{1,20}}$')
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(w.n_toks) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(LENGTH(d.word) + 1) AS BIGINT) AS n_chars_marked
FROM docwords d JOIN wordlen w USING (word)
GROUP BY d.doc_id
"""


@register(
    "text_bpe_encode",
    oracle=_bpe_encode_oracle(),
    category="text",
    tables=("documents",),
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the induced BPE vocabulary back to the corpus: per
    document, words, BPE-token count under the 3-round merge table,
    and the pre-merge symbol count (chars + end marker) — the
    train→encode round trip every tokenizer pipeline runs, with the
    compression the merges bought visible as n_chars_marked −
    n_bpe_tokens. Scale shape: encoding is a JOIN of the corpus word
    stream against the (vocabulary-sized) trained word→length table —
    the corpus is never re-segmented per merge; a broadcast join when
    the vocab fits, shuffle-hash otherwise."""
    from aws_etl_spark.text.bpe import WORD_RE, bpe_final_state

    docs = load_table(spark, sf_dir, "documents")
    seq = bpe_final_state(docs, "text", n_rounds=_BPE_ROUNDS)
    wordlen = seq.groupBy("word").agg(
        F.count("*").cast("bigint").alias("n_toks")
    )
    docwords = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("word"),
        )
        .filter(F.col("word").rlike(WORD_RE))
    )
    return (
        docwords.join(wordlen, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_toks").cast("bigint").alias("n_bpe_tokens"),
            F.sum(F.length("word") + 1).cast("bigint").alias("n_chars_marked"),
        )
    )


_PHRASE_SPARK = r"""
WITH toks AS (
  SELECT doc_id, pos, word FROM (
    SELECT doc_id, posexplode(split(lower(text), '\\s+')) AS (pos, word)
    FROM documents
  )
),
a AS (SELECT doc_id, pos FROM toks WHERE word = 'table'),
b AS (SELECT doc_id, pos FROM toks WHERE word = 'scan')
SELECT a.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_matches,
       CAST(MIN(a.pos) AS BIGINT) AS first_pos
FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
GROUP BY a.doc_id
"""

_PHRASE_DUCK = r"""
WITH toks AS (
  SELECT doc_id,
         generate_subscripts(ws, 1) - 1 AS pos,
         unnest(ws) AS word
  FROM (
    SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ws
    FROM documents
  )
),
a AS (SELECT doc_id, pos FROM toks WHERE word = 'table'),
b AS (SELECT doc_id, pos FROM toks WHERE word = 'scan')
SELECT a.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_matches,
       CAST(MIN(a.pos) AS BIGINT) AS first_pos
FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
GROUP BY a.doc_id
"""

sql_query(
    "text_phrase_search",
    _PHRASE_SPARK,
    oracle=_PHRASE_DUCK,
    category="text",
    doc=(
        "Positional phrase search ('table scan') over word-position "
        "postings: both term posting lists are filtered BEFORE the "
        "adjacency self-join (b.pos = a.pos + 1), so the join touches "
        "only the two terms' postings — the inverted-index query "
        "shape; per-doc match count + first hit position. Spark pos "
        "is posexplode's 0-based index; the oracle subtracts 1 from "
        "generate_subscripts to match."
    ),
    tables=("documents",),
)


_SKIPGRAM_SPARK = r"""
WITH toks AS (
  SELECT doc_id, pos, word FROM (
    SELECT doc_id, posexplode(split(lower(text), '\\s+')) AS (pos, word)
    FROM documents
  ) WHERE word <> ''
)
SELECT a.word AS center, b.word AS context,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM toks a JOIN toks b
  ON b.doc_id = a.doc_id
 AND b.pos BETWEEN a.pos - 2 AND a.pos + 2
 AND b.pos <> a.pos
GROUP BY a.word, b.word
HAVING COUNT(*) >= 5
"""

_SKIPGRAM_DUCK = r"""
WITH toks AS (
  SELECT doc_id, pos, word FROM (
    SELECT doc_id,
           generate_subscripts(ws, 1) - 1 AS pos,
           unnest(ws) AS word
    FROM (
      SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ws
      FROM documents
    )
  ) WHERE word <> ''
)
SELECT a.word AS center, b.word AS context,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM toks a JOIN toks b
  ON b.doc_id = a.doc_id
 AND b.pos BETWEEN a.pos - 2 AND a.pos + 2
 AND b.pos <> a.pos
GROUP BY a.word, b.word
HAVING COUNT(*) >= 5
"""

sql_query(
    "text_skipgram_pairs",
    _SKIPGRAM_SPARK,
    oracle=_SKIPGRAM_DUCK,
    category="text",
    doc=(
        "Skip-gram (center, context) pair counts, window ±2 — the "
        "training-pair generator for word2vec-style embedding "
        "pretraining. The self-join key is doc_id (ONE co-partitioned "
        "shuffle) and the position band bounds fan-out to 4 contexts "
        "per token, so cost is linear in corpus size × window; the "
        "min-count HAVING (≥5) is the standard vocabulary floor and "
        "bounds output to frequent-pair mass."
    ),
    tables=("documents",),
)


_NOVELTY_SPARK = r"""
WITH t AS (
  SELECT doc_id, split(lower(text), '\\s+') AS ws FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id, explode(
      -- short-doc guard: docs with < 3 tokens yield no 3-grams
      -- (matching the oracle's range(1, n-2+1) semantics). The token
      -- array is hoisted to `ws` so split() runs once per row — the
      -- r6 filter-lambda guard re-evaluated split() per element
      -- (higher-order lambdas are interpreted, O(tokens × split)).
      CASE WHEN size(ws) >= 3
           THEN transform(sequence(1, size(ws) - 2),
                          i -> concat_ws(' ', slice(ws, i, 3)))
           ELSE CAST(array() AS ARRAY<STRING>) END
    ) AS gram
    FROM t
  ) WHERE gram <> ''
),
firsts AS (
  SELECT gram, MIN(doc_id) AS first_doc FROM grams GROUP BY gram
)
SELECT g.doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS novelty_ratio
FROM grams g JOIN firsts f ON f.gram = g.gram
GROUP BY g.doc_id
"""

_NOVELTY_DUCK = r"""
WITH grams AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, greatest(len(regexp_split_to_array(lower(text), '\s+')) - 2, 0) + 1),
             i -> array_to_string(
               regexp_split_to_array(lower(text), '\s+')[i:i+2], ' ')
           )) AS gram
    FROM documents
  ) WHERE gram <> ''
),
firsts AS (
  SELECT gram, MIN(doc_id) AS first_doc FROM grams GROUP BY gram
)
SELECT g.doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS novelty_ratio
FROM grams g JOIN firsts f ON f.gram = g.gram
GROUP BY g.doc_id
"""

sql_query(
    "text_ngram_novelty",
    _NOVELTY_SPARK,
    oracle=_NOVELTY_DUCK,
    category="text",
    doc=(
        "Per-document 3-gram NOVELTY: the fraction of a doc's "
        "distinct shingles whose corpus-wide first occurrence (by "
        "doc_id order) is this doc — the curriculum/memorization "
        "audit: late documents full of already-seen spans contribute "
        "little new signal and are dedup/down-sample candidates. One "
        "map-side MIN per gram + one join; int/int IEEE ratio."
    ),
    tables=("documents",),
)


# --------------------------------------------------------------------------
# Heaps'-law vocabulary-growth fit: V(n) ~ K * n^beta. The growth curve
# is sampled at 20 doc-prefix checkpoints; the exponent is an OLS fit
# over micro-quantized ln points — all integers until two final IEEE
# divisions. Corpus-linguistics health check: natural text sits at
# beta ~ 0.4-0.6; synthetic/templated corpora drift far outside.
# --------------------------------------------------------------------------

def _heaps_sql(tok_clause: str) -> str:
    """``tok_clause`` is the dialect word-splitter (explode(split())
    on Spark, unnest(string_split()) on DuckDB). The prefix curve
    needs NO prefix scan: per-doc token counts and per-word
    first-occurrence docs (both one map-side-combinable agg) join a
    broadcast 20-row checkpoint spine — 20 partial sums per doc/word,
    never a running window. ln() quantizes to micros with FLOOR at
    the output boundary (the surprisal idiom); the OLS sums are exact
    BIGINTs (|x| ~ 1e7, K*x^2 ~ 2.4e15 << 2^63), so beta and alpha
    are single divisions of identical integers."""
    return f"""
WITH tok AS ({tok_clause}),
t AS (SELECT doc_id, word FROM tok WHERE word <> ''),
dt AS (SELECT doc_id, COUNT(*) AS nt FROM t GROUP BY doc_id),
wf AS (SELECT word, MIN(doc_id) AS first_doc FROM t GROUP BY word),
mx AS (SELECT MAX(doc_id) + 1 AS n_docs FROM dt),
cp AS (
  SELECT g.k,
         CAST(FLOOR(CAST(mx.n_docs AS DOUBLE) * g.k / 20.0) AS BIGINT) AS cut
  FROM (SELECT bin + 1 AS k FROM bins) g CROSS JOIN mx
),
curve AS (
  SELECT cp.k, cp.cut,
         (SELECT CAST(SUM(nt) AS BIGINT) FROM dt WHERE dt.doc_id < cp.cut)
           AS n_tokens,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM wf WHERE wf.first_doc < cp.cut)
           AS vocab
  FROM cp
),
q AS (
  SELECT k, cut, n_tokens, vocab,
         CAST(FLOOR(LN(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
           AS ln_n_q6,
         CAST(FLOOR(LN(CAST(vocab AS DOUBLE)) * 1000000) AS BIGINT)
           AS ln_v_q6
  FROM curve
),
ols AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS kk,
         CAST(SUM(ln_n_q6) AS BIGINT) AS sx,
         CAST(SUM(ln_v_q6) AS BIGINT) AS sy,
         CAST(SUM(ln_n_q6 * ln_v_q6) AS BIGINT) AS sxy,
         CAST(SUM(ln_n_q6 * ln_n_q6) AS BIGINT) AS sxx
  FROM q
)
SELECT q.k, q.cut, q.n_tokens, q.vocab, q.ln_n_q6, q.ln_v_q6,
       CAST(ols.kk * ols.sxy - ols.sx * ols.sy AS DOUBLE) /
       CAST(ols.kk * ols.sxx - ols.sx * ols.sx AS DOUBLE) AS beta,
       (CAST(ols.sy AS DOUBLE) -
        CAST(ols.kk * ols.sxy - ols.sx * ols.sy AS DOUBLE) /
        CAST(ols.kk * ols.sxx - ols.sx * ols.sx AS DOUBLE) *
        CAST(ols.sx AS DOUBLE)) / CAST(ols.kk AS DOUBLE) / 1000000.0
         AS alpha_lnk
FROM q CROSS JOIN ols
ORDER BY q.k
"""


_HEAPS_SPARK_TOK = (
    "SELECT doc_id, explode(split(trim(lower(text)), ' ')) AS word "
    "FROM documents"
)
_HEAPS_DUCK_TOK = (
    "SELECT doc_id, unnest(string_split(trim(lower(text)), ' ')) AS word "
    "FROM documents"
)
_HEAPS_SPARK_BINS = "(SELECT explode(sequence(0, 19)) AS bin) bins"
_HEAPS_DUCK_BINS = "(SELECT unnest(generate_series(0, 19)) AS bin) bins"

staged_sql_query(
    "text_heaps_law",
    # Round-10 rescan fix: the CTE form re-derived the token explode
    # into 10 logical documents scans (dt and wf each re-tokenized,
    # then the 20 correlated checkpoint subqueries inlined them
    # again). Staged: the per-doc token counts and the per-word
    # first-occurrence docs are each ONE tokenizing scan (two
    # documents scans total — checkpointing the exploded token stream
    # itself would materialize more than the corpus, the wrong trade
    # at 100 TB); both rollups checkpoint small (docs / vocab sized)
    # and the 20-point curve reads only them.
    ops=(
        (
            "view",
            "heaps_dt",
            f"""
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nt
            FROM ({_HEAPS_SPARK_TOK}) tok WHERE word <> ''
            GROUP BY doc_id
            """,
        ),
        (
            "view",
            "heaps_wf",
            f"""
            SELECT word, MIN(doc_id) AS first_doc
            FROM ({_HEAPS_SPARK_TOK}) tok WHERE word <> ''
            GROUP BY word
            """,
        ),
        ("scalar", "HEAPSND", "SELECT MAX(doc_id) + 1 FROM heaps_dt"),
    ),
    final="""
    WITH cp AS (
      SELECT g.k,
             CAST(FLOOR(CAST({HEAPSND} AS DOUBLE) * g.k / 20.0) AS BIGINT)
               AS cut
      FROM (SELECT bin + 1 AS k
            FROM (SELECT explode(sequence(0, 19)) AS bin) bins) g
    ),
    curve AS (
      SELECT cp.k, cp.cut,
             (SELECT CAST(SUM(nt) AS BIGINT) FROM heaps_dt dt
              WHERE dt.doc_id < cp.cut) AS n_tokens,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM heaps_wf wf
              WHERE wf.first_doc < cp.cut) AS vocab
      FROM cp
    ),
    q AS (
      SELECT k, cut, n_tokens, vocab,
             CAST(FLOOR(LN(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
               AS ln_n_q6,
             CAST(FLOOR(LN(CAST(vocab AS DOUBLE)) * 1000000) AS BIGINT)
               AS ln_v_q6
      FROM curve
    ),
    ols AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS kk,
             CAST(SUM(ln_n_q6) AS BIGINT) AS sx,
             CAST(SUM(ln_v_q6) AS BIGINT) AS sy,
             CAST(SUM(ln_n_q6 * ln_v_q6) AS BIGINT) AS sxy,
             CAST(SUM(ln_n_q6 * ln_n_q6) AS BIGINT) AS sxx
      FROM q
    )
    SELECT q.k, q.cut, q.n_tokens, q.vocab, q.ln_n_q6, q.ln_v_q6,
           CAST(ols.kk * ols.sxy - ols.sx * ols.sy AS DOUBLE) /
           CAST(ols.kk * ols.sxx - ols.sx * ols.sx AS DOUBLE) AS beta,
           (CAST(ols.sy AS DOUBLE) -
            CAST(ols.kk * ols.sxy - ols.sx * ols.sy AS DOUBLE) /
            CAST(ols.kk * ols.sxx - ols.sx * ols.sx AS DOUBLE) *
            CAST(ols.sx AS DOUBLE)) / CAST(ols.kk AS DOUBLE) / 1000000.0
             AS alpha_lnk
    FROM q CROSS JOIN ols
    ORDER BY q.k
    """,
    oracle=_heaps_sql(_HEAPS_DUCK_TOK).replace(
        "bins)", _HEAPS_DUCK_BINS + ")"
    ),
    category="text",
    doc=(
        "Heaps'-law vocabulary-growth fit V(n) ~ K*n^beta over 20 "
        "doc-prefix checkpoints: cumulative token counts and "
        "first-occurrence vocabulary per checkpoint (two "
        "map-side-combinable aggs joined to a broadcast spine — no "
        "running window over the corpus), micro-quantized ln points "
        "and an exact-integer OLS for the exponent. The templated "
        "synthetic corpus fits with beta far below natural-text "
        "0.4-0.6 — exactly what the health check is for."
    ),
    tables=("documents",),
)


# --------------------------------------------------------------------------
# TextRank keyword extraction: quantized PageRank over the word
# co-occurrence graph (window +-2 within each doc). Pure composition
# of two proven kernels — the skip-gram co-occurrence join and the
# integer PageRank from dedup/pagerank.py — so the whole pipeline
# inherits their oracle-exactness.
# --------------------------------------------------------------------------

def _textrank_oracle(n_iter: int = 10, damping_pct: int = 85) -> str:
    q = 10**12
    its = []
    for k in range(n_iter):
        its.append(f""",
it{k + 1} AS MATERIALIZED (
  SELECT d.u,
         CAST(tq.teleport_q
              + ({damping_pct} * COALESCE(c.contrib, 0)) // 100
           AS BIGINT) AS rank_q,
         d.deg
  FROM deg d CROSS JOIN tq
  LEFT JOIN (
    SELECT e.v AS u, SUM(r.rank_q // r.deg) AS contrib
    FROM edges e JOIN it{k} r ON e.u = r.u
    GROUP BY e.v
  ) c ON c.u = d.u
)""")
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, pos, word FROM (
    SELECT doc_id,
           generate_subscripts(ws, 1) - 1 AS pos,
           unnest(ws) AS word
    FROM (
      SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws
      FROM documents
    )
  ) WHERE word <> ''
),
cooc AS MATERIALIZED (
  SELECT DISTINCT LEAST(a.word, b.word) AS id_a,
                  GREATEST(a.word, b.word) AS id_b
  FROM toks a JOIN toks b
    ON b.doc_id = a.doc_id
   AND b.pos BETWEEN a.pos + 1 AND a.pos + 2
  WHERE a.word <> b.word
),
edges AS MATERIALIZED (
  SELECT id_a AS u, id_b AS v FROM cooc
  UNION
  SELECT id_b AS u, id_a AS v FROM cooc
),
deg AS MATERIALIZED (SELECT u, COUNT(*) AS deg FROM edges GROUP BY u),
nn AS (SELECT COUNT(*) AS n FROM deg),
tq AS (
  SELECT ((100 - {damping_pct}) * {q}) // (100 * n) AS teleport_q,
         {q} // n AS init_q
  FROM nn
),
it0 AS (
  SELECT d.u, CAST(tq.init_q AS BIGINT) AS rank_q, d.deg
  FROM deg d CROSS JOIN tq
){"".join(its)}
SELECT u AS word, rank_q, CAST(deg AS BIGINT) AS degree
FROM it{n_iter}
ORDER BY rank_q DESC, u
LIMIT 20
"""


@register(
    "text_textrank_keywords",
    oracle=_textrank_oracle(),
    category="text",
    tables=("documents",),
)
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction: top-20 words by quantized
    PageRank over the corpus co-occurrence graph (undirected edges
    between words within +-2 positions in a doc). Pure composition
    of proven kernels — the skip-gram windowed self-join builds the
    edge list, dedup/pagerank.py's integer PageRank ranks it — so
    every arithmetic step is the exact oracle-able formulation.
    Scale: the edge list is bounded by distinct co-occurring word
    PAIRS (vocabulary-sized, not corpus-sized) after the one
    token-stream join; iterations then run on the vocabulary graph
    only, the BPE/Gram 'reduce once, iterate small' shape."""
    from aws_etl_spark.dedup.pagerank import pagerank_quantized

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.lower("text"), r"\s+")).alias(
                "pos", "word"
            ),
        )
        .filter(F.col("word") != "")
    )
    a, b = toks.alias("a"), toks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.doc_id") == F.col("a.doc_id"))
            & F.col("b.pos").between(F.col("a.pos") + 1, F.col("a.pos") + 2)
            & (F.col("a.word") != F.col("b.word")),
        )
        .select(
            F.least(F.col("a.word"), F.col("b.word")).alias("id_a"),
            F.greatest(F.col("a.word"), F.col("b.word")).alias("id_b"),
        )
        .distinct()
    )
    ranks = pagerank_quantized(pairs, n_iter=10, damping_pct=85)
    return (
        ranks.select(
            F.col("node").alias("word"),
            "rank_q",
            F.col("degree").cast("long").alias("degree"),
        )
        .orderBy(F.desc("rank_q"), "word")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Bigram-LM cross-entropy: the conditional upgrade of unigram
# surprisal. An add-1-smoothed bigram model is fit on the corpus
# itself and each document scored by its average negative
# log-likelihood under it — the standard cheap LM-quality signal
# (high xent = unusual word order = noise/garble candidates; very low
# xent = templated/boilerplate candidates). Plan: one posexplode, a
# doc-partitioned LEAD for adjacency, two grouped counts (map-side
# combined), joins back on the bigram/unigram keys. Per-bigram NLL is
# FLOOR-quantized to micro-nats (the surprisal idiom) so the per-doc
# SUM is an exact integer — order-independent under any partitioning.
# --------------------------------------------------------------------------

def _bigram_xent_sql(tok0: str) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, pos, token FROM ({tok0}) WHERE token <> ''
),
bg0 AS (
  SELECT doc_id, token AS w1,
         LEAD(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM tok
),
bg AS (SELECT doc_id, w1, w2 FROM bg0 WHERE w2 IS NOT NULL),
c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg GROUP BY w1),
v AS (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS vsz FROM tok),
scored AS (
  SELECT bg.doc_id,
         CAST(FLOOR(LN(CAST(c1.c1 + v.vsz AS DOUBLE) / (c12.c12 + 1))
              * 1000000) AS BIGINT) AS nll_q
  FROM bg
  JOIN c12 ON c12.w1 = bg.w1 AND c12.w2 = bg.w2
  JOIN c1 ON c1.w1 = bg.w1
  CROSS JOIN v
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(nll_q) AS BIGINT) AS xent_q6_sum,
       (CAST(SUM(nll_q) AS DOUBLE) / COUNT(*)) / 1000000.0 AS avg_cross_entropy
FROM scored GROUP BY doc_id
"""


_XENT_TOK_SPARK = (
    "SELECT doc_id, posexplode(split(trim(lower(text)), ' ')) AS (pos, token) "
    "FROM documents"
)
_XENT_TOK_DUCK = (
    "SELECT doc_id, generate_subscripts(arr, 1) AS pos, unnest(arr) AS token "
    "FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS arr "
    "FROM documents)"
)

sql_query(
    "text_bigram_crossentropy",
    _bigram_xent_sql(_XENT_TOK_SPARK),
    oracle=_bigram_xent_sql(_XENT_TOK_DUCK),
    category="text",
    doc=(
        "Per-document cross-entropy under an add-1-smoothed corpus "
        "bigram LM — the conditional word-order upgrade of "
        "text_unigram_surprisal and the classic cheap LM-quality "
        "filter (CCNet-style perplexity gating). NLL per bigram is "
        "ln((c1+V)/(c12+1)) micro-quantized, so per-doc sums are "
        "exact integers; one posexplode + doc-partitioned LEAD + two "
        "map-side-combined count aggregations."
    ),
    tables=("documents",),
)


# --------------------------------------------------------------------------
# BM25 top-k retrieval — the full-text search scorer over the corpus
# (Robertson/Sparck-Jones idf, Lucene's +1 idf shift so scores stay
# positive; k1=1.2, b=0.75). Fixed query terms make the scorer a
# driver-checkable plan; the shape is the inverted-index one: the
# token stream is filtered to query terms BEFORE any join (posting
# lists), per-doc lengths reduce map-side, and the score is assembled
# from exact integers — idf and the tf/length weight are each
# FLOOR-quantized to micros and multiplied as BIGINTs, so the per-doc
# sum is exact and the top-20 cut (score, doc_id tiebreak) is total.
# Every double literal is CAST explicitly: bare 0.9 parses as
# DECIMAL on DuckDB and the decimal division rounds differently.
# --------------------------------------------------------------------------

def _bm25_sql(tok: str) -> str:
    return f"""
WITH tok AS ({tok}),
t AS (SELECT doc_id, token FROM tok WHERE token <> ''),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM t GROUP BY doc_id),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl
  FROM dl
),
tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
       FROM t WHERE token IN ('join', 'vector', 'dup')
       GROUP BY doc_id, token),
df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token),
contrib AS (
  SELECT tf.doc_id,
         CAST(FLOOR(LN(CAST(1.0 AS DOUBLE)
             + (CAST(s.n AS DOUBLE) - df.df + CAST(0.5 AS DOUBLE))
               / (CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
           * 1000000) AS BIGINT)
         *
         CAST(FLOOR(
           ((CAST(tf.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
              / (CAST(tf.tf AS DOUBLE) + CAST(0.3 AS DOUBLE)
                 + ((CAST(0.9 AS DOUBLE) * dl.dl) * s.n) / s.sumdl))
           * 1000000) AS BIGINT) AS s_q
  FROM tf
  JOIN df ON df.token = tf.token
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
       CAST(SUM(s_q) AS BIGINT) AS score_q12,
       CAST(SUM(s_q) AS DOUBLE) / 1000000000000.0 AS bm25_score
FROM contrib GROUP BY doc_id
ORDER BY score_q12 DESC, doc_id
LIMIT 20
"""


_BM25_TOK_SPARK = (
    "SELECT doc_id, explode(split(trim(lower(text)), ' ')) AS token "
    "FROM documents"
)
_BM25_TOK_DUCK = (
    "SELECT doc_id, unnest(string_split(trim(lower(text)), ' ')) AS token "
    "FROM documents"
)

sql_query(
    "text_bm25_search",
    _bm25_sql(_BM25_TOK_SPARK),
    oracle=_bm25_sql(_BM25_TOK_DUCK),
    category="text",
    doc=(
        "BM25 top-20 retrieval for the query {join, vector, dup}: "
        "Lucene-shifted idf ln(1+(N-df+0.5)/(df+0.5)), k1=1.2 b=0.75 "
        "length normalization, idf and weight each micro-quantized "
        "and multiplied as exact BIGINTs; deterministic (score, "
        "doc_id) top-k. Posting-list shape: term filter before any "
        "join, map-side length reduce, broadcast-size stats."
    ),
    tables=("documents",),
)


# --------------------------------------------------------------------------
# PMI collocation mining over adjacent bigrams — phrase discovery for
# tokenizer vocab induction / stop-phrase lists. PMI compares the
# observed pair rate to the independence expectation using the bigram
# relation's own marginals (left/right sums of c12 — a clean 2-way
# contingency, no mixed denominators); ln is micro-quantized at the
# output boundary, counts stay BIGINT, cross-products go through
# DOUBLE before multiplying so no int64 overflow at corpus scale.
# min-count 5 prunes noise pairs BEFORE the expensive tail; top-50 by
# (pmi, w1, w2) is a total order.
# --------------------------------------------------------------------------

def _pmi_sql(tok0: str) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, pos, token FROM ({tok0}) WHERE token <> ''
),
bg0 AS (
  SELECT doc_id, token AS w1,
         LEAD(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM tok
),
bg AS (SELECT w1, w2 FROM bg0 WHERE w2 IS NOT NULL),
c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY w1, w2),
m1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
m2 AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2 FROM c12 GROUP BY w2),
nb AS (SELECT CAST(SUM(c12) AS BIGINT) AS n FROM c12)
SELECT c12.w1, c12.w2, c12.c12 AS n_pair,
       CAST(FLOOR(LN((CAST(nb.n AS DOUBLE) * c12.c12)
                     / (CAST(m1.c1 AS DOUBLE) * m2.c2)) * 1000000)
            AS BIGINT) AS pmi_q6
FROM c12
JOIN m1 ON m1.w1 = c12.w1
JOIN m2 ON m2.w2 = c12.w2
CROSS JOIN nb
WHERE c12.c12 >= 5
ORDER BY pmi_q6 DESC, c12.w1, c12.w2
LIMIT 50
"""


sql_query(
    "text_pmi_collocations",
    _pmi_sql(_XENT_TOK_SPARK),
    oracle=_pmi_sql(_XENT_TOK_DUCK),
    category="text",
    doc=(
        "Top-50 PMI collocations over adjacent bigrams (min count 5): "
        "ln(N*c12/(c1*c2)) against the bigram relation's own marginals, "
        "micro-quantized; phrase discovery for vocab induction. One "
        "posexplode + LEAD + three grouped counts, all map-side "
        "combined; total-order top-k."
    ),
    tables=("documents",),
)


# --------------------------------------------------------------------------
# Reciprocal-rank fusion of a lexical (BM25) and a semantic (cosine)
# retrieval run — the standard hybrid-search combiner (Cormack et al.,
# SIGIR 2009): score(d) = sum over runs of 1/(60 + rank_run(d)). Ranks
# are exact integers (each run's score order is engine-identical: the
# BM25 scores are exact quantized BIGINTs, the cosines identical IEEE
# sequential folds), 1/(60+rank) is micro-quantized to an exact BIGINT,
# so the fused ordering is hash-provable end to end.
#
# Scale shape: each run's global top-50 is an ORDER BY+LIMIT TakeOrdered
# (no global window over the corpus); only the bounded 50-row cuts are
# ranked, inside the declared-single-partition seam; fusion is a
# 50x50 full-outer join on doc_id. The corpus convention doc_id ==
# vec_id links the two modalities (documents.text <-> embeddings).
# --------------------------------------------------------------------------


def _hybrid_runs_sql(tok: str, dot, declared) -> str:
    """Shared WITH-prefix producing the two retrieval runs: ``lex``
    (BM25 top-50: doc_id, lex_rank) and ``sem`` (cosine top-50:
    doc_id, sem_rank). Consumed by both the RRF fusion and the nDCG
    evaluation tails — one proven ranking pipeline, two analyses."""
    return f"""
WITH tok AS ({tok}),
t AS (SELECT doc_id, token FROM tok WHERE token <> ''),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM t GROUP BY doc_id),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl
  FROM dl
),
tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
       FROM t WHERE token IN ('join', 'vector', 'dup')
       GROUP BY doc_id, token),
df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token),
contrib AS (
  SELECT tf.doc_id,
         CAST(FLOOR(LN(CAST(1.0 AS DOUBLE)
             + (CAST(s.n AS DOUBLE) - df.df + CAST(0.5 AS DOUBLE))
               / (CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
           * 1000000) AS BIGINT)
         *
         CAST(FLOOR(
           ((CAST(tf.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
              / (CAST(tf.tf AS DOUBLE) + CAST(0.3 AS DOUBLE)
                 + ((CAST(0.9 AS DOUBLE) * dl.dl) * s.n) / s.sumdl))
           * 1000000) AS BIGINT) AS s_q
  FROM tf
  JOIN df ON df.token = tf.token
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
bm AS (SELECT doc_id, CAST(SUM(s_q) AS BIGINT) AS score_q12
       FROM contrib GROUP BY doc_id),
lex0 AS (SELECT doc_id, score_q12 FROM bm
         ORDER BY score_q12 DESC, doc_id LIMIT 50),
lex AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY __g
              ORDER BY score_q12 DESC, doc_id) AS BIGINT) AS lex_rank
  FROM {declared("lex0")}
),
qv AS (
  SELECT embedding AS qemb,
         SQRT({dot("embedding", "embedding")}) AS qnrm
  FROM embeddings WHERE vec_id = 0
),
sem0 AS (
  SELECT e.vec_id AS doc_id,
         {dot("e.embedding", "qv.qemb")}
           / (SQRT({dot("e.embedding", "e.embedding")}) * qv.qnrm) AS cosine
  FROM embeddings e CROSS JOIN qv
  WHERE e.vec_id <> 0
),
sem1 AS (SELECT doc_id, cosine FROM sem0
         ORDER BY cosine DESC, doc_id LIMIT 50),
sem AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY __g
              ORDER BY cosine DESC, doc_id) AS BIGINT) AS sem_rank
  FROM {declared("sem1")}
)"""


def _rrf_sql(tok: str, dot, declared) -> str:
    q = "1000000000000.0"  # 1e12 micro-quant: FLOOR(1e12/(60+rank))
    return _hybrid_runs_sql(tok, dot, declared) + f""",
fused AS (
  SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
         COALESCE(l.lex_rank, CAST(0 AS BIGINT)) AS lex_rank,
         COALESCE(s.sem_rank, CAST(0 AS BIGINT)) AS sem_rank,
         COALESCE(CAST(FLOOR({q} / (60 + l.lex_rank)) AS BIGINT),
                  CAST(0 AS BIGINT))
       + COALESCE(CAST(FLOOR({q} / (60 + s.sem_rank)) AS BIGINT),
                  CAST(0 AS BIGINT)) AS rrf_q12
  FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
)
SELECT doc_id, lex_rank, sem_rank, rrf_q12,
       CAST(rrf_q12 AS DOUBLE) / {q} AS rrf_score
FROM fused
ORDER BY rrf_q12 DESC, doc_id
LIMIT 20
"""


def _rrf_spark() -> str:
    from aws_etl_spark.queries.similarity_queries import _spark_fold_dot
    from aws_etl_spark.queries.sql_seams import spark_declared

    return _rrf_sql(_BM25_TOK_SPARK, _spark_fold_dot, spark_declared)


def _rrf_duck() -> str:
    from aws_etl_spark.queries.similarity_queries import _duck_fold_dot
    from aws_etl_spark.queries.sql_seams import duck_declared

    return _rrf_sql(_BM25_TOK_DUCK, _duck_fold_dot, duck_declared)


sql_query(
    "search_rank_fusion",
    _rrf_spark(),
    oracle=_rrf_duck(),
    category="text",
    doc=(
        "Hybrid-retrieval reciprocal-rank fusion: BM25 top-50 (terms "
        "{join, vector, dup}) fused with cosine top-50 against vec_id "
        "0's embedding by RRF score sum(FLOOR(1e12/(60+rank))); rank 0 "
        "marks absence from a run. Both runs' global cuts are "
        "TakeOrdered LIMITs (no corpus-wide window); only the bounded "
        "50-row cuts are ranked inside the declared-single-partition "
        "seam; fusion is a 50x50 full-outer join."
    ),
    tables=("documents", "embeddings"),
)


# --------------------------------------------------------------------------
# Retrieval evaluation: nDCG@10 of the lexical (BM25) run scored
# against the semantic (exact-cosine) run as graded ground truth
# (rel = 11 - truth_rank for the truth top-10, else 0) — the metric
# that quantifies what rank fusion is worth before shipping it. DCG
# discount weights 1/log2(p+1) are the only transcendental inputs and
# positions are FIXED (p = 1..10), so the weights are inlined as ten
# integer literals computed once in Python — the pinned-literal trick
# (IVF centroids, LSH hyperplanes) applied to a math table. Everything
# else is exact integer algebra over the shared hybrid-runs prefix;
# one IEEE division (DCG/IDCG) at the boundary.
# --------------------------------------------------------------------------

def _ndcg_weights() -> tuple[int, ...]:
    import math

    return tuple(
        int(round(1e9 / math.log2(p + 1))) for p in range(1, 11)
    )


def _ndcg_sql(tok: str, dot, declared) -> str:
    wspine = " UNION ALL ".join(
        f"SELECT {p} AS p, CAST({w} AS BIGINT) AS w"
        for p, w in enumerate(_ndcg_weights(), start=1)
    )
    return _hybrid_runs_sql(tok, dot, declared) + f""",
wspine AS ({wspine}),
hits AS (
  SELECT s.lex_rank AS p, COALESCE(11 - t.sem_rank, 0) AS rel
  FROM (SELECT doc_id, lex_rank FROM lex WHERE lex_rank <= 10) s
  LEFT JOIN (SELECT doc_id, sem_rank FROM sem WHERE sem_rank <= 10) t
    ON t.doc_id = s.doc_id
),
dcg AS (
  SELECT CAST(SUM(w.w * h.rel) AS BIGINT) AS dcg_q,
         CAST(SUM(CASE WHEN h.rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_overlap
  FROM hits h JOIN wspine w ON w.p = h.p
),
idcg AS (
  SELECT CAST(SUM(w.w * (11 - w.p)) AS BIGINT) AS idcg_q FROM wspine w
)
SELECT dcg.dcg_q, idcg.idcg_q, dcg.n_overlap,
       CAST(dcg.dcg_q AS DOUBLE) / idcg.idcg_q AS ndcg_at_10
FROM dcg CROSS JOIN idcg
"""


def _ndcg_spark() -> str:
    from aws_etl_spark.queries.similarity_queries import _spark_fold_dot
    from aws_etl_spark.queries.sql_seams import spark_declared

    return _ndcg_sql(_BM25_TOK_SPARK, _spark_fold_dot, spark_declared)


def _ndcg_duck() -> str:
    from aws_etl_spark.queries.similarity_queries import _duck_fold_dot
    from aws_etl_spark.queries.sql_seams import duck_declared

    return _ndcg_sql(_BM25_TOK_DUCK, _duck_fold_dot, duck_declared)


sql_query(
    "search_eval_ndcg",
    _ndcg_spark(),
    oracle=_ndcg_duck(),
    category="text",
    doc=(
        "Retrieval evaluation: nDCG@10 of the BM25 lexical run against "
        "the exact-cosine semantic top-10 as graded relevance "
        "(rel = 11 - truth rank). DCG discounts are ten pinned integer "
        "literals (positions are fixed, so 1/log2(p+1) is a math "
        "table, not a runtime transcendental); DCG/IDCG stay exact "
        "BIGINTs with one boundary division. Reuses the hybrid-runs "
        "prefix shared with search_rank_fusion."
    ),
    tables=("documents", "embeddings"),
)


# --------------------------------------------------------------------------
# Tokenizer vocabulary-coverage audit (OOV rate). A tokenizer trained
# on one distribution under-covers another; before training, the audit
# is: fix the vocabulary = top-V corpus words (frequency desc, word
# asc tiebreak — deterministic), then measure per-source token and
# TYPE coverage outside it. Plan: one token explode (map-side flatMap)
# -> word-frequency agg (map-side combined, vocabulary-bounded) ->
# top-V LIMIT (tiny, broadcast back) -> per-source left join + agg.
# At 100 TB the vocab agg output is corpus-vocabulary-sized (millions,
# not trillions) and the top-V result broadcasts — no large shuffle
# beyond the two grouped aggs. Rates are exact-int divisions.
# --------------------------------------------------------------------------

def _oov_sql(tok: str) -> str:
    # symmetric single-space split + empty filter on BOTH engines (the
    # _BM25_TOK convention): a regex-vs-literal split pair would break
    # hash parity on any doc with consecutive whitespace
    return f"""
WITH tok AS (
  SELECT source, w FROM (SELECT source, {tok} AS w FROM documents)
  WHERE w <> ''
),
freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY w),
vocab AS (SELECT w FROM freq ORDER BY f DESC, w LIMIT 20),
per_src AS (
  SELECT tok.source,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov,
         CAST(COUNT(DISTINCT CASE WHEN v.w IS NULL THEN tok.w END)
              AS BIGINT) AS n_oov_types
  FROM tok LEFT JOIN vocab v ON v.w = tok.w
  GROUP BY tok.source
)
SELECT source, n_tokens, n_oov, n_oov_types,
       CAST(n_oov AS DOUBLE) / n_tokens AS oov_rate
FROM per_src
"""


sql_query(
    "text_oov_rate",
    _oov_sql("explode(split(trim(text), ' '))"),
    oracle=_oov_sql("unnest(string_split(trim(text), ' '))"),
    category="text",
    doc=(
        "Tokenizer vocabulary-coverage audit: vocabulary = top-20 "
        "corpus words (freq desc, word asc tiebreak), then per-source "
        "token count, out-of-vocabulary token count, distinct OOV "
        "types, and OOV rate. The pre-training check that a fixed "
        "vocabulary covers every source; token explode + two bounded "
        "aggs + a broadcast top-V join."
    ),
    tables=("documents",),
)


# --------------------------------------------------------------------------
# Readability scoring (Flesch reading ease, vowel-group syllable
# heuristic). The classic pre-training quality gate the corpus's
# C4/Gopher/surprisal/cross-entropy family still lacked: score =
# 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words). All
# three counts are exact integers (split length + two regexp match
# counts), so the score is the single IEEE division of two exact
# BIGINT polynomials:
#   num = 206835*S*W - 1015*W^2 - 84600*Y*S,  den = 1000*S*W
# and the band thresholds compare num against k*den in exact integer
# space — no float ever enters a comparison. Per-row map, no shuffle;
# linear at any scale and trivially partition-parallel.
# --------------------------------------------------------------------------

def _readability_sql(nwords: str, ngroups) -> str:
    return f"""
WITH m AS (
  SELECT doc_id,
         CAST(GREATEST({nwords}, 1) AS BIGINT) AS n_words,
         CAST(GREATEST({ngroups("text", "[.!?]+")}, 1) AS BIGINT)
           AS n_sentences,
         CAST(GREATEST({ngroups("lower(text)", "[aeiouy]+")}, 1) AS BIGINT)
           AS n_syllables
  FROM documents
),
f AS (
  SELECT doc_id, n_words, n_sentences, n_syllables,
         206835 * n_sentences * n_words
           - 1015 * n_words * n_words
           - 84600 * n_syllables * n_sentences AS num,
         1000 * n_sentences * n_words AS den
  FROM m
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CAST(num AS DOUBLE) / den AS flesch,
       CASE WHEN num >= 70 * den THEN 'easy'
            WHEN num >= 50 * den THEN 'standard'
            WHEN num >= 30 * den THEN 'difficult'
            ELSE 'very_difficult' END AS readability_band
FROM f
"""


sql_query(
    "text_readability_score",
    _readability_sql(
        "size(split(trim(text), ' '))",
        lambda col, pat: f"regexp_count({col}, '{pat}')",
    ),
    oracle=_readability_sql(
        "LEN(STRING_SPLIT(TRIM(text), ' '))",
        lambda col, pat: f"LEN(REGEXP_EXTRACT_ALL({col}, '{pat}'))",
    ),
    category="text",
    doc=(
        "Flesch reading-ease per document with the vowel-group "
        "syllable heuristic: words = space-split length, sentences = "
        "[.!?]+ group count, syllables = [aeiouy]+ group count (all "
        "GREATEST(...,1)-guarded exact integers). The score is one "
        "IEEE division of exact BIGINT polynomials and the difficulty "
        "band is decided by integer comparisons (num vs k*den) — no "
        "float comparison anywhere. Pure per-row map; no shuffle."
    ),
    tables=("documents",),
)


# --------------------------------------------------------------------------
# Zipf law fit over the corpus word-frequency distribution: the
# rank-frequency diagnostic (alongside the existing Heaps-law fit)
# that tells a data team whether a source's token distribution is
# natural-language-shaped or degenerate (boilerplate / spam collapse
# the slope toward 0; natural text sits near -1). Least squares of
# ln f on ln r over the top-100 ranks. ln values are micro-quantized
# BIGINTs (the corpus's proven FLOOR(LN(x)*1e6) idiom), so all five
# regression sums are exact integers; the normal-equation arithmetic
# then runs in double where both engines perform the identical IEEE
# op sequence on identical inputs. Plan: token explode -> map-side-
# combined word count -> top-100 TakeOrdered cut -> 100-row bounded
# window inside the declared-single-partition seam -> one scalar agg.
# At 100 TB the only wide stage is the vocabulary-sized word count.
# --------------------------------------------------------------------------

def _zipf_sql(tok: str, declared) -> str:
    return f"""
WITH tok AS (
  SELECT w FROM (SELECT {tok} AS w FROM documents) WHERE w <> ''
),
freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY w),
topk AS (SELECT w, f FROM freq ORDER BY f DESC, w LIMIT 100),
ranked AS (
  SELECT f,
         ROW_NUMBER() OVER (PARTITION BY __g ORDER BY f DESC, w) AS r
  FROM {declared("topk")}
),
q AS (
  SELECT CAST(FLOOR(LN(CAST(r AS DOUBLE)) * 1000000) AS BIGINT) AS xq,
         CAST(FLOOR(LN(CAST(f AS DOUBLE)) * 1000000) AS BIGINT) AS yq
  FROM ranked
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xq) AS BIGINT) AS sx,
         CAST(SUM(yq) AS BIGINT) AS sy,
         CAST(SUM(xq * yq) AS BIGINT) AS sxy,
         CAST(SUM(xq * xq) AS BIGINT) AS sxx
  FROM q
),
fit AS (
  SELECT n, sx, sy,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
  FROM s
)
SELECT n AS n_ranks,
       slope AS zipf_slope,
       (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
         / CAST(n AS DOUBLE) / CAST(1000000 AS DOUBLE) AS zipf_intercept_ln
FROM fit
"""


def _zipf_spark() -> str:
    from aws_etl_spark.queries.sql_seams import spark_declared

    return _zipf_sql("explode(split(trim(lower(text)), ' '))", spark_declared)


def _zipf_duck() -> str:
    from aws_etl_spark.queries.sql_seams import duck_declared

    return _zipf_sql(
        "unnest(string_split(trim(lower(text)), ' '))", duck_declared
    )


sql_query(
    "text_zipf_fit",
    _zipf_spark(),
    oracle=_zipf_duck(),
    category="text",
    doc=(
        "Zipf rank-frequency fit: least squares of ln(frequency) on "
        "ln(rank) over the top-100 corpus words (freq desc, word asc "
        "tiebreak). ln terms are micro-quantized BIGINTs so the five "
        "regression sums are exact; slope/intercept are a fixed IEEE "
        "expression over those exact sums. Natural text fits near "
        "slope -1; boilerplate collapses toward 0. One vocabulary "
        "agg + a broadcastable top-100 cut — the bounded ranking runs "
        "inside the declared-single-partition seam."
    ),
    tables=("documents",),
)


# --------------------------------------------------------------------------
# Tokenizer fertility / bytes-per-token by language (round 9) — the
# compression-ratio audit that closes the tokenizer set (BPE
# train/encode, OOV rate, Zipf, Heaps): fix the vocabulary = top-V
# corpus words (the text_oov_rate convention; V=16 keeps roughly half
# the synthetic corpus's 31 word types out-of-vocab — the degeneracy
# audit: V=50 made fertility identically 1.0), price each word at 1
# token if in-vocab else LENGTH(word) byte-fallback tokens (the
# BPE-miss cost model), then per LANGUAGE report subword fertility
# (tokens per word) and bytes per token. A tokenizer trained on one
# language mix under-covers the others — this is the audit that shows
# it, per language, before a single GPU-hour is spent.
#
# Scale shape: one token explode -> vocabulary-bounded word-freq agg
# (map-side combined) -> top-V LIMIT broadcast back -> one per-lang
# agg (≤ n_languages rows). All counts exact BIGINTs; the only IEEE
# ops are the two boundary divisions per output row.
# --------------------------------------------------------------------------

def _fertility_sql(tok: str, bytelen: str) -> str:
    return f"""
WITH tok AS (
  SELECT lang, w FROM (SELECT lang, {tok} AS w FROM documents)
  WHERE w <> ''
),
freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY w),
vocab AS (SELECT w FROM freq ORDER BY f DESC, w LIMIT 16),
cost AS (
  SELECT tok.lang,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(CASE WHEN v.w IS NULL THEN LENGTH(tok.w) ELSE 1 END)
              AS BIGINT) AS n_subword_tokens
  FROM tok LEFT JOIN vocab v ON v.w = tok.w
  GROUP BY tok.lang
),
sizes AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM({bytelen}) AS BIGINT) AS n_bytes
  FROM documents GROUP BY lang
)
SELECT s.lang, s.n_docs, s.n_bytes, c.n_words, c.n_subword_tokens,
       CAST(c.n_subword_tokens AS DOUBLE) / c.n_words AS fertility,
       CAST(s.n_bytes AS DOUBLE) / c.n_subword_tokens AS bytes_per_token
FROM sizes s JOIN cost c ON c.lang = s.lang
"""


sql_query(
    "text_tokenizer_fertility",
    _fertility_sql("explode(split(trim(text), ' '))", "octet_length(text)"),
    oracle=_fertility_sql(
        "unnest(string_split(trim(text), ' '))", "strlen(text)"
    ),
    category="text",
    doc=(
        "Tokenizer fertility audit by language: vocabulary = top-16 "
        "corpus words (freq desc, word asc tiebreak); each word costs "
        "1 token in-vocab else LENGTH(word) byte-fallback tokens; per "
        "language, subword fertility (tokens/word) and bytes/token. "
        "Exact BIGINT counts, two boundary divisions per row."
    ),
    tables=("documents",),
)


# --------------------------------------------------------------------------
# Paragraph-level duplication fraction (round 9) — the Gopher
# repetition signal at the granularity between span dedup
# (dedup/spans.py k-gram census) and whole-document dedup: split on
# blank lines, hash paragraphs corpus-wide, report per document the
# fraction of its paragraphs (and of its characters) that belong to a
# paragraph seen more than once ANYWHERE in the corpus.
#
# The synthetic corpus has no newlines, so every document is one
# paragraph and the query degrades to exact doc-level duplication
# (still a non-trivial hash: the corpus contains exact-dup docs); the
# multi-paragraph branches are pinned by a crafted-parquet edge
# differential in tests/test_round9_edges.py (the r8 pattern).
#
# Scale shape: paragraph explode (map-side flatMap), one md5-freq agg
# (map-side combined, paragraph-vocabulary-bounded), one join back on
# the hash, one per-doc agg. Counts exact; two boundary divisions.
# --------------------------------------------------------------------------

def _paragraph_dup_sql(split: str) -> str:
    return f"""
WITH p0 AS (
  SELECT doc_id, TRIM(x) AS para
  FROM (SELECT doc_id, {split} AS x FROM documents)
),
h AS (
  SELECT doc_id, MD5(para) AS ph, CAST(LENGTH(para) AS BIGINT) AS plen
  FROM p0 WHERE para <> ''
),
freq AS (SELECT ph, CAST(COUNT(*) AS BIGINT) AS f FROM h GROUP BY ph)
SELECT h.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_paragraphs,
       CAST(SUM(CASE WHEN freq.f > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_paragraphs,
       CAST(SUM(h.plen) AS BIGINT) AS n_chars,
       CAST(SUM(CASE WHEN freq.f > 1 THEN h.plen ELSE 0 END) AS BIGINT)
         AS n_dup_chars,
       CAST(SUM(CASE WHEN freq.f > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS dup_para_frac,
       CAST(SUM(CASE WHEN freq.f > 1 THEN h.plen ELSE 0 END) AS DOUBLE)
         / SUM(h.plen) AS dup_char_frac
FROM h JOIN freq ON freq.ph = h.ph
GROUP BY h.doc_id
"""


sql_query(
    "text_paragraph_dup",
    _paragraph_dup_sql("explode(split(text, '\\n\\n'))"),
    oracle=_paragraph_dup_sql(
        "unnest(string_split(text, chr(10) || chr(10)))"
    ),
    category="text",
    doc=(
        "Gopher-style duplicate-paragraph fraction: split documents "
        "on blank lines, md5 each trimmed non-empty paragraph, count "
        "corpus-wide occurrences, and report per document the "
        "paragraph- and character-weighted fractions that are "
        "duplicated anywhere in the corpus."
    ),
    tables=("documents",),
)


# --------------------------------------------------------------------------
# Vocabulary coverage curve (round 9): what fraction of all token
# OCCURRENCES the top-K word types cover, for a spine of K values —
# the sizing curve a tokenizer budget decision reads (Zipf gives the
# fit, Heaps the growth; this gives the cumulative payoff per vocab
# slot). One explode + vocabulary-bounded freq agg; the ranking
# window runs over the top-64 cut only (declared single-partition
# seam, same discipline as text_zipf_fit's top-100) while totals come
# from the full freq table via cheap scalar aggregates. Exact BIGINT
# counts; one boundary division per spine row.
# --------------------------------------------------------------------------


def _vocab_cov_sql(tok: str, ks_clause: str, declared) -> str:
    return f"""
WITH tok AS (
  SELECT w FROM (SELECT {tok} AS w FROM documents) WHERE w <> ''
),
freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY w),
tot AS (
  SELECT CAST(SUM(f) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_types
  FROM freq
),
top AS (SELECT w, f FROM freq ORDER BY f DESC, w LIMIT 64),
cum AS (
  SELECT ROW_NUMBER() OVER (PARTITION BY __g ORDER BY f DESC, w) AS rk,
         CAST(SUM(f) OVER (PARTITION BY __g ORDER BY f DESC, w
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cf
  FROM {declared("top")}
),
ks AS (SELECT CAST(kk.k AS BIGINT) AS k FROM ({ks_clause}) kk)
SELECT ks.k, tot.n_types, tot.n_tokens,
       c.cf AS covered_tokens,
       CAST(c.cf AS DOUBLE) / tot.n_tokens AS coverage
FROM ks CROSS JOIN tot
JOIN cum c ON c.rk = LEAST(ks.k, tot.n_types)
"""


def _vocab_cov_spark() -> str:
    from aws_etl_spark.queries.sql_seams import spark_declared

    return _vocab_cov_sql(
        "explode(split(trim(text), ' '))",
        "SELECT explode(array(4, 8, 16, 24)) AS k",
        spark_declared,
    )


def _vocab_cov_duck() -> str:
    from aws_etl_spark.queries.sql_seams import duck_declared

    return _vocab_cov_sql(
        "unnest(string_split(trim(text), ' '))",
        "SELECT unnest([4, 8, 16, 24]) AS k",
        duck_declared,
    )


sql_query(
    "text_vocab_coverage",
    _vocab_cov_spark(),
    oracle=_vocab_cov_duck(),
    category="text",
    doc=(
        "Vocabulary coverage curve: fraction of token occurrences "
        "covered by the top-K word types for K in (4, 8, 16, 24) — "
        "rank by (freq desc, word), exact cumulative BIGINT prefix "
        "sums over the top-64 cut, one boundary division per row."
    ),
    tables=("documents",),
)


# --------------------------------------------------------------------------
# Language-ID confusion audit (round 9, queued for the r10 window):
# per-class precision/recall/F1 of the stopword-overlap langid
# heuristic against the stored labels — the eval row on top of
# text_lang_id (which emits predictions; this grades them). One scan
# feeds a ≤(langs+1)² confusion matrix (localCheckpoint'ed so the two
# marginal aggregates cannot re-expand into two corpus scans — the
# ml_negative_sampling lesson); every downstream stage runs on ≤36
# rows. Counts exact BIGINTs; precision/recall one IEEE division
# each; F1 a guarded fixed-shape IEEE expression.
# --------------------------------------------------------------------------

_LANG_CONF_ORACLE = """
WITH t AS (
  SELECT lang AS lang_actual,
         LIST_DISTINCT(STRING_SPLIT(TRIM(LOWER(text)), ' ')) AS w
  FROM documents
),
s AS (
  SELECT lang_actual,
    LEN(LIST_INTERSECT(w, ['the','and','of','to','a','in','is','it','that','for'])) AS s_en,
    LEN(LIST_INTERSECT(w, ['el','la','de','que','y','en','un','por','con','una'])) AS s_es,
    LEN(LIST_INTERSECT(w, ['le','la','de','et','un','une','du','des','est','dans'])) AS s_fr,
    LEN(LIST_INTERSECT(w, ['der','die','das','und','ist','von','ein','eine','mit','zu'])) AS s_de
  FROM t
),
pred AS (
  SELECT lang_actual,
       CASE WHEN GREATEST(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
            WHEN s_de = GREATEST(s_en, s_es, s_fr, s_de) THEN 'de'
            WHEN s_en = GREATEST(s_en, s_es, s_fr, s_de) THEN 'en'
            WHEN s_es = GREATEST(s_en, s_es, s_fr, s_de) THEN 'es'
            ELSE 'fr' END AS lang_pred
  FROM s
),
cm AS (
  SELECT lang_actual, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
  FROM pred GROUP BY lang_actual, lang_pred
),
a AS (
  SELECT lang_actual AS lang,
         CAST(SUM(n) AS BIGINT) AS n_actual,
         CAST(SUM(CASE WHEN lang_pred = lang_actual THEN n ELSE 0 END)
              AS BIGINT) AS tp
  FROM cm GROUP BY lang_actual
),
p AS (
  SELECT lang_pred AS lang, CAST(SUM(n) AS BIGINT) AS n_pred
  FROM cm GROUP BY lang_pred
),
m AS (
  SELECT COALESCE(a.lang, p.lang) AS lang,
         COALESCE(a.tp, 0) AS tp,
         COALESCE(a.n_actual, 0) AS n_actual,
         COALESCE(p.n_pred, 0) AS n_pred
  FROM a FULL OUTER JOIN p ON p.lang = a.lang
),
f AS (
  SELECT lang, tp, n_actual, n_pred,
         CASE WHEN n_pred = 0 THEN CAST(0 AS DOUBLE)
              ELSE CAST(tp AS DOUBLE) / n_pred END AS precision,
         CASE WHEN n_actual = 0 THEN CAST(0 AS DOUBLE)
              ELSE CAST(tp AS DOUBLE) / n_actual END AS recall
  FROM m
)
SELECT lang, tp, n_actual, n_pred, precision, recall,
       CASE WHEN precision + recall = CAST(0 AS DOUBLE)
            THEN CAST(0 AS DOUBLE)
            ELSE 2 * precision * recall / (precision + recall)
       END AS f1
FROM f
"""


@register(
    "text_lang_confusion",
    oracle=_LANG_CONF_ORACLE,
    category="text",
    tables=("documents",),
)
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 of the langid heuristic vs the
    stored labels, via one checkpointed bounded confusion matrix.

    Round-14: the scan is widened before the lang_id projection —
    the stopword-overlap scoring is an interpreted higher-order
    expression that ran serially on the single-row-group local scan
    (profiler: one task, all of the query's compute), and the
    aggregate after it is ≤(langs+1)² rows, so the §6 'widen only
    pure map-dominant stages' rule applies (within-process A/B
    min-of-5: 0.90 → 0.78 s; no-op at production scan widths)."""
    from aws_etl_spark.ops.widen import widen_if_narrow

    docs = widen_if_narrow(load_table(spark, sf_dir, "documents"))
    cm = (
        docs.select(
            F.col("lang").alias("lang_actual"),
            lang_id(F.col("text")).alias("lang_pred"),
        )
        .groupBy("lang_actual", "lang_pred")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    a = cm.groupBy(F.col("lang_actual").alias("lang")).agg(
        F.sum("n").cast("bigint").alias("n_actual"),
        F.sum(
            F.when(F.col("lang_pred") == F.col("lang_actual"), F.col("n"))
            .otherwise(F.lit(0))
        ).cast("bigint").alias("tp"),
    )
    p = cm.groupBy(F.col("lang_pred").alias("lang")).agg(
        F.sum("n").cast("bigint").alias("n_pred")
    )
    m = (
        a.join(p, "lang", "full_outer")
        .select(
            "lang",
            F.coalesce(F.col("tp"), F.lit(0)).alias("tp"),
            F.coalesce(F.col("n_actual"), F.lit(0)).alias("n_actual"),
            F.coalesce(F.col("n_pred"), F.lit(0)).alias("n_pred"),
        )
        .withColumn(
            "precision",
            F.when(F.col("n_pred") == 0, F.lit(0.0)).otherwise(
                F.col("tp").cast("double") / F.col("n_pred")
            ),
        )
        .withColumn(
            "recall",
            F.when(F.col("n_actual") == 0, F.lit(0.0)).otherwise(
                F.col("tp").cast("double") / F.col("n_actual")
            ),
        )
    )
    return m.withColumn(
        "f1",
        F.when(F.col("precision") + F.col("recall") == 0.0, F.lit(0.0))
        .otherwise(
            2 * F.col("precision") * F.col("recall")
            / (F.col("precision") + F.col("recall"))
        ),
    )


# --------------------------------------------------------------------------
# Per-source Jensen-Shannon divergence from the corpus unigram
# distribution (round 10, queued for the r11 window): "which source's
# language is most atypical" — the drift monitor a mixture owner
# checks before re-weighting (KL is undefined on unseen words; JSD is
# bounded [0, ln2] and symmetric). Per (source, word): p = c_sw/n_s,
# q = c_w/n, m = (p+q)/2; the vocabulary-absent tail is folded in
# CLOSED FORM — sum over words absent from source s of q·ln(q/m) is
# ln2 · (1 − Q_s) with Q_s = (Σ_{w∈s} c_w)/n kept an exact rational
# (BIGINT over BIGINT) — so the join stays on PRESENT (source, word)
# pairs only, never the vocab × sources expansion. Present-pair
# contributions are fixed IEEE chains over exact integers,
# nano-quantized (floor ×1e9) before the order-free integer sum (the
# lnratio idiom; error < |vocab|·1e-9, far under any re-weighting
# threshold). One staged token-count scan; everything after is
# vocab-sized.
# --------------------------------------------------------------------------

_JSD_TOK = """
SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c_sw
FROM (
  SELECT source, UNNEST(STRING_SPLIT(TRIM(LOWER(text)), ' ')) AS w
  FROM documents
) t
WHERE w <> ''
GROUP BY source, w
"""

_JSD_TOK_SPARK = """
SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c_sw
FROM (
  SELECT source, EXPLODE(SPLIT(TRIM(LOWER(text)), ' ')) AS w
  FROM documents
) t
WHERE w <> ''
GROUP BY source, w
"""


def _jsd_tail(tok: str, n_expr: str) -> str:
    # p = c_sw/n_s, q = c_w/N, m = (p+q)/2 — each a fixed-shape IEEE
    # chain over exact BIGINTs, identical on both engines
    p = "(CAST(t.c_sw AS DOUBLE) / CAST(s.n_s AS DOUBLE))"
    q = f"(CAST(g.c_w AS DOUBLE) / CAST({n_expr} AS DOUBLE))"
    contrib = (
        f"{p} * LN({p} / (({p} + {q}) / CAST(2 AS DOUBLE)))"
        f" + {q} * LN({q} / (({p} + {q}) / CAST(2 AS DOUBLE)))"
    )
    return f"""
WITH g AS (
  SELECT w, CAST(SUM(c_sw) AS BIGINT) AS c_w FROM {tok} GROUP BY w
),
s AS (
  SELECT source, CAST(SUM(c_sw) AS BIGINT) AS n_s,
         CAST(COUNT(*) AS BIGINT) AS vocab_s
  FROM {tok} GROUP BY source
),
c AS (
  SELECT t.source,
         CAST(SUM(CAST(FLOOR(({contrib}) * 1000000000) AS BIGINT))
              AS BIGINT) AS qsum,
         CAST(SUM(g.c_w) AS BIGINT) AS cw_mass
  FROM {tok} t
  JOIN g ON g.w = t.w
  JOIN s ON s.source = t.source
  GROUP BY t.source
)
SELECT s.source, s.n_s, s.vocab_s,
       (CAST(c.qsum AS DOUBLE) / CAST(1000000000 AS DOUBLE)
        + LN(CAST(2 AS DOUBLE))
          * (CAST(1 AS DOUBLE)
             - CAST(c.cw_mass AS DOUBLE) / CAST({n_expr} AS DOUBLE)))
       / CAST(2 AS DOUBLE) AS jsd
FROM s JOIN c ON c.source = s.source
"""


def _register_jsd() -> None:
    duck_tail = _jsd_tail("tok", "(SELECT SUM(c_sw) FROM tok)")
    assert duck_tail.startswith("\nWITH ")
    staged_sql_query(
        "text_jsd_by_source",
        ops=(
            ("view", "jsd_tok", _JSD_TOK_SPARK),
            (
                "scalar",
                "JSDN",
                "SELECT CAST(SUM(c_sw) AS BIGINT) FROM jsd_tok",
            ),
        ),
        final=_jsd_tail("jsd_tok", "{JSDN}"),
        oracle=f"WITH tok AS ({_JSD_TOK}),\n" + duck_tail[len("\nWITH ") :],
        category="text",
        doc=(
            "Per-source Jensen-Shannon divergence from the corpus "
            "unigram distribution: present-pair p/q/m contributions "
            "as fixed IEEE chains over exact token counts, nano-"
            "quantized before the order-free sum, and the absent-"
            "vocabulary tail folded in closed form (ln2 * (1 - Q_s) "
            "with Q_s an exact rational) so the plan never expands "
            "vocab x sources. One staged token-count scan."
        ),
        tables=("documents",),
    )


_register_jsd()


# --------------------------------------------------------------------------
# RAKE keyword extraction (round 11 late batch, queued for the r12
# window): TextRank above scores single words by co-occurrence
# centrality; RAKE (Rose et al.) is the other classic unsupervised
# extractor — it scores PHRASES: split each document on stopwords
# into candidate phrases, score each word by degree/frequency over
# phrase memberships, and score a phrase by the sum of its word
# scores. Canonical scoring (Rose et al., r11 ADVICE 3): word
# freq/degree run over ALL candidate phrases; the 4-word cap applies
# only to the phrase READOUT, so words appearing mostly in long
# phrases keep their full degree (rake-nltk-compatible semantics).
# Exact integer machinery: phrase ids come from one running
# stopword-count window over the staged token view, word scores are
# micro-quantized by pure integer division ((degree*1e6) DIV freq —
# no float ever), phrase scores are order-free integer sums, and the
# top-20 readout tiebreaks (score DESC, phrase ASC) for a
# deterministic LIMIT. The phrase string itself is the SQL-standard
# ordered aggregation (LISTAGG WITHIN GROUP / STRING_AGG ORDER BY) —
# deterministic under parallel aggregation. The en stopword list is
# the module's shared STOPWORDS (embedded verbatim in both texts).
# Scale: one staged documents scan; the window partitions by doc;
# word stats and phrase sums are hash aggs on bounded keys.
# --------------------------------------------------------------------------


def _rake_tail(tok: str, listagg, intdiv) -> str:
    phrase_agg = listagg("m.w", "' '", "m.pos")
    score = intdiv("ws.degree * 1000000", "ws.freq")
    return f"""
WITH g AS (
  SELECT doc_id, pos, w, stop,
         SUM(stop) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS grp
  FROM {tok}
),
memb AS (SELECT doc_id, grp, pos, w FROM g WHERE stop = 0),
p0 AS (
  SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS plen
  FROM memb GROUP BY doc_id, grp
),
-- the 4-word cap applies ONLY to the phrase READOUT (canonical RAKE,
-- Rose et al.: word stats run over ALL candidate phrases; the cap
-- exists so a low-stopword document does not surface as ONE giant
-- "keyword" — it must not understate the degree of words that also
-- appear in long phrases)
ph AS (SELECT doc_id, grp, plen FROM p0 WHERE plen <= 4),
ws AS (
  -- word freq/degree over ALL candidate phrases (p0, uncapped)
  SELECT m.w, CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(p.plen) AS BIGINT) AS degree
  FROM memb m JOIN p0 p ON p.doc_id = m.doc_id AND p.grp = m.grp
  GROUP BY m.w
),
wsq AS (SELECT w, CAST({score} AS BIGINT) AS score_q FROM ws),
inst AS (
  -- only capped candidates in the readout; every word of a kept
  -- phrase is present in wsq by construction (wsq covers ALL
  -- candidate words), so the inner join cannot drop members
  SELECT m.doc_id, m.grp,
         {phrase_agg} AS phrase,
         CAST(SUM(s.score_q) AS BIGINT) AS inst_score_q,
         CAST(COUNT(*) AS BIGINT) AS n_words
  FROM memb m
  JOIN ph p ON p.doc_id = m.doc_id AND p.grp = m.grp
  JOIN wsq s ON s.w = m.w
  GROUP BY m.doc_id, m.grp
)
SELECT phrase,
       CAST(MAX(n_words) AS BIGINT) AS n_words,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(MAX(inst_score_q) AS DOUBLE) / CAST(1000000 AS DOUBLE)
         AS rake_score
FROM inst
GROUP BY phrase
ORDER BY MAX(inst_score_q) DESC, phrase
LIMIT 20
"""


def _register_rake() -> None:
    from aws_etl_spark.text import STOPWORDS

    sw = ", ".join(f"'{s}'" for s in STOPWORDS["en"])
    spark_tok = f"""
SELECT doc_id, pos + 1 AS pos, col AS w,
       CASE WHEN col IN ({sw}) THEN 1 ELSE 0 END AS stop
FROM (SELECT doc_id, posexplode(split(trim(lower(text)), ' '))
      FROM documents)
WHERE col <> ''
"""
    duck_tok = f"""
SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS w,
       CASE WHEN unnest(ws) IN ({sw}) THEN 1 ELSE 0 END AS stop
FROM (SELECT doc_id, STRING_SPLIT(TRIM(LOWER(text)), ' ') AS ws
      FROM documents)
"""
    duck_tail = _rake_tail(
        "tok",
        lambda col, sep, order: f"STRING_AGG({col}, {sep} ORDER BY {order})",
        lambda a, b: f"({a}) // ({b})",
    )
    assert duck_tail.startswith("\nWITH ")
    staged_sql_query(
        "text_rake_keywords",
        ops=(("view", "rake_tok", spark_tok),),
        final=_rake_tail(
            "rake_tok",
            lambda col, sep, order: (
                f"LISTAGG({col}, {sep}) WITHIN GROUP (ORDER BY {order})"
            ),
            lambda a, b: f"({a}) DIV ({b})",
        ),
        oracle=(
            f"WITH tok AS (SELECT doc_id, pos, w, stop FROM ({duck_tok}) t"
            f" WHERE w <> ''),\n" + duck_tail[len("\nWITH ") :]
        ),
        category="text",
        doc=(
            "RAKE keyword phrases over the corpus: stopword-delimited "
            "candidate phrases from one running-count window on the "
            "staged token view, word scores degree/freq over ALL "
            "candidate phrases as pure "
            "integer division (micro-quantized, canonical Rose et "
            "al. scoring — the 4-word cap applies only to the phrase "
            "readout), phrase scores as "
            "order-free integer sums, ordered LISTAGG/STRING_AGG "
            "phrase assembly, deterministic top-20 (score DESC, "
            "phrase ASC)."
        ),
        tables=("documents",),
    )


_register_rake()


# --------------------------------------------------------------------------
# MSTTR-50 lexical diversity (round 12, queued for the r13 window):
# raw type-token ratio collapses as corpora grow (Heaps' law — the
# text_heaps_law query measures exactly that), so corpus dashboards
# report the Mean Segmental TTR: split each document into consecutive
# 50-token segments, take each FULL segment's type/token ratio, and
# average over segments — length-invariant, so it compares sources
# and snapshots fairly. Fully exact: tokens come from the RAKE
# tokenization (lower/trim/split, empty tokens filtered), segment id
# is pure integer division of the token position, only exactly-50-
# token segments survive (the standard MSTTR truncation — a partial
# tail segment would bias TTR upward), the per-segment distinct count
# is an integer, and msttr = sum(distinct)/(50 * n_segments) is ONE
# IEEE division of exact BIGINTs — no quantization anywhere. The
# global TTR rides along for the Heaps-collapse contrast. Scale: one
# token explode (linear in corpus tokens), one (doc, segment) hash
# agg, one constant-width rollup; no windows, no pairing.
# --------------------------------------------------------------------------

_MSTTR_SEG = 50


def _msttr_tail(tok: str, intdiv) -> str:
    seg = intdiv("(pos - 1)", str(_MSTTR_SEG))
    return f"""
WITH segs AS (
  SELECT doc_id, {seg} AS seg,
         CAST(COUNT(*) AS BIGINT) AS n_tok,
         CAST(COUNT(DISTINCT w) AS BIGINT) AS n_types
  FROM {tok}
  GROUP BY doc_id, {seg}
),
full_segs AS (
  SELECT doc_id, n_types FROM segs WHERE n_tok = {_MSTTR_SEG}
),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT w) AS BIGINT) AS n_types
  FROM {tok}
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_segments,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_covered,
         CAST(COALESCE(SUM(n_types), 0) AS BIGINT) AS types_sum
  FROM full_segs
)
SELECT s.n_segments, s.n_docs_covered, g.n_tokens,
       CASE WHEN g.n_tokens = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(g.n_types AS DOUBLE) / CAST(g.n_tokens AS DOUBLE)
       END AS global_ttr,
       CASE WHEN s.n_segments = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(s.types_sum AS DOUBLE)
                 / (CAST({_MSTTR_SEG} AS DOUBLE)
                    * CAST(s.n_segments AS DOUBLE))
       END AS msttr_{_MSTTR_SEG}
FROM s CROSS JOIN g
"""


def _register_msttr() -> None:
    # Both engines must number the FILTERED token sequence: DuckDB
    # filters the list before generate_subscripts; Spark re-numbers
    # with the doc-partitioned ROW_NUMBER in _MSTTR_SPARK_TOK.
    duck_tok = """
SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS w
FROM (SELECT doc_id,
             LIST_FILTER(STRING_SPLIT(TRIM(LOWER(text)), ' '),
                         x -> x <> '') AS ws
      FROM documents)
"""
    duck_tail = _msttr_tail("tok", lambda a, b: f"({a}) // ({b})")
    assert duck_tail.startswith("\nWITH ")
    staged_sql_query(
        "text_msttr",
        ops=(("view", "msttr_tok", _MSTTR_SPARK_TOK),),
        final=_msttr_tail("msttr_tok", lambda a, b: f"({a}) DIV ({b})"),
        oracle=(
            f"WITH tok AS ({duck_tok}),\n" + duck_tail[len("\nWITH ") :]
        ),
        category="text",
        doc=(
            "Mean Segmental TTR (MSTTR-50) lexical diversity: RAKE "
            "tokenization, segment = integer division of the filtered "
            "token position, only exactly-50-token segments survive "
            "(standard truncation), msttr = sum(distinct types) / "
            "(50 * n_segments) as ONE IEEE division of exact BIGINTs; "
            "the Heaps-collapsing global TTR rides along for "
            "contrast. One token explode + hash aggs, no pairing."
        ),
        tables=("documents",),
    )


# Spark's posexplode numbers BEFORE the empty filter; positions must
# count only surviving tokens on both engines, so the Spark token view
# re-numbers with a doc-partitioned ROW_NUMBER over the original
# position (deterministic: original pos is unique per doc).
_MSTTR_SPARK_TOK = """
SELECT doc_id,
       ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos0) AS pos,
       w
FROM (
  SELECT doc_id, pos AS pos0, col AS w
  FROM (SELECT doc_id, posexplode(split(trim(lower(text)), ' '))
        FROM documents)
  WHERE col <> ''
)
"""

_register_msttr()


# --------------------------------------------------------------------------
# Hapax legomena profile (round 12, queued for the r13 window): the
# Zipf-fit and Heaps-law queries read the SHAPE of the frequency
# curve; the hapax share is its classic single-number tail readout —
# in natural text roughly 40-60% of the vocabulary occurs exactly
# once, and a collapsing hapax share is the cheapest OCR-garbage /
# boilerplate / dedup-failure alarm a corpus dashboard can run.
# Exact: one token scan -> per-word counts (hash agg, linear), then
# vocab V, tokens T, hapax H1 (c=1), dis legomena H2 (c=2) as exact
# BIGINT conditional counts, and the three shares as single IEEE
# divisions; the empty corpus pins every share to 0 in integer space.
# --------------------------------------------------------------------------


def _hapax_sql(tok: str) -> str:
    return f"""
WITH wc AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM ({tok}) t GROUP BY w
),
a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(COALESCE(SUM(c), 0) AS BIGINT) AS tokens,
         CAST(COALESCE(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS hapax,
         CAST(COALESCE(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS dis_legomena
  FROM wc
)
SELECT vocab, tokens, hapax, dis_legomena,
       CASE WHEN vocab = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(hapax AS DOUBLE) / CAST(vocab AS DOUBLE)
       END AS hapax_vocab_share,
       CASE WHEN tokens = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(hapax AS DOUBLE) / CAST(tokens AS DOUBLE)
       END AS hapax_token_share,
       CASE WHEN vocab = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(dis_legomena AS DOUBLE) / CAST(vocab AS DOUBLE)
       END AS dis_vocab_share
FROM a
"""


def _register_hapax() -> None:
    spark_tok = """
SELECT col AS w
FROM (SELECT posexplode(split(trim(lower(text)), ' ')) FROM documents)
WHERE col <> ''
"""
    duck_tok = """
SELECT unnest(LIST_FILTER(STRING_SPLIT(TRIM(LOWER(text)), ' '),
              x -> x <> '')) AS w
FROM documents
"""
    sql_query(
        "text_hapax_ratio",
        _hapax_sql(spark_tok),
        oracle=_hapax_sql(duck_tok),
        category="text",
        doc=(
            "Hapax legomena profile of the corpus vocabulary: one "
            "token scan into per-word counts, vocab / tokens / "
            "hapax (c=1) / dis legomena (c=2) as exact BIGINTs and "
            "the shares as single IEEE divisions; empty corpus pins "
            "every share to 0 in integer space. The frequency-curve "
            "tail alarm beside text_zipf_fit and text_heaps_law."
        ),
        tables=("documents",),
    )


_register_hapax()


# --------------------------------------------------------------------------
# Yule's K vocabulary-richness characteristic (round 12 late batch,
# queued for the r13 window): hapax share reads the frequency curve's
# TAIL; Yule's K reads its BODY — K = 1e4 * (sum(c^2) - T) / T^2, the
# classic length-stable repetitiveness constant (natural prose ~
# 60-200; boilerplate and template spam read far higher). It is the
# second-moment companion the Zipf fit's slope needs for a complete
# frequency-shape dashboard, and it is FULLY exact here: one token
# scan -> per-word counts, M2 = sum(c^2) as exact DECIMAL(38,0)
# (c <= T, M2 <= T^2 — overflow-safe to T ~ 1e19), K one fixed IEEE
# chain; the empty corpus pins K to 0 in integer space.
# --------------------------------------------------------------------------


def _yule_sql(tok: str) -> str:
    return f"""
WITH wc AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM ({tok}) t GROUP BY w
),
a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(COALESCE(SUM(c), 0) AS BIGINT) AS tokens,
         CAST(COALESCE(SUM(CAST(c AS DECIMAL(19,0))
                           * CAST(c AS DECIMAL(19,0))), 0)
              AS DECIMAL(38,0)) AS m2
  FROM wc
)
SELECT vocab, tokens,
       CASE WHEN tokens = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(10000 AS DOUBLE)
                 * (CAST(m2 AS DOUBLE) - CAST(tokens AS DOUBLE))
                 / (CAST(tokens AS DOUBLE) * CAST(tokens AS DOUBLE))
       END AS yule_k
FROM a
"""


def _register_yule() -> None:
    spark_tok = """
SELECT col AS w
FROM (SELECT posexplode(split(trim(lower(text)), ' ')) FROM documents)
WHERE col <> ''
"""
    duck_tok = """
SELECT unnest(LIST_FILTER(STRING_SPLIT(TRIM(LOWER(text)), ' '),
              x -> x <> '')) AS w
FROM documents
"""
    sql_query(
        "text_yule_k",
        _yule_sql(spark_tok),
        oracle=_yule_sql(duck_tok),
        category="text",
        doc=(
            "Yule's K vocabulary-richness characteristic: one token "
            "scan into per-word counts, K = 1e4*(sum(c^2) - T)/T^2 "
            "with the second moment exact in DECIMAL(38,0) and K one "
            "fixed IEEE chain; empty corpus pinned to 0. The "
            "frequency-body companion to text_hapax_ratio's tail and "
            "text_zipf_fit's slope."
        ),
        tables=("documents",),
    )


_register_yule()


# ---------------------------------------------------------------------------
# Distinct-n corpus diversity (round 13, window slot 48): the
# distinct-1 / distinct-2 ratios standard in generation-quality
# reporting (Li et al. 2016's Dist-n) — share of unique unigrams and
# unique adjacent bigrams in the corpus token stream. A degenerate,
# template-heavy, or decode-collapsed corpus shows a collapsing
# distinct-2 long before perplexity moves. ONE documents scan: the
# positional token stream (the RAKE idiom) gains its predecessor via
# doc-partitioned LAG (bigrams never cross documents; empty tokens
# are dropped BEFORE pairing so adjacency is over the cleaned
# sequence), then a single aggregate computes both totals and both
# distinct counts (Spark plans multi-distinct via Expand — still one
# pass over the token stream). Exact BIGINTs, ratios as single IEEE
# divisions, empty corpus pinned to 0.
# ---------------------------------------------------------------------------


def _register_distinct_ngrams() -> None:
    spark_tok = """
SELECT doc_id, pos, w FROM (
  SELECT doc_id, pos, col AS w
  FROM (SELECT doc_id, posexplode(split(trim(lower(text)), ' '))
        FROM documents)
) t WHERE w <> ''
"""
    duck_tok = """
SELECT doc_id, pos, w FROM (
  SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS w
  FROM (SELECT doc_id, STRING_SPLIT(TRIM(LOWER(text)), ' ') AS ws
        FROM documents)
) t WHERE w <> ''
"""

    def tail(tok: str) -> str:
        return f"""
WITH tok AS ({tok}),
lagged AS (
  SELECT w,
         LAG(w) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM tok
),
a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT w) AS BIGINT) AS distinct_unigrams,
         CAST(COUNT(prev) AS BIGINT) AS n_bigrams,
         CAST(COUNT(DISTINCT CASE WHEN prev IS NOT NULL
                                  THEN CONCAT(prev, ' ', w) END)
              AS BIGINT) AS distinct_bigrams
  FROM lagged
)
SELECT n_tokens, distinct_unigrams, n_bigrams, distinct_bigrams,
       CASE WHEN n_tokens = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(distinct_unigrams AS DOUBLE)
                 / CAST(n_tokens AS DOUBLE)
       END AS distinct_1,
       CASE WHEN n_bigrams = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(distinct_bigrams AS DOUBLE)
                 / CAST(n_bigrams AS DOUBLE)
       END AS distinct_2
FROM a
"""

    sql_query(
        "text_distinct_ngrams",
        tail(spark_tok),
        oracle=tail(duck_tok),
        category="text",
        doc=(
            "Dist-1/Dist-2 corpus diversity: unique-unigram and "
            "unique-adjacent-bigram shares of the cleaned token "
            "stream, bigrams via doc-partitioned LAG (never crossing "
            "documents), both distincts in one aggregate pass; empty "
            "corpus pinned to 0. The generation-collapse monitor "
            "beside text_msttr's windowed type-token curve."
        ),
        tables=("documents",),
    )


_register_distinct_ngrams()


# ---------------------------------------------------------------------------
# Gopher-style repetition profile (round 13 late batch, queued for the
# r14 window): the repetition filters of Rae et al. 2021 (Gopher,
# table A1) — share of the corpus's token mass captured by its single
# most frequent 2-gram and 3-gram, and the fraction of duplicated
# n-gram INSTANCES (occurrences beyond each gram's first) — the
# decode-loop / boilerplate alarm that fires long before perplexity
# moves. (The corpus has no newlines, so the line-level Gopher rules
# degrade to doc-level dedup — covered by dedup_exact; the n-gram
# tier is the meaningful one here.) ONE documents scan: the
# positional token stream gains 1- and 2-step predecessors via
# doc-partitioned LAGs (grams never cross documents), per-gram counts
# roll up per n, and each n's profile is exact BIGINTs with the
# shares as single IEEE divisions. Empty corpus pins every share 0.
# ---------------------------------------------------------------------------


def _register_repetition_profile() -> None:
    spark_tok = """
SELECT doc_id, pos, w FROM (
  SELECT doc_id, pos, col AS w
  FROM (SELECT doc_id, posexplode(split(trim(lower(text)), ' '))
        FROM documents)
) t WHERE w <> ''
"""
    duck_tok = """
SELECT doc_id, pos, w FROM (
  SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS w
  FROM (SELECT doc_id, STRING_SPLIT(TRIM(LOWER(text)), ' ') AS ws
        FROM documents)
) t WHERE w <> ''
"""

    def tail(tok: str) -> str:
        return f"""
WITH tok AS ({tok}),
lagged AS (
  SELECT w,
         LAG(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS p1,
         LAG(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS p2
  FROM tok
),
grams AS (
  SELECT 2 AS n, CONCAT(p1, ' ', w) AS g FROM lagged WHERE p1 IS NOT NULL
  UNION ALL
  SELECT 3 AS n, CONCAT(p2, ' ', p1, ' ', w) FROM lagged
  WHERE p2 IS NOT NULL
),
gc AS (
  SELECT n, g, CAST(COUNT(*) AS BIGINT) AS c FROM grams GROUP BY n, g
),
prof AS (
  SELECT n,
         CAST(SUM(c) AS BIGINT) AS total_grams,
         CAST(MAX(c) AS BIGINT) AS top_gram_count,
         CAST(SUM(c - 1) AS BIGINT) AS dup_instances
  FROM gc GROUP BY n
)
SELECT n AS gram_n, total_grams, top_gram_count, dup_instances,
       CASE WHEN total_grams = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(top_gram_count AS DOUBLE)
                 / CAST(total_grams AS DOUBLE)
       END AS top_gram_share,
       CASE WHEN total_grams = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(dup_instances AS DOUBLE)
                 / CAST(total_grams AS DOUBLE)
       END AS dup_instance_share
FROM prof
"""

    sql_query(
        "text_repetition_profile",
        tail(spark_tok),
        oracle=tail(duck_tok),
        category="text",
        doc=(
            "Gopher-style n-gram repetition alarms: top-2-gram and "
            "top-3-gram mass shares plus the duplicated-instance "
            "fraction per n, grams via doc-partitioned LAGs (never "
            "crossing documents), exact BIGINT counts, shares as "
            "single IEEE divisions; empty corpus pinned to 0. The "
            "decode-collapse complement to text_distinct_ngrams' "
            "diversity readout."
        ),
        tables=("documents",),
    )


_register_repetition_profile()
