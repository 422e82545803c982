"""The composed training-corpus pipeline as ONE Spark plan.

Every stage exists (and is individually oracle-checked) elsewhere in
the registry; this query chains them the way a production corpus
build runs them — language gate → quality gate → exact dedup →
split assignment → token accounting — in a single declarative plan,
so Catalyst sees the whole flow at once: the text-derived columns
(lang score, quality, digest) all compute in the SAME narrow
projection over one scan, the only wide operations are the dedup
window (one shuffle on the content digest) — split assignment and
token counts stay row-local.

That single-plan property is the scale argument: at 100 TB the
pipeline is one pass + one shuffle, not five chained jobs
materializing four intermediates. The DuckDB oracle is the same
five-stage CTE chain built from the individually-proven oracle
fragments, so the driver pins the composition end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_spark.dedup import dedup_exact
from aws_etl_spark.ops.corpus import duckdb_bucket_sql, split_assign, split_case_sql
from aws_etl_spark.queries.registry import load_table, register
from aws_etl_spark.text import lang_id, quality_score, whitespace_token_count

_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}
_MIN_QUALITY = 0.5

_SW = "['the','and','of','to','a','in','is','it','that','for']"

_E2E_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source, lang, text,
         STRING_SPLIT(TRIM(LOWER(text)), ' ') AS w,
         LIST_DISTINCT(STRING_SPLIT(TRIM(LOWER(text)), ' ')) AS wd,
         LENGTH(REGEXP_REPLACE(text, '\\s', '', 'g')) AS nonspace,
         LENGTH(REGEXP_REPLACE(text, '[\\w\\s]', '', 'g')) AS punct
  FROM documents
),
m AS (
  SELECT doc_id, source, lang, text,
         (CASE WHEN LENGTH(text) >= 50 AND LENGTH(text) <= 10000
               THEN 0.4 ELSE 0.0 END)
         + LEAST((CASE WHEN LEN(w) > 0
                       THEN LEN(LIST_FILTER(w, x -> LIST_CONTAINS({_SW}, x)))
                            * 1.0 / LEN(w)
                       ELSE 0.0 END) * 2, 0.4)
         + GREATEST(0.2 - (CASE WHEN nonspace > 0
                                THEN punct * 1.0 / nonspace
                                ELSE 0.0 END), 0.0) AS quality,
    LEN(LIST_INTERSECT(wd, ['the','and','of','to','a','in','is','it','that','for'])) AS s_en,
    LEN(LIST_INTERSECT(wd, ['el','la','de','que','y','en','un','por','con','una'])) AS s_es,
    LEN(LIST_INTERSECT(wd, ['le','la','de','et','un','une','du','des','est','dans'])) AS s_fr,
    LEN(LIST_INTERSECT(wd, ['der','die','das','und','ist','von','ein','eine','mit','zu'])) AS s_de
  FROM t
),
scored AS (
  SELECT *,
         CASE WHEN GREATEST(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
              WHEN s_de = GREATEST(s_en, s_es, s_fr, s_de) THEN 'de'
              WHEN s_en = GREATEST(s_en, s_es, s_fr, s_de) THEN 'en'
              WHEN s_es = GREATEST(s_en, s_es, s_fr, s_de) THEN 'es'
              ELSE 'fr' END AS lang_pred
  FROM m
),
kept AS (
  SELECT * FROM scored
  WHERE lang_pred = lang AND quality >= {_MIN_QUALITY}
),
ddup AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM kept
)
SELECT doc_id, source, lang, quality,
       {split_case_sql("CAST(doc_id AS VARCHAR)", _SPLITS)} AS split,
       CAST({duckdb_bucket_sql("CAST(doc_id AS VARCHAR)")} AS BIGINT) AS bucket,
       LEN(STRING_SPLIT(TRIM(text), ' ')) AS n_tokens_ws
FROM ddup WHERE rn = 1
"""


@register(
    "corpus_e2e_pipeline",
    oracle=_E2E_ORACLE,
    category="corpus",
    tables=("documents",),
)
def q_corpus_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language gate → quality gate → exact dedup (min-id survivor) →
    split assignment → token accounting, composed as one plan.

    All scalar stages fuse into one projection over one scan; the only
    shuffle is the dedup window on the content digest. Stage
    implementations are the registry's own operators (lang_id,
    quality_score, dedup_exact, split_assign) — the composition adds
    no new kernels, which is the point."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        "lang",
        "text",
        lang_id(F.col("text")).alias("lang_pred"),
        quality_score(F.col("text")).alias("quality"),
    )
    kept = scored.filter(
        (F.col("lang_pred") == F.col("lang"))
        & (F.col("quality") >= _MIN_QUALITY)
    )
    deduped = dedup_exact(kept, ["text"], "doc_id")
    assigned = split_assign(deduped, "doc_id", _SPLITS)
    return assigned.select(
        "doc_id",
        "source",
        "lang",
        "quality",
        "split",
        F.col("bucket").cast("bigint").alias("bucket"),
        whitespace_token_count(F.col("text")).alias("n_tokens_ws"),
    )
