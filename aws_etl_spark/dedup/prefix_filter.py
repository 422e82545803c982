"""Prefix-filtered exact set-similarity join (AllPairs/PPJoin family
— Bayardo et al., WWW'07 "Scaling Up All Pairs Similarity Search").

A third exact route to the Jaccard-pair contract, complementing the
full posting self-join (dedup/jaccard.py — Σ df² in candidate cost)
and MinHash-LSH (dedup/minhash.py — probabilistic recall, verified
exact). The prefix-filter principle: order every document's shingles
by ascending global document frequency (rarest first; ties broken by
shingle text so both engines agree), and keep only the first
``p = n - ceil(t·n) + 1`` as the document's PREFIX. Two sets with
Jaccard ≥ t must overlap in ≥ ceil(t·n) elements, so they CANNOT
avoid each other's prefixes — any qualifying pair shares at least
one prefix token. Candidates therefore come from a self-join on
prefix tokens only: rare tokens carry most prefixes, so Σ df² is
computed over the rarest slice of the distribution instead of the
stop-shingle head — the cheap end of the same sum the full join pays,
with EXACT recall (no LSH miss probability, no df cap truncating
hot shingles).

Verification joins candidates back to the full shingle postings for
the exact intersection count — identical arithmetic to
ngram_jaccard_pairs, so the two operators share an oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aws_etl_spark.dedup.jaccard import shingle_rows


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    t_num: int = 1,
    t_den: int = 2,
) -> DataFrame:
    """All pairs (id_a < id_b) with shingle-Jaccard ≥ t_num/t_den via
    prefix filtering; returns ``(id_a, id_b, n_common, jaccard)`` —
    the exact ngram_jaccard_pairs contract. The threshold is a
    rational so the prefix length is pure integer arithmetic
    (``ceil(t·n) = (n·t_num + t_den − 1) DIV t_den`` — no float
    boundary can flip an element in or out of a prefix)."""
    sh = shingle_rows(df, id_col, text_col, k)
    sh = sh.withColumn("n", F.count("*").over(Window.partitionBy("doc")))
    ranked = (
        sh.withColumn(
            "df_s", F.count("*").over(Window.partitionBy("shingle"))
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("doc").orderBy("df_s", "shingle")
            ),
        )
    )
    prefix_len = (
        F.col("n")
        - F.expr(f"(n * {t_num} + {t_den - 1}) DIV {t_den}")
        + F.lit(1)
    )
    pre = ranked.filter(F.col("rnk") <= prefix_len).select("doc", "shingle")

    cand = (
        pre.alias("a")
        .join(
            pre.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b")
        )
        .dropDuplicates()
    )

    full = sh.select("doc", "shingle", "n")
    inter = (
        cand.join(
            full.select(
                F.col("doc").alias("id_a"),
                "shingle",
                F.col("n").alias("na"),
            ),
            "id_a",
        )
        .join(
            full.select(
                F.col("doc").alias("id_b"),
                "shingle",
                F.col("n").alias("nb"),
            ),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .filter(
            F.col("n_common") * t_den
            >= (F.col("na") + F.col("nb") - F.col("n_common")) * t_num
        )
        .select("id_a", "id_b", "n_common", "jaccard")
    )
