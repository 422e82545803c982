"""Text analysis operators (see analysis module doc)."""

from aws_etl_spark.text.analysis import (
    STOPWORDS,
    fingerprint_md5,
    fingerprint_min_shingle,
    min_shingle_fingerprints,
    tf_idf,
    lang_id,
    lang_scores,
    mean_word_length,
    punct_ratio,
    quality_score,
    regex_token_count,
    repetition_ratio,
    stopword_ratio,
    top_ngrams,
    whitespace_token_count,
    word_entropy,
)

__all__ = [
    "STOPWORDS",
    "whitespace_token_count",
    "regex_token_count",
    "punct_ratio",
    "mean_word_length",
    "stopword_ratio",
    "quality_score",
    "lang_scores",
    "lang_id",
    "fingerprint_md5",
    "fingerprint_min_shingle",
    "min_shingle_fingerprints",
    "tf_idf",
    "repetition_ratio",
    "top_ngrams",
    "word_entropy",
]
