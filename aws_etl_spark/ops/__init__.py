"""Relational operators Spark lacks natively (as-of join) and
skew/shuffle-management rewrites for 100 TB plans (salting, bucketed
co-located joins)."""

from aws_etl_spark.ops.asof import asof_join
from aws_etl_spark.ops.incremental import rollup_partials, upsert
from aws_etl_spark.ops.keys import (
    with_contiguous_ids,
    with_ordered_ids,
    with_sparse_ids,
)
from aws_etl_spark.ops.range_join import range_overlap_join
from aws_etl_spark.ops.quality import (
    QualityError,
    expect_contained,
    expect_no_nulls,
    expect_row_count,
    expect_unique,
    profile,
)
from aws_etl_spark.ops.scale import (
    bucketed_table,
    hot_keys,
    salted_agg,
    salted_join,
)

__all__ = ["asof_join", "rollup_partials", "upsert", "QualityError", "expect_contained", "expect_no_nulls", "expect_row_count", "expect_unique", "profile", "range_overlap_join", "with_contiguous_ids", "with_ordered_ids", "with_sparse_ids", "bucketed_table", "hot_keys", "salted_agg", "salted_join"]
