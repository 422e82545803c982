"""Relational operators Spark lacks natively (as-of join, ...)."""

from aws_etl_spark.ops.asof import asof_join
