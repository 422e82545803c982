"""Declared query corpus; see registry.py."""

from aws_etl_spark.queries.registry import REGISTRY, oracle_sql, queries, register

__all__ = ["REGISTRY", "queries", "oracle_sql", "register"]
