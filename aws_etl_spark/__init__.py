"""aws_etl_spark — a PySpark-native analytics/ETL engine.

Re-expresses the data-processing capabilities of the reference AWS ETL
pipeline (camposvinicius/aws-etl) as an idiomatic Spark library:
DataFrame/SQL declarative plans, Catalyst/AQE optimization, plus
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.
"""

__version__ = "0.1.0"
