"""Pipeline runner (SURVEY §2.12): steps, sensors, reconciliation."""

from aws_etl_spark.pipeline.runner import (
    Pipeline,
    SensorTimeout,
    Step,
    StepFailed,
    file_sensor,
    reconcile_counts,
)
