"""dbt-style model layer: registry, ref resolution, materialization."""

from finance_reporting_etl_spark.plans.registry import Model, ModelRegistry

__all__ = ["Model", "ModelRegistry"]
