"""Column-expression libraries (the engine's 'macro'/UDF layer).

Everything here returns ``pyspark.sql.Column`` built from built-in
functions — no Python UDFs — so expressions stay inside Catalyst and
whole-stage codegen. This mirrors the reference's dbt Jinja macros
(README.md:487-492), which likewise expand to plain SQL expressions.
"""

from finance_reporting_etl_spark.functions.kpis import (
    profit_margin,
    return_on_assets,
    return_on_equity,
    safe_div,
)
from finance_reporting_etl_spark.functions.scalars import case_map, normalize_string

__all__ = [
    "safe_div",
    "profit_margin",
    "return_on_assets",
    "return_on_equity",
    "normalize_string",
    "case_map",
]
