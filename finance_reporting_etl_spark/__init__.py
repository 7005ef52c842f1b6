"""finance_reporting_etl_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
finance-reporting ETL pipeline (Airflow -> S3 -> PostgreSQL/TimescaleDB ->
dbt -> Metabase) as an idiomatic Spark engine:

- ``sources``   : ingest surface (JSON/CSV/Parquet readers, REST fetch shim)
- ``plans``     : dbt-style model registry (staging views -> mart tables)
- ``functions`` : scalar/KPI/text/vector column-expression libraries
- ``operators`` : relational ops (joins/pivots), dedup, similarity search,
                  incremental merge, multimodal column plumbing
- ``streaming`` : time-bucketed aggregation (batch ``F.window`` +
                  Structured Streaming ``AvailableNow`` upgrade path)

Everything is DataFrame/Spark-SQL first so Catalyst handles predicate
pushdown, column pruning, join strategy, and AQE; Pandas UDFs appear only
where built-ins cannot express the semantics (see operators.multimodal).
"""

from finance_reporting_etl_spark.session import get_spark
from finance_reporting_etl_spark.tables import TABLES, load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views", "TABLES"]
