"""dbt-style schema tests (reference parity: the dbt project's
``tests:`` blocks — unique / not_null / relationships /
accepted_values — which `dbt run`+`dbt test` evaluate after every
build; README.md's dbt usage implies them for the stg/mart chain).

Each test compiles to ONE aggregate or anti-join returning a failure
count; the suite is a union of tiny result rows, so a whole test run
adds one job per table scanned, not per test:

- ``unique``        -> groupBy(col) HAVING count>1 (one shuffle on col)
- ``not_null``      -> conditional count (map-side, no shuffle)
- ``accepted_values``-> conditional count against a literal set
- ``relationships`` -> LEFT ANTI join child->parent on the key; parent
  keys are dimension-sized, so the join broadcasts and the fact side
  never shuffles (the same shape at 100 TB)

Results: (table_name, column_name, test_name, n_failures) — the dbt
convention that 0 failures == pass. Aggregating counts rather than
returning failing rows keeps the result driver-safe at any scale;
failing-row samples are one ``.filter`` away when debugging.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class SchemaTest:
    table: str
    column: str
    test: str  # unique | not_null | accepted_values | relationships
    values: list | None = None  # accepted_values
    to_table: str | None = None  # relationships parent table
    to_column: str | None = None  # relationships parent key
    where: str | None = None  # optional row filter before testing


@dataclass
class TestSuite:
    tests: list[SchemaTest] = field(default_factory=list)

    def run(self, tables: dict[str, DataFrame]) -> DataFrame:
        """Evaluate every test; returns the (table, column, test,
        n_failures) report as one DataFrame (union of 1-row counts)."""
        parts = []
        for t in self.tests:
            df = tables[t.table]
            if t.where:
                df = df.filter(t.where)
            c = F.col(t.column)
            if t.test == "unique":
                fail = (
                    df.groupBy(t.column)
                    .agg(F.count(F.lit(1)).alias("n"))
                    .filter(F.col("n") > 1)
                    .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("n_failures"))
                )
            elif t.test == "not_null":
                fail = df.agg(
                    F.coalesce(F.sum(c.isNull().cast("long")), F.lit(0)).alias("n_failures")
                )
            elif t.test == "accepted_values":
                # dbt parity: NULLs PASS accepted_values (not_null is a
                # separate test); counting them double-penalized
                # nullable columns (r5 review)
                bad = c.isNotNull() & ~c.isin(t.values)
                fail = df.agg(F.coalesce(F.sum(bad.cast("long")), F.lit(0)).alias("n_failures"))
            elif t.test == "relationships":
                parent = tables[t.to_table].select(
                    F.col(t.to_column).alias(t.column)
                ).distinct()
                fail = (
                    df.filter(c.isNotNull())
                    .select(t.column)
                    .join(F.broadcast(parent), t.column, "left_anti")
                    .agg(F.count(F.lit(1)).alias("n_failures"))
                )
            else:
                raise ValueError(f"unknown schema test {t.test!r}")
            parts.append(
                fail.select(
                    F.lit(t.table).alias("table_name"),
                    F.lit(t.column).alias("column_name"),
                    F.lit(t.test).alias("test_name"),
                    F.col("n_failures").cast("long").alias("n_failures"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
