"""Capture .explain("formatted") for named catalog queries into
plans/r14/<name>_<tag>.txt (judge-checkable plan evidence for the
optimization round). Queries that persist aux artifacts or replay
streams execute those side effects; the captured plan is the final
declared DataFrame's."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_RUN_ID", f"plans-{os.getpid()}")

from finance_reporting_etl_spark.queries import CATALOG  # noqa: E402
from finance_reporting_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"capture-plans-{tag}")
    for name in names:
        try:
            df = CATALOG[name].fn(spark, sf_dir)
            jvm = spark.sparkContext._jvm
            txt = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR {type(e).__name__}: {e}"
        with open(f"{out_dir}/{name}_{tag}.txt", "w") as f:
            f.write(txt)
        print(f"captured {name}")


if __name__ == "__main__":
    main()
