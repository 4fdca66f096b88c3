"""Audit every declared batch query's physical plan with
plans.audit.assert_scalable and print a one-line verdict per query.

Survey tool behind tests/test_plan_audit_suite.py: run it after plan-
affecting changes to see the whole suite's scale posture at once.

    python scripts/audit_all_plans.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as E
    from duckdb_behavioral_spark.plans import PlanAuditError, assert_scalable

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for name, fn in E.queries().items():
        if name.startswith("streaming_"):
            continue  # replay harnesses, not batch plans
        try:
            df = fn(spark, sf)
            r = assert_scalable(df)
            print(
                f"ok   {name}: exch={r.exchanges} "
                f"sp(b/r)={r.bounded_single_partition_exchanges}/"
                f"{r.raw_single_partition_exchanges} "
                f"arrow={r.arrow_python_evals}"
            )
        except PlanAuditError as ex:
            bad += 1
            print(f"FLAG {name}: {ex}")
        except Exception as ex:  # noqa: BLE001
            bad += 1
            print(f"ERR  {name}: {type(ex).__name__}: {str(ex)[:160]}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
