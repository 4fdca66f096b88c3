from duckdb_behavioral_spark.plans.audit import (
    PlanAuditError,
    PlanReport,
    assert_scalable,
    audit_plan,
)

__all__ = ["audit_plan", "assert_scalable", "PlanReport", "PlanAuditError"]
