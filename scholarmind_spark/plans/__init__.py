from scholarmind_spark.plans.audit import explain_formatted, plan_digest

__all__ = ["explain_formatted", "plan_digest"]
