from datafusion_monoid_spark.plans.inspect import (
    explain_str,
    has_pushed_filters,
    codegen_stages,
)

__all__ = ["explain_str", "has_pushed_filters", "codegen_stages"]
