"""Plan introspection & scale-audit utilities.

audit — inspect a DataFrame's physical plan for the anti-patterns that
        sink jobs at 100 TB (cartesian products, unpushed filters, full
        scans of wide tables, Python row UDFs in the hot path).
"""

from .audit import PlanWarning, audit_plan, plan_string

__all__ = ["PlanWarning", "audit_plan", "plan_string"]
