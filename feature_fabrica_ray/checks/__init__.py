"""Constraint checks: row-level masks, keyed checks, stats, drift, schema."""

from .row_checks import (AcceptedValuesCheck, CheckSpecError, MembershipCheck,
                         MinLengthCheck, NotNullCheck, RangeCheck, RegexCheck,
                         RowCheck, build_row_check)
from .suite import (CheckSuite, DistinctBoundCheck, DriftCheck,
                    QuantileBoundCheck,
                    ReferentialCheck, SchemaCheck, StatsCheck, UniqueCheck)

__all__ = ["RowCheck", "NotNullCheck", "MinLengthCheck", "RegexCheck",
           "AcceptedValuesCheck", "RangeCheck", "MembershipCheck",
           "build_row_check", "CheckSpecError", "CheckSuite", "UniqueCheck",
           "ReferentialCheck", "StatsCheck", "DriftCheck", "SchemaCheck",
           "QuantileBoundCheck", "DistinctBoundCheck"]
