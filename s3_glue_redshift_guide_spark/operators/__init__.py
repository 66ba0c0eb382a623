"""Relational operators (SURVEY.md §2.2-§2.6).

projection — the reference's "Change schema" transform (P1-P5) + predicates
joins      — J1-J8 incl. the custom range/as-of join helpers
aggregates — A1-A7 wrappers and approx variants
windows    — W1-W4 helpers
setops     — O1-O5
"""

from .projection import SchemaMapping

__all__ = ["SchemaMapping"]
