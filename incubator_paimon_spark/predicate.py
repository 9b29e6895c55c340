"""Predicate IR used for manifest/file pruning.

Mirrors the reference's predicate tree (paimon-common/src/main/java/org/apache/
paimon/predicate/Predicate.java:35, LeafPredicate.java:40, CompoundPredicate.java:33,
builder PredicateBuilder.java:74-399) but is intentionally tiny: Spark `Column`
expressions carry the *query* semantics; this IR exists only so the Python
planner can evaluate predicates against manifest min/max/null-count stats —
something Catalyst never sees (it has no access to our manifest files).

Each leaf can answer three questions:
- ``test_value(row_dict)``          exact evaluation (partition pruning)
- ``test_stats(min, max, nulls, row_count)``  "might this file contain a match?"
- ``to_column()``                    the equivalent Spark Column (residual filter)

The stats test is conservative: returns True ("keep the file") unless the
stats *prove* no row can match — the same contract as the reference's
``LeafFunction.test(long rowCount, min, max, nullCount)``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

from pyspark.sql import functions as F


class Predicate:
    def __and__(self, other: "Predicate") -> "Predicate":
        return And([self, other])

    def __or__(self, other: "Predicate") -> "Predicate":
        return Or([self, other])

    # --- interface ---
    def test_value(self, row: dict) -> bool:  # pragma: no cover - abstract
        raise NotImplementedError

    def test_stats(self, stats: dict) -> bool:  # pragma: no cover - abstract
        """stats: {col: {"min":..,"max":..,"null_count":..}, "_row_count": n}"""
        raise NotImplementedError

    def to_column(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def fields(self) -> set:
        raise NotImplementedError


def _cmp_ok(a, b) -> bool:
    """True when a and b are comparable non-None values."""
    return a is not None and b is not None


def _col_stats(stats: dict, field: str):
    s = stats.get(field)
    if s is None:
        return None, None, None
    return s.get("min"), s.get("max"), s.get("null_count")


@dataclass
class Leaf(Predicate):
    op: str  # eq, ne, lt, le, gt, ge, in, not_in, is_null, is_not_null, starts_with
    field: str
    literal: Any = None

    def fields(self):
        return {self.field}

    def test_value(self, row: dict) -> bool:
        v = row.get(self.field)
        lit = self.literal
        op = self.op
        if op == "is_null":
            return v is None
        if op == "is_not_null":
            return v is not None
        if v is None:
            return False
        if op == "eq":
            return v == lit
        if op == "ne":
            return v != lit
        if op == "lt":
            return v < lit
        if op == "le":
            return v <= lit
        if op == "gt":
            return v > lit
        if op == "ge":
            return v >= lit
        if op == "in":
            return v in lit
        if op == "not_in":
            return v not in lit
        if op == "starts_with":
            return isinstance(v, str) and v.startswith(lit)
        raise ValueError(f"unknown op {op}")

    def test_stats(self, stats: dict) -> bool:
        row_count = stats.get("_row_count")
        mn, mx, nulls = _col_stats(stats, self.field)
        op, lit = self.op, self.literal
        all_null = (
            row_count is not None and nulls is not None and nulls >= row_count
        )
        if op == "is_null":
            return nulls is None or nulls > 0
        if op == "is_not_null":
            return not all_null
        if all_null:
            return False
        if op == "eq":
            if _cmp_ok(mn, lit) and lit < mn:
                return False
            if _cmp_ok(mx, lit) and lit > mx:
                return False
            return True
        if op == "lt":
            return not (_cmp_ok(mn, lit) and mn >= lit)
        if op == "le":
            return not (_cmp_ok(mn, lit) and mn > lit)
        if op == "gt":
            return not (_cmp_ok(mx, lit) and mx <= lit)
        if op == "ge":
            return not (_cmp_ok(mx, lit) and mx < lit)
        if op == "in":
            if mn is None or mx is None:
                return True
            return any(mn <= x <= mx for x in self.literal if x is not None)
        if op == "starts_with":
            # min/max on strings bound the prefix range
            if isinstance(mn, str) and isinstance(mx, str) and isinstance(lit, str):
                hi = lit[: len(lit)]
                if mx < hi:
                    return False
                if mn[: len(lit)] > lit:
                    return False
            return True
        # ne / not_in can rarely prune; only when min==max==literal
        if op == "ne":
            return not (_cmp_ok(mn, mx) and mn == mx and mn == lit)
        if op == "not_in":
            return not (_cmp_ok(mn, mx) and mn == mx and mn in lit)
        raise ValueError(f"unknown op {op}")

    def to_column(self):
        c = F.col(self.field)
        op, lit = self.op, self.literal
        if op == "eq":
            return c == F.lit(lit)
        if op == "ne":
            return c != F.lit(lit)
        if op == "lt":
            return c < F.lit(lit)
        if op == "le":
            return c <= F.lit(lit)
        if op == "gt":
            return c > F.lit(lit)
        if op == "ge":
            return c >= F.lit(lit)
        if op == "in":
            return c.isin(list(lit))
        if op == "not_in":
            return ~c.isin(list(lit))
        if op == "is_null":
            return c.isNull()
        if op == "is_not_null":
            return c.isNotNull()
        if op == "starts_with":
            return c.startswith(lit)
        raise ValueError(f"unknown op {op}")


@dataclass
class And(Predicate):
    children: Sequence[Predicate]

    def fields(self):
        return set().union(*(c.fields() for c in self.children))

    def test_value(self, row):
        return all(c.test_value(row) for c in self.children)

    def test_stats(self, stats):
        return all(c.test_stats(stats) for c in self.children)

    def to_column(self):
        col = self.children[0].to_column()
        for c in self.children[1:]:
            col = col & c.to_column()
        return col


@dataclass
class Or(Predicate):
    children: Sequence[Predicate]

    def fields(self):
        return set().union(*(c.fields() for c in self.children))

    def test_value(self, row):
        return any(c.test_value(row) for c in self.children)

    def test_stats(self, stats):
        return any(c.test_stats(stats) for c in self.children)

    def to_column(self):
        col = self.children[0].to_column()
        for c in self.children[1:]:
            col = col | c.to_column()
        return col


class P:
    """PredicateBuilder-style factory (PredicateBuilder.java:74-399)."""

    @staticmethod
    def eq(field, v):
        return Leaf("eq", field, v)

    @staticmethod
    def ne(field, v):
        return Leaf("ne", field, v)

    @staticmethod
    def lt(field, v):
        return Leaf("lt", field, v)

    @staticmethod
    def le(field, v):
        return Leaf("le", field, v)

    @staticmethod
    def gt(field, v):
        return Leaf("gt", field, v)

    @staticmethod
    def ge(field, v):
        return Leaf("ge", field, v)

    @staticmethod
    def isin(field, vals):
        return Leaf("in", field, list(vals))

    @staticmethod
    def not_in(field, vals):
        return Leaf("not_in", field, list(vals))

    @staticmethod
    def is_null(field):
        return Leaf("is_null", field)

    @staticmethod
    def is_not_null(field):
        return Leaf("is_not_null", field)

    @staticmethod
    def starts_with(field, prefix):
        return Leaf("starts_with", field, prefix)

    @staticmethod
    def between(field, lo, hi):
        return And([Leaf("ge", field, lo), Leaf("le", field, hi)])


def split_by_fields(pred: Predicate | None, allowed: set) -> tuple[Predicate | None, Predicate | None]:
    """Split an AND-tree into (covered, residual) where `covered` touches only
    `allowed` fields. Used to peel the partition-pruning part of a filter,
    mirroring PredicateBuilder.splitAnd + partition extraction
    (PredicateBuilder.java:371)."""
    if pred is None:
        return None, None
    parts = pred.children if isinstance(pred, And) else [pred]
    covered = [p for p in parts if p.fields() <= allowed]
    residual = [p for p in parts if not (p.fields() <= allowed)]

    def _combine(ps):
        if not ps:
            return None
        return ps[0] if len(ps) == 1 else And(ps)

    return _combine(covered), _combine(residual)
