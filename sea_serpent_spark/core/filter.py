"""Boolean predicate wrapper.

Reference parity: ``seaserpent.base.Filter`` (base.py:2261-2314) holds a SQL
WHERE fragment as a *string* and combines fragments by string concatenation;
``~`` is a lossy operator-flip rewrite that raises on AND/OR compounds
(base.py:2273-2293).

Spark-first design: a ``Filter`` wraps a boolean ``pyspark.sql.Column`` — an
unresolved expression tree, not a string. ``&``/``|``/``~`` compose natively
and De Morgan/NNF rewrites happen inside Catalyst (BooleanSimplification),
which is a strict superset of the reference's string rewrites.
"""

from __future__ import annotations

from pyspark.sql import Column as SparkColumn


class Filter:
    """A lazy boolean predicate over a table.

    Composable with ``&`` (AND), ``|`` (OR), ``~`` (NOT). Never executes I/O;
    consumed by ``Table.loc`` / ``Table.filter``.
    """

    __slots__ = ("expr",)

    def __init__(self, expr: SparkColumn):
        if not isinstance(expr, SparkColumn):
            raise TypeError(f"Filter expects a pyspark Column, got {type(expr)}")
        self.expr = expr

    # -- composition -------------------------------------------------------
    def __and__(self, other: "Filter | SparkColumn") -> "Filter":
        return Filter(self.expr & _unwrap(other))

    def __or__(self, other: "Filter | SparkColumn") -> "Filter":
        return Filter(self.expr | _unwrap(other))

    def __rand__(self, other):  # checkbox Column & Filter
        return Filter(_unwrap(other) & self.expr)

    def __ror__(self, other):
        return Filter(_unwrap(other) | self.expr)

    def __invert__(self) -> "Filter":
        # Strict superset of base.py:2273-2293 — works on compounds too.
        return Filter(~self.expr)

    def __repr__(self) -> str:
        return f"<Filter {self.expr}>"


def _unwrap(obj) -> SparkColumn:
    """Accept Filter, engine Column (checkbox promise), or raw spark Column."""
    if isinstance(obj, Filter):
        return obj.expr
    if isinstance(obj, SparkColumn):
        return obj
    expr = getattr(obj, "expr", None)
    if isinstance(expr, SparkColumn):
        return expr
    raise TypeError(f"cannot use {type(obj)} as a boolean predicate")
