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

    ``terms`` is a SOUND UNDER-APPROXIMATION of the predicate as simple
    conjuncts ``(column, op, literal)`` — the structured form the mutation
    store's per-bucket min/max statistics can prune files with (the Delta
    data-skipping analogue). Soundness contract: every row satisfying
    ``expr`` satisfies every term, so skipping a file that fails a term
    can never drop a matching row. AND concatenates both sides' terms
    (a conjunction implies each conjunct); OR and NOT yield ``()`` —
    no claim, no pruning, never wrong.

    ``bound`` (r12) is the same predicate built from BOUND attribute
    references captured off the source table's DataFrame (``df[name]``
    instead of ``F.col(name)``) — carried alongside because the two
    resolution modes fail in complementary places: the name-based
    ``expr`` must be primary (it alone resolves against the mutation
    store's version-pinned stats-pruned re-read of the table's files),
    but in a frame holding a same-named column from ANOTHER source
    (raw-df mixing) only the bound twin resolves.
    ``Table._where_named`` retries with it on AMBIGUOUS_REFERENCE, so
    that case now works instead of erroring; a true self-join (both
    sides the same attribute) stays ambiguous either way and keeps the
    actionable error. ``bound`` is None when any contributing predicate
    could not capture one; composition propagates it best-effort.
    """

    __slots__ = ("expr", "terms", "bound")

    def __init__(
        self, expr: SparkColumn, terms: tuple = (),
        bound: SparkColumn | None = None,
    ):
        if not isinstance(expr, SparkColumn):
            raise TypeError(f"Filter expects a pyspark Column, got {type(expr)}")
        self.expr = expr
        self.terms = tuple(terms)
        self.bound = bound

    # -- composition -------------------------------------------------------
    def __and__(self, other: "Filter | SparkColumn") -> "Filter":
        return Filter(
            self.expr & _unwrap(other),
            self.terms + _terms(other),
            bound=_combine(self.bound, _bound_of(other), lambda a, b: a & b),
        )

    def __or__(self, other: "Filter | SparkColumn") -> "Filter":
        return Filter(
            self.expr | _unwrap(other),
            bound=_combine(self.bound, _bound_of(other), lambda a, b: a | b),
        )

    def __rand__(self, other):  # checkbox Column & Filter
        return Filter(
            _unwrap(other) & self.expr,
            _terms(other) + self.terms,
            bound=_combine(_bound_of(other), self.bound, lambda a, b: a & b),
        )

    def __ror__(self, other):
        return Filter(
            _unwrap(other) | self.expr,
            bound=_combine(_bound_of(other), self.bound, lambda a, b: a | b),
        )

    def __invert__(self) -> "Filter":
        # Strict superset of base.py:2273-2293 — works on compounds too.
        return Filter(
            ~self.expr,
            bound=None if self.bound is None else ~self.bound,
        )

    def __repr__(self) -> str:
        return f"<Filter {self.expr}>"


def _terms(obj) -> tuple:
    """Prunable conjuncts of the other operand (Filters carry them; raw
    Columns and engine checkbox promises claim nothing)."""
    return obj.terms if isinstance(obj, Filter) else ()


def _bound_of(obj):
    """Best-effort bound twin of the other operand: Filters carry one;
    engine Columns capture theirs on demand; a raw spark Column is its
    own (whatever resolution mode it was built with)."""
    if isinstance(obj, Filter):
        return obj.bound
    if isinstance(obj, SparkColumn):
        return obj
    b = getattr(obj, "_bound", None)
    if b is not None:
        return b
    return getattr(obj, "expr", None)


def _combine(a, b, op):
    return None if a is None or b is None else op(a, b)


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
