"""loc / iloc indexers.

Reference parity: ``LocIndexer`` (base.py:2317-2463) and ``iLocIndexer``
(base.py:2466-2515). ``table.loc[where, cols, limit]`` reads;
``table.loc[where, col] = values`` writes. ``where`` accepts a Filter, a
checkbox Column, an int / slice (positional), a row-id string, a row-id
list, or a boolean mask.

Spark-first: reads compile to ``df.filter(pred).select(cols).limit(n)`` —
a lazy plan (the reference eagerly downloaded pandas). Positional forms
require a defined row order; managed tables carry a ``_seq`` column
(insertion order — SURVEY §7 risk 2), raw parquet tables fall back to a
user-supplied ``order_by``.
"""

from __future__ import annotations

from typing import Any

import pyspark.sql.functions as F

from .column import Column, _SemiJoinFilter
from .filter import Filter


class LocIndexer:
    def __init__(self, table):
        self.table = table

    # -- read: table.loc[where, cols, limit] ------------------------------
    def __getitem__(self, key):
        where, cols, limit = _unpack(key)
        t = self.table
        if where is not None:
            t = _apply_where(t, where)
        if cols is not None and cols != "*":
            if isinstance(cols, str):
                cols = [cols]
            t = t.select(list(cols))
        if limit is not None:
            t = t.limit(int(limit))
        return t

    # -- write: table.loc[where, col] = values ----------------------------
    def __setitem__(self, key, values):
        where, cols, _ = _unpack(key)
        if cols is None or cols == "*" or not isinstance(cols, str):
            raise ValueError("loc-write requires a single target column name")
        self.table._loc_write(where, cols, values)


class iLocIndexer:
    """Positional access; requires deterministic order (``_seq`` / order_by)."""

    def __init__(self, table):
        self.table = table

    def __getitem__(self, key):
        t = self.table
        if isinstance(key, tuple):
            pos, cols = key
        else:
            pos, cols = key, None
        if isinstance(pos, int):
            pos = slice(pos, pos + 1 if pos != -1 else None)
        if not isinstance(pos, slice):
            raise TypeError("iloc expects int or slice")
        out = t.slice(pos.start, pos.stop, pos.step)
        if cols is not None:
            out = out.select([cols] if isinstance(cols, str) else list(cols))
        return out


def _unpack(key) -> tuple[Any, Any, Any]:
    where = cols = limit = None
    if isinstance(key, tuple):
        if len(key) == 2:
            where, cols = key
        elif len(key) == 3:
            where, cols, limit = key
        else:
            raise IndexError("loc accepts at most (where, cols, limit)")
    else:
        where = key
    return where, cols, limit


def _apply_where(t, where):
    """Dispatch the reference's polymorphic ``where`` (base.py:2326-2377)."""
    # Large-isin semi-join marker
    if isinstance(where, _SemiJoinFilter):
        return t._semi_join(where)
    if isinstance(where, Filter):
        return t.filter(where)
    if isinstance(where, Column):  # bare checkbox column as predicate
        return t.filter(Filter(where.expr == F.lit(True)))
    if isinstance(where, str):  # single row id → bucket-pruned scan
        return t._prune_for_ids([where]).filter(
            Filter(F.col(t.id_col) == F.lit(where))
        )
    if isinstance(where, int):  # positional single row
        return t.slice(where, where + 1 if where != -1 else None)
    if isinstance(where, slice):
        return t.slice(where.start, where.stop, where.step)
    if _is_bool_mask(where):
        return t._mask_filter(list(where))
    if isinstance(where, (list, tuple)):  # row-id list → bucket-pruned scan
        ids = list(where)
        return t._prune_for_ids(ids).filter(
            Filter(F.col(t.id_col).isin(ids))
        )
    raise TypeError(f"unsupported loc selector: {type(where)}")


def _is_bool_mask(obj) -> bool:
    try:
        import numpy as np
        import pandas as pd

        if isinstance(obj, (pd.Series, np.ndarray)):
            return obj.dtype == bool
    except ImportError:  # pragma: no cover
        pass
    return isinstance(obj, (list, tuple)) and len(obj) > 0 and all(
        isinstance(x, (bool,)) for x in obj
    )
