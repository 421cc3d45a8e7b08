"""Named views: stored (filters + conjunction + sorts + hidden columns)
specs compiled to lazy Table reads.

Reference parity: ``Table.get_view`` (base.py:1359-1470) compiles the
server-stored view spec into ``Filter`` objects:

- filters are grouped per (column, predicate); repeated ``is`` terms
  rewrite to ``is_any_of`` and repeated ``is_not`` to ``is_none_of``
  (base.py:1421-1424) — the OR-of-equalities → IN rewrite (SURVEY §4);
- predicates: is / is_not / is_empty / is_not_empty / is_any_of /
  is_none_of / contains / does_not_contain (base.py:1432-1450); each
  ``contains`` term contributes its own conjunct (base.py:1444-1447);
- terms may be nested lists → flattened (utils.py:641-648);
- conjunction AND/OR across the compiled filters (base.py:1454-1455);
- ``hide_cols`` drops the view's hidden columns (base.py:1458-1462);
- ``sorts`` apply multi-key ordering, ``sort_type`` up/down
  (base.py:1464-1468).

View creation mirrors base.py:523-579 (name + spec stored with the
table). Here the spec lives in the managed table's metadata (or on the
Table instance for ad-hoc/parquet tables); compilation produces a lazy
``filter → select → orderBy`` plan, so Catalyst pushdown applies — the
reference sorts client-side in pandas, we sort in the engine.
"""

from __future__ import annotations

from typing import Any

from .filter import Filter

PREDICATES = (
    "is",
    "is_not",
    "is_empty",
    "is_not_empty",
    "is_any_of",
    "is_none_of",
    "contains",
    "does_not_contain",
)


def flatten(terms) -> list:
    """Recursive flatten of nested term lists (utils.py:641-648)."""
    out: list = []
    for t in terms if isinstance(terms, (list, tuple)) else [terms]:
        if isinstance(t, (list, tuple)):
            out.extend(flatten(t))
        else:
            out.append(t)
    return out


def make_view_spec(
    name: str,
    filters: list[dict] | None = None,
    filter_conjunction: str = "AND",
    hidden_columns: list[str] | None = None,
    sorts: list[dict] | None = None,
) -> dict[str, Any]:
    """Normalize + validate a view spec (creation side, base.py:523-579)."""
    conj = filter_conjunction.upper()
    if conj not in ("AND", "OR"):
        raise ValueError(f"filter_conjunction must be AND or OR, got {conj!r}")
    for f in filters or []:
        if "filter_predicate" not in f or not (
            f.get("column") or f.get("column_key")
        ):
            raise ValueError(f"malformed filter term: {f!r}")
        if f["filter_predicate"] not in PREDICATES:
            raise ValueError(
                f'Unsupported filter predicate: "{f["filter_predicate"]}"'
            )
    for s in sorts or []:
        if not (s.get("column") or s.get("column_key")):
            raise ValueError(f"malformed sort term: {s!r}")
        if s.get("sort_type", "up") not in ("up", "down"):
            raise ValueError(f"sort_type must be up/down: {s!r}")
    return {
        "name": name,
        "filters": list(filters or []),
        "filter_conjunction": conj,
        "hidden_columns": list(hidden_columns or []),
        "sorts": list(sorts or []),
    }


def compile_filters(table, spec: dict) -> Filter | None:
    """Compile the spec's filter terms to one engine Filter (or None)."""
    grouped: dict[tuple[str, str], list] = {}
    order: list[tuple[str, str]] = []
    for f in spec.get("filters", []):
        col_name = f.get("column") or f.get("column_key")
        key = (col_name, f["filter_predicate"])
        if key not in grouped:
            grouped[key] = []
            order.append(key)
        grouped[key].append(f.get("filter_term"))

    filters: list[Filter] = []
    for col_name, pred in order:
        col = table[col_name]
        terms = flatten(grouped[(col_name, pred)])
        if pred == "is" and len(terms) > 1:
            pred = "is_any_of"
        elif pred == "is_not" and len(terms) > 1:
            pred = "is_none_of"
        if pred == "is":
            filters.append(col == terms[0])
        elif pred == "is_not":
            filters.append(col != terms[0])
        elif pred == "is_empty":
            filters.append(col.isnull())
        elif pred == "is_not_empty":
            filters.append(col.notnull())
        elif pred == "is_any_of":
            filters.append(col.isin(terms))
        elif pred == "is_none_of":
            filters.append(~col.isin(terms))
        elif pred == "contains":
            filters.extend(col.contains(t) for t in terms)
        elif pred == "does_not_contain":
            filters.extend(~col.contains(t) for t in terms)
        else:  # pragma: no cover - caught at creation
            raise ValueError(f'Unsupported filter predicate: "{pred}"')

    if not filters:
        return None
    combined = filters[0]
    for f in filters[1:]:
        combined = (
            combined | f
            if spec.get("filter_conjunction", "AND").upper() == "OR"
            else combined & f
        )
    return combined


def apply_view(table, spec: dict, hide_cols: bool = True, sort: bool = True):
    """Compile + apply a view spec → lazy derived Table."""
    out = table
    pred = compile_filters(table, spec)
    if pred is not None:
        out = out.filter(pred)
    if hide_cols and spec.get("hidden_columns"):
        hidden = set(spec["hidden_columns"])
        out = out.select([c for c in table.columns if c not in hidden])
    if sort and spec.get("sorts"):
        cols = [s.get("column") or s.get("column_key") for s in spec["sorts"]]
        asc = [s.get("sort_type", "up") == "up" for s in spec["sorts"]]
        out = out.sort(cols, ascending=asc)
    return out
