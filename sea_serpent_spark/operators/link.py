"""Links between tables + linked-column rollups.

Reference parity: ``Table.link`` (base.py:1481-1603) builds row-id links by
downloading both key columns and hashing the build side in a client dict
(base.py:1543-1557); ``add_linked_column`` (base.py:748-818) creates a
server-computed column pulling/aggregating values across links with
formulas lookup / count_links / rollup-avg / rollup-sum / rollup-conc /
findmin / findmax (base.py:775-806).

Spark-first design:
- the match is a **left equi-join**; Catalyst picks broadcast-hash when the
  other side is dimension-sized (the distributed analogue of the
  reference's in-memory dict) and sort-merge otherwise — both scale where
  the client dict cannot;
- ``multi_match=False`` ("first match", base.py:1558-1560) is a
  ``row_number() == 1`` window over the other table's ``_seq`` insertion
  order — deterministic, unlike the reference's server-order dependence
  (SURVEY §7 risk 5);
- unmatched rows get an empty array (left-outer semantics,
  base.py:1574-1577);
- rollups aggregate after ``explode_outer`` of the link array, keeping
  NULL-correct left-outer counts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..core.table import Table

FORMULAS = (
    "lookup",
    "count_links",
    "rollup-avg",
    "rollup-sum",
    "rollup-conc",
    "findmin",
    "findmax",
)


def compute_links(
    left: DataFrame,
    right: DataFrame,
    link_on: str,
    link_on_other: str,
    multi_match: bool = True,
    right_id: str = "_id",
    right_order: str = "_seq",
) -> DataFrame:
    """→ DataFrame[_id, links array<string>] of matching right-row ids.

    Sorted by the right table's insertion order so link arrays are
    deterministic and first-match is well-defined."""
    r = right.select(
        F.col(link_on_other).alias("__k"),
        F.col(right_id).alias("__rid"),
        F.col(right_order).alias("__rord"),
    )
    l = left.select("_id", F.col(link_on).alias("__k"))
    m = l.join(r, "__k", "left")
    if not multi_match:
        from pyspark.sql import Window

        w = Window.partitionBy("_id").orderBy(F.asc_nulls_last("__rord"))
        m = m.withColumn("__rn", F.row_number().over(w)).where(
            F.col("__rn") == 1
        )
    # collect_list skips NULL structs, so unmatched rows yield []
    keyed = F.when(
        F.col("__rid").isNotNull(), F.struct(F.col("__rord"), F.col("__rid"))
    )
    return m.groupBy("_id").agg(
        F.transform(
            F.array_sort(F.collect_list(keyed)), lambda s: s["__rid"]
        ).alias("links")
    )


def link(
    table: Table,
    other: Table,
    link_on: str,
    link_on_other: str,
    link_col: str,
    multi_match: bool = True,
) -> None:
    """Materialize a link column on a managed table (base.py:1481-1603)."""
    store = table._require_store()
    links = compute_links(
        table.df, other.df, link_on, link_on_other, multi_match
    )
    store.set_column_from_df(table, link_col, links, "links")
    meta = store.meta(table.name)
    meta["columns"][link_col] = {
        "type": "link",
        "data": {"other_table": other.name, "link_on": link_on,
                 "link_on_other": link_on_other},
    }
    store._write_meta(table.name, meta)


def linked_rollup(
    left: DataFrame,
    right: DataFrame,
    link_col: str,
    value_col: str | None,
    formula: str,
    right_id: str = "_id",
    right_order: str = "_seq",
) -> DataFrame:
    """→ DataFrame[_id, value] applying one rollup formula across the link
    array (base.py:775-806). The explode→join→agg pipeline is fully
    distributed; the join key is the right row id (unique), so no skew."""
    if formula not in FORMULAS:
        raise ValueError(
            f"unknown formula {formula!r}; allowed: {FORMULAS} "
            "(reference base.py:775-783)"
        )
    e = left.select("_id", F.explode_outer(link_col).alias("__rid"))
    if formula == "count_links":
        return e.groupBy("_id").agg(
            F.count("__rid").alias("value")
        )
    cols = [F.col(right_id).alias("__rid"), F.col(right_order).alias("__rord")]
    if value_col:
        cols.append(F.col(value_col).alias("__v"))
    j = e.join(right.select(*cols), "__rid", "left")
    g = j.groupBy("_id")
    keyed = F.when(
        F.col("__rid").isNotNull(),
        F.struct(F.col("__rord"), F.col("__v") if value_col else F.lit(None)),
    )
    if formula == "lookup":
        return g.agg(
            F.transform(
                F.array_sort(F.collect_list(keyed)), lambda s: s["__v"]
            ).alias("value")
        )
    if formula == "rollup-avg":
        return g.agg(F.avg("__v").alias("value"))
    if formula == "rollup-sum":
        return g.agg(F.sum("__v").alias("value"))
    if formula == "rollup-conc":
        return g.agg(
            F.concat_ws(
                ", ",
                F.transform(
                    F.array_sort(F.collect_list(keyed)),
                    lambda s: s["__v"].cast("string"),
                ),
            ).alias("value")
        )
    if formula == "findmin":
        return g.agg(F.min("__v").alias("value"))
    return g.agg(F.max("__v").alias("value"))


def add_linked_column(
    table: Table,
    link_col: str,
    formula: str,
    value_col: str | None = None,
    name: str | None = None,
) -> None:
    """Materialize a rollup as a column on a managed table
    (add_linked_column, base.py:748-818)."""
    store = table._require_store()
    meta = store.meta(table.name)
    lmeta = meta["columns"].get(link_col, {})
    if lmeta.get("type") != "link":
        raise ValueError(f"{link_col!r} is not a link column")
    other_name = lmeta["data"]["other_table"]
    other = store.table(other_name)
    out = linked_rollup(table.df, other.df, link_col, value_col, formula)
    col_name = name or f"{formula}_{value_col or link_col}"
    store.set_column_from_df(table, col_name, out, "value")
    meta = store.meta(table.name)
    meta["columns"][col_name] = {
        "type": "link-formula",
        "data": {"formula": formula, "link_col": link_col,
                 "value_col": value_col},
    }
    store._write_meta(table.name, meta)
