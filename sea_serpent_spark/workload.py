"""Driver workload: named queries + DuckDB oracle SQL.

Each entry exercises one operator row from SURVEY.md §2 through the engine's
public API (Table/Column/Filter/loc/query) or, for joins/rollups, the
operators package. The driver runs the Spark side and the oracle side at
sf=0.01 and compares row-count + schema + order-insensitive value hash —
so every computed column is aliased identically on both sides, float
aggregates are rounded on both sides, and integer sums are cast to BIGINT
in DuckDB (whose SUM(int) yields HUGEINT).

Scale notes are attached per query; the global posture: AQE on, dimension
joins broadcast, aggregations partial-agg'd map-side by Catalyst, no
driver-side collects.
"""

from __future__ import annotations

from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .core.table import Table

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

_ORDER_COLS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def ensure_nanos_readable(spark: SparkSession) -> None:
    """Set ``spark.sql.legacy.parquet.nanosAsLong`` so a TIMESTAMP(NANOS)
    parquet column resolves (as raw int64) instead of failing the footer
    schema read. The driver supplies its own SparkSession — nothing from
    ``session.py`` is guaranteed — and ``events.ts`` has shipped as NANOS
    before; the conf is a no-op for MICROS files, so it is always safe."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # conf locked down (e.g. Spark Connect policy) — the
        # schema dispatch below still works for MICROS files


def ntz_from_epoch_us(us: "F.Column") -> "F.Column":
    """Epoch microseconds → UTC-naive TIMESTAMP_NTZ by pure decimal-
    interval arithmetic from the epoch literal — **independent of the
    session timezone**. The obvious ``timestamp_micros(us).cast(
    'timestamp_ntz')`` is WRONG on a non-UTC session: the LTZ→NTZ cast
    renders wall time in the session zone, shifting every value (and
    aliasing DST gaps)."""
    secs = (us.cast("decimal(20,0)") / F.lit(1_000_000)).cast("decimal(18,6)")
    return F.to_timestamp_ntz(
        F.lit("1970-01-01 00:00:00")
    ) + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), secs)


def epoch_us_from_ntz(col: "F.Column") -> "F.Column":
    """UTC-naive TIMESTAMP_NTZ → epoch microseconds by pure wall-clock
    field extraction — session-TZ-independent and DST-proof. Both
    ``to_utc_timestamp`` and SQL ``timestampdiff`` implicitly route NTZ
    operands through the session zone (probed on Spark 4.1: a non-UTC
    session shifts the result and aliases DST-gap values), so neither is
    usable here."""
    return (
        F.unix_date(F.to_date(col)).cast("long") * 86_400_000_000
        + F.hour(col).cast("long") * 3_600_000_000
        + F.minute(col).cast("long") * 60_000_000
        + (F.date_part(F.lit("SECOND"), col) * 1_000_000).cast("long")
    )


def ntz_from_any_ts(col: "F.Column", data_type) -> "F.Column":
    """Normalize any shipped ``ts`` encoding to UTC-naive TIMESTAMP_NTZ
    independently of the session timezone — the representation DuckDB
    yields for the same parquet, so oracle hashes agree on any session.

    - int64 nanos (nanosAsLong) → epoch micros → NTZ;
    - TIMESTAMP (LTZ) → epoch micros via ``unix_micros`` (TZ-free) → NTZ;
    - TIMESTAMP_NTZ → already naive, returned as-is."""
    from pyspark.sql.types import LongType, TimestampNTZType

    if isinstance(data_type, TimestampNTZType):
        return col
    if isinstance(data_type, LongType):
        us = (col / 1000).cast("long")
    else:  # TIMESTAMP (LTZ): epoch micros are timezone-free
        us = F.unix_micros(col)
    return ntz_from_epoch_us(us)


def load(spark: SparkSession, sf_dir: str, name: str) -> Table:
    """Open one driver parquet table as an engine Table.

    ``events.ts`` has shipped as both parquet TIMESTAMP(NANOS) (read as
    raw int64 via nanosAsLong, floored to micros) and TIMESTAMP(MICROS)
    (read natively).  Normalize either encoding to TIMESTAMP_NTZ micros —
    the same representation DuckDB's client yields, so oracle comparisons
    agree — by dispatching on the schema Spark actually resolved."""
    if name == "events":
        ensure_nanos_readable(spark)
        d = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        d = d.withColumn(
            "ts", ntz_from_any_ts(F.col("ts"), d.schema["ts"].dataType)
        )
        return Table(d, name, spark, order_col=_ORDER_COLS.get(name))
    return Table.from_parquet(
        f"{sf_dir}/{name}.parquet", name, spark, order_col=_ORDER_COLS.get(name)
    )


def df(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load(spark, sf_dir, name).df


# ---------------------------------------------------------------------------
# §2.1/§2.2 — scans, projections, filters, predicates
# ---------------------------------------------------------------------------

def q01_filter_project(spark, sf_dir):
    """Flagship filtered/projected scan (loc read, base.py:2326-2377)
    plus range predicate on a timestamp (Column.between) — one query
    covering >=, between, > and | composition; every predicate and the
    projection push into the parquet scan (row-group stats prune)."""
    t = load(spark, sf_dir, "lineitem")
    f = (t.l_quantity >= 45) | (
        t.l_shipdate.between("1996-01-01", "1996-12-31")
        & (t.l_discount > 0.05)
    )
    return t.loc[
        f,
        ["l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate",
         "l_discount"],
    ].df


def q02_compound_pred(spark, sf_dir):
    """&, |, ~ composition (Filter algebra, base.py:2261-2314)."""
    t = load(spark, sf_dir, "orders")
    f = (t.o_orderstatus == "F") & ~(
        (t.o_orderpriority == "1-URGENT") | (t.o_orderpriority == "2-HIGH")
    )
    return t.loc[f, ["o_orderkey", "o_orderstatus", "o_orderpriority"]].df


def q03_string_preds(spark, sf_dir):
    """contains / startswith / endswith (base.py:1938-1972) plus isin
    membership pushdown (base.py:1974-2012), | composed — all four string
    predicates reach the scan as PushedFilters."""
    t = load(spark, sf_dir, "part")
    f = (
        t.p_name.contains("a")
        & t.p_type.startswith("S")
        & t.p_brand.endswith("2")
    ) | t.p_brand.isin(["Brand#1", "Brand#5", "Brand#9"])
    return t.loc[f, ["p_partkey", "p_name", "p_type", "p_brand"]].df


def _scalar_shapes(spark, sf_dir):
    """COUNT(*) pushdown (base.py:357-360, parquet metadata-only scan),
    the `value in column` existence probe (Column.__contains__,
    base.py:1782-1792 — a pushdown LIMIT-1 scan), AND the isnull/notnull
    empty-string≡NULL duality aggregates (base.py:2014-2050): all
    single-row scalar shapes, combined via a 1×1 cross join. Formerly
    the q06 slot; folded into q08's tagged union in round 10 to free
    the driver slot for q70_profile_qa (the driver caps oracle slots
    at 50)."""
    t = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    d = load(spark, sf_dir, "documents")
    present = "Brand#7" in p.p_brand  # LIMIT-1 probe through the engine API
    notnull = d.text.notnull().expr
    isnull = d.text.isnull().expr
    nulls = d.df.agg(
        F.count(F.when(notnull, 1)).alias("n_notnull"),
        F.count(F.when(isnull, 1)).alias("n_null"),
    )
    return (
        t.df.agg(F.count(F.lit(1)).alias("n"))
        .withColumn("present", F.lit(bool(present)))
        .crossJoin(nulls)
    )


def q08_value_counts(spark, sf_dir):
    """Tagged union of the key-aggregation shapes, one oracle row
    (frees the former q07 slot for q62_span_dedup): value_counts
    (base.py:2205-2219, made distributed — group-by count on orders
    priority) and SELECT DISTINCT (base.py:2158-2169, partial-agg'd
    map-side — lineitem flag/status key pairs, count NULL).

    Round 10 folds the former q06 slot in as ``op='scalar'`` rows
    (COUNT(*) pushdown, the LIMIT-1 existence probe, the ''≡NULL
    duality aggregates — :func:`_scalar_shapes`), melted into the
    (key, count) shape; the freed slot carries q70_profile_qa."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    vc = (
        o.df.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            F.col("o_orderpriority").alias("key"),
            "count",
            F.lit("value_counts").alias("op"),
        )
    )
    di = (
        l.df.select(
            F.concat_ws("|", "l_returnflag", "l_linestatus").alias("key")
        )
        .distinct()
        .select(
            "key",
            F.lit(None).cast("long").alias("count"),
            F.lit("distinct").alias("op"),
        )
    )
    scalars = _scalar_shapes(spark, sf_dir).select(
        F.explode(
            F.create_map(
                F.lit("lineitem_count"), F.col("n").cast("long"),
                F.lit("brand7_present"), F.col("present").cast("long"),
                F.lit("doc_text_notnull"), F.col("n_notnull").cast("long"),
                F.lit("doc_text_null"), F.col("n_null").cast("long"),
            )
        ).alias("key", "count")
    ).withColumn("op", F.lit("scalar"))
    return vc.unionByName(di).unionByName(scalars)


def q09_topn_slice(spark, sf_dir):
    """Tagged union of BOTH limit shapes, one oracle row (frees a driver
    slot for q60): multi-key sort + limit → TakeOrderedAndProject (no
    full sort at scale), and the positional slice rows [100,110) in
    o_orderkey order (create_query LIMIT a,b — base.py:2546-2567)."""
    t = load(spark, sf_dir, "orders")
    top = (
        t.sort(["o_totalprice", "o_orderkey"], ascending=[False, True])
        .limit(10)
        .select(["o_orderkey", "o_totalprice"])
        .df.withColumn("op", F.lit("topn"))
    )
    sl = (
        t.slice(100, 110)
        .select(["o_orderkey", "o_totalprice"])
        .df.withColumn("op", F.lit("slice"))
    )
    return top.unionByName(sl)


# q12_null_semantics was folded into q06_count (both single-row scalar
# aggregates; the duality predicates now run through the engine's
# Column.isnull/notnull API there) — the freed slot carries
# q61_connected_components (workload_ext).


def q13_sql_passthrough(spark, sf_dir):
    """Raw SQL with auto-FROM + comma-LIMIT (base.py:1616-1649)."""
    t = load(spark, sf_dir, "lineitem")
    return t.query(
        "SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty "
        "GROUP BY l_returnflag"
    ).df


# ---------------------------------------------------------------------------
# §2.3/§2.4 — links (joins) + rollup aggregations
# ---------------------------------------------------------------------------

def q16_rollup_aggs(spark, sf_dir):
    """ALL the rollup formulas in one wide row per customer: 'lookup'
    (the former q14 — customer → nation name over a broadcast dimension
    join, mirroring the reference's in-memory dict base.py:1543-1549),
    'count_links' (the former q15 — left-outer, 0 for none), and
    'rollup-sum'/'rollup-avg'/'rollup-conc'/'findmin'/'findmax'
    (base.py:748-818, summary_method split :805-806). One grouped pass
    over left-joined orders serves every aggregate — map-side partial
    agg applies to all of them; the two freed driver slots now carry
    q68/q69 (workload_ext).

    Joins are LEFT so an order-less customer keeps n_orders=0 and NULL
    aggregates (both engines' SUM/string_agg over no rows are NULL; the
    avg and concat are when-guarded to match).

    sum/avg are computed in the integer-cents domain: o_totalprice has 2
    decimals, so ROUND(price*100) AS BIGINT is lossless, and half-up avg
    becomes pure integer math floor((2*sum_cents + n) / (2*n)). Any
    post-hoc rounding of a float AVG flips at IEEE ulp boundaries
    (partial-agg order differs between Spark and DuckDB — e.g.
    888598.53/6 = 148099.755 exactly at the half-cent boundary); integer
    cents is bit-exact by construction. Divide by 100.0 only for display:
    identical integers yield identical doubles on both engines."""
    c = df(spark, sf_dir, "customer")
    n = df(spark, sf_dir, "nation")
    o = df(spark, sf_dir, "orders")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(o, F.col("c_custkey") == o.o_custkey, "left")
        .withColumn(
            "cents", F.round(F.col("o_totalprice") * 100).cast("long")
        )
        .groupBy("c_custkey", "n_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
            F.concat_ws(
                ",", F.array_sort(F.collect_list("o_orderpriority"))
            ).alias("prio_raw"),
            F.min("o_orderdate").alias("first_date"),
            F.max("o_orderdate").alias("last_date"),
        )
        .select(
            "c_custkey",
            F.col("n_name").alias("nation_name"),
            "n_orders",
            (F.col("sum_cents") / 100.0).alias("sum_total"),
            F.when(
                F.col("n_orders") > 0,
                F.expr("(2 * sum_cents + n_orders) div (2 * n_orders)")
                / 100.0,
            ).alias("avg_total"),
            F.when(F.col("n_orders") > 0, F.col("prio_raw")).alias(
                "priorities"
            ),
            "first_date",
            "last_date",
        )
    )


def q19_first_match(spark, sf_dir):
    """link(multi_match=False) first-match semantics (base.py:1558-1560)
    made deterministic by explicit order (SURVEY §7 risk 5)."""
    o = df(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", F.col("o_orderkey").alias("first_order"))
    )


def q20_semi_anti_join(spark, sf_dir):
    """Semi- AND anti-join in one tagged-union oracle row (frees the
    former q21 slot for q63_fuzzy_pairs): parts that appear in lineitem
    (semi — membership against another table, base.py:2011-2012) and
    customers with no orders (anti — beyond-reference, SURVEY §2.4)."""
    p = df(spark, sf_dir, "part")
    l = df(spark, sf_dir, "lineitem")
    c = df(spark, sf_dir, "customer")
    o = df(spark, sf_dir, "orders")
    semi = (
        p.join(
            l.select("l_partkey").distinct(),
            p.p_partkey == F.col("l_partkey"),
            "left_semi",
        )
        .select(
            F.col("p_partkey").alias("key"),
            F.col("p_name").alias("name"),
            F.lit("semi").alias("op"),
        )
    )
    anti = (
        c.join(
            o.select("o_custkey"),
            c.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .select(
            F.col("c_custkey").alias("key"),
            F.col("c_name").alias("name"),
            F.lit("anti").alias("op"),
        )
    )
    return semi.unionByName(anti)


# ---------------------------------------------------------------------------
# analytics — TPC-H-ish shapes over the engine
# ---------------------------------------------------------------------------

def q22_tpch_q1(spark, sf_dir):
    """TPC-H Q1 shape: wide aggregation, map-side partial agg, 2-col group."""
    l = df(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q23_tpch_q3ish(spark, sf_dir):
    """3-way join + agg + top-n: revenue of open-priority orders."""
    c = df(spark, sf_dir, "customer")
    o = df(spark, sf_dir, "orders")
    l = df(spark, sf_dir, "lineitem")
    return (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q24_tpch_q5ish(spark, sf_dir):
    """Star join through broadcast dims: revenue per nation."""
    r = df(spark, sf_dir, "region")
    n = df(spark, sf_dir, "nation")
    c = df(spark, sf_dir, "customer")
    o = df(spark, sf_dir, "orders")
    l = df(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .where(F.col("r_name").isin("ASIA", "EUROPE"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# §2.5 — windows, dedup, set ops
# ---------------------------------------------------------------------------

def q25_window_rank(spark, sf_dir):
    """Ranking window (beyond-reference §2.5): top-3 orders per customer."""
    o = df(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


def q26_dedup_keeplast(spark, sf_dir):
    """Keep-last dedup (time-machine window, base.py:1008): last event per
    (user_id, event_type) by ts."""
    e = df(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", F.round("value", 4).alias("value"))
    )


# NOTE: the former q27_set_ops (UNION distinct) was folded into
# q56_cube as a tagged union — both are single-statement Catalyst SQL
# shapes; the freed slot now carries q67_zorder_key (workload_ext),
# oracle-pinning the Morton bit math that was previously test-only.


# NOTE: the former q28_events_tumbling (batch tumbling windows) was folded
# into q52_stream_tumbling — its oracle was literally identical, and the
# driver caps CORRECTNESS at 50 rows; the freed slot now carries
# q58_asof_join (workload_ext). The batch window shape remains covered by
# q44_sessionize and the streaming parity tests.


def q29_view(spark, sf_dir):
    """Stored view read (get_view, base.py:1359-1470): grouped filters
    (is×2 → IN rewrite, base.py:1421-1424), is_not, contains,
    is_not_empty, hidden columns, multi-key sort. Compiles to
    filter→select→orderBy — pushdown/pruning reach the scan (the
    reference sorts client-side in pandas)."""
    t = load(spark, sf_dir, "lineitem")
    t.add_view(
        "audited",
        filters=[
            {"column": "l_returnflag", "filter_predicate": "is",
             "filter_term": "A"},
            {"column": "l_returnflag", "filter_predicate": "is",
             "filter_term": "N"},
            {"column": "l_linestatus", "filter_predicate": "is_not",
             "filter_term": "O"},
            {"column": "l_linestatus", "filter_predicate": "contains",
             "filter_term": "F"},
            {"column": "l_quantity", "filter_predicate": "is_not_empty"},
        ],
        hidden_columns=["l_partkey", "l_suppkey", "l_tax", "l_shipdate"],
        sorts=[
            {"column": "l_extendedprice", "sort_type": "down"},
            {"column": "l_orderkey", "sort_type": "up"},
        ],
    )
    return t.get_view("audited").df


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    name: fn
    for name, fn in sorted(globals().items())
    if name.startswith("q") and name[1:3].isdigit() and callable(fn)
}

ORACLES: dict[str, str] = {
    "q01_filter_project": (
        "SELECT l_orderkey, l_quantity, l_extendedprice, l_shipdate, "
        "l_discount FROM lineitem WHERE l_quantity >= 45 OR "
        "(l_shipdate BETWEEN '1996-01-01' AND '1996-12-31' "
        "AND l_discount > 0.05)"
    ),
    "q02_compound_pred": (
        "SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders "
        "WHERE o_orderstatus = 'F' AND NOT "
        "(o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH')"
    ),
    "q03_string_preds": (
        "SELECT p_partkey, p_name, p_type, p_brand FROM part "
        "WHERE (p_name LIKE '%a%' AND p_type LIKE 'S%' AND p_brand LIKE '%2') "
        "OR p_brand IN ('Brand#1', 'Brand#5', 'Brand#9')"
    ),
    "q08_value_counts": (
        "SELECT o_orderpriority AS key, COUNT(*) AS count, "
        "'value_counts' AS op FROM orders GROUP BY o_orderpriority "
        "UNION ALL "
        "SELECT DISTINCT l_returnflag || '|' || l_linestatus AS key, "
        "CAST(NULL AS BIGINT) AS count, 'distinct' AS op FROM lineitem "
        # the former q06 scalar shapes, melted to (key, count)
        "UNION ALL SELECT 'lineitem_count', "
        "(SELECT COUNT(*) FROM lineitem), 'scalar' "
        "UNION ALL SELECT 'brand7_present', "
        "(SELECT CAST(COUNT(*) > 0 AS BIGINT) FROM part "
        "WHERE p_brand = 'Brand#7'), 'scalar' "
        "UNION ALL SELECT 'doc_text_notnull', "
        "(SELECT CAST(COUNT(*) FILTER (WHERE text IS NOT NULL "
        "AND text != '') AS BIGINT) FROM documents), 'scalar' "
        "UNION ALL SELECT 'doc_text_null', "
        "(SELECT CAST(COUNT(*) FILTER (WHERE text IS NULL OR text = '') "
        "AS BIGINT) FROM documents), 'scalar'"
    ),
    "q09_topn_slice": (
        "SELECT o_orderkey, o_totalprice, 'topn' AS op FROM ("
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10) "
        "UNION ALL "
        "SELECT o_orderkey, o_totalprice, 'slice' AS op FROM ("
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_orderkey LIMIT 10 OFFSET 100)"
    ),
    "q13_sql_passthrough": (
        "SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "q16_rollup_aggs": (
        # integer-cents on both sides: bit-exact, no float-rounding boundary
        "SELECT c_custkey, n_name AS nation_name, "
        "COUNT(o_orderkey) AS n_orders, "
        "SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 "
        "AS sum_total, "
        "CASE WHEN COUNT(o_orderkey) > 0 THEN "
        "((2 * SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) "
        "+ COUNT(o_orderkey)) // (2 * COUNT(o_orderkey))) / 100.0 END "
        "AS avg_total, "
        "CASE WHEN COUNT(o_orderkey) > 0 THEN "
        "string_agg(o_orderpriority, ',' ORDER BY o_orderpriority) END "
        "AS priorities, "
        "MIN(o_orderdate) AS first_date, MAX(o_orderdate) AS last_date "
        "FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey "
        "LEFT JOIN orders ON c_custkey = o_custkey "
        "GROUP BY c_custkey, n_name"
    ),
    "q19_first_match": (
        "SELECT o_custkey, o_orderkey AS first_order FROM ("
        "SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER ("
        "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn "
        "FROM orders) WHERE rn = 1"
    ),
    "q20_semi_anti_join": (
        "SELECT p_partkey AS key, p_name AS name, 'semi' AS op FROM part "
        "WHERE p_partkey IN (SELECT l_partkey FROM lineitem) "
        "UNION ALL "
        "SELECT c_custkey AS key, c_name AS name, 'anti' AS op "
        "FROM customer "
        "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)"
    ),
    "q22_tpch_q1": (
        "SELECT l_returnflag, l_linestatus, "
        "ROUND(SUM(l_quantity), 2) AS sum_qty, "
        "ROUND(SUM(l_extendedprice), 2) AS sum_base_price, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) "
        "AS sum_charge, "
        "ROUND(AVG(l_quantity), 4) AS avg_qty, "
        "ROUND(AVG(l_extendedprice), 4) AS avg_price, "
        "ROUND(AVG(l_discount), 4) AS avg_disc, "
        "COUNT(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
    "q23_tpch_q3ish": (
        "SELECT o_orderkey, o_orderdate, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON o_orderkey = l_orderkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "GROUP BY o_orderkey, o_orderdate "
        "ORDER BY revenue DESC, o_orderkey ASC LIMIT 10"
    ),
    "q24_tpch_q5ish": (
        "SELECT n_name, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name IN ('ASIA', 'EUROPE') GROUP BY n_name"
    ),
    "q25_window_rank": (
        "SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM ("
        "SELECT o_custkey, o_orderkey, o_totalprice, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rnk "
        "FROM orders) WHERE rnk <= 3"
    ),
    "q26_dedup_keeplast": (
        "SELECT user_id, event_type, event_id, ROUND(value, 4) AS value FROM ("
        "SELECT user_id, event_type, event_id, value, "
        "ROW_NUMBER() OVER (PARTITION BY user_id, event_type "
        "ORDER BY ts DESC, event_id DESC) AS rn FROM events) WHERE rn = 1"
    ),
    "q29_view": (
        "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, "
        "l_discount, l_returnflag, l_linestatus FROM lineitem "
        "WHERE l_returnflag IN ('A', 'N') AND l_linestatus != 'O' "
        "AND l_linestatus LIKE '%F%' AND l_quantity IS NOT NULL "
        "ORDER BY l_extendedprice DESC, l_orderkey ASC"
    ),
}
