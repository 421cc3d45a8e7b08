"""One-pass dataset profiling for training-data pipeline QA.

Beyond-reference extension (the reference exposes only row counts and
per-column ``value_counts``, base.py:357-360, 2205-2219). A corpus-scale
ingest job needs column-level health stats before anything else runs:
null fractions, cardinality estimates, numeric ranges and quantiles,
string length distribution. All of it is expressible as ONE aggregation
pass over the table — every statistic below compiles into the same
map-side-partial ``Aggregate`` (plus one lightweight follow-up for exact
quantiles at small N vs approx at scale), so profiling 100 TB costs a
single scan with no Python in the path.

Design choices for scale:

- ``approx_count_distinct`` (HyperLogLog++, fixed ~KB sketch per column)
  instead of exact COUNT DISTINCT — cardinality of an id column at 100 TB
  would otherwise shuffle billions of groups;
- ``percentile_approx`` (positional Greenwald-Khanna sketch, bounded
  memory) instead of exact percentiles — an exact percentile needs a full
  sort;
- one wide ``agg`` instead of per-column jobs: Catalyst fuses all the
  aggregate expressions into one partial+final pair, so adding a column
  adds expressions, not passes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    rsd: float = 0.05,
) -> DataFrame:
    """→ one row per profiled column:
    [column, dtype, n, n_null, null_frac, approx_distinct,
    min, max, mean, q25, q50, q75, avg_len]

    ``min``/``max``/``mean``/quantiles are NULL for non-numeric columns;
    ``avg_len`` is NULL for non-string columns. ``rsd`` is the HLL++
    relative standard deviation (accuracy/size trade-off).

    Single scan: all statistics for all columns are one ``agg`` call —
    the plan is one partial-aggregate + one final over zero groups
    (a metadata-sized result regardless of table size)."""
    cols = columns or df.columns
    aggs = []
    for c in cols:
        dt = df.schema[c].dataType
        aggs.append(F.count(F.lit(1)).alias(f"{c}__n"))
        aggs.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nnull")
        )
        aggs.append(
            F.approx_count_distinct(c, rsd).alias(f"{c}__dist")
        )
        if isinstance(dt, _NUMERIC):
            aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
            aggs.append(F.avg(F.col(c).cast("double")).alias(f"{c}__mean"))
            aggs.append(
                F.percentile_approx(
                    F.col(c).cast("double"), list(quantiles)
                ).alias(f"{c}__q")
            )
        if isinstance(dt, T.StringType):
            aggs.append(
                F.avg(F.length(c).cast("double")).alias(f"{c}__avglen")
            )
    wide = df.agg(*aggs)

    rows = []
    for c in cols:
        dt = df.schema[c].dataType
        num = isinstance(dt, _NUMERIC)
        s = isinstance(dt, T.StringType)
        q = (
            [F.col(f"{c}__q")[i] for i in range(len(quantiles))]
            if num
            else [F.lit(None).cast("double")] * len(quantiles)
        )
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dt.simpleString()).alias("dtype"),
                F.col(f"{c}__n").alias("n"),
                F.col(f"{c}__nnull").alias("n_null"),
                F.round(
                    F.col(f"{c}__nnull")
                    / F.greatest(F.col(f"{c}__n"), F.lit(1)),
                    6,
                ).alias("null_frac"),
                F.col(f"{c}__dist").alias("approx_distinct"),
                (F.col(f"{c}__min") if num else F.lit(None).cast("double")).alias("min"),
                (F.col(f"{c}__max") if num else F.lit(None).cast("double")).alias("max"),
                (
                    F.round(F.col(f"{c}__mean"), 6)
                    if num
                    else F.lit(None).cast("double")
                ).alias("mean"),
                *[qc.alias(f"q{int(p * 100)}") for qc, p in zip(q, quantiles)],
                (
                    F.round(F.col(f"{c}__avglen"), 4)
                    if s
                    else F.lit(None).cast("double")
                ).alias("avg_len"),
            )
        )
    return wide.select(
        F.explode(F.array(*rows)).alias("p")
    ).select("p.*")
