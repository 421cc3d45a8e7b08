"""Multi-dimensional data layout: Z-order (Morton) clustering.

At 100 TB the dominant query cost is the scan, and the dominant scan
saving is skipping files: parquet readers prune row groups / files by
min-max statistics, but those statistics only bite when rows with
nearby values sit in the same files. A single-column sort clusters one
dimension and destroys the others; interleaving the bits of several
columns (the Z-order / Morton curve — Morton 1966, and the layout
behind clustered tables in every modern lakehouse engine) gives every
indexed column partial locality, so a predicate on ANY subset of them
touches a small fraction of files.

Shape: one min/max aggregate per call (a few scalars to the driver),
then the key is pure codegen bit arithmetic (shift/AND/OR — no UDF, no
shuffle of its own); ``zorder_frame`` range-partitions on the key
(sampled boundaries, skew-tolerant) and sorts within partitions, so
each output file owns a contiguous Z-range = a small hyper-rectangle
of the value space.

Column handling:

- numeric / date / timestamp → ``width_bucket`` over the observed
  min-max into ``2^bits`` uniform cells. Uniform cells under-resolve
  heavily skewed columns (half the curve maps to one hot cell); for
  those, pre-transform (log, rank) or pass explicit ``(lo, hi)``
  bounds via ``ranges``.
- string / binary / other → ``xxhash64`` low bits. Hashing keeps
  equality locality (equal values share a cell — point predicates and
  joins prune) but deliberately not range locality.

No reference analogue (the reference is an HTTP client; storage layout
belongs to its server). Beyond-reference extension, same family as
``Table.write_shards`` (SURVEY §7 Phase 5).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _cell(df: DataFrame, col: str, bits: int,
          bounds: tuple | None) -> Column:
    """Integer cell index in [0, 2^bits) for one dimension."""
    n = 1 << bits
    dt = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dt, T.DateType):
        c = F.unix_date(c).cast("long")
        dt = T.LongType()
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        # NTZ first re-interprets in the session zone — monotone, which
        # is all bucketing needs (bounds come from the same session)
        if isinstance(dt, T.TimestampNTZType):
            c = c.cast("timestamp")
        c = F.unix_micros(c)
        dt = T.LongType()
    if isinstance(dt, _NUMERIC):
        if bounds is None:
            # aggregate the TRANSFORMED expression (dates/timestamps are
            # already epoch longs here), so bounds are always numeric
            row = df.agg(
                F.min(c).alias("lo"), F.max(c).alias("hi")
            ).first()
            bounds = (row["lo"], row["hi"])
        lo, hi = bounds
        if lo is None or hi is None or float(lo) == float(hi):
            return F.lit(0).cast("long")
        # width_bucket: 1..n inside [lo, hi], 0 / n+1 outside — clamp
        # into the cell range so out-of-bounds rows land on the edges
        b = F.width_bucket(
            c.cast("double"), F.lit(float(lo)), F.lit(float(hi)), F.lit(n)
        )
        # NULL → cell 0: degrade THIS dimension only. Without the
        # coalesce a single NULL cell propagates through the bit-OR and
        # nulls the whole Morton key, collapsing every NULL-bearing row
        # into one unsorted range — min-max pruning lost for all of them.
        return F.coalesce(
            F.least(F.greatest(b - 1, F.lit(0)), F.lit(n - 1)),
            F.lit(0),
        ).cast("long")
    # categorical: hash low bits — equality locality only (xxhash64 of
    # NULL is the seed constant, so this branch is already NULL-safe)
    return F.pmod(F.xxhash64(c), F.lit(n)).cast("long")


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    ranges: dict[str, tuple] | None = None,
) -> Column:
    """Morton-interleaved key over ``cols``: bit b of dimension d lands
    at position ``b·ndims + d``. ``bits`` is per-dimension resolution;
    ``bits × len(cols)`` must fit a signed long (≤ 62). ``ranges``
    optionally pins explicit (lo, hi) bounds per numeric column —
    skipping the min/max job and letting callers widen bounds for
    append-stable cell assignment across batches."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    nd = len(cols)
    if bits * nd > 62:
        raise ValueError(
            f"bits={bits} × {nd} dims = {bits * nd} key bits > 62 — "
            "lower bits or drop columns"
        )
    ranges = ranges or {}
    cells = [_cell(df, c, bits, ranges.get(c)) for c in cols]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for d, cell in enumerate(cells):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(cell, b).bitwiseAND(F.lit(1)),
                    b * nd + d,
                )
            )
    return z


def zorder_frame(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    num_partitions: int | None = None,
    ranges: dict[str, tuple] | None = None,
) -> DataFrame:
    """``df`` re-laid-out along the Z-curve: range-partitioned on the
    Morton key (sampled boundaries — balanced even when the curve is
    unevenly populated) and sorted within partitions, key dropped.
    Write the result with any sink; each output file then carries tight
    min-max ranges on every indexed column. ``num_partitions`` defaults
    to the session's shuffle partitioning (on a real cluster: size so
    each partition ≈ one target file, e.g. rows·bytes ≈ 1 GB)."""
    z = zorder_key(df, cols, bits, ranges)
    tagged = df.withColumn("__z", z)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        tagged.repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
