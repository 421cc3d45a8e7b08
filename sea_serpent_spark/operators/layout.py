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
    boundaries: list[int] | None = None,
) -> DataFrame:
    """``df`` re-laid-out along the Z-curve: range-partitioned on the
    Morton key and sorted within partitions, key dropped. Write the
    result with any sink; each output file then carries tight min-max
    ranges on every indexed column. ``num_partitions`` defaults to the
    session's shuffle partitioning (on a real cluster: size so each
    partition ≈ one target file, e.g. rows·bytes ≈ 1 GB).

    By default partition boundaries come from ``repartitionByRange``'s
    reservoir sample, whose seed is derived from the shuffle RDD id —
    re-running the SAME layout job moves rows between files. For table
    maintenance that matters: a no-op re-layout of an already-clustered
    100 TB table should rewrite zero bytes, and incremental maintenance
    diffs files. Pass ``boundaries`` (ascending Morton-key split points,
    e.g. from :func:`zorder_boundaries`) to pin the layout: bucket k =
    #{b ≤ z} is computed by an UNROLLED BINARY SEARCH (log₂ steps of
    codegen'd ``element_at`` — not an O(n_files) per-row scan), and
    bucket k lands in shuffle partition k exactly via Murmur3-preimage
    partition keys — fully deterministic, no sampling anywhere."""
    z = zorder_key(df, cols, bits, ranges)
    tagged = df.withColumn("__z", z)
    if boundaries is not None:
        bl = [int(b) for b in boundaries]
        if sorted(set(bl)) != bl:
            raise ValueError("boundaries must be strictly ascending")
        n = len(bl) + 1
        if num_partitions is not None and num_partitions != n:
            raise ValueError(
                f"num_partitions={num_partitions} conflicts with "
                f"{len(bl)} boundaries (⇒ {n} partitions)"
            )
        bucket = _search_sorted(F.col("__z"), bl)
        # hash-partitioning is the only sampling-free DataFrame shuffle,
        # but pmod(murmur3(k), n) scrambles bucket order; element_at of
        # this preimage table un-scrambles it so partition index ==
        # bucket index (files stay monotone in z for free)
        pk = F.array(*[
            F.lit(x).cast("long") for x in _identity_hash_keys(n)
        ])
        return (
            tagged.withColumn("__pk", F.element_at(pk, bucket + 1))
            .repartition(n, "__pk")
            .sortWithinPartitions("__z")
            .drop("__z", "__pk")
        )
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        tagged.repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def zorder_boundaries(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    num_partitions: int | None = None,
    ranges: dict[str, tuple] | None = None,
    relative_error: float = 0.001,
) -> list[int]:
    """Deterministic Morton-key split points for ``zorder_frame``'s
    ``boundaries=``: equi-depth quantiles of the key via Spark's
    Greenwald-Khanna sketch (``approxQuantile`` — a full deterministic
    pass, NOT a random sample; same files in → same boundaries out).
    Compute once, persist next to the table, reuse for every re-layout
    and for append-batch maintenance.

    Keys wider than 53 bits are rejected: the quantile sketch operates
    in double precision, so Morton keys above 2⁵³ (``bits × len(cols)``
    > 53, e.g. bits=12 with 5 columns) would silently lose low bits and
    can collapse adjacent split points into duplicates — fewer
    partitions than asked for, and a ``num_partitions`` conflict when
    the caller hands the same n back to ``zorder_frame``. Lower
    ``bits``: per-dimension resolution beyond what 53 total bits afford
    adds nothing to file skipping at realistic file counts."""
    nd = len(cols)
    if bits * nd > 53:
        raise ValueError(
            f"bits={bits} × {nd} dims = {bits * nd} key bits > 53 — the "
            "quantile sketch is double-precision and would drop low "
            "bits (duplicate boundaries); lower bits"
        )
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    keyed = df.select(zorder_key(df, cols, bits, ranges).alias("__z"))
    qs = [k / n for k in range(1, n)]
    raw = keyed.approxQuantile("__z", qs, relative_error)
    out: list[int] = []
    for v in raw:
        i = int(v)
        if not out or i > out[-1]:
            out.append(i)
    return out


def _search_sorted(z: Column, bounds: list[int]) -> Column:
    """#{b in bounds : b ≤ z} with ``bounds`` sorted ascending — binary
    lifting unrolled into log₂(len) WHEN/element_at steps, all inside
    whole-stage codegen (the naive ``filter``-and-``size`` HOF is an
    interpreted O(n_files) scan per row)."""
    m = len(bounds)
    arr = F.array(*[F.lit(int(b)).cast("long") for b in bounds])
    pos = F.lit(0)
    step = 1 << max(m.bit_length() - 1, 0)
    while step:
        cand = pos + F.lit(step)
        ok = (cand <= F.lit(m)) & (F.element_at(arr, cand) <= z)
        pos = F.when(ok, cand).otherwise(pos)
        step >>= 1
    return pos


def _murmur3_long(v: int, seed: int = 42) -> int:
    """Spark's ``Murmur3_x86_32.hashLong`` (the expression behind
    ``F.hash``/hash partitioning on a LongType key), in pure Python —
    pinned bit-for-bit against ``F.hash`` in test_layout."""
    M = 0xFFFFFFFF

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & M

    def mixk1(k1: int) -> int:
        k1 = (k1 * 0xCC9E2D51) & M
        k1 = rotl(k1, 15)
        return (k1 * 0x1B873593) & M

    def mixh1(h1: int, k1: int) -> int:
        h1 ^= k1
        h1 = rotl(h1, 13)
        return (h1 * 5 + 0xE6546B64) & M

    v &= 0xFFFFFFFFFFFFFFFF
    h1 = seed & M
    h1 = mixh1(h1, mixk1(v & M))
    h1 = mixh1(h1, mixk1(v >> 32))
    h1 ^= 8  # fmix with total byte length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & M
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & M
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def _identity_hash_keys(n: int) -> list[int]:
    """``keys[k]`` hash-partitions to partition k under Spark's
    ``pmod(murmur3(key), n)`` — the preimage table that turns a hash
    repartition into an EXPLICIT partitioner (driver-side probe of
    small ints; murmur3 is uniform, so all ``n`` slots fill after
    ~n·ln(n) probes — microseconds up to tens of thousands of files)."""
    keys: dict[int, int] = {}
    x = 0
    limit = max(4096, 64 * n)
    while len(keys) < n and x < limit:
        k = _murmur3_long(x) % n  # Python % is already non-negative
        if k not in keys:
            keys[k] = x
        x += 1
    if len(keys) < n:  # pragma: no cover - ~impossible for uniform hash
        raise RuntimeError(f"could not fill {n} partition-key slots")
    return [keys[k] for k in range(n)]
