"""Temporal joins Spark has no native operator for: as-of and range.

Beyond-reference extensions (the reference has no temporal joins; its
only time feature is log pagination, base.py:1082-1128). Both are
built from one shuffle + window functions — no UDFs, no nested-loop
fallback in the hot path.

- **asof_join** — for each left row, the latest right row at-or-before
  its timestamp (pandas ``merge_asof`` semantics, the standard
  event⋈snapshot enrichment). Implemented as the union-and-carry-forward
  plan: tag both sides, union on (key, time), sort within key, carry the
  last right payload forward with ``last(ignorenulls=True)`` over an
  unbounded-preceding window, keep left rows. ONE shuffle on the key —
  the same cost as a plain equi-join — versus the naive
  join-filter-rank formulation which joins every left row to ALL earlier
  right rows (quadratic per key) before ranking.
- **range_join** — points joined to enclosing [start, end] intervals via
  **binning**: intervals are exploded to the coarse time bins they
  overlap, points equi-join on their bin, and the exact containment
  predicate filters inside the join. Candidate volume is
  |intervals|·avg_span/bin + |points| instead of the |points|·|intervals|
  broadcast-nested-loop Spark plans for a bare range predicate. Bin
  width trades replication against selectivity — size it near the median
  interval span.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .util import tracked_checkpoint


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    right_on: str | None = None,
    tolerance: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right[right_on] <= left[on]`` (within the same ``by`` key group),
    NULLs when no prior right row exists. ``tolerance`` (an INTERVAL
    literal, e.g. ``'2 hours'``) drops matches older than
    ``left[on] - tolerance`` — pandas ``merge_asof`` semantics.

    Plan: union both sides keyed on (by, time), one window pass per key
    carrying the last right payload forward, filter back to left rows.
    One shuffle; skew follows the ``by`` key distribution (salt upstream
    if a single key dominates)."""
    right_on = right_on or on
    keys = [by] if isinstance(by, str) else list(by or [])
    rcols = [c for c in right.columns if c not in keys and c != right_on]
    lcols = left.columns

    rt_type = right.schema[right_on].dataType
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("__is_l"),
        F.col(on).alias("__t"),
        F.lit(None).cast(rt_type).alias("__rt"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in rcols],
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in keys],
        *[F.col(k) for k in keys],
        F.lit(0).alias("__is_l"),
        F.col(right_on).alias("__t"),
        F.col(right_on).alias("__rt"),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
    ).select(  # align column order with l_tag
        *lcols, "__is_l", "__t", "__rt", *[f"__r_{c}" for c in rcols]
    )
    u = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal timestamps so a
    # same-instant snapshot is visible to the event (merge_asof default)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.asc("__t"), F.asc("__is_l"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        F.last("__rt", ignorenulls=True).over(w).alias("__m_t"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in rcols
        ],
    ).where(F.col("__is_l") == 1)
    if tolerance is not None:
        in_tol = F.col("__m_t") >= F.col("__t") - F.expr(
            f"INTERVAL {tolerance}"
        )
    else:
        in_tol = F.lit(True)
    return carried.select(
        *lcols,
        F.when(in_tol, F.col("__m_t")).alias(f"{right_on}{suffix}"),
        *[
            F.when(in_tol, F.col(f"__m_{c}")).alias(f"{c}{suffix}")
            for c in rcols
        ],
    )


def _auto_bin_width(
    intervals: DataFrame, start_col: str, end_col: str
) -> str:
    """Median interval span (approx, sampled) as a whole-second INTERVAL
    literal. Binning at the median span bounds per-interval replication
    near span/bin + 1 ≈ 2 for the typical interval — a hand-picked width
    100x off the span distribution degrades to per-bin replication
    blowup (too narrow) or a near-cross-join inside each bin (too
    wide). One metadata-sized quantile job over the interval side only."""
    spans = (
        intervals.where(F.col(end_col) > F.col(start_col))
        .select(
            (
                F.col(end_col).cast("timestamp").cast("double")
                - F.col(start_col).cast("timestamp").cast("double")
            ).alias("__span")
        )
    )
    med = spans.approxQuantile("__span", [0.5], 0.1)
    if not med:  # no non-degenerate intervals: width is irrelevant
        return "1 hour"
    return f"{max(int(round(med[0])), 1)} seconds"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: str = "auto",
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` — via coarse-bin equi-join + exact filter.

    ``bin_width`` is an INTERVAL literal; both sides are floored to bin
    ids (intervals exploded across every bin they overlap with
    ``sequence``), so the join is a plain hash equi-join on the bin and
    the exact predicate only runs on co-binned candidates. The default
    ``'auto'`` sizes the bin at the median interval span (approx
    quantile over the interval side — see ``_auto_bin_width``); pass an
    explicit INTERVAL literal to override. ``how`` may be ``'inner'`` or
    ``'left'`` (points with no interval kept with NULLs)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if bin_width == "auto":
        bin_width = _auto_bin_width(intervals, start_col, end_col)
    step = F.expr(f"INTERVAL {bin_width}")
    p_bin = F.window(F.col(point_col), bin_width).getField("start")
    # degenerate (end <= start) or NULL-bounded intervals match nothing
    # under start <= point < end; drop them BEFORE exploding — otherwise
    # sequence(start_bin, end_bin) has stop < start with a positive step
    # and throws 'Illegal sequence boundaries' at runtime
    iv = intervals.where(F.col(end_col) > F.col(start_col)).withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.window(F.col(start_col), bin_width).getField("start"),
                # end is exclusive: a zero-length or bin-aligned end
                # contributes no extra bin
                F.window(
                    F.col(end_col) - F.expr("INTERVAL 1 microsecond"),
                    bin_width,
                ).getField("start"),
                step,
            )
        ),
    )
    exact = (F.col(start_col) <= F.col(point_col)) & (
        F.col(point_col) < F.col(end_col)
    )
    if how == "inner":
        pts = points.withColumn("__bin", p_bin)
        return pts.join(iv, "__bin").where(exact).drop("__bin")
    # left: anti-join on a surrogate row id, not the point columns —
    # NULL = NULL is never true, so a matched row containing a NULL
    # attribute would survive a column-wise anti-join and be re-emitted
    # NULL-padded (and duplicate point rows would collapse)
    # __pid is only stable within ONE materialization; matched and
    # unmatched both read pts, so pin the ids with a checkpoint or a
    # task retry / re-evaluated shuffle could assign different ids per
    # branch (duplicated or lost point rows)
    pts, _ = tracked_checkpoint(
        points.withColumn("__pid", F.monotonically_increasing_id())
        .withColumn("__bin", p_bin)
    )
    matched = pts.join(iv, "__bin").where(exact).drop("__bin")
    unmatched = pts.drop("__bin").join(
        matched.select("__pid").distinct(), on="__pid", how="left_anti"
    )
    for c in intervals.columns:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(intervals.schema[c].dataType)
        )
    return matched.unionByName(unmatched).drop("__pid")
