"""Temporal join operators vs independent oracles: asof_join against
pandas merge_asof, range_join against the brute-force cross-join."""

import pandas as pd
import pyspark.sql.functions as F
import pytest

from sea_serpent_spark.operators.temporal import asof_join, range_join


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from sea_serpent_spark.workload import df as load_df

    return load_df(spark, sf_dir, "events")


def test_asof_join_matches_pandas(spark, events):
    """Per-user as-of enrichment: each event picks up the latest prior
    snapshot value — identical to pandas merge_asof(by=...)"""
    ev = events.select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    # snapshots: every user's purchase events act as state changes
    snap = (
        events.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").cast("timestamp").alias("snap_ts"),
            F.col("value").alias("snap_value"),
        )
    )
    got = (
        asof_join(ev, snap, on="ts", by="user_id", right_on="snap_ts")
        .orderBy("event_id")
        .toPandas()
    )
    lp = ev.toPandas().sort_values("ts", kind="mergesort").reset_index(drop=True)
    rp = (
        snap.toPandas()
        .sort_values("snap_ts", kind="mergesort")
        .reset_index(drop=True)
    )
    exp = (
        pd.merge_asof(
            lp, rp, left_on="ts", right_on="snap_ts", by="user_id"
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got = got.sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(exp)
    assert got["snap_value_r"].equals(exp["snap_value"])
    assert got["snap_ts_r"].equals(exp["snap_ts"])


def test_asof_join_tolerance(spark, events):
    ev = events.select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    snap = events.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").cast("timestamp").alias("snap_ts"),
        F.col("value").alias("snap_value"),
    )
    tight = asof_join(
        ev, snap, on="ts", by="user_id", right_on="snap_ts",
        tolerance="1 hour",
    ).where(F.col("snap_ts_r").isNotNull())
    # every surviving match is within the tolerance
    bad = tight.where(
        F.col("snap_ts_r") < F.col("ts") - F.expr("INTERVAL 1 hour")
    ).count()
    assert bad == 0
    loose_n = (
        asof_join(ev, snap, on="ts", by="user_id", right_on="snap_ts")
        .where(F.col("snap_ts_r").isNotNull())
        .count()
    )
    assert tight.count() <= loose_n


def test_range_join_matches_bruteforce(spark, events):
    pts = events.select(
        "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    # synthetic intervals: one per user session-ish window
    iv = (
        events.groupBy("user_id")
        .agg(
            F.min(F.col("ts").cast("timestamp")).alias("start"),
            F.max(F.col("ts").cast("timestamp")).alias("end"),
        )
        .where(F.col("end") > F.col("start"))
        .select("user_id", "start", "end")
    )
    got = {
        (r["event_id"], r["user_id"])
        for r in range_join(
            pts, iv, "ts", "start", "end", bin_width="6 hours"
        ).collect()
    }
    brute = {
        (r["event_id"], r["user_id"])
        for r in pts.crossJoin(iv)
        .where((F.col("start") <= F.col("ts")) & (F.col("ts") < F.col("end")))
        .collect()
    }
    assert got == brute and len(brute) > 0


def test_range_join_left_keeps_unmatched(spark, events):
    pts = events.select("event_id", F.col("ts").cast("timestamp").alias("ts"))
    # narrow interval: first hour only
    iv = pts.agg(
        F.min("ts").alias("start"),
        (F.min("ts") + F.expr("INTERVAL 1 hour")).alias("end"),
    ).select(F.lit("w0").alias("win"), "start", "end")
    out = range_join(pts, iv, "ts", "start", "end", how="left")
    n_pts = pts.count()
    assert out.count() == n_pts  # no point dropped, none duplicated
    assert out.where(F.col("win").isNull()).count() > 0
    assert out.where(F.col("win").isNotNull()).count() > 0


def test_range_join_degenerate_intervals(spark):
    """Zero-length / inverted / NULL-bounded intervals match nothing under
    start <= point < end — they must contribute zero rows, not throw
    'Illegal sequence boundaries' from the bin explode."""
    pts = spark.createDataFrame(
        [(1, "2024-01-01 10:30:00")], "pid long, ts string"
    ).select("pid", F.col("ts").cast("timestamp").alias("ts"))
    iv = spark.createDataFrame(
        [
            # zero-length, end ON a bin boundary (the sequence-crash case)
            ("z", "2024-01-01 10:00:00", "2024-01-01 10:00:00"),
            # inverted
            ("inv", "2024-01-01 12:00:00", "2024-01-01 09:00:00"),
            # NULL end
            ("nul", "2024-01-01 09:00:00", None),
            # a real match
            ("ok", "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
        ],
        "win string, start string, end string",
    ).select(
        "win",
        F.col("start").cast("timestamp").alias("start"),
        F.col("end").cast("timestamp").alias("end"),
    )
    got = range_join(pts, iv, "ts", "start", "end", bin_width="1 hour")
    assert [r["win"] for r in got.collect()] == ["ok"]
    # left join: the point survives exactly once even though three
    # intervals are degenerate
    left = range_join(pts, iv, "ts", "start", "end", bin_width="1 hour",
                      how="left")
    assert left.count() == 1


def test_range_join_auto_bin_width(spark, events):
    """Default bin_width='auto' sizes the bin at the (approx) median
    interval span and produces the same rows as any explicit width —
    binning only shapes candidate volume, never the exact-filter
    output."""
    from sea_serpent_spark.operators.temporal import _auto_bin_width

    pts = events.select("event_id", F.col("ts").cast("timestamp").alias("ts"))
    iv = (
        events.select(F.col("ts").cast("timestamp").alias("ts"), "user_id")
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("start"),
            (F.min("ts") + F.expr("INTERVAL 1 DAY")).alias("end"),
        )
    )
    # every interval spans exactly 1 day → auto width must land on it
    w = _auto_bin_width(iv, "start", "end")
    assert w == "86400 seconds"
    auto = {
        (r["event_id"], r["user_id"])
        for r in range_join(pts, iv, "ts", "start", "end").collect()
    }
    manual = {
        (r["event_id"], r["user_id"])
        for r in range_join(
            pts, iv, "ts", "start", "end", bin_width="6 hours"
        ).collect()
    }
    assert auto == manual and len(auto) > 0
    # no non-degenerate intervals: any width works, must not throw
    empty = iv.where(F.lit(False))
    assert _auto_bin_width(empty, "start", "end") == "1 hour"


def test_range_join_left_null_point_attrs(spark):
    """how='left' must not re-emit matched points that carry a NULL
    attribute (NULL = NULL is never true in a column-wise anti-join) and
    must keep duplicate point rows distinct."""
    pts = spark.createDataFrame(
        [
            (1, None, "2024-01-01 10:30:00"),   # matches, NULL attr
            (2, "a", "2024-01-01 23:00:00"),    # no match
            (3, "b", "2024-01-01 10:15:00"),    # matches
            (3, "b", "2024-01-01 10:15:00"),    # duplicate row, matches
        ],
        "pid long, tag string, ts string",
    ).select("pid", "tag", F.col("ts").cast("timestamp").alias("ts"))
    iv = spark.createDataFrame(
        [("w0", "2024-01-01 10:00:00", "2024-01-01 11:00:00")],
        "win string, start string, end string",
    ).select(
        "win",
        F.col("start").cast("timestamp").alias("start"),
        F.col("end").cast("timestamp").alias("end"),
    )
    out = range_join(pts, iv, "ts", "start", "end", how="left").collect()
    assert len(out) == 4  # 3 matched + 1 unmatched, no NULL-padded dupes
    by_pid = sorted((r["pid"], r["win"]) for r in out)
    assert by_pid == [(1, "w0"), (2, None), (3, "w0"), (3, "w0")]


def test_asof_join_no_python_in_plan(spark, events):
    ev = events.select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    snap = events.select(
        "user_id", F.col("ts").cast("timestamp").alias("snap_ts"),
        F.col("value").alias("snap_value"),
    )
    df = asof_join(ev, snap, on="ts", by="user_id", right_on="snap_ts")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one shuffle on the by-key for the window — no join exchange at all
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
