"""Checkpoint-lifecycle registry invariants (operators/util.py).

A long-running pipeline calls tracked_checkpoint thousands of times;
the registry must not grow without bound when callers release handles
themselves, and a release must actually free the block-manager blocks.
"""

import pyspark.sql.functions as F

from sea_serpent_spark.operators import util
from sea_serpent_spark.operators.util import (
    release_checkpoints,
    track_pinned,
    tracked_checkpoint,
)


def _live_ids(spark):
    jsc = spark.sparkContext._jsc
    return {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}


def test_release_untracks_and_frees_blocks(spark):
    df = spark.range(1000).withColumn("x", F.col("id") * 2)
    n0 = len(util._TRACKED)
    out, handle = tracked_checkpoint(df)
    out.count()
    assert handle in util._TRACKED
    assert handle.rdd_ids and set(handle.rdd_ids) <= _live_ids(spark)
    handle.release()
    # explicitly-released handles leave the registry — no slow leak of
    # _jsc-holding handles in library (non-bench) sessions
    assert handle not in util._TRACKED
    assert len(util._TRACKED) == n0
    assert not (set(handle.rdd_ids) & _live_ids(spark))
    handle.release()  # idempotent
    assert len(util._TRACKED) == n0


def test_release_checkpoints_drains_registry(spark):
    n0 = len(util._TRACKED)
    frames = []
    for i in range(3):
        out, _ = tracked_checkpoint(spark.range(100 + i))
        frames.append(out.count())
    assert len(util._TRACKED) == n0 + 3
    release_checkpoints()
    assert len(util._TRACKED) == 0
    release_checkpoints()  # idempotent on empty


def test_track_pinned_release(spark):
    df = spark.range(500).persist()
    df.count()
    n0 = len(util._TRACKED)
    handle = track_pinned(df)
    assert len(util._TRACKED) == n0 + 1
    handle.release()
    assert handle not in util._TRACKED
    assert not df.is_cached
    handle.release()  # idempotent


def test_untracked_checkpoint_skips_registry(spark):
    n0 = len(util._TRACKED)
    out, handle = tracked_checkpoint(spark.range(10), track=False)
    out.count()
    assert len(util._TRACKED) == n0
    handle.release()
