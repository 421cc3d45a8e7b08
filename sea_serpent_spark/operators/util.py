"""Partitioning helpers shared by the pair-generating operators.

Local-mode scans of small files arrive as one split and AQE sizes stages
by their *inputs*, so compute-heavy or expansive operators need explicit
fan-out to use the cluster. At real scale inputs have thousands of splits
and these become no-ops / cheap narrow shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition iff the input has fewer partitions than the target.

    CPU-heavy per-row operators (hashing, shingling, vector math) are
    otherwise bound by scan parallelism — a single small parquet file is
    one split, so on local[32] the whole operator would run on one core."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def spread(df: DataFrame) -> DataFrame:
    """Unconditional round-robin repartition to the default parallelism.

    For candidate-pair sets before a verify join: candidate generation is
    *expansive*, and AQE sizes the enumerate stage by its (tiny) input,
    so the expensive verification would otherwise run in one or two
    tasks. An explicit repartition (which AQE honors) moves only narrow
    id-pairs and parallelizes the verify."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


# ---------------------------------------------------------------------------
# local-checkpoint lifecycle
# ---------------------------------------------------------------------------
#
# ``DataFrame.localCheckpoint`` persists an RDD whose blocks are freed
# only when the JVM garbage-collects the last reference and the
# ContextCleaner notices — across a long session of iterative operators
# (connected components checkpoints EVERY round) the blocks pile up in
# the block manager, evicting execution memory and filling local disk.
# That accumulation is invisible on a fast machine and a 7x warm-run
# slowdown on a contended one (round-4 driver bench, q61). These helpers
# make the lifetime explicit: every checkpoint records its persisted RDD
# id at creation, and releases are deterministic unpersist calls instead
# of GC luck.
#
# CONTRACT: unlike a cache unpersist, a released local checkpoint CANNOT
# recompute — its lineage was truncated, and any frame still referencing
# it fails with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. ``release()`` a handle
# only once everything downstream of it is materialized;
# ``release_checkpoints()`` only at a quiesce point (between bench
# queries, after a pipeline's outputs are written).

_TRACKED: list["LocalCheckpoint"] = []


class LocalCheckpoint:
    """Handle to the persistent RDD(s) behind one ``localCheckpoint``."""

    __slots__ = ("_jsc", "rdd_ids", "released")

    def __init__(self, jsc, rdd_ids: list[int]):
        self._jsc = jsc
        self.rdd_ids = rdd_ids
        self.released = False

    def release(self) -> None:
        """Unpersist the checkpoint blocks NOW (idempotent). The
        checkpointed frame and anything lazily built on it become
        unusable — call only after downstream consumption."""
        if self.released:
            return
        self.released = True
        try:
            live = self._jsc.getPersistentRDDs()
            for i in self.rdd_ids:
                r = live.get(i)
                if r is not None:
                    r.unpersist(False)
        except Exception:
            pass  # a dead/restarted JVM has nothing left to free


def tracked_checkpoint(
    df: DataFrame, storage_level=None, track: bool = True
) -> tuple[DataFrame, LocalCheckpoint]:
    """``df.localCheckpoint(eager=True)`` + a release handle.

    The persisted RDD id is found by diffing ``getPersistentRDDs``
    around the call (single-threaded driver assumption — concurrent
    persists from other threads would be mis-attributed). With
    ``track=True`` the handle also lands in the module registry so
    :func:`release_checkpoints` can sweep it at the next quiesce
    point."""
    sc = df.sparkSession.sparkContext
    try:
        before = {
            int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()
        }
    except Exception:
        before = None
    out = (
        df.localCheckpoint(eager=True)
        if storage_level is None
        else df.localCheckpoint(eager=True, storageLevel=storage_level)
    )
    ids: list[int] = []
    if before is not None:
        try:
            ids = [
                int(k)
                for k in sc._jsc.getPersistentRDDs().keySet().toArray()
                if int(k) not in before
            ]
        except Exception:
            ids = []
    handle = LocalCheckpoint(sc._jsc, ids)
    if track:
        _TRACKED.append(handle)
    return out, handle


def release_checkpoints() -> None:
    """Free every tracked checkpoint's blocks. QUIESCE-POINT ONLY:
    released checkpoints cannot recompute, so frames from earlier
    operator calls must already be materialized (written/collected)."""
    while _TRACKED:
        _TRACKED.pop().release()
