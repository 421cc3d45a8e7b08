"""Partitioning helpers shared by the pair-generating operators.

Local-mode scans of small files arrive as one split and AQE sizes stages
by their *inputs*, so compute-heavy or expansive operators need explicit
fan-out to use the cluster. At real scale inputs have thousands of splits
and these become no-ops / cheap narrow shuffles.
"""

from __future__ import annotations

import logging
import threading
from contextlib import contextmanager
from contextlib import nullcontext as _nullcontext

from pyspark.sql import DataFrame

_log = logging.getLogger(__name__)


#: Session conf key overriding the operators' fan-out width. Default
#: (unset) is ``defaultParallelism`` — right for corpus-sized inputs.
#: A streaming micro-batch of a few hundred rows gains nothing from a
#: 32-way spread but pays 32 task launches PER STAGE of fixed
#: scheduler latency, which multiplied by a probe's ~30 jobs IS the
#: per-batch floor (r12 q69 decomposition) — so the ingest sink sets
#: this for the duration of each batch (``incremental_dedup_sink``'s
#: ``batch_parallelism``), exactly the per-trigger parallelism tuning
#: a real cluster deployment does.
FANOUT_CONF = "spark.sea_serpent.fanout.parallelism"


def _fanout_target(df: DataFrame) -> int:
    spark = df.sparkSession
    v = spark.conf.get(FANOUT_CONF, None)
    if v:
        try:
            return max(1, int(v))
        except ValueError:
            pass
    return spark.sparkContext.defaultParallelism


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition iff the input has fewer partitions than the target.

    CPU-heavy per-row operators (hashing, shingling, vector math) are
    otherwise bound by scan parallelism — a single small parquet file is
    one split, so on local[32] the whole operator would run on one core."""
    target = min_parts or _fanout_target(df)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def spread(df: DataFrame) -> DataFrame:
    """Unconditional round-robin repartition to the fan-out target.

    For candidate-pair sets before a verify join: candidate generation is
    *expansive*, and AQE sizes the enumerate stage by its (tiny) input,
    so the expensive verification would otherwise run in one or two
    tasks. An explicit repartition (which AQE honors) moves only narrow
    id-pairs and parallelizes the verify."""
    return df.repartition(_fanout_target(df))


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

_TRACKED: list["LocalCheckpoint | PinnedFrame"] = []
# Guards the registry only. RDD-id attribution needs no lock: the id is
# read off the returned DataFrame's own LogicalRDD plan node, so a
# concurrent driver thread's persist can never be mis-attributed (the
# failure mode of the previous getPersistentRDDs set-diff, where a
# wrong id meant a later release() unpersisted a LIVE checkpoint —
# unrecoverable CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND downstream).
_LOCK = threading.Lock()

# release() must swallow ONLY "the JVM is gone" errors — anything else
# (a bug in our id bookkeeping, a wrong handle) should surface, not
# silently leak blocks.
try:
    from py4j.protocol import Py4JError as _Py4JError
except ImportError:  # pragma: no cover - py4j ships with pyspark
    _Py4JError = ()
_DEAD_JVM_ERRORS = (_Py4JError, ConnectionError, EOFError, OSError)


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
        _untrack(self)
        try:
            live = self._jsc.getPersistentRDDs()
            for i in self.rdd_ids:
                r = live.get(i)
                if r is not None:
                    r.unpersist(False)
        except _DEAD_JVM_ERRORS:
            pass  # a dead/restarted JVM has nothing left to free


class PinnedFrame:
    """Handle to a ``persist()``-pinned DataFrame an operator must keep
    alive for result determinism (e.g. ``token_budget_mix``'s range-
    partitioned input, whose sampled boundaries must not be resampled
    between the offset collect and the output scan). Unlike a released
    checkpoint the frame CAN recompute after release — but possibly
    with different partition boundaries, so the same quiesce-point
    contract applies."""

    __slots__ = ("_df", "released")

    def __init__(self, df: DataFrame):
        self._df = df
        self.released = False

    def release(self) -> None:
        if self.released:
            return
        self.released = True
        _untrack(self)
        try:
            self._df.unpersist(False)
        except _DEAD_JVM_ERRORS:
            pass


def _untrack(handle) -> None:
    with _LOCK:
        try:
            _TRACKED.remove(handle)
        except ValueError:
            pass  # not tracked, or already swept by release_checkpoints


def track_pinned(df: DataFrame) -> PinnedFrame:
    """Register an operator-pinned (persisted) frame for the quiesce
    sweep and return its release handle."""
    handle = PinnedFrame(df)
    with _LOCK:
        _TRACKED.append(handle)
    return handle


def tracked_checkpoint(
    df: DataFrame, storage_level=None, track: bool = True,
    scalar_plan: bool = False,
) -> tuple[DataFrame, LocalCheckpoint]:
    """``df.localCheckpoint(eager=True)`` + a release handle.

    The persisted RDD id is read directly off the returned frame's
    ``LogicalRDD`` plan node — exact attribution with zero extra JVM
    round-trips, safe under concurrent driver threads (no global-state
    diffing). With ``track=True`` the handle also lands in the module
    registry so :func:`release_checkpoints` can sweep it at the next
    quiesce point.

    ``scalar_plan=True`` (r14) runs the eager fill under
    :func:`scalar_action_confs` — for call sites whose plan is
    aggregation-only (the single shuffle carries partial-agg'd narrow
    rows), where AQE's per-exchange stage job is pure scheduler
    latency. Leave False for plans carrying joins or explicit wide
    repartitions AQE should re-plan."""
    sc = df.sparkSession.sparkContext
    ctx = (
        scalar_action_confs(df.sparkSession)
        if scalar_plan
        else _nullcontext()
    )
    with ctx:
        out = (
            df.localCheckpoint(eager=True)
            if storage_level is None
            else df.localCheckpoint(eager=True, storageLevel=storage_level)
        )
    try:
        # Dataset.localCheckpoint returns a LogicalRDD wrapping the
        # persisted internal RDD; its id is the unpersist target
        ids = [int(out._jdf.queryExecution().analyzed().rdd().id())]
    except _DEAD_JVM_ERRORS + (AttributeError,):
        # Unknown plan shape / connect mode: the handle becomes a no-op,
        # which means blocks are freed only by JVM GC again — the exact
        # accumulation failure this lifecycle exists to prevent. Say so
        # loudly instead of silently degrading (an iterative operator
        # checkpointing every round would re-create the round-4
        # warm-run regression with zero signal).
        ids = []
        _log.warning(
            "tracked_checkpoint could not resolve the persisted RDD id "
            "from the plan (unexpected plan shape or connect mode); "
            "release() for this handle will be a no-op and checkpoint "
            "blocks will only be freed by JVM GC"
        )
    handle = LocalCheckpoint(sc._jsc, ids)
    if track:
        with _LOCK:
            _TRACKED.append(handle)
    return out, handle


def release_all(handles) -> None:
    """Release a batch of handles with at most ONE ``getPersistentRDDs``
    JVM round-trip (vs one per ``release()`` call) — for iterative
    operators that supersede a checkpoint every round and would
    otherwise pay a driver round-trip inside the convergence loop."""
    cps = []
    for h in handles:
        if isinstance(h, LocalCheckpoint) and not h.released:
            cps.append(h)
        else:
            h.release()
    if not cps:
        return
    try:
        live = cps[0]._jsc.getPersistentRDDs()
    except _DEAD_JVM_ERRORS:
        live = None  # dead/restarted JVM has nothing left to free
    # Mark a handle released only AFTER its blocks are freed: a
    # non-dead-JVM error from unpersist (bookkeeping bug, wrong handle)
    # must leave the not-yet-freed handles retryable — released=True
    # would make both retry and the registry sweep no-ops and leak the
    # blocks. unpersist is idempotent, so re-releasing the handle that
    # raised mid-batch is safe.
    for h in cps:
        if live is not None:
            try:
                for i in h.rdd_ids:
                    r = live.get(i)
                    if r is not None:
                        r.unpersist(False)
            except _DEAD_JVM_ERRORS:
                live = None
        h.released = True
        _untrack(h)


def release_checkpoints() -> None:
    """Free every tracked checkpoint's / pinned frame's blocks.

    QUIESCE-POINT ONLY — this is bench/driver plumbing, not a pipeline
    call: released checkpoints cannot recompute, and released pins may
    recompute differently, so every frame produced by earlier operator
    calls must already be materialized (written / collected). Calling
    it mid-pipeline silently corrupts any lazily-held operator output."""
    while True:
        with _LOCK:
            if not _TRACKED:
                return
            handle = _TRACKED.pop()
        handle.release()


#: r14 plan-construction cache for data-independent Column trees (the
#: quantizer-literal argmax in similarity.ivf_assign, the probe
#: selection in ann_index.ivf_probes, the band-struct array in
#: dedup.banded_signatures): building these costs tens-to-hundreds of
#: py4j round-trips plus their incremental Catalyst analysis — a fixed
#: per-call tax the streaming ingest loops paid EVERY micro-batch for
#: expressions that cannot change between batches. Columns are
#: immutable expression handles (unresolved attribute refs), safe to
#: reuse across plans; keys carry the expression's full content plus
#: the Spark application id, so a session restart can never serve dead
#: JVM handles.
_EXPR_CACHE: dict = {}
_EXPR_CACHE_MAX = 64


def _expr_cache_key(*parts) -> tuple | None:
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    if sc is None:
        return None
    return (sc.applicationId,) + parts


def _expr_cache_get(key):
    return _EXPR_CACHE.get(key) if key is not None else None


def _expr_cache_put(key, value) -> None:
    if key is None:
        return
    if len(_EXPR_CACHE) >= _EXPR_CACHE_MAX:
        _EXPR_CACHE.clear()
    _EXPR_CACHE[key] = value


def _quantizer_key(x):
    """Content fingerprint of a centroid / codebook nest — tuples of
    floats hash fast, and two sidecar reloads of the same generation
    produce equal keys even though the list objects differ."""
    if isinstance(x, (list, tuple)):
        return tuple(_quantizer_key(v) for v in x)
    return float(x)


#: Guards the one-shot-take conf flip below. RLock (not the streaming
#: sinks' batch lock): a probe may run inside a sink batch that holds
#: its own lock, and re-entry from the same thread must not deadlock.
_TAKE_CONF_LOCK = threading.RLock()
_INITIAL_PARTS_CONF = "spark.sql.limit.initialNumPartitions"


@contextmanager
def one_shot_take(spark, parts: int = 64):
    """Make ``take()`` scan ``parts`` partitions in its FIRST job for
    the duration of the block (restored on exit, lock-guarded).

    ``executeTake``'s default scale-up loop (1 partition, then 4x per
    retry) is the right shape for LIMIT over a big scan; for the local
    micro-batch probe's capped collects — a handful of post-shuffle
    partitions that will ALL be needed — it costs 2-4 extra Spark jobs
    of pure scheduler latency per take (r14 job audit: 8 of the LSH
    probe's 12 per-batch jobs were its two takes' scans, 5 of them
    scale-up retries). 64 one-shots
    every trigger-sized frame while keeping the overscan of a
    pathological cap-overflow take bounded to one pass."""
    with _TAKE_CONF_LOCK:
        prev = spark.conf.get(_INITIAL_PARTS_CONF, None)
        spark.conf.set(_INITIAL_PARTS_CONF, str(int(parts)))
        try:
            yield
        finally:
            if prev is None:
                spark.conf.unset(_INITIAL_PARTS_CONF)
            else:
                spark.conf.set(_INITIAL_PARTS_CONF, prev)


#: Guards the micro-plan conf bracket below (RLock: a micro-commit can
#: run inside a caller that already holds it, e.g. a bundle flush
#: committing several staged edits back-to-back on one thread).
_MICRO_PLAN_LOCK = threading.RLock()

#: Sessions with an :func:`overlap_build` in flight (id(session) →
#: count). While a session is registered, the AQE conf brackets below
#: become NO-OPS for that session (r15, closing the overlap × bracket
#: race): a bracket that flipped the session-global
#: ``spark.sql.adaptive.enabled`` would make SIBLING chains' unbracketed
#: plan compilations timing-dependent — a deliberately-AQE-on fill
#: could silently compile with AQE off. Keeping AQE ON during overlap
#: is the conservative posture (the bracket's only job is shaving
#: scheduler latency, and overlap hides that latency anyway); results
#: are identical either way. Registration keys on the PYTHON session
#: object id — safe because this package's sessions are module-cached
#: singletons and streaming foreachBatch bodies receive per-query JVM
#: clone sessions (verified: conf-isolated), which are never the
#: registered object, so sink batch brackets keep their posture even
#: while a foreground overlap is live.
_OVERLAP_SESSIONS: dict = {}


def _bracket_is_noop(spark) -> bool:
    """True while an overlap_build is in flight on ``spark`` — AQE
    brackets must not flip session-global conf under sibling chains.
    Caller holds ``_MICRO_PLAN_LOCK``."""
    return _OVERLAP_SESSIONS.get(id(spark), 0) > 0


@contextmanager
def micro_plan_confs(spark, parts: int = 4):
    """AQE off + a narrow static shuffle width for the duration of the
    block (restored on exit, lock-guarded) — the streaming sinks'
    per-batch posture (``streaming.dedup._batch_confs``), reusable for
    any plan bracket whose input is KNOWN to be micro-sized at the call
    site. AQE materializes every exchange as its own Spark job to
    re-plan with runtime stats — the right trade for big unknown-stats
    queries, pure scheduler latency for a bracket whose size the caller
    has already bounded (mutation micro-commits gate on the table's
    bucket count: single-bucket == auto-sized under 1M rows). Callers
    whose data CAN be large must not enter the bracket — size-gate
    first. The lock serializes concurrent brackets (and concurrent
    plan-time conf reads of other threads see the flipped value for
    the duration — parallelism-only impact, never results).

    NO-OP while an :func:`overlap_build` is in flight on this session
    (r15): flipping session-global conf under sibling chains would make
    their plan posture timing-dependent."""
    with _MICRO_PLAN_LOCK:
        if _bracket_is_noop(spark):
            yield
            return
        prev_shuf = spark.conf.get("spark.sql.shuffle.partitions")
        prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.shuffle.partitions", str(int(parts)))
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_shuf)
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def overlap_build(*thunks, workers: int = 3, spark=None) -> list:
    """Run independent member-builder thunks concurrently and return
    their results in SUBMISSION order (guide §2.6: Spark happily runs
    several jobs at once inside one application; member chains that
    only share read-only inputs are sequential purely because driver
    code calls their eager actions — checkpoint fills, sizing
    collects — back to back). Wall becomes the max chain instead of
    the sum. 2-3 workers is plenty: enough to fill each chain's
    driver-latency gaps with another chain's tasks, not so many that
    they fight for executors. Results must be order-insensitive by
    construction (each thunk a pure function of its inputs —
    deterministic frames/checkpoints); the caller assembles them in
    the same fixed order as the sequential formulation, so the output
    plan is identical. Exceptions re-raise at collection, preserving
    the sequential error surface.

    ``spark`` (r15): the session the chains compile against. While the
    overlap is in flight, AQE conf brackets on that session
    (:func:`scalar_action_confs` / :func:`micro_plan_confs`) become
    no-ops so sibling chains' plan posture is deterministic (always
    the session's steady-state AQE-on). Registration takes
    ``_MICRO_PLAN_LOCK``, so an in-flight bracket fully exits (conf
    restored) before any chain starts compiling."""
    from concurrent.futures import ThreadPoolExecutor

    key = None
    if spark is not None:
        key = id(spark)
        with _MICRO_PLAN_LOCK:
            _OVERLAP_SESSIONS[key] = _OVERLAP_SESSIONS.get(key, 0) + 1
    try:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            futs = [pool.submit(t) for t in thunks]
            return [f.result() for f in futs]
    finally:
        if key is not None:
            with _MICRO_PLAN_LOCK:
                n = _OVERLAP_SESSIONS.get(key, 0) - 1
                if n > 0:
                    _OVERLAP_SESSIONS[key] = n
                else:
                    _OVERLAP_SESSIONS.pop(key, None)


@contextmanager
def scalar_action_confs(spark):
    """AQE off — shuffle width UNTOUCHED — for the duration of one
    scalar/metadata-sized aggregate action (restored on exit,
    lock-guarded; same lock as :func:`micro_plan_confs`).

    AQE materializes every exchange as its own Spark job to re-plan
    with runtime stats. For a *scalar* aggregate (count, sum, max,
    group-cardinality collect) that trade buys nothing: partial
    aggregation has already shrunk each upstream partition to a
    handful of narrow rows before the exchange, so there is nothing
    for AQE to coalesce or skew-split — but every exchange still
    costs a full driver job of scheduler latency (measured r14:
    each 2-3-job scalar-agg wave is one job without AQE, ~0.1-0.3 s
    of wall per action on the bench box). Unlike
    :func:`micro_plan_confs` this bracket leaves
    ``spark.sql.shuffle.partitions`` alone, so it is safe for
    aggregates over corpus-sized inputs: the plan is identical to
    pre-AQE Spark at the deploy's static width.

    Use ONLY around actions whose plan the call site bounds: an
    aggregate directly over a checkpoint/persist-truncated frame, or
    a partial-agg-first report over a source scan. Do NOT use when
    the input plan carries joins whose strategy AQE should pick at
    runtime (e.g. ``weighted_sample``'s generic total over an
    arbitrary scored plan stays on AQE).

    NO-OP while an :func:`overlap_build` is in flight on this session
    (r15) — see :func:`micro_plan_confs`."""
    with _MICRO_PLAN_LOCK:
        if _bracket_is_noop(spark):
            yield
            return
        prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


#: local_rows_df falls back to createDataFrame past this many CELLS:
#: the one-statement SQL text stays driver-cheap into the thousands of
#: cells (~µs/cell of string building + one JVM parse), but the whole
#: relation lives in the PLAN — caps at a size where plan bloat and
#: broadcast re-serialization stay trivially bounded.
_LOCAL_ROWS_CELL_CAP = 4096


def _sql_lit(v) -> str:
    """One value → a Spark SQL literal, exactly round-trippable under
    the per-column CAST local_rows_df wraps around it. Floats go
    through a STRING cast (Java ``Double.parseDouble`` of Python's
    shortest ``repr`` reproduces the exact IEEE754 double — and it
    covers Infinity/NaN); strings escape backslash + quote (the only
    escapes Spark's default string literal needs)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        r = repr(v)
        r = {"inf": "Infinity", "-inf": "-Infinity", "nan": "NaN"}.get(
            r, r
        )
        return f"CAST('{r}' AS DOUBLE)"
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(v, (list, tuple)):
        return "ARRAY(" + ",".join(_sql_lit(x) for x in v) + ")"
    raise TypeError(
        f"local_rows_df cannot inline a {type(v).__name__} literal"
    )


def local_rows_df(spark, rows, schema: str):
    """Literal LocalRelation frame (r15). ``spark.createDataFrame``
    over a Python list parallelizes it into an RDD-backed scan
    (``LogicalRDD``), so every consumer — in particular every
    BROADCAST build over it — pays a real Spark job plus a
    whole-stage-codegen compile on first execution (measured: a
    5-row broadcast build side costs ~1-1.5 s cold, ~0.4 s warm; the
    LocalRelation twin is driver-collected with neither). A VALUES
    relation folds to a ``LocalTableScan``.

    Values are INLINED as SQL literals in one statement — one py4j
    round trip total (the named-parameter form measured ~5 ms/cell of
    per-arg py4j traffic); strings are escaped, floats round-trip
    exactly through a string cast, and every column is cast to its
    declared type, so the result schema and values are identical to
    the ``createDataFrame(rows, schema)`` twin. ``schema`` is the DDL
    string form (columns nullable, as createDataFrame infers for
    list-of-rows input) or a ``StructType`` (declared nullability
    honored — values for non-nullable fields must be non-NULL). Use
    for SMALL literal tables only (rule snapshots, driver-computed id
    lists, probe batches, single-row tags): the whole relation lives
    in the plan and on the driver."""
    from pyspark.sql import types as _T

    fields = (
        _T._parse_datatype_string(schema)
        if isinstance(schema, str)
        else schema
    )
    cells = sum(
        len(v) if isinstance(v, (list, tuple)) else 1
        for row in rows
        for v in row
    )
    if not rows or cells > _LOCAL_ROWS_CELL_CAP:
        if not rows:
            return spark.createDataFrame(rows, schema)
        # oversized fallback: parallelize with FEW slices.
        # createDataFrame(list) defaults to defaultParallelism (32)
        # slices, and every consuming job pays ~130 ms of
        # Python-runner overhead PER SLICE (measured r15 — a 1700-row
        # 32-slice frame cost ~4 s per write/scan); a handful of
        # slices keeps the conversion parallel enough at this size
        # with ~100× less runner overhead.
        n_slices = max(1, min(8, cells // _LOCAL_ROWS_CELL_CAP))
        rdd = spark.sparkContext.parallelize(list(rows), n_slices)
        return spark.createDataFrame(rdd, schema)
    tuples = [
        "(" + ",".join(_sql_lit(v) for v in row) + ")" for row in rows
    ]
    raw_cols = ", ".join(f"c{j}" for j in range(len(fields)))
    # IF(TRUE, c, NULL) makes a column NULLABLE in the ANALYZED plan
    # (which is what df.schema reports — exact createDataFrame parity,
    # whose list-of-rows columns are always nullable); the optimizer
    # folds the IF away, so the executed plan is still a bare
    # LocalRelation. Non-nullable StructType fields skip the wrapper
    # (their non-NULL literals already infer non-null).
    proj = ", ".join(
        (
            "IF(TRUE, CAST(c{j} AS {t}), CAST(NULL AS {t})) AS `{n}`"
            if f.nullable
            else "CAST(c{j} AS {t}) AS `{n}`"
        ).format(j=j, t=f.dataType.simpleString(), n=f.name)
        for j, f in enumerate(fields)
    )
    return spark.sql(
        f"SELECT {proj} FROM VALUES {', '.join(tuples)} "
        f"AS t({raw_cols})"
    )


class MinRootUnionFind:
    """Driver-side union-find whose every root is the MIN of its merged
    set — the canonical-doc choice ``connected_components`` makes, so
    local fast paths agree bit-for-bit with the distributed loop
    (Python int/str ordering == Spark's: UTF-8 binary order is
    code-point order). Shared by the three local probes (r14 — they
    each hand-rolled this; one copy keeps the canonical-order contract
    in one place)."""

    def __init__(self) -> None:
        self.parent: dict = {}

    def find(self, x):
        p = self.parent
        while p.setdefault(x, x) != x:
            p[x] = p[p[x]]  # path halving
            x = p[x]
        return x

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra

    def components(self) -> dict:
        """→ {root: [members]} over every node ever seen."""
        out: dict = {}
        for n in self.parent:
            out.setdefault(self.find(n), []).append(n)
        return out
