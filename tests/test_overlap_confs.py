"""r15: overlap_build × AQE-conf-bracket determinism, and the
thread-scoped pair-operator cache registries.

The race these pin down (r14 verdict item 5 / advice): a bracket that
flips the session-global ``spark.sql.adaptive.enabled`` while an
``overlap_build`` sibling chain compiles a plan would silently compile
that plan with AQE off — posture nondeterminism (never results). The
fix: while an overlap is registered on a session, the brackets are
no-ops, so sibling compilations always see the steady-state conf.
"""

import threading

import pytest
from pyspark.sql import functions as F

from sea_serpent_spark.operators.util import (
    micro_plan_confs,
    overlap_build,
    scalar_action_confs,
)


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _shuffle_plan(spark):
    return (
        spark.range(1000)
        .groupBy((F.col("id") % 7).alias("k"))
        .count()
    )


def test_bracket_flips_aqe_outside_overlap(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    with scalar_action_confs(spark):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        assert "AdaptiveSparkPlan" not in _physical(_shuffle_plan(spark))
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_overlap_sibling_plan_stays_adaptive(spark):
    """A sibling chain compiling WHILE another chain sits inside a
    scalar_action_confs bracket must still plan adaptively."""
    in_bracket = threading.Event()
    sibling_done = threading.Event()
    seen: dict = {}

    def _bracketed():
        with scalar_action_confs(spark):
            seen["conf_in_bracket"] = spark.conf.get(
                "spark.sql.adaptive.enabled"
            )
            in_bracket.set()
            assert sibling_done.wait(timeout=30)
        return "a"

    def _sibling():
        assert in_bracket.wait(timeout=30)
        try:
            seen["sibling_plan"] = _physical(_shuffle_plan(spark))
        finally:
            sibling_done.set()
        return "b"

    out = overlap_build(_bracketed, _sibling, workers=2, spark=spark)
    assert out == ["a", "b"]
    # the bracket no-opped: conf never flipped under the sibling
    assert seen["conf_in_bracket"] == "true"
    assert "AdaptiveSparkPlan" in seen["sibling_plan"]
    # registration is refcounted away: brackets flip again afterwards
    with micro_plan_confs(spark, parts=3):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_overlap_registration_survives_thunk_error(spark):
    with pytest.raises(RuntimeError, match="boom"):
        overlap_build(
            lambda: (_ for _ in ()).throw(RuntimeError("boom")),
            spark=spark,
        )
    with scalar_action_confs(spark):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_cache_scope_isolation(spark):
    """Frames kept inside a cache_scope survive another thread's
    operator-entry retire; the global release_caches sweep still drops
    every scope."""
    from sea_serpent_spark.operators.dedup import (
        _keep_cache,
        _retire_scope_caches,
        cache_scope,
        release_caches,
    )

    release_caches()  # clean slate
    scoped: dict = {}

    def _chain():
        with cache_scope():
            dfx = _keep_cache(spark.range(100).withColumn("v", F.lit(1)))
            dfx.count()
            scoped["df"] = dfx

    t = threading.Thread(target=_chain)
    t.start()
    t.join(timeout=60)
    assert "df" in scoped
    assert scoped["df"].storageLevel.useMemory
    # a DEFAULT-scope operator entry (what a concurrent sink batch
    # does) must not see the scoped frame
    _retire_scope_caches()
    assert scoped["df"].storageLevel.useMemory
    # the quiesce sweep drops every scope, including finished ones
    release_caches()
    assert not scoped["df"].storageLevel.useMemory


def test_default_scope_retire_still_works(spark):
    from sea_serpent_spark.operators.dedup import (
        _keep_cache,
        _retire_scope_caches,
        release_caches,
    )

    release_caches()
    dfx = _keep_cache(spark.range(10))
    assert dfx.storageLevel.useMemory
    _retire_scope_caches()
    assert not dfx.storageLevel.useMemory
