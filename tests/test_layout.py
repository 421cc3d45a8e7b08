"""Z-order layout tests: Morton bit math, partition locality, pruning."""

import pyspark.sql.functions as F
import pytest

from sea_serpent_spark.operators.layout import zorder_frame, zorder_key


def _morton(cells, bits):
    z = 0
    nd = len(cells)
    for b in range(bits):
        for d, v in enumerate(cells):
            z |= ((v >> b) & 1) << (b * nd + d)
    return z


def test_zorder_key_bit_math(spark):
    """Cells interleave exactly as the reference Morton formula — pinned
    against a pure-python recomputation over the full 4x4 grid."""
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x long, y long")
    # ranges (0,4) with bits=2 → width_bucket cell == int value for 0..3
    out = df.withColumn(
        "z", zorder_key(df, ["x", "y"], bits=2,
                        ranges={"x": (0, 4), "y": (0, 4)})
    ).collect()
    for r in out:
        assert r["z"] == _morton([r["x"], r["y"]], 2), (r["x"], r["y"])


def test_zorder_key_edges(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 5.0), (3, None, 5.0)],
        "id long, s string, const double",
    )
    # constant numeric column → cell 0 everywhere; strings hash; key is
    # deterministic across runs
    z1 = [r["z"] for r in df.withColumn(
        "z", zorder_key(df, ["const", "s"], bits=4)).collect()]
    z2 = [r["z"] for r in df.withColumn(
        "z", zorder_key(df, ["const", "s"], bits=4)).collect()]
    assert z1 == z2
    with pytest.raises(ValueError, match="62"):
        zorder_key(df, ["id", "s"], bits=32)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key(df, [], bits=8)


def test_zorder_key_null_cells_degrade_one_dimension(spark):
    """A NULL in one numeric dimension lands that dimension in cell 0 —
    the key itself is NEVER NULL, and the other dimensions keep their
    locality (pinned against the Morton formula with the NULL cell
    forced to 0). Pre-fix, width_bucket(NULL) propagated through the
    bit-OR and collapsed every NULL-bearing row into one NULL key."""
    rows = [(0, 3), (1, None), (2, 0), (3, None)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.withColumn(
        "z", zorder_key(df, ["x", "y"], bits=2,
                        ranges={"x": (0, 4), "y": (0, 4)})
    ).collect()
    for r in out:
        assert r["z"] is not None, r
        assert r["z"] == _morton([r["x"], r["y"] if r["y"] is not None
                                  else 0], 2), r
    # pruning still works on the non-NULL dimension: distinct keys
    assert len({r["z"] for r in out}) == 4

    # NULL dates/timestamps ride the same numeric path
    df2 = spark.createDataFrame(
        [(1, "2024-01-01"), (2, None)], "id long, d string"
    ).select("id", F.col("d").cast("date").alias("d"))
    z = df2.withColumn("z", zorder_key(df2, ["d", "id"], bits=4)).collect()
    assert all(r["z"] is not None for r in z)


def _span_score(df, parts, cols):
    """Mean over partitions of the product of normalized per-column
    spans — the fraction of the 2-D value rectangle each partition
    covers. Small = partitions are tight hyper-rectangles = min-max
    file pruning works."""
    tot = {c: df.agg(
        (F.max(c) - F.min(c)).cast("double")).first()[0] for c in cols}
    spans = (
        parts.withColumn("__p", F.spark_partition_id())
        .groupBy("__p")
        .agg(*[
            ((F.max(c) - F.min(c)) / F.lit(tot[c])).alias(c) for c in cols
        ])
        .collect()
    )
    prod = [max(float(r[cols[0]]), 1e-9) * max(float(r[cols[1]]), 1e-9)
            for r in spans]
    return sum(prod) / len(prod)


def test_zorder_partitions_are_tight_rectangles(spark, sf_dir):
    """After z-ordering events on (user_id, event_id), each range
    partition covers a small sub-rectangle of the value space; a
    round-robin layout covers ~the whole rectangle per partition."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("user_id").isNotNull() & F.col("event_id").isNotNull()
    )
    cols = ["user_id", "event_id"]
    zed = zorder_frame(ev, cols, bits=10, num_partitions=16)
    base = ev.repartition(16)
    z_score = _span_score(ev, zed, cols)
    r_score = _span_score(ev, base, cols)
    assert z_score < 0.25, f"z-order partitions too loose: {z_score}"
    assert z_score < r_score / 3, (z_score, r_score)
    # layout is a reshuffle, never a filter
    assert zed.count() == ev.count()
    assert zed.columns == ev.columns


def test_table_zorder_method(spark, sf_dir):
    import sea_serpent_spark as ss

    t = ss.Table.from_parquet(f"{sf_dir}/events.parquet", "events")
    z = t.zorder(["user_id", "ts"], bits=8, num_partitions=4)
    assert len(z) == len(t)
    assert z.columns == t.columns


def test_murmur3_long_matches_spark_hash(spark):
    """The pure-python Murmur3 behind the preimage partition keys is
    bit-identical to Spark's F.hash on longs — the property the whole
    deterministic-layout path rests on."""
    from sea_serpent_spark.operators.layout import _murmur3_long

    vals = list(range(0, 50)) + [-1, -7, 2**40, -(2**40), 2**62]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: r["h"] for r in
           df.select("v", F.hash("v").alias("h")).collect()}
    for v in vals:
        assert _murmur3_long(v) == got[v], v


def test_zorder_frame_pinned_boundaries_deterministic(spark, sf_dir):
    """With explicit boundaries two layout runs produce IDENTICAL file
    assignment (the repartitionByRange default does not — its reservoir
    seed is RDD-id-derived), and partition index is monotone in z, so
    files keep range order."""
    from sea_serpent_spark.operators.layout import zorder_boundaries

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cols = ["user_id", "event_id"]
    bounds = zorder_boundaries(ev, cols, bits=10, num_partitions=8)
    assert bounds == sorted(set(bounds))

    def assignment():
        out = zorder_frame(ev, cols, bits=10, boundaries=bounds)
        rows = (
            out.withColumn("__p", F.spark_partition_id())
            .groupBy("__p")
            .agg(
                F.sort_array(F.collect_list("event_id")).alias("ids"),
                F.min(zorder_key(out, cols, bits=10)).alias("zlo"),
                F.max(zorder_key(out, cols, bits=10)).alias("zhi"),
            )
            .collect()
        )
        return {r["__p"]: (tuple(r["ids"]), r["zlo"], r["zhi"])
                for r in rows}

    a, b = assignment(), assignment()
    assert a == b
    assert len(a) == len(bounds) + 1
    # partition k owns exactly the z-range [bounds[k-1], bounds[k])
    order = sorted(a)
    for k in order:
        ids, zlo, zhi = a[k]
        if k > 0:
            assert zlo >= bounds[k - 1], (k, zlo)
        if k < len(bounds):
            assert zhi < bounds[k], (k, zhi)
    with pytest.raises(ValueError, match="ascending"):
        zorder_frame(ev, cols, bits=10, boundaries=[5, 5, 9])
    with pytest.raises(ValueError, match="conflicts"):
        zorder_frame(ev, cols, bits=10, boundaries=bounds,
                     num_partitions=3)
    # keys wider than a double's 53-bit mantissa are rejected — the
    # quantile sketch would drop low bits and collapse split points
    with pytest.raises(ValueError, match="53"):
        zorder_boundaries(ev, cols, bits=27)


def test_search_sorted_matches_bisect(spark):
    import bisect

    from sea_serpent_spark.operators.layout import _search_sorted

    for bounds in ([3], [2, 7], [1, 5, 9, 13, 40], list(range(0, 64, 7))):
        df = spark.createDataFrame(
            [(v,) for v in range(-2, 45)], "z long"
        )
        got = df.select(
            "z", _search_sorted(F.col("z"), bounds).alias("k")
        ).collect()
        for r in got:
            assert r["k"] == bisect.bisect_right(bounds, r["z"]), (
                bounds, r["z"]
            )


def test_zorder_survives_timestamp_and_string_dims(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = zorder_frame(ev, ["ts", "event_type"], bits=8, num_partitions=8)
    assert out.count() == ev.count()
    # equal event_type values share hash cells → each partition sees a
    # subset of types, not all of them
    per_part = (
        out.withColumn("__p", F.spark_partition_id())
        .groupBy("__p")
        .agg(F.countDistinct("event_type").alias("n"))
        .agg(F.avg("n"))
        .first()[0]
    )
    total = ev.select("event_type").distinct().count()
    assert per_part <= total
