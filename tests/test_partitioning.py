"""Partitioning independence: operator results must not depend on input
file layout (single split vs many) — the property that makes local
correctness transfer to a 1000-executor cluster."""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def docs_multi(spark, sf_dir, tmp_path_factory):
    """The documents table rewritten as many small files."""
    out = str(tmp_path_factory.mktemp("docs_multi") / "documents.parquet")
    spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        7
    ).write.mode("overwrite").parquet(out)
    return out


def _pairs(df):
    return sorted((r.id_a, r.id_b) for r in df.collect())


def test_minhash_lsh_pairs_layout_independent(spark, sf_dir, docs_multi):
    from sea_serpent_spark.operators import dedup as D

    single = spark.read.parquet(f"{sf_dir}/documents.parquet")
    multi = spark.read.parquet(docs_multi)
    p1 = _pairs(D.minhash_lsh_pairs(single, jaccard_threshold=0.5))
    p2 = _pairs(D.minhash_lsh_pairs(multi, jaccard_threshold=0.5))
    assert p1 == p2 and len(p1) > 0


def test_ngram_jaccard_layout_independent(spark, sf_dir, docs_multi):
    from sea_serpent_spark.operators import dedup as D

    single = spark.read.parquet(f"{sf_dir}/documents.parquet")
    multi = spark.read.parquet(docs_multi)
    p1 = _pairs(D.ngram_jaccard_pairs(single, threshold=0.8))
    p2 = _pairs(D.ngram_jaccard_pairs(multi, threshold=0.8))
    assert p1 == p2 and len(p1) > 0


def test_signatures_layout_independent(spark, sf_dir, docs_multi):
    from sea_serpent_spark.operators import dedup as D

    single = spark.read.parquet(f"{sf_dir}/documents.parquet")
    multi = spark.read.parquet(docs_multi)
    s1 = {(r.id, tuple(r.sig)) for r in D.minhash_signature(single).collect()}
    s2 = {(r.id, tuple(r.sig)) for r in D.minhash_signature(multi).collect()}
    assert s1 == s2
    h1 = {(r.id, r.sim) for r in D.simhash_signatures(single).collect()}
    h2 = {(r.id, r.sim) for r in D.simhash_signatures(multi).collect()}
    assert h1 == h2


def test_lsh_verify_shuffle_fallback(spark, sf_dir):
    """Above the broadcast size gate the verify joins must run as pure
    shuffle joins (the 100 TB fallback: billions of docs cannot be
    broadcast) — and produce identical pairs to the broadcast plan."""
    from sea_serpent_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    forced = _pairs(
        D.minhash_lsh_pairs(docs, jaccard_threshold=0.5, broadcast_verify=True)
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = D.minhash_lsh_pairs(
            docs, jaccard_threshold=0.5, broadcast_verify=False
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "broadcast" not in plan.lower()
        fallback = _pairs(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert fallback == forced and len(forced) > 0


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key join WITHOUT a shuffle
    exchange on either side — the persistent co-location contract that
    turns fact⋈fact equi-joins into per-bucket merges at scale."""
    from sea_serpent_spark.core.table import Table

    old_wh = spark.conf.get("spark.sql.warehouse.dir", None)
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_customer")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        Table.from_parquet(
            f"{sf_dir}/orders.parquet", "orders", spark
        ).to_catalog("bt_orders", mode="overwrite",
                     bucket_by="o_custkey", buckets=8, sort_by="o_custkey")
        Table.from_parquet(
            f"{sf_dir}/customer.parquet", "customer", spark
        ).to_catalog("bt_customer", mode="overwrite",
                     bucket_by="c_custkey", buckets=8, sort_by="c_custkey")
        j = spark.table("bt_orders").join(
            spark.table("bt_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # co-located result equals the plain shuffle join
        plain = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .join(
                spark.read.parquet(f"{sf_dir}/customer.parquet"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .count()
        )
        assert j.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_customer")


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    from sea_serpent_spark.core.table import Table

    t = Table.from_parquet(f"{sf_dir}/nation.parquet", "nation", spark)
    out = str(tmp_path / "nation_orc")
    t.to_orc(out, mode="overwrite")
    back = Table.from_orc(out, "nation", spark)
    assert sorted(r.n_nationkey for r in back.df.collect()) == sorted(
        r.n_nationkey for r in t.df.collect()
    )


def test_workload_query_layout_independent(spark, sf_dir, tmp_path_factory):
    """A relational query over a re-partitioned lineitem copy equals the
    single-file result (group-by totals are layout-invariant)."""
    out = str(tmp_path_factory.mktemp("li_multi") / "lineitem.parquet")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(
        11
    ).write.mode("overwrite").parquet(out)

    def agg(path):
        df = spark.read.parquet(path)
        return {
            tuple(r)
            for r in df.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("l_quantity"), 2).alias("q"),
            )
            .collect()
        }

    assert agg(f"{sf_dir}/lineitem.parquet") == agg(out)


def test_salted_pairs_bounds_hot_bucket(spark):
    """Skew stress: one LSH-style bucket holds 10% of the corpus. The
    k-way salted self-join must (a) enumerate exactly the right pairs
    and (b) split the hot bucket's B^2 work across sub-joins so no
    single task owns it — the property that survives a boilerplate
    bucket at 100 TB where an unsalted bucket join serializes the
    stage."""
    from sea_serpent_spark.operators.dedup import _salted_pairs

    n, hot = 2000, 200
    # bucket 'HOT' owns 10% of ids; everyone else is in tiny buckets
    rows = [
        (f"d{i:05d}", "HOT" if i < hot else f"b{i % 600}") for i in range(n)
    ]
    indexed = spark.createDataFrame(rows, "id string, bkey string")
    k = spark.sparkContext.defaultParallelism

    pairs = _salted_pairs(indexed, ["bkey"], distinct=False).collect()

    # (a) exactness: every unordered co-bucket pair exactly once
    from collections import Counter

    by_bucket = Counter(b for _, b in rows)
    expected = sum(c * (c - 1) // 2 for c in by_bucket.values())
    assert len(pairs) == expected
    assert len({(p.id_a, p.id_b) for p in pairs}) == expected

    # (b) boundedness: a pair lands in sub-join chunk t = max(c_a, c_b)
    # (the build row's chunk); reconstruct each pair's chunk with the
    # operator's own hash and assert the hot bucket's largest sub-join
    # carries ~B^2/k pairs, not B^2.
    chunk_df = spark.createDataFrame(
        [(i,) for i in {x for p in pairs for x in (p.id_a, p.id_b)}],
        "id string",
    ).select("id", F.pmod(F.hash("id"), F.lit(k)).alias("c"))
    cmap = {r.id: r.c for r in chunk_df.collect()}
    hot_ids = {f"d{i:05d}" for i in range(hot)}
    hot_total = hot * (hot - 1) // 2
    sub = Counter(
        max(cmap[p.id_a], cmap[p.id_b])
        for p in pairs
        if p.id_a in hot_ids  # hot-bucket pairs only
    )
    assert sum(sub.values()) == hot_total
    largest = max(sub.values())
    if k > 1:
        # largest sub-join (t = k-1) ideally carries
        # (1 - ((k-1)/k)^2) ≈ 2/k of the hot pairs; allow 2x hash slack
        assert largest <= 2 * (2 * hot_total // k)
        assert len(sub) == k  # every chunk got a share of the hot bucket
        assert largest < hot_total / 2  # no task owns the hot bucket
