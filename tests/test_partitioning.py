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
