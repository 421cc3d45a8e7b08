"""Core read-surface tests (SURVEY §2.1-2.2, §2.5)."""

import pyspark.sql.functions as F
import pytest

from sea_serpent_spark import Filter, Table


def test_attribute_column_promise(lineitem):
    col = lineitem.l_quantity
    assert col.name == "l_quantity"
    assert col.dtype == "double"


def test_unknown_column_raises(lineitem):
    with pytest.raises(AttributeError):
        lineitem.nope


def test_filter_project_limit(lineitem):
    t = lineitem.loc[lineitem.l_quantity >= 45, ["l_orderkey", "l_quantity"], 10]
    pdf = t.to_frame()
    assert len(pdf) == 10
    assert list(pdf.columns) == ["l_orderkey", "l_quantity"]
    assert (pdf["l_quantity"] >= 45).all()


def test_filter_pushdown_reaches_scan(lineitem):
    t = lineitem.loc[lineitem.l_quantity >= 45, ["l_orderkey", "l_quantity"]]
    plan = t.df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_quantity" in plan
    # column pruning: scan must not read all 12 columns
    assert "l_comment" not in plan


def test_compound_predicates(lineitem):
    f = (lineitem.l_quantity > 10) & (lineitem.l_discount <= 0.05)
    assert isinstance(f, Filter)
    pdf = lineitem.loc[f, ["l_quantity", "l_discount"]].to_frame()
    assert (pdf["l_quantity"] > 10).all()
    assert (pdf["l_discount"] <= 0.05).all()
    g = ~((lineitem.l_returnflag == "A") | (lineitem.l_returnflag == "R"))
    pdf2 = lineitem.loc[g, "l_returnflag"].to_frame()
    assert set(pdf2["l_returnflag"].unique()) <= {"N"}


def test_string_predicates(spark, sf_dir):
    part = Table.from_parquet(f"{sf_dir}/part.parquet", "part", spark)
    got = part.loc[part.p_name.contains("a"), "p_name"].to_frame()
    assert got["p_name"].str.contains("a").all()
    got2 = part.loc[part.p_type.startswith("S"), "p_type"].to_frame()
    assert got2["p_type"].str.startswith("S").all()


def test_isin_small_and_large(lineitem):
    small = lineitem.loc[lineitem.l_returnflag.isin(["A", "R"]), "l_returnflag"]
    assert set(small.to_frame()["l_returnflag"]) <= {"A", "R"}
    # force the semi-join path
    import sea_serpent_spark.core.column as colmod

    old = colmod.ISIN_LITERAL_CAP
    colmod.ISIN_LITERAL_CAP = 1
    try:
        big = lineitem.loc[lineitem.l_returnflag.isin(["A", "R"]), "l_returnflag"]
        assert set(big.to_frame()["l_returnflag"]) <= {"A", "R"}
    finally:
        colmod.ISIN_LITERAL_CAP = old


def test_scalar_isin_degrades_to_eq(lineitem):
    f = lineitem.l_returnflag.isin("A")
    pdf = lineitem.loc[f, "l_returnflag"].to_frame()
    assert set(pdf["l_returnflag"]) == {"A"}


def test_existence_probe(lineitem):
    assert "A" in lineitem.l_returnflag
    assert "ZZZ" not in lineitem.l_returnflag


def test_unique_and_value_counts(lineitem):
    u = set(lineitem.l_returnflag.unique())
    assert u == {"A", "N", "R"}
    vc = lineitem.l_returnflag.value_counts()
    assert vc.sum() == len(lineitem)
    assert vc.index[0] == "N"  # most frequent
    norm = lineitem.l_returnflag.value_counts(normalize=True)
    assert abs(norm.sum() - 1.0) < 1e-9
    assert norm.name == "proportion"
    asc = lineitem.l_returnflag.value_counts(ascending=True)
    assert list(asc.values) == sorted(vc.values)
    unsorted = lineitem.l_returnflag.value_counts(sort=False)
    assert set(unsorted.index) == {"A", "N", "R"}


def test_shape_len(lineitem):
    n, c = lineitem.shape
    assert n == 6000 and c == 11
    assert len(lineitem.l_orderkey) == 6000


def test_head_sorted(lineitem):
    pdf = lineitem.sort(["l_orderkey", "l_linenumber"]).limit(5).to_frame()
    assert len(pdf) == 5


def test_getitem_projection(lineitem):
    t = lineitem[["l_orderkey", "l_quantity"]]
    assert t.columns == ["l_orderkey", "l_quantity"]


def test_column_slice_projection(lineitem):
    t = lineitem["l_orderkey":"l_suppkey"]
    assert t.columns == ["l_orderkey", "l_partkey", "l_suppkey"]


def test_query_passthrough_auto_from(lineitem):
    out = lineitem.query("SELECT COUNT(*) AS n")
    assert out.to_frame(row_id_index=False)["n"][0] == 6000


def test_query_comma_limit(lineitem):
    out = lineitem.query(
        "SELECT l_orderkey FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 5, 3"
    )
    full = lineitem.query(
        "SELECT l_orderkey FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 8"
    )
    assert (
        out.to_frame(row_id_index=False)["l_orderkey"].tolist()
        == full.to_frame(row_id_index=False)["l_orderkey"].tolist()[5:]
    )


def test_slice_and_mask_require_order(lineitem):
    with pytest.raises(ValueError):
        lineitem.slice(0, 5)


def test_slice_with_order(spark, sf_dir):
    nation = Table.from_parquet(
        f"{sf_dir}/nation.parquet", "nation", spark, order_col="n_nationkey"
    )
    pdf = nation.slice(2, 6).to_frame()
    assert pdf["n_nationkey"].tolist() == [2, 3, 4, 5]
    # negative indices
    pdf2 = nation.slice(-3, None).to_frame()
    assert pdf2["n_nationkey"].tolist() == [22, 23, 24]
    # step
    pdf3 = nation.slice(0, 10, 3).to_frame()
    assert pdf3["n_nationkey"].tolist() == [0, 3, 6, 9]


def test_boolean_mask(spark, sf_dir):
    nation = Table.from_parquet(
        f"{sf_dir}/nation.parquet", "nation", spark, order_col="n_nationkey"
    )
    mask = [i % 2 == 0 for i in range(25)]
    pdf = nation.loc[mask, "n_nationkey"].to_frame()
    assert pdf["n_nationkey"].tolist() == list(range(0, 25, 2))


def test_column_map_dict(spark, sf_dir):
    nation = Table.from_parquet(f"{sf_dir}/nation.parquet", "nation", spark)
    mapped = nation.n_name.map({"NATION_0": "N0"})
    pdf = nation.df.select(mapped).toPandas()
    assert "N0" in set(pdf["n_name"].dropna())


def test_column_astype(lineitem):
    cast = lineitem.l_quantity.astype("int")
    pdf = lineitem.df.select(cast).limit(5).toPandas()
    assert str(pdf["l_quantity"].dtype).startswith("int")


def test_isnull_empty_str_semantics(spark):
    pdf_df = spark.createDataFrame(
        [("a", "x"), ("b", ""), ("c", None)], ["k", "v"]
    )
    t = Table(pdf_df, "tnull", spark)
    nulls = t.loc[t.v.isnull(), "k"].to_frame()
    assert set(nulls["k"]) == {"b", "c"}
    notnulls = t.loc[t.v.notnull(), "k"].to_frame()
    assert set(notnulls["k"]) == {"a"}
    strict = t.loc[t.v.isnull(empty_str=False), "k"].to_frame()
    assert set(strict["k"]) == {"c"}


def test_source_sink_roundtrips(spark, sf_dir, tmp_path):
    from sea_serpent_spark import Table

    t = Table.from_parquet(f"{sf_dir}/nation.parquet", "nation")
    # parquet sink (partitioned) → parquet source
    t.to_parquet(str(tmp_path / "n_pq"), partition_by="n_regionkey")
    back = Table.from_parquet(str(tmp_path / "n_pq"), "nation2")
    assert back.count() == t.count()
    assert sorted(back.columns) == sorted(t.columns)
    # csv round-trip
    t.df.write.option("header", True).csv(str(tmp_path / "n_csv"))
    csvt = Table.from_csv(str(tmp_path / "n_csv"), "nation_csv")
    assert csvt.count() == t.count()
    # json round-trip
    t.df.write.json(str(tmp_path / "n_json"))
    jt = Table.from_json(str(tmp_path / "n_json"), "nation_json")
    assert jt.count() == t.count()
    # catalog sink/source
    spark.sql("DROP TABLE IF EXISTS nation_cat")
    t.to_catalog("nation_cat")
    ct = Table.from_catalog("nation_cat", spark)
    assert ct.count() == t.count()
    assert ct.loc[ct.n_nationkey == 3, ["n_name"]].to_frame(
        row_id_index=False
    )["n_name"].tolist() == ["NATION_3"]
    spark.sql("DROP TABLE IF EXISTS nation_cat")


def test_iloc_positional(spark, tmp_path):
    import pandas as pd

    from sea_serpent_spark import Base

    base = Base(str(tmp_path / "wh_iloc"), spark)
    t = base.from_frame(
        pd.DataFrame({"v": list(range(10)), "w": list("abcdefghij")}), "t"
    )
    t = base.table("t")
    # slice
    assert t.iloc[2:5].to_frame(row_id_index=False)["v"].tolist() == [2, 3, 4]
    # step applied like the reference's client-side step
    assert t.iloc[0:8:3].to_frame(row_id_index=False)["v"].tolist() == [0, 3, 6]
    # single position + column selection
    assert t.iloc[4, "w"].to_frame(row_id_index=False)["w"].tolist() == ["e"]
    # negative start resolves against COUNT(*)
    assert t.iloc[-3:].to_frame(row_id_index=False)["v"].tolist() == [7, 8, 9]


def test_map_callable_pandas_udf(spark, sf_dir):
    from sea_serpent_spark import Table

    nation = Table.from_parquet(f"{sf_dir}/nation.parquet", "nation")
    # arbitrary Python fn → Arrow-batched pandas UDF, typed result
    doubled = nation.df.select(
        "n_nationkey",
        nation.n_nationkey.map(lambda k: k * 2 + 1, returns="long").alias("m"),
    )
    got = {(r.n_nationkey, r.m) for r in doubled.collect()}
    assert got == {(k, k * 2 + 1) for k in range(25)}
    # string fn
    tagged = nation.df.select(
        nation.n_name.map(lambda s: s.lower()).alias("n_name")
    )
    assert tagged.where("n_name = 'nation_3'").count() == 1


def test_describe_and_sample(lineitem):
    d = lineitem.describe(["l_quantity", "l_returnflag"])
    assert list(d.index) == ["l_quantity", "l_returnflag"]
    assert d.loc["l_quantity", "n"] == 6000
    assert d.loc["l_quantity", "min"] == 1.0
    assert d.loc["l_returnflag", "avg_len"] == 1.0
    s = lineitem.sample(0.1, seed=7)
    n = len(s)
    assert 300 < n < 900  # ~600 expected


def test_merge_pandas_style(spark, sf_dir):
    o = Table.from_parquet(f"{sf_dir}/orders.parquet", "orders", spark)
    c = Table.from_parquet(f"{sf_dir}/customer.parquet", "customer", spark)
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey", how="left",
                broadcast=True)
    assert m.count() == o.count()
    assert "c_name" in m.columns
    inner = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    assert inner.count() <= o.count()
    # suffix handling on overlapping columns
    o2 = o.merge(o, on="o_orderkey")
    assert "o_totalprice_y" in o2.columns


def test_merge_condition_join_key_collision(spark):
    """left_on/right_on where the right key shares a name with a left
    column: the right key must be suffixed (condition joins keep both
    key columns), leaving no ambiguous duplicate names."""
    l = Table(
        spark.createDataFrame([(1, "x"), (2, "y")], ["k", "lv"]), "l", spark
    )
    r = Table(
        spark.createDataFrame([(1, "A"), (3, "B")], ["k", "rv"]), "r", spark
    )
    m = l.merge(r, left_on="k", right_on="k", how="left")
    assert sorted(m.columns) == ["k", "k_y", "lv", "rv"]
    got = {r2["k"]: (r2["k_y"], r2["rv"]) for r2 in m.df.collect()}
    assert got == {1: (1, "A"), 2: (None, None)}
    # every column individually selectable (no ambiguity)
    m.df.select("k", "k_y").collect()


def test_dropna_fillna_empty_str_duality(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "", 2.0), (3, None, None)], ["k", "s", "v"]
    )
    t = Table(df, "tna", spark)
    assert t.dropna().count() == 1            # '' counts as missing
    assert t.dropna(subset=["v"]).count() == 2
    assert t.dropna(how="all").count() == 3   # no all-missing row
    filled = t.fillna("x", subset=["s"])
    got = {r.k: r.s for r in filled.df.collect()}
    assert got == {1: "a", 2: "x", 3: "x"}


def test_column_quantile_median_fillna(lineitem):
    med = lineitem.l_quantity.median()
    lo, hi = lineitem.l_quantity.quantile([0.1, 0.9])
    assert lo <= med <= hi
    assert 1.0 <= med <= 50.0
    filled = lineitem.df.select(lineitem.l_comment.fillna("?")) \
        if "l_comment" in lineitem.columns else None


def test_table_split_sample_dedup_conveniences(spark, sf_dir):
    """Table-level delegates for the curation ops (split / stratified /
    dedup) return Tables and match the operator outputs."""
    from sea_serpent_spark import Table

    docs = Table.from_parquet(f"{sf_dir}/documents.parquet", "documents",
                              spark)
    s = docs.split("doc_id")
    assert "split" in s.columns
    assert set(
        r["split"] for r in s.df.select("split").distinct().collect()
    ) <= {"train", "val", "test"}
    assert s.count() == docs.count()

    ev = Table.from_parquet(f"{sf_dir}/events.parquet", "events", spark)
    samp = ev.stratified_sample("event_type", 0.1, "event_id")
    assert 0 < samp.count() < ev.count()

    kept = docs.dedup(method="exact")
    n_content = docs.df.selectExpr("count(distinct text)").collect()[0][0]
    assert kept.count() == n_content


def test_table_text_curation_conveniences(spark, sf_dir):
    """Table-level delegates for clean_text / repetition_metrics /
    quality_filter / pack_shards."""
    from sea_serpent_spark import Table

    docs = Table.from_parquet(f"{sf_dir}/documents.parquet", "documents",
                              spark, order_col="doc_id")
    cleaned = docs.clean_text()
    assert cleaned.columns == docs.columns
    assert cleaned.count() == docs.count()

    m = docs.repetition_metrics()
    assert "dup_2gram_frac" in m.columns and "top_2gram_frac" in m.columns

    # synthetic docs are short: everything dies on min_tokens=50,
    # everything survives at min_tokens=1 with repetition rules off
    assert docs.quality_filter(min_tokens=50).count() < docs.count()
    assert docs.quality_filter(min_tokens=0, rules={}).count() == docs.count()

    packed = docs.pack_shards("n_chars", budget=5000)
    assert "shard" in packed.columns
    shards = sorted(
        r["shard"] for r in packed.df.select("shard").distinct().collect()
    )
    assert shards == list(range(len(shards)))


def test_table_chunk_cap_mix_conveniences(spark, sf_dir):
    from sea_serpent_spark import Table

    docs = Table.from_parquet(f"{sf_dir}/documents.parquet", "documents",
                              spark, order_col="doc_id")
    ch = docs.chunk(chunk_tokens=16, overlap=4)
    assert set(ch.columns) == {"doc_id", "chunk_id", "chunk_text",
                               "n_chunk_tokens"}
    assert ch.count() >= docs.count()

    capped = docs.cap_per_group("source", 5, "doc_id")
    assert capped.df.groupBy("source").count().agg(
        {"count": "max"}).collect()[0][0] <= 5

    srcs = [r["source"] for r in
            docs.df.select("source").distinct().limit(1).collect()]
    mixed = docs.mix("source", {srcs[0]: 0.5}, "doc_id")
    assert 0 < mixed.count() < docs.count()


def test_json_csv_roundtrip(spark, sf_dir, tmp_path):
    from sea_serpent_spark import Table

    nat = Table.from_parquet(f"{sf_dir}/nation.parquet", "nation", spark)
    jp, cp = str(tmp_path / "nat_json"), str(tmp_path / "nat_csv")
    nat.to_json(jp)
    nat.to_csv(cp)

    back_j = Table.from_json(
        jp, "nation", spark,
        schema="n_nationkey long, n_name string, n_regionkey long, "
               "n_comment string")
    assert back_j.count() == nat.count()
    assert sorted(map(tuple, back_j.df.select(*nat.columns).collect())) == \
        sorted(map(tuple, nat.df.collect()))

    back_c = Table.from_csv(
        cp, "nation", spark,
        schema="n_nationkey long, n_name string, n_regionkey long, "
               "n_comment string")
    assert back_c.count() == nat.count()
    assert sorted(
        r["n_name"] for r in back_c.df.collect()
    ) == sorted(r["n_name"] for r in nat.df.collect())


def test_write_shards_layout(spark, sf_dir, tmp_path):
    import os

    from sea_serpent_spark import Table

    docs = Table.from_parquet(f"{sf_dir}/documents.parquet", "documents",
                              spark, order_col="doc_id")
    packed = docs.pack_shards("n_chars", budget=20_000)
    out = str(tmp_path / "shards")
    packed.write_shards(out)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    n_shards = packed.df.select("shard").distinct().count()
    assert len(dirs) == n_shards
    # round-trip: partition column comes back, all rows survive
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # one file set per shard dir (repartition-by-key, no writer fanout)
    for d in dirs:
        files = [f for f in os.listdir(f"{out}/{d}")
                 if f.endswith(".parquet")]
        assert len(files) == 1
    # manifest: per-shard row+token counts match the data
    import json
    man = json.load(open(f"{out}/_manifest.json"))
    assert man["n_shards"] == n_shards
    assert sum(s["rows"] for s in man["shards"].values()) == docs.count()

    out2 = str(tmp_path / "shards_tok")
    packed.write_shards(out2, token_col="n_chars")
    man2 = json.load(open(f"{out2}/_manifest.json"))
    total = docs.df.agg({"n_chars": "sum"}).collect()[0][0]
    assert sum(s["tokens"] for s in man2["shards"].values()) == total


def test_map_batches(spark, sf_dir):
    from sea_serpent_spark import Table

    nat = Table.from_parquet(f"{sf_dir}/nation.parquet", "nation", spark)

    def double_key(batches):
        for b in batches:
            b = b[["n_nationkey"]].copy()
            b["doubled"] = b["n_nationkey"] * 2
            yield b

    out = nat.map_batches(double_key, "n_nationkey long, doubled long")
    rows = {r["n_nationkey"]: r["doubled"] for r in out.df.collect()}
    assert rows == {k: 2 * k for k in rows}
    assert len(rows) == nat.count()


def test_groupby_pivot_conveniences(spark, sf_dir):
    import duckdb

    from sea_serpent_spark import Table

    o = Table.from_parquet(f"{sf_dir}/orders.parquet", "orders", spark)
    g = o.groupby("o_orderpriority",
                  {"o_totalprice": ["sum", "max"], "o_orderkey": "count"})
    got = {
        r["o_orderpriority"]: (round(r["o_totalprice_sum"], 2),
                               r["o_totalprice_max"], r["o_orderkey_count"])
        for r in g.df.collect()
    }
    con = duckdb.connect()
    con.sql(f"CREATE VIEW o AS SELECT * FROM '{sf_dir}/orders.parquet'")
    want = {
        r[0]: (round(r[1], 2), r[2], r[3])
        for r in con.sql(
            "SELECT o_orderpriority, SUM(o_totalprice), MAX(o_totalprice), "
            "COUNT(o_orderkey) FROM o GROUP BY 1").fetchall()
    }
    assert got == want

    with pytest.raises(ValueError):
        o.groupby("o_orderpriority", {"o_totalprice": "median"})

    p = o.pivot("o_orderpriority", "o_orderstatus", "o_totalprice",
                aggfunc="count")
    pdf = p.to_frame().set_index("o_orderpriority")
    want_n = con.sql(
        "SELECT COUNT(*) FROM o WHERE o_orderstatus='F' "
        "AND o_orderpriority='1-URGENT'").fetchall()[0][0]
    assert pdf.loc["1-URGENT", "F"] == want_n
    # explicit pivot domain skips the discovery pass
    p2 = o.pivot("o_orderpriority", "o_orderstatus", "o_totalprice",
                 aggfunc="count", pivot_values=["F", "O", "P"])
    assert set(p2.columns) == {"o_orderpriority", "F", "O", "P"}


def test_table_semantic_dedup_convenience(spark, sf_dir):
    """Table-level delegate for operators/similarity.semantic_dedup."""
    emb = Table.from_parquet(f"{sf_dir}/embeddings.parquet", "embeddings",
                             spark)
    kept = emb.semantic_dedup(k=4, threshold=0.45, keep="min_id")
    assert set(kept.columns) == set(emb.columns)
    assert 0 < kept.count() <= emb.count()


def test_table_incremental_dedup_conveniences(spark, sf_dir):
    """Table-level build_dedup_index / dedup_against delegates."""
    docs = Table.from_parquet(f"{sf_dir}/documents.parquet", "documents",
                              spark)
    old = docs.loc[docs.doc_id < 250]
    new = docs.loc[docs.doc_id >= 250]
    idx = old.build_dedup_index()
    assert {"id", "band", "key", "sig"} <= set(idx.columns)
    kept = new.dedup_against(idx, jaccard_threshold=0.5)
    assert 0 < kept.count() < new.count()

    seen = old.build_dedup_index(method="exact")
    kept2 = new.dedup_against(seen, method="exact")
    assert 0 < kept2.count() <= new.count()


def test_table_temperature_and_skew_conveniences(spark, sf_dir):
    """Table-level delegates for temperature_mix and skew_report."""
    docs = Table.from_parquet(f"{sf_dir}/documents.parquet", "documents",
                              spark)
    out = docs.temperature_mix("source", "doc_id", alpha=0.5)
    assert 0 < out.count() <= docs.count()

    rep = docs.skew_report(["lang"], top=3)
    rows = rep.df.collect()
    assert 0 < len(rows) <= 3
    assert {"key", "n", "share", "cum_share", "rank"} <= set(rep.columns)


def test_table_strip_duplicate_spans_convenience(spark, sf_dir):
    """Table-level delegate for operators/spans.strip_duplicate_spans."""
    docs = Table.from_parquet(f"{sf_dir}/documents.parquet", "documents",
                              spark)
    out = docs.strip_duplicate_spans(span_tokens=8)
    assert out.count() == docs.count()        # removal, not row dropping
    assert set(out.columns) == set(docs.columns)


def test_table_fuzzy_pairs_convenience(spark, sf_dir):
    """Table-level delegate for operators/fuzzy.edit_distance_pairs."""
    sup = Table.from_parquet(f"{sf_dir}/supplier.parquet", "supplier",
                             spark)
    pairs = sup.fuzzy_pairs("s_name", "s_suppkey", max_distance=2)
    assert set(pairs.columns) == {"id_a", "id_b", "distance"}
    assert pairs.count() > 0


def test_table_ann_topk_convenience(spark, sf_dir):
    """Table-level ANN dispatcher: all four methods produce ranked
    neighbor lists; brute is exact, the rest return valid subsets."""
    emb = Table.from_parquet(f"{sf_dir}/embeddings.parquet", "embeddings",
                             spark)
    q = emb.df.where("vec_id < 3")
    brute = emb.ann_topk(q, k=3, method="brute")
    assert brute.count() == 9
    assert set(brute.columns) == {"query_id", "neighbor_id", "rank"}
    for m in ("lsh", "ivf", "pq"):
        out = emb.ann_topk(q, k=3, method=m, n_clusters=4)
        rows = out.df.collect()
        assert 0 < len(rows) <= 9, m
        assert all(1 <= r["rank"] <= 3 for r in rows), m
    with pytest.raises(ValueError):
        emb.ann_topk(q, method="nope")


def test_table_profile_conveniences(spark, sf_dir):
    """Table-level delegates for profile and corpus_profile."""
    docs = Table.from_parquet(f"{sf_dir}/documents.parquet", "documents",
                              spark)
    prof = docs.profile(["doc_id", "text", "n_chars"])
    rows = {r["column"]: r for r in prof.df.collect()}
    assert set(rows) == {"doc_id", "text", "n_chars"}
    assert rows["doc_id"]["null_frac"] == 0.0

    cp = docs.corpus_profile(lang_col="lang")
    assert cp["n_docs"] == docs.count()
    assert cp["vocab"] > 0 and cp["top_tokens"]
    assert set(cp["langs"]) >= {"en"}


def test_table_temporal_and_decontaminate_conveniences(spark, sf_dir):
    """Table-level delegates for asof_join / range_join / decontaminate."""
    import pyspark.sql.functions as F

    from sea_serpent_spark.workload import df as _wl_df

    evdf = _wl_df(spark, sf_dir, "events")
    ev = Table(evdf, "events", spark)
    pts = Table(
        evdf.select("user_id", "ts").limit(50), "pts", spark
    )
    joined = pts.asof_join(ev.select(["user_id", "ts", "event_type"]),
                           on="ts", by="user_id")
    assert joined.count() == 50
    assert "event_type_r" in joined.columns or "event_type" in joined.columns

    iv = Table(
        evdf.select(
            F.col("ts").alias("start"),
            (F.col("ts") + F.expr("INTERVAL 30 minutes")).alias("end"),
        ).limit(20),
        "iv", spark,
    )
    rj = pts.range_join(iv, "ts", "start", "end")
    assert rj.count() >= 0  # shape check; semantics pinned in test_temporal

    docs = Table.from_parquet(f"{sf_dir}/documents.parquet", "documents",
                              spark)
    ref = Table(docs.df.limit(10), "ref", spark)
    clean = docs.decontaminate(ref)
    assert clean.count() < docs.count()


def test_map_batches_batch_size_rechunks(spark):
    """batch_size bounds the frames fn sees without touching the session
    Arrow conf (review finding: the old conf-set leaked session-wide and
    a set-and-restore would have been an execution-time no-op)."""
    df = spark.range(1000).selectExpr("id", "id AS v").coalesce(1)
    t = Table(df, "chunks", spark)
    before = spark.conf.get(
        "spark.sql.execution.arrow.maxRecordsPerBatch", None
    )

    def fn(it):
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame({"n": [len(pdf)]})

    sizes = [
        r["n"]
        for r in t.map_batches(fn, "n long", batch_size=128).df.collect()
    ]
    assert max(sizes) <= 128 and sum(sizes) == 1000
    after = spark.conf.get(
        "spark.sql.execution.arrow.maxRecordsPerBatch", None
    )
    assert before == after


def test_ambiguous_filter_raises_actionable_error(spark, sf_dir):
    """A Filter applied in a frame with duplicate column names (raw-df
    mixing) fails with the documented contract + fix, not Spark's bare
    AMBIGUOUS_REFERENCE dump. (The restriction is the deliberate trade
    for version-pinned stats pruning — core/column.py expr.)"""
    import pytest

    from sea_serpent_spark import Table

    n = Table.from_parquet(f"{sf_dir}/nation.parquet", "nation")
    joined = n.df.alias("a").join(
        n.df.alias("b"),
        F.col("a.n_regionkey") == F.col("b.n_regionkey"),
    )
    t = Table(joined, name="selfjoin", spark=spark)
    with pytest.raises(ValueError, match="duplicate names"):
        t.filter(n.n_nationkey > 3).df.collect()
    # the same predicate through its OWN table's verbs keeps working
    assert n.filter(n.n_nationkey > 3).df.count() > 0


def test_ambiguous_filter_resolves_via_bound_source(spark, sf_dir):
    """r12 (r10 verdict item): mixing a table's frame with a RAW df that
    happens to share a column name no longer errors — the Filter's
    bound twin (captured off its source table's plan) resolves the
    name to the right side. A true self-join stays ambiguous in both
    modes and keeps the actionable error (previous test)."""
    from sea_serpent_spark import Table

    n = Table.from_parquet(f"{sf_dir}/nation.parquet", "nation")
    other = spark.range(5).select(
        F.col("id").alias("n_regionkey"),
        F.col("id").alias("n_nationkey"),  # same-named foreign column
    )
    mixed = Table(
        n.df.join(other, n.df["n_regionkey"] == other["n_regionkey"]),
        name="mixed", spark=spark,
    )
    flt = n.n_nationkey > 3
    got = mixed.filter(flt).df
    # resolved against the NATION side: every surviving left key > 3
    keys = [r[0] for r in got.select(n.df["n_nationkey"]).collect()]
    assert keys and all(k > 3 for k in keys)
    # compound predicates carry the bound twin through composition
    both = (n.n_nationkey > 3) & (n.n_name != "nope")
    assert mixed.filter(both).df.count() == len(keys)
    # negation too
    neg = ~(n.n_nationkey > 3)
    assert (
        mixed.filter(neg).df.count() + len(keys) == mixed.df.count()
    )
