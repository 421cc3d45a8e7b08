"""Curation operator tests: PII redaction, repetition filters, shard
packing — cross-checked against brute-force Python / DuckDB oracles."""

import duckdb
import pyspark.sql.functions as F
import pytest

from sea_serpent_spark.operators import curation as C


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        (1, "contact me at jane.doe+spam@example.co.uk for details"),
        (2, "call 555-867-5309 or +1 (212) 555-0199 now"),
        (3, "server at 192.168.1.254 port 8080"),
        (4, "ssn 123-45-6789 card 4111 1111 1111 1111 ok"),
        (5, "no pii here just words"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, ["id", "text"])


def test_redact_pii(pii_df):
    out = dict(
        pii_df.select(
            "id", C.redact_pii(F.col("text")).alias("t")
        ).collect()
    )
    assert out[1] == "contact me at <EMAIL> for details"
    assert "<PHONE>" in out[2] and "555" not in out[2]
    assert out[3] == "server at <IP> port 8080"
    assert "<SSN>" in out[4] and "<CARD>" in out[4]
    assert "6789" not in out[4] and "4111" not in out[4]
    assert out[5] == "no pii here just words"
    assert out[6] == ""


def test_redact_pii_subset(pii_df):
    out = dict(
        pii_df.select(
            "id", C.redact_pii(F.col("text"), kinds=["email"]).alias("t")
        ).collect()
    )
    assert "<EMAIL>" in out[1]
    assert "555-867-5309" in out[2]  # phone untouched


def test_normalize_text(spark):
    rows = [(1, "  a\tb   c\x07d\n\n\n\n\ne  ")]
    out = spark.createDataFrame(rows, ["id", "text"]).select(
        C.normalize_text(F.col("text")).alias("t")
    ).collect()[0]["t"]
    assert out == "a b cd\n\ne"


@pytest.fixture(scope="module")
def rep_df(spark):
    rows = [
        # clean prose: no repeated lines/ngrams
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        # heavy word repetition: "spam" 8/10 tokens
        (2, "spam spam spam spam spam spam spam spam ham eggs"),
        # duplicated lines (nav-bar boilerplate shape)
        (3, "home | about\ncontent line one\nhome | about\nhome | about"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, ["id", "text"])


def test_repetition_metrics(rep_df):
    m = {
        r["id"]: r.asDict()
        for r in C.repetition_metrics(rep_df).collect()
    }
    assert m[1]["dup_word_frac"] == 0.0
    assert m[1]["dup_2gram_frac"] == 0.0
    # 10 tokens, 3 distinct → dup = 1 - 3/10
    assert m[2]["dup_word_frac"] == 0.7
    # "spam spam" covers 7 of 9 2-gram slots
    assert m[2]["top_2gram_frac"] == round(7 / 9, 4)
    # 4 non-empty lines, 2 distinct
    assert m[3]["dup_line_frac"] == 0.5
    assert m[4]["dup_word_frac"] == 0.0
    assert m[4]["mean_word_len"] == 0.0


def test_repetition_metrics_python_oracle(spark, sf_dir):
    """Cross-check dup fractions on real documents against pure Python."""
    import decimal

    def r4(x):  # HALF_UP like Spark's F.round (python round is banker's)
        return float(
            decimal.Decimal(repr(x)).quantize(
                decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    got = {
        r["doc_id"]: r
        for r in C.repetition_metrics(d).collect()
    }
    for r in d.collect():
        toks = r["text"].strip().lower().split() if r["text"] else []
        toks = [t for t in toks if t]
        g2 = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        want_w = 0.0 if not toks else 1 - len(set(toks)) / len(toks)
        want_2 = 0.0 if not g2 else 1 - len(set(g2)) / len(g2)
        want_top = (
            0.0 if not g2
            else max(g2.count(g) for g in set(g2)) / len(g2)
        )
        assert got[r["doc_id"]]["dup_word_frac"] == r4(want_w)
        assert got[r["doc_id"]]["dup_2gram_frac"] == r4(want_2)
        assert got[r["doc_id"]]["top_2gram_frac"] == r4(want_top)


def test_gopher_filter(spark):
    long_clean = " ".join(f"tok{i}word" for i in range(60))
    long_repeat = " ".join(["spam maps"] * 30)
    rows = [
        (1, long_clean),          # survives
        (2, long_repeat),         # killed: dup/top 2-gram fracs
        (3, "too short"),         # killed: min_tokens
        (4, long_clean + " !!! ### $$$ " + " ".join(["%"] * 20)),  # symbols
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    kept = {r["id"] for r in C.gopher_filter(df).collect()}
    assert kept == {1}
    audit = C.gopher_filter(df, keep_metrics=True)
    assert "dup_2gram_frac" in audit.columns


def test_pack_shards_matches_global_window(spark, sf_dir):
    """Distributed packing == the single-window SQL oracle, and shard
    sizes respect the budget (each shard starts before the boundary)."""
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "n_chars")
    )
    out = C.pack_shards(d, "n_chars", budget=5000, order_col="doc_id")
    got = {r["doc_id"]: r["shard"] for r in out.collect()}

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW d AS SELECT doc_id, n_chars FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    want = dict(
        con.sql(
            "SELECT doc_id, CAST(FLOOR((SUM(n_chars) OVER "
            "(ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_chars) "
            "/ 5000.0) AS BIGINT) FROM d"
        ).fetchall()
    )
    assert got == want
    # shards are contiguous in doc order and non-empty
    shards = sorted(set(got.values()))
    assert shards == list(range(len(shards)))


def test_pack_shards_stable_after_materialization(spark):
    """The shard assignment must not drift when the result is consumed
    twice (the range-exchange re-sample hazard pack_shards checkpoints
    away)."""
    rows = [(i, 10 + (i % 7)) for i in range(500)]
    d = spark.createDataFrame(rows, ["id", "toks"]).repartition(8)
    out = C.pack_shards(d, "toks", budget=100, order_col="id")
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, out.collect()))
    assert a == b


def test_chunk_documents_duckdb_oracle(spark, sf_dir):
    """Chunk boundaries and text match the window-arithmetic SQL oracle."""
    from sea_serpent_spark.operators.curation import chunk_documents

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = chunk_documents(d, chunk_tokens=16, overlap=4)
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_chunk_tokens"])
        for r in out.collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW d AS SELECT doc_id, "
        f"regexp_split_to_array(lower(trim(text)), '\\s+') AS toks "
        f"FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        map(
            tuple,
            con.sql(
                """
    WITH n AS (SELECT doc_id, toks, len(toks) AS n FROM d),
    k AS (SELECT doc_id, toks,
          unnest(generate_series(0,
            GREATEST(CAST(CEIL(GREATEST(n - 4, 1) / 12.0) AS BIGINT) - 1,
                     0))) AS k
          FROM n)
    SELECT doc_id, CAST(k AS INT) AS chunk_id,
      array_to_string(toks[k * 12 + 1 : k * 12 + 16], ' ') AS chunk_text,
      CAST(len(toks[k * 12 + 1 : k * 12 + 16]) AS INT) AS n
    FROM k
    """
            ).fetchall(),
        )
    )
    assert got == want
    # overlap property: consecutive chunks share exactly `overlap` tokens
    by_doc = {}
    for doc, cid, txt, _ in got:
        by_doc.setdefault(doc, []).append((cid, txt.split()))
    for doc, chunks in by_doc.items():
        chunks.sort()
        for (_, a), (_, b) in zip(chunks, chunks[1:]):
            assert a[12:] == b[: len(a[12:])]


def test_chunk_documents_single_chunk_and_validation(spark):
    from sea_serpent_spark.operators.curation import chunk_documents

    d = spark.createDataFrame(
        [(1, "only three tokens"), (2, "")], ["doc_id", "text"]
    )
    out = chunk_documents(d, chunk_tokens=8, overlap=2).collect()
    assert {(r["doc_id"], r["chunk_id"]) for r in out} == {(1, 0), (2, 0)}
    with pytest.raises(ValueError):
        chunk_documents(d, chunk_tokens=8, overlap=8)


def test_cap_and_mix(spark, sf_dir):
    from sea_serpent_spark.operators.sampling import (
        cap_per_group, hash_bucket, mix_corpora)

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    capped = cap_per_group(d, "source", 10, "doc_id")
    per = capped.groupBy("source").count().collect()
    assert all(r["count"] <= 10 for r in per)
    # deterministic: same ids on re-run
    a = {r["doc_id"] for r in capped.collect()}
    b = {r["doc_id"] for r in cap_per_group(d, "source", 10, "doc_id").collect()}
    assert a == b

    srcs = [r["source"] for r in d.select("source").distinct().collect()]
    rates = {srcs[0]: 1.0, srcs[1]: 0.3}
    mixed = mix_corpora(d, "source", rates, "doc_id")
    n_all = d.where(F.col("source") == srcs[0]).count()
    assert mixed.where(F.col("source") == srcs[0]).count() == n_all
    n1 = d.where(F.col("source") == srcs[1]).count()
    k1 = mixed.where(F.col("source") == srcs[1]).count()
    assert 0 < k1 < n1
    # unknown sources drop by default
    assert mixed.select("source").distinct().count() == 2
    # monotone: raising a rate only ADDS rows
    more = mix_corpora(d, "source", {srcs[0]: 1.0, srcs[1]: 0.6}, "doc_id")
    kept_03 = {r["doc_id"] for r in mixed.collect()}
    kept_06 = {r["doc_id"] for r in more.collect()}
    assert kept_03 <= kept_06


def test_epoch_key_reshuffles(spark, sf_dir):
    from sea_serpent_spark.operators.sampling import epoch_key

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    o0 = [r["doc_id"] for r in
          d.orderBy(epoch_key("doc_id", 0), "doc_id").collect()]
    o0b = [r["doc_id"] for r in
           d.orderBy(epoch_key("doc_id", 0), "doc_id").collect()]
    o1 = [r["doc_id"] for r in
          d.orderBy(epoch_key("doc_id", 1), "doc_id").collect()]
    assert o0 == o0b          # reproducible within an epoch
    assert o0 != o1           # different across epochs
    assert sorted(o0) == sorted(o1)


def test_temperature_rates_math(spark):
    """Rates follow the n^α law exactly: α=1 → natural distribution
    (all rates 1, nothing resampled); α<1 → smallest source keeps 100%
    and rates decrease with size; target_rows sizes the output."""
    from sea_serpent_spark.operators.sampling import temperature_rates

    rows = (
        [("big", i) for i in range(800)]
        + [("mid", i) for i in range(150)]
        + [("small", i) for i in range(50)]
    )
    d = spark.createDataFrame(rows, ["source", "i"])

    r1 = temperature_rates(d, "source", alpha=1.0)
    assert r1 == {"big": 1.0, "mid": 1.0, "small": 1.0}

    r = temperature_rates(d, "source", alpha=0.5)
    assert r["small"] == 1.0
    assert r["small"] > r["mid"] > r["big"]
    # exact law: rate_g ∝ n_g^(α-1), normalized to the smallest group
    assert abs(r["big"] - (800 / 50) ** -0.5) < 1e-12
    assert abs(r["mid"] - (150 / 50) ** -0.5) < 1e-12

    rt = temperature_rates(d, "source", alpha=0.5, target_rows=500)
    # p ∝ sqrt(n): sqrt(800),sqrt(150),sqrt(50) → quota·p/n, capped at 1
    import math

    tot = math.sqrt(800) + math.sqrt(150) + math.sqrt(50)
    for s, n in [("big", 800), ("mid", 150), ("small", 50)]:
        want = min(1.0, 500 * (math.sqrt(n) / tot) / n)
        assert abs(rt[s] - want) < 1e-12

    with pytest.raises(ValueError):
        temperature_rates(d, "source", alpha=0.0)


def test_temperature_mix_end_to_end(spark):
    """temperature_mix flattens a skewed source distribution: kept
    fractions decrease with source size, the largest source is actually
    down-sampled, and the result is deterministic. (The driver's
    documents table has uniform sources, so skew is synthesized.)"""
    from sea_serpent_spark.operators.sampling import temperature_mix

    rows = (
        [("crawl", i) for i in range(2000)]
        + [("books", 10_000 + i) for i in range(400)]
        + [("wiki", 20_000 + i) for i in range(100)]
    )
    d = spark.createDataFrame(rows, ["source", "doc_id"])
    sizes = {
        r["source"]: r["count"]
        for r in d.groupBy("source").count().collect()
    }
    out = temperature_mix(d, "source", "doc_id", alpha=0.3)
    kept = {
        r["source"]: r["count"]
        for r in out.groupBy("source").count().collect()
    }
    fracs = {s: kept.get(s, 0) / n for s, n in sizes.items()}
    big = max(sizes, key=sizes.get)
    small = min(sizes, key=sizes.get)
    assert fracs[small] == 1.0
    assert fracs[big] < 1.0
    # deterministic re-run
    again = {
        r["doc_id"]
        for r in temperature_mix(
            d, "source", "doc_id", alpha=0.3
        ).select("doc_id").collect()
    }
    assert again == {r["doc_id"] for r in out.select("doc_id").collect()}


def test_curation_funnel(spark, sf_dir):
    """Per-stage funnel accounting: counts chain exactly, the final
    frame equals running the stages unobserved, and a no-op stage
    reports zero drops."""
    from sea_serpent_spark import Table

    docs = Table.from_parquet(f"{sf_dir}/documents.parquet", "documents",
                              spark)
    stages = [
        ("noop", lambda t: t),
        ("min50tok", lambda t: t.quality_filter(min_tokens=50)),
        ("exact_dedup", lambda t: t.dedup(method="exact")),
    ]
    out, rep = docs.curation_funnel(stages)

    assert [r["stage"] for r in rep] == ["noop", "min50tok", "exact_dedup"]
    assert rep[0]["dropped"] == 0
    assert rep[0]["rows_in"] == docs.count()
    for prev, nxt in zip(rep, rep[1:]):
        assert prev["rows_out"] == nxt["rows_in"]
    assert rep[-1]["rows_out"] == out.count()

    unobserved = docs.quality_filter(min_tokens=50).dedup(method="exact")
    assert out.count() == unobserved.count()
    assert (
        {r["doc_id"] for r in out.df.select("doc_id").collect()}
        == {r["doc_id"] for r in unobserved.df.select("doc_id").collect()}
    )


def test_weighted_sample(spark):
    """Importance sampling: kept fraction tracks the weight ratio,
    deterministic, monotone in target, zero weights never kept."""
    from sea_serpent_spark.operators.sampling import weighted_sample

    rows = (
        [(i, "hi", 4.0) for i in range(4000)]
        + [(10_000 + i, "lo", 1.0) for i in range(4000)]
        + [(20_000 + i, "zero", 0.0) for i in range(100)]
    )
    d = spark.createDataFrame(rows, ["doc_id", "grp", "w"])
    out = weighted_sample(d, "w", target_rows=2000, id_col="doc_id")
    kept = {
        r["grp"]: r["count"]
        for r in out.groupBy("grp").count().collect()
    }
    assert "zero" not in kept
    # p_hi = 2000·4/20000 = 0.4, p_lo = 0.1 → ≈4:1 kept ratio
    ratio = kept["hi"] / kept["lo"]
    assert 3.0 < ratio < 5.5, (kept, ratio)
    assert abs(out.count() - 2000) < 300

    # deterministic + monotone
    a = {r["doc_id"] for r in out.select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in weighted_sample(d, "w", 2000, "doc_id")
        .select("doc_id").collect()
    }
    assert a == b
    bigger = {
        r["doc_id"]
        for r in weighted_sample(d, "w", 4000, "doc_id")
        .select("doc_id").collect()
    }
    assert a <= bigger

    # weight clipping caps the heavy tail
    d2 = spark.createDataFrame(
        [(1, 1e9), (2, 1.0), (3, 1.0)], ["doc_id", "w"]
    )
    clipped = weighted_sample(d2, "w", 2, "doc_id", max_weight=2.0)
    assert clipped.count() <= 3


def test_dsir_weights_and_select(spark):
    """DSIR on a separable corpus: target-like documents get higher
    importance weights and dominate the selection; empty docs weight 0;
    deterministic."""
    from sea_serpent_spark.operators.selection import (
        dsir_select,
        dsir_weights,
    )

    sci = ["proton", "neutron", "quark", "lepton", "boson", "photon"]
    spam = ["click", "free", "winner", "prize", "offer", "deal"]

    def doc(vocab, i, n=30):
        return " ".join(vocab[(i + j) % len(vocab)] for j in range(n))

    raw_rows = (
        [(i, doc(sci, i)) for i in range(100)]
        + [(1000 + i, doc(spam, i)) for i in range(100)]
        + [(9999, "")]
    )
    target_rows_ = [(i, doc(sci, i + 3)) for i in range(20)]
    raw = spark.createDataFrame(raw_rows, ["doc_id", "text"])
    target = spark.createDataFrame(target_rows_, ["doc_id", "text"])

    scored = dsir_weights(raw, target)
    w = {r["doc_id"]: r["dsir_weight"] for r in scored.collect()}
    sci_w = [w[i] for i in range(100)]
    spam_w = [w[1000 + i] for i in range(100)]
    assert min(sci_w) > max(spam_w)
    assert w[9999] == 0.0
    assert max(w.values()) == 1.0  # normalized to the corpus max

    sel = dsir_select(raw, target, target_rows=60)
    ids = {r["doc_id"] for r in sel.select("doc_id").collect()}
    assert ids  # non-empty selection
    assert all(i < 1000 for i in ids)  # only science docs selected
    assert set(sel.columns) == {"doc_id", "text"}  # weights dropped

    again = {
        r["doc_id"]
        for r in dsir_select(raw, target, target_rows=60)
        .select("doc_id").collect()
    }
    assert again == ids


def test_dsir_single_featurization_pass(spark):
    """Execution-count pin: dsir_select reads the raw corpus exactly 2×
    end-to-end (ONE shared featurization feeding both the bucket model
    and the per-doc scores — r14 — plus the consumer join) and the
    target once. Before the per-doc checkpoint + precomputed sampler
    total, the featurization re-executed on every downstream pass
    (max-collect, sum-collect, final join) — 3-4 full corpus reads more
    than necessary; before the shared feature frame, the model pass
    split and hashed every raw document a second time."""
    from sea_serpent_spark.operators.selection import dsir_select

    raw_acc = spark.sparkContext.accumulator(0)
    tgt_acc = spark.sparkContext.accumulator(0)

    def counted(acc):
        def fn(it):
            for pdf in it:
                acc.add(len(pdf))
                yield pdf

        return fn

    n_raw, n_tgt = 120, 20
    raw = spark.createDataFrame(
        [(i, f"w{i % 7} w{i % 11} w{i % 13}") for i in range(n_raw)],
        ["doc_id", "text"],
    )
    tgt = spark.createDataFrame(
        [(i, f"w{i % 7} w{i % 11}") for i in range(n_tgt)],
        ["doc_id", "text"],
    )
    raw_c = raw.mapInPandas(counted(raw_acc), raw.schema)
    tgt_c = tgt.mapInPandas(counted(tgt_acc), tgt.schema)
    dsir_select(raw_c, tgt_c, target_rows=50).collect()
    assert raw_acc.value == 2 * n_raw
    assert tgt_acc.value == n_tgt


def test_dsir_orders_languages_on_real_docs(spark, sf_dir):
    """On the driver corpus, targeting one language ranks that
    language's documents highest on average."""
    import pyspark.sql.functions as F

    from sea_serpent_spark.operators.selection import dsir_weights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = docs.where(F.col("lang") == "zh").limit(30)
    by_lang = {
        r["lang"]: r["lw"]
        for r in dsir_weights(docs, target)
        .groupBy("lang")
        .agg(F.avg("dsir_logw").alias("lw"))
        .collect()
    }
    assert by_lang["zh"] == max(by_lang.values())


def test_ngram_cross_entropy(spark, sf_dir):
    """Perplexity-style quality scoring: gibberish scores higher (worse)
    than in-distribution text under a real-document reference; empty
    docs score NULL; self-reference works."""
    import pyspark.sql.functions as F

    from sea_serpent_spark.operators.selection import ngram_cross_entropy

    ref = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sample = [r["text"] for r in ref.limit(3).collect()]
    probe = spark.createDataFrame(
        [
            (1, sample[0]),
            (2, sample[1]),
            (3, "zxqv jkwp mmxr ttyz qqpl wvnb zzkr xxjw"),  # gibberish
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["xent"]
        for r in ngram_cross_entropy(probe, ref).collect()
    }
    assert out[4] is None
    assert out[3] > out[1] and out[3] > out[2]

    selfscored = ngram_cross_entropy(ref.limit(50))
    assert selfscored.where(F.col("xent").isNotNull()).count() == 50


def test_repetition_metrics_refilter_output(spark):
    """quality_filter over a keep_metrics=True output replaces the
    metric columns instead of raising AMBIGUOUS_REFERENCE (review
    finding)."""
    long_clean = " ".join(f"tok{i}word" for i in range(60))
    df = spark.createDataFrame([(1, long_clean)], ["id", "text"])
    audited = C.gopher_filter(df, keep_metrics=True)
    again = C.gopher_filter(audited, keep_metrics=True)
    assert again.count() == 1
    assert again.columns.count("dup_2gram_frac") == 1


def test_pack_sequences_bfd(spark):
    """Best-fit-decreasing: perfectly pairable sizes pack with zero
    padding; capacity is never exceeded; every doc lands exactly once."""
    from sea_serpent_spark.operators.curation import pack_sequences

    rows = [(i * 10 + j, t) for i in range(20)
            for j, t in enumerate([6, 5, 4, 3, 2, 1])]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_sequences(df, "n_tok", 7, partitions=1)
    fills = {
        r["seq_id"]: r["s"]
        for r in out.groupBy("seq_id").agg(
            F.sum("n_tok").alias("s")).collect()
    }
    assert all(s <= 7 for s in fills.values())
    # 120 docs of pairable sizes → 60 perfectly full bins
    assert len(fills) == 60 and all(s == 7 for s in fills.values())
    assert out.count() == df.count()
    assert out.select("doc_id").distinct().count() == df.count()


def test_pack_sequences_contracts(spark):
    from sea_serpent_spark.operators.curation import pack_sequences

    df = spark.createDataFrame(
        [(1, 5), (2, 12), (3, None)], "doc_id long, n_tok long"
    )
    with pytest.raises(ValueError, match="exceed"):
        pack_sequences(df, "n_tok", 8)
    iso = pack_sequences(df, "n_tok", 8, oversize="isolate")
    bins = {r["doc_id"]: r["seq_id"] for r in iso.collect()}
    assert len(bins) == 3
    # the oversized doc sits alone in its bin
    assert list(bins.values()).count(bins[2]) == 1
    with pytest.raises(ValueError, match="oversize"):
        pack_sequences(df, "n_tok", 8, oversize="drop")
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(df, "n_tok", 0)


def test_pack_sequences_layout_independent(spark, sf_dir):
    """Hash grouping + deterministic BFD ⇒ the same (doc → seq)
    assignment no matter how the input was partitioned."""
    from sea_serpent_spark.operators.curation import pack_sequences
    from sea_serpent_spark.operators.text import token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", token_count(F.col("text")).alias("n_tok")
    )
    a = {
        r["doc_id"]: r["seq_id"]
        for r in pack_sequences(docs, "n_tok", 2048,
                                oversize="isolate").collect()
    }
    b = {
        r["doc_id"]: r["seq_id"]
        for r in pack_sequences(docs.repartition(7), "n_tok", 2048,
                                oversize="isolate").collect()
    }
    assert a == b and len(a) == docs.count()


def test_token_budget_mix(spark, sf_dir):
    from sea_serpent_spark.operators.sampling import token_budget_mix
    from sea_serpent_spark.operators.text import token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tok")
    )
    budgets = {"src0": 500, "src1": 120, "src2": 0}
    out = token_budget_mix(docs, "source", "n_tok", budgets, "doc_id")
    sums = {
        r["source"]: (r["s"], r["m"])
        for r in out.groupBy("source").agg(
            F.sum("n_tok").alias("s"), F.max("n_tok").alias("m")
        ).collect()
    }
    totals = {
        r["source"]: r["s"]
        for r in docs.groupBy("source").agg(
            F.sum("n_tok").alias("s")).collect()
    }
    assert set(sums) <= {"src0", "src1"}  # src2 budget 0, rest dropped
    for s, (tok_sum, mx) in sums.items():
        assert tok_sum < budgets[s] + mx  # over-run ≤ one doc
        if totals[s] > budgets[s]:
            assert tok_sum >= budgets[s]  # budget actually filled
    # deterministic + monotone: doubling a budget only adds docs
    a = {r["doc_id"] for r in out.collect()}
    b = {
        r["doc_id"]
        for r in token_budget_mix(
            docs, "source", "n_tok", budgets, "doc_id").collect()
    }
    assert a == b
    more = {
        r["doc_id"]
        for r in token_budget_mix(
            docs, "source", "n_tok",
            {**budgets, "src1": 1000}, "doc_id").collect()
    }
    assert a <= more
    # default='keep' passes unbudgeted sources through whole
    kept = token_budget_mix(
        docs, "source", "n_tok", {"src0": 500}, "doc_id", default="keep"
    )
    n_other = docs.where("source <> 'src0'").count()
    assert kept.where("source <> 'src0'").count() == n_other
    import pytest as _pt

    with _pt.raises(ValueError, match="budget"):
        token_budget_mix(docs, "source", "n_tok", {"src0": -1}, "doc_id")
    with _pt.raises(ValueError, match="default"):
        token_budget_mix(docs, "source", "n_tok", {}, "doc_id",
                         default="zero")


def test_token_budget_mix_matches_global_window(spark, sf_dir):
    """Bit-for-bit parity of the distributed (range-partition + offset)
    running sum with the semantic spec: SUM(tokens) OVER (PARTITION BY
    source ORDER BY epoch_key, id) - tokens < budget. Run at several
    budgets so boundary docs land mid- and cross-partition."""
    from pyspark.sql import Window

    from sea_serpent_spark.operators.sampling import (
        epoch_key, token_budget_mix,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", F.col("n_chars").alias("n_tok")
    )
    for budgets in (
        {"src0": 1, "src1": 700, "src2": 10**9},
        {"src0": 3000, "src3": 0, "src4": 4444},
    ):
        got = {
            r["doc_id"]
            for r in token_budget_mix(
                docs, "source", "n_tok", budgets, "doc_id", seed=7
            ).collect()
        }
        w = (
            Window.partitionBy("source")
            .orderBy(epoch_key("doc_id", 7), "doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        b = F.lit(None).cast("long")
        for s, v in budgets.items():
            b = F.when(F.col("source") == s, F.lit(v)).otherwise(b)
        want = {
            r["doc_id"]
            for r in docs.where(F.col("source").isin(list(budgets)))
            .withColumn("__c", F.sum("n_tok").over(w))
            .where((F.col("__c") - F.col("n_tok")) < b)
            .collect()
        }
        assert got == want
