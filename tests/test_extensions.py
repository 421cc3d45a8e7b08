"""Extension operator tests: dedup, similarity, text analysis."""

import pyspark.sql.functions as F
import pytest

from sea_serpent_spark.operators import dedup as D
from sea_serpent_spark.operators import similarity as S
from sea_serpent_spark.operators import text as X


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over a lazy dog"),  # near dup of 1
        (4, "completely different content about spark engines"),
        (5, "der hund ist nicht auf der couch und das ist gut"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_groups(docs):
    out = {
        r["canonical_id"]: r["n_dups"]
        for r in D.exact_dedup_groups(docs).collect()
    }
    assert out[1] == 2  # docs 1,2 collapse
    assert out[3] == 1


def test_exact_dedup_canonical_flags(docs):
    rows = {r["doc_id"]: r["is_canonical"] for r in D.exact_dedup(docs).collect()}
    assert rows[1] is True and rows[2] is False


def test_minhash_identical_docs_same_signature(docs):
    sigs = {r["id"]: r["sig"] for r in D.minhash_signature(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.minhash_lsh_pairs(docs.where("doc_id != 6"),
                                     jaccard_threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] >= 0.5
    assert (1, 4) not in pairs


def test_ngram_jaccard_exact(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, threshold=0.1).collect()
    }
    assert pairs[(1, 2)] == 1.0
    # doc1 has 8 distinct words, doc3 differs by one word ('the'->'a'...)
    assert 0.5 < pairs[(1, 3)] < 1.0


def _pair_set(df_pairs):
    return {
        (r["id_a"], r["id_b"]): r["jaccard"] for r in df_pairs.collect()
    }


def test_ngram_dense_fast_paths_match_prefix(spark):
    """r14 parity pin for the dense-regime shortcuts: the single-word
    literal-map projection (vocab ≤ 64), the driver-side dictionary +
    unrolled popcount verify (64 < vocab ≤ 64·max_bitmap_words), and
    the prefix-filter formulation (``max_bitmap_words=0`` disables the
    bitmap regime outright) must produce identical pair sets and
    identical jaccard values — including empty/NULL-text docs, which
    must vanish from all three."""
    import random

    rng = random.Random(7)

    def corpus(vocab_size, n_docs):
        vocab = [f"w{i}" for i in range(vocab_size)]
        rows = []
        for i in range(n_docs):
            k = rng.randint(3, min(12, vocab_size))
            rows.append((i, " ".join(rng.sample(vocab, k))))
        rows.append((n_docs, ""))  # empty text
        rows.append((n_docs + 1, None))  # NULL text
        return spark.createDataFrame(rows, "doc_id long, text string")

    for vocab_size in (40, 100):  # 1-word fast path / 2-word dic path
        d = corpus(vocab_size, 60)
        fast = _pair_set(D.ngram_jaccard_pairs(d, threshold=0.3))
        prefix = _pair_set(
            D.ngram_jaccard_pairs(d, threshold=0.3, max_bitmap_words=0)
        )
        assert fast == prefix, f"vocab={vocab_size}: {fast} != {prefix}"
        assert fast  # non-degenerate: the corpus produced pairs


def test_simhash_hamming(docs):
    sigs = {r["id"]: r["sim"] for r in D.simhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]
    ham13 = bin(sigs[1] ^ sigs[3]).count("1")
    ham14 = bin(sigs[1] ^ sigs[4]).count("1")
    assert ham13 < ham14  # near dup closer than unrelated


def test_simhash_pairs_pigeonhole(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_pairs(docs, max_hamming=10).collect()
    }
    assert pairs.get((1, 2)) == 0


def test_first_agreeing_emission_is_exactly_once(spark, sf_dir):
    """The pair operators dedup candidates with an in-join
    "first agreeing band/chunk" predicate instead of a survivor
    distinct — on a real corpus (where pairs agree on several bands)
    every unordered pair must still leave the enumeration EXACTLY once,
    and the set must equal the distinct-ed formulation."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for op, kw in [
        (D.minhash_lsh_pairs, {"jaccard_threshold": 0.5}),
        (D.simhash_pairs, {"max_hamming": 8}),
    ]:
        out = op(docs, **kw)
        dup = (
            out.groupBy("id_a", "id_b").count().where("count > 1").count()
        )
        assert dup == 0, f"{op.__name__}: {dup} duplicate pairs emitted"
        assert out.count() == out.distinct().count()


def test_incremental_pairs_emitted_exactly_once(spark, sf_dir):
    from sea_serpent_spark.operators.incremental import (
        incremental_minhash_pairs,
        minhash_band_index,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = minhash_band_index(d.where("doc_id < 250"))
    out = incremental_minhash_pairs(
        d.where("doc_id >= 250"), idx, jaccard_threshold=0.5
    )
    dup = out.groupBy("id_a", "id_b").count().where("count > 1").count()
    assert dup == 0


def test_operators_accept_empty_inputs(spark):
    """An empty corpus flows through every search/pair/selection
    operator as an empty result — never an error (a daily pipeline's
    first run, or a filter that drops everything, must not crash the
    job). Model FITTING on nothing stays a real error (pq_fit)."""
    from sea_serpent_spark.operators import fuzzy as FZ
    from sea_serpent_spark.operators import incremental as I
    from sea_serpent_spark.operators import sampling as SA
    from sea_serpent_spark.operators import similarity as S

    docs = spark.createDataFrame(
        [], "doc_id long, text string, source string, n_chars long"
    )
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert D.minhash_lsh_pairs(docs).count() == 0
    assert D.simhash_pairs(docs).count() == 0
    assert D.dedup_corpus(docs).count() == 0
    assert FZ.edit_distance_pairs(docs, "text", "doc_id").count() == 0
    assert S.embedding_near_dup_pairs(emb, threshold=0.9).count() == 0
    assert S.brute_force_topk(emb, emb, k=3).count() == 0
    assert S.lsh_topk(emb, emb, k=3, nbits=4).count() == 0
    # the random-projection branch probes the vector dim — the path the
    # empty-corpus placeholder exists for
    assert S.lsh_topk(emb, emb, k=3, nbits=4,
                      projection="random").count() == 0
    # all-NULL embeddings behave like an empty corpus, not a crash
    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<float>"
    )
    assert S.embedding_near_dup_pairs(nulls, threshold=0.9).count() == 0
    assert (
        I.incremental_minhash_pairs(docs, I.minhash_band_index(docs))
        .count() == 0
    )
    assert SA.token_budget_mix(
        docs, "source", "n_chars", {"a": 10}, "doc_id", checkpoint=False
    ).count() == 0
    with pytest.raises(ValueError, match="empty corpus"):
        S.pq_fit(emb, m=2, ksub=4)


def test_lang_id(spark):
    rows = [
        (1, "the cat is in the house and it is happy"),
        (2, "der hund ist nicht mit der katze auf dem sofa und das"),
        (3, "le chat est dans la maison et il est pour les amis"),
        (4, "el perro es un animal y los gatos en la casa por"),
        (5, "xyzzy plugh qwerty"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["lang"] for r in df.select(
        "doc_id", X.lang_id(F.col("text")).alias("lang")).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "und"}


def test_token_count_and_quality(docs):
    out = {r["doc_id"]: r for r in X.analyze(docs).collect()}
    assert out[1]["n_tokens"] == 9
    assert out[6]["n_tokens"] == 0
    assert 0.0 <= out[1]["quality"] <= 1.0
    assert out[1]["fp"] == out[2]["fp"]


def test_brute_force_topk_self_excluded(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),   # closest to 1
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]),  # opposite of 1
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = S.brute_force_topk(df, df.where("vec_id = 1"), k=3).collect()
    ranked = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [2, 3, 4]
    assert 1 not in ranked


def test_lsh_topk_same_bucket_only(spark):
    rows = [
        (1, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
        (2, [0.9, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),  # same signs
        (3, [-1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0]),  # other bucket
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = S.lsh_topk(df, df.where("vec_id = 1"), k=5, nbits=8).collect()
    ids = {r["neighbor_id"] for r in out}
    assert ids == {2}  # 3 is in a different bucket, never scored


def test_embedding_near_dup(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.999, 0.001]),
        (3, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = S.embedding_near_dup_pairs(df, threshold=0.99).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]


def test_tune_srp_meets_target_and_budget():
    """(nbits, bands) from the S-curve optimizer catch a threshold pair
    with ≥ p_target while staying inside the hyperplane budget."""
    import math

    for thr in (0.45, 0.7, 0.9, 0.99):
        r, b = S.tune_srp(thr, p_target=0.9)
        s = 1 - math.acos(thr) / math.pi
        p_pair = 1 - (1 - s**r) ** b
        assert p_pair >= 0.9, (thr, r, b, p_pair)
        assert r * b <= 64


def test_near_dup_random_projection_recall(spark, sf_dir):
    """Default (banded seeded random projections, auto-tuned) vs the
    exact all-pairs baseline on the real embeddings table: exact
    precision (verify step) and high recall — deterministic under the
    fixed seed."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r["id_a"], r["id_b"])
        for r in S.embedding_near_dup_pairs(emb, 0.45, nbits=0)
        .select("id_a", "id_b")
        .collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in S.embedding_near_dup_pairs(emb, 0.45)
        .select("id_a", "id_b")
        .collect()
    }
    assert exact  # the table actually contains near-dups
    assert lsh <= exact  # cosine-verified → no false positives
    assert len(lsh & exact) / len(exact) >= 0.85


def test_lsh_topk_multiprobe_raises_recall(spark, sf_dir):
    """nprobe>1 probes the smallest-margin bit-flip buckets: recall vs
    the brute-force truth rises monotonically, the corpus side is never
    replicated, and nprobe=1 stays the single-bucket behavior."""
    from sea_serpent_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 30)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(e, q, k=5).collect()
    }

    def recall(npb):
        got = {
            (r.query_id, r.neighbor_id)
            for r in lsh_topk(
                e, q, k=5, nbits=10, projection="random", nprobe=npb
            ).collect()
        }
        return len(got & truth) / len(truth), len(got)

    r1, n1 = recall(1)
    r8, n8 = recall(8)
    assert n8 >= n1
    assert r8 > r1  # deterministic: seeded hyperplanes + fixed corpus
    with pytest.raises(ValueError, match="nprobe"):
        lsh_topk(e, q, k=5, nprobe=0)


def test_lsh_topk_random_projection_on_clustered_data(spark):
    """Multi-band random-projection top-k recovers within-cluster
    neighbors on data WITH locality (20 tight clusters)."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for c in range(20):
        center = rng.standard_normal(16)
        center /= np.linalg.norm(center)
        for j in range(6):
            v = center + 0.05 * rng.standard_normal(16)
            rows.append((c * 10 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.where(F.col("vec_id") % 10 == 0)  # one query per cluster
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(df, q, k=3).collect()
    }
    lsh = {
        (r["query_id"], r["neighbor_id"])
        for r in S.lsh_topk(
            df, q, k=3, nbits=8, projection="random", bands=4
        ).collect()
    }
    assert len(lsh & brute) / len(brute) >= 0.9


def test_plan_stays_jvm_side(docs):
    """No Python UDFs in extension plans — BatchEvalPython must not appear."""
    for frame in (
        D.minhash_signature(docs),
        D.simhash_signatures(docs),
        X.analyze(docs),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_profile_single_pass(spark, sf_dir):
    """profile() emits one stats row per column from ONE aggregation —
    exact n/null counts, sane numeric ranges, and a single-scan plan."""
    from sea_serpent_spark.operators.profile import profile

    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    p = profile(df)
    rows = {r["column"]: r.asDict() for r in p.collect()}
    assert set(rows) == set(df.columns)
    n = df.count()
    ok = rows["o_totalprice"]
    assert ok["n"] == n and ok["n_null"] == 0 and ok["null_frac"] == 0.0
    exact_min = df.agg(F.min("o_totalprice")).collect()[0][0]
    exact_max = df.agg(F.max("o_totalprice")).collect()[0][0]
    assert ok["min"] == exact_min and ok["max"] == exact_max
    assert exact_min <= ok["q50"] <= exact_max
    # HLL estimate within 15% of exact cardinality
    exact_d = df.select("o_custkey").distinct().count()
    est = rows["o_custkey"]["approx_distinct"]
    assert abs(est - exact_d) / exact_d < 0.15
    # string stats populated, numeric stats absent for strings
    st = rows["o_orderstatus"]
    assert st["avg_len"] is not None and st["min"] is None
    # single scan: exactly one relation read in the (final) plan — AQE's
    # toString repeats the initial plan, so trim to the final section
    plan = p._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1


def test_kmeans_ivf_end_to_end(spark):
    """Learned IVF: k-means recovers the synthetic cluster structure and
    ivf_topk over the learned labels matches brute force for
    within-cluster neighbors."""
    import numpy as np

    from sea_serpent_spark.operators import similarity as S

    rng = np.random.default_rng(11)
    rows = []
    for c in range(4):
        center = rng.standard_normal(16)
        center /= np.linalg.norm(center)
        for j in range(25):
            v = center + 0.05 * rng.standard_normal(16)
            rows.append((c * 100 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    cents = S.kmeans_fit(df, k=4, iters=4, seed=3)
    assert len(cents) == 4 and all(len(c) == 16 for c in cents)
    lab = S.ivf_assign(df, cents)
    # every synthetic cluster maps to exactly one learned cluster
    purity = (
        lab.withColumn("truth", (F.col("vec_id") / 100).cast("int"))
        .groupBy("truth")
        .agg(F.countDistinct("label").alias("nl"))
        .agg(F.max("nl"))
        .collect()[0][0]
    )
    assert purity == 1
    q = lab.where(F.col("vec_id") % 100 == 0)
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ivf_topk(lab, q, k=3).collect()
    }
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(df, q, k=3).collect()
    }
    assert ivf == brute


def test_bpe_token_count(spark):
    rows = [
        (1, "don't stop—counting 123 tokens!"),
        (2, "plain words here"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: (r.ws, r.bpe)
        for r in df.select(
            "doc_id",
            X.token_count(F.col("text")).alias("ws"),
            X.bpe_token_count(F.col("text")).alias("bpe"),
        ).collect()
    }
    # don ' t stop — counting 123 tokens !  => 9 BPE vs 4 whitespace
    assert out[1] == (4, 9)
    assert out[2] == (3, 3)
    assert out[3][1] == 0


def test_connected_components_vs_union_find(spark, sf_dir):
    """Min-label components over the real LSH pair output must equal a
    driver-side union-find on the same edges (transitive closure: A~B,
    B~C collapses A,B,C even though (A,C) was never emitted)."""
    from sea_serpent_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = D.minhash_lsh_pairs(docs, jaccard_threshold=0.5)
    edges = [(r.id_a, r.id_b) for r in pairs.collect()]
    got = {
        r.id: r.component
        for r in D.connected_components(pairs).collect()
    }

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    exp = {x: find(x) for x in parent}
    # normalize: component label = min member id on both sides
    from collections import defaultdict
    def canon(m):
        groups = defaultdict(set)
        for k, v in m.items():
            groups[v].add(k)
        out = {}
        for members in groups.values():
            lo = min(members)
            for x in members:
                out[x] = lo
        return out
    assert canon(got) == canon(exp)
    assert len(got) > 0


def test_connected_components_chain(spark):
    """A pure chain (worst diameter case) collapses to one component."""
    from sea_serpent_spark.operators.dedup import connected_components

    n = 20
    pairs = spark.createDataFrame(
        [(f"d{i:03d}", f"d{i + 1:03d}") for i in range(n)],
        "id_a string, id_b string",
    )
    got = {r.id: r.component for r in connected_components(pairs).collect()}
    assert set(got.values()) == {"d000"}
    assert len(got) == n + 1


@pytest.mark.parametrize("method", ["minhash", "simhash", "ngram"])
def test_spanning_edges_component_equivalent(spark, sf_dir, method):
    """emit='spanning' yields the SAME connected components as the full
    pair expansion — star+rep edges are connectivity-equivalent, at
    O(cluster) instead of O(cluster²) edges (what dedup_corpus feeds CC
    at scale)."""
    from sea_serpent_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ops = {
        "minhash": lambda e: minhash_lsh_pairs(
            docs, jaccard_threshold=0.5, emit=e
        ),
        "simhash": lambda e: simhash_pairs(docs, max_hamming=3, emit=e),
        "ngram": lambda e: ngram_jaccard_pairs(docs, threshold=0.8, emit=e),
    }
    full = ops[method]("pairs")
    span = ops[method]("spanning")
    n_full, n_span = full.count(), span.count()
    assert n_span <= n_full
    comp_full = {
        r.id: r.component for r in connected_components(full).collect()
    }
    comp_span = {
        r.id: r.component for r in connected_components(span).collect()
    }
    assert comp_full == comp_span
    assert n_full > 0  # the corpus does contain near-dup clusters


def test_pair_ops_reject_bad_emit(spark):
    from sea_serpent_spark.operators.dedup import minhash_lsh_pairs

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="emit"):
        minhash_lsh_pairs(df, emit="edges")


def test_dedup_corpus_end_to_end(spark, sf_dir):
    """dedup_corpus keeps exactly one doc (the min id) per near-dup
    cluster and every unclustered doc."""
    from sea_serpent_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = D.dedup_corpus(docs, method="minhash", threshold=0.5)
    comp = {
        r.id: r.component
        for r in D.connected_components(
            D.minhash_lsh_pairs(docs, jaccard_threshold=0.5)
        ).collect()
    }
    losers = {i for i, c in comp.items() if i != c}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    expected = all_ids - losers
    got = {r.doc_id for r in kept.select("doc_id").collect()}
    assert got == expected
    assert kept.columns == docs.columns
    # exact mode: one survivor per distinct content
    ex = D.dedup_corpus(docs, method="exact")
    n_content = docs.selectExpr("count(distinct text)").collect()[0][0]
    assert ex.count() == n_content


def test_dedup_corpus_keep_best(spark):
    """keep='max'/'min' keeps the best-scoring member per cluster (ties
    -> min id, NULL scores lose); unclustered docs always survive."""
    from sea_serpent_spark.operators import dedup as D

    rows = [
        # near-dup cluster {1,2,3}: 2 has the top score
        (1, "the quick brown fox jumps over the lazy dog", 0.2),
        (2, "the quick brown fox jumps over the lazy dog", 0.9),
        (3, "the quick brown fox jumps over a lazy dog", 0.5),
        # exact-dup cluster {4,5}: tie -> min id (4)
        (4, "spark engines are completely different content", 0.7),
        (5, "spark engines are completely different content", 0.7),
        # singleton with NULL score survives regardless
        (6, "der hund ist nicht auf der couch gewesen heute", None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, q double")

    got = {
        r.doc_id
        for r in D.dedup_corpus(
            docs, method="minhash", threshold=0.5, keep="max", keep_col="q"
        ).collect()
    }
    assert got == {2, 4, 6}
    got_min = {
        r.doc_id
        for r in D.dedup_corpus(
            docs, method="minhash", threshold=0.5, keep="min", keep_col="q"
        ).collect()
    }
    assert got_min == {1, 4, 6}  # NULL q on 6: singleton, still kept
    ex = {
        r.doc_id
        for r in D.dedup_corpus(
            docs, method="exact", keep="max", keep_col="q"
        ).collect()
    }
    # exact groups: {1,2} (2 wins on score), {4,5} (tie -> 4), 3 and 6
    # are singletons — near-dup 3 survives because exact mode only
    # collapses identical text
    assert ex == {2, 3, 4, 6}
    with pytest.raises(ValueError, match="keep_col"):
        D.dedup_corpus(docs, method="exact", keep="max")
    with pytest.raises(ValueError, match="keep"):
        D.dedup_corpus(docs, keep="best")


def test_deterministic_split_properties(spark, sf_dir):
    """Split fractions near weights, layout-independent, and STABLE under
    corpus growth (existing rows never move between splits)."""
    from sea_serpent_spark.operators.sampling import deterministic_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s = deterministic_split(docs, "doc_id")
    counts = {r["split"]: r["n"] for r in
              s.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = docs.count()
    assert abs(counts.get("train", 0) / n - 0.9) < 0.05
    assert set(counts) <= {"train", "val", "test"}
    # layout independence
    multi = docs.repartition(13)
    a = {(r.doc_id, r.split) for r in s.select("doc_id", "split").collect()}
    b = {(r.doc_id, r.split) for r in
         deterministic_split(multi, "doc_id").select("doc_id", "split").collect()}
    assert a == b
    # growth stability: splitting HALF the corpus assigns the same labels
    half = docs.where(F.col("doc_id") % 2 == 0)
    h = {(r.doc_id, r.split) for r in
         deterministic_split(half, "doc_id").select("doc_id", "split").collect()}
    assert h <= a
    # portable: DuckDB computes identical buckets from the same md5
    import duckdb
    buckets = {
        r.doc_id: r.b for r in s.select(
            "doc_id",
            F.pmod(
                F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12),
                       16, 10).cast("long"),
                F.lit(1_000_000),
            ).alias("b"),
        ).collect()
    }
    from sea_serpent_spark.operators.hashing import h48_sql

    dd = duckdb.sql(
        f"SELECT doc_id, {h48_sql('CAST(doc_id AS VARCHAR)')} % 1000000 "
        f"AS b FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    assert {k: v for k, v in dd} == buckets


def test_stratified_sample_exact_counts(spark, sf_dir):
    """Exactly floor(n_s * fraction) per stratum, deterministic across
    layouts."""
    from sea_serpent_spark.operators.sampling import stratified_sample

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    frac = 0.1
    got = stratified_sample(ev, "event_type", frac, "event_id")
    per = {r["event_type"]: r["n"] for r in
           got.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    base = {r["event_type"]: r["n"] for r in
            ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {k: int(v * frac) for k, v in base.items() if int(v * frac)}
    again = stratified_sample(ev.repartition(9), "event_type", frac, "event_id")
    assert {r.event_id for r in got.select("event_id").collect()} == \
           {r.event_id for r in again.select("event_id").collect()}


def test_contamination_check_and_decontaminate(spark):
    """Train docs sharing an 8-gram with the eval set are flagged;
    decontaminate drops exactly those. Short docs (< n tokens) can
    never be flagged."""
    from sea_serpent_spark.operators.dedup import (
        contamination_check,
        decontaminate,
    )

    leak = "the quick brown fox jumps over the lazy dog tonight"
    train = spark.createDataFrame(
        [
            (1, f"some intro text then {leak} and a long tail of words"),
            (2, "totally original content with no overlap at all here "
                "spanning more than eight tokens easily"),
            (3, "short doc"),  # < 8 tokens: cannot be flagged
            (4, f"{leak}"),    # the leaked phrase verbatim
        ],
        ["doc_id", "text"],
    )
    evalset = spark.createDataFrame(
        [(100, f"benchmark question: {leak} answer choices follow")],
        ["doc_id", "text"],
    )
    flagged = {r.id: r.n_hits for r in
               contamination_check(train, evalset, ngram=8).collect()}
    assert set(flagged) == {1, 4}
    assert all(v >= 1 for v in flagged.values())
    clean = decontaminate(train, evalset, ngram=8)
    assert sorted(r.doc_id for r in clean.select("doc_id").collect()) == [2, 3]
    assert clean.columns == train.columns
    # min_hits raises the bar
    strict = contamination_check(train, evalset, ngram=8, min_hits=100)
    assert strict.count() == 0


def test_contamination_shuffle_fallback(spark):
    """broadcast_reference=False must produce identical flags (the
    big-reference degrade path)."""
    from sea_serpent_spark.operators.dedup import contamination_check

    leak = "alpha beta gamma delta epsilon zeta eta theta iota"
    train = spark.createDataFrame(
        [(1, f"pre {leak} post"), (2, "nothing in common here at all "
                                      "with nine plus tokens present")],
        ["doc_id", "text"],
    )
    ref = spark.createDataFrame([(9, leak)], ["doc_id", "text"])
    a = {r.id for r in contamination_check(train, ref).collect()}
    b = {r.id for r in contamination_check(
        train, ref, broadcast_reference=False).collect()}
    assert a == b == {1}


def test_corpus_profile(spark, sf_dir):
    """corpus_profile vs DuckDB-computed ground truth."""
    import duckdb

    from sea_serpent_spark.operators.profile import corpus_profile

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = corpus_profile(d, lang_col="lang")

    con = duckdb.connect()
    con.sql(f"CREATE VIEW d AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'")
    n_docs, total_chars = con.sql(
        "SELECT COUNT(*), SUM(LENGTH(text)) FROM d").fetchall()[0]
    assert got["n_docs"] == n_docs
    assert got["total_chars"] == total_chars
    vocab, total_toks = con.sql(
        "SELECT COUNT(DISTINCT t), COUNT(*) FROM (SELECT unnest("
        "regexp_split_to_array(lower(trim(text)), '\\s+')) AS t FROM d) "
        "WHERE t != ''").fetchall()[0]
    assert got["vocab"] == vocab
    top1 = con.sql(
        "SELECT t, COUNT(*) AS n FROM (SELECT unnest("
        "regexp_split_to_array(lower(trim(text)), '\\s+')) AS t FROM d) "
        "WHERE t != '' GROUP BY t ORDER BY n DESC, t LIMIT 1").fetchall()[0]
    assert got["top_tokens"][0] == top1
    assert sum(got["langs"].values()) == n_docs


def test_sql_functions_match_column_api(spark, sf_dir):
    """The generated SQL UDF bodies produce bit-identical output to the
    Column operators over the whole corpus (one source of truth)."""
    import pyspark.sql.functions as F

    from sea_serpent_spark.operators import text as X
    from sea_serpent_spark.operators.curation import (_ngrams, dup_frac,
                                                      normalize_text,
                                                      redact_pii)
    from sea_serpent_spark.operators.sqlfuncs import register_sql_functions

    names = register_sql_functions(spark)
    assert "ss_quality" in names
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    # the corpus has no PII/control chars: exercise redact/normalize too
    extra = spark.createDataFrame(
        [(100001, "mail a@b.io call 555-123-4567 ip 10.0.0.1  x\ty\n\n\n\nz"),
         (100002, "ssn 123-45-6789 card 4111 1111 1111 1111")],
        ["doc_id", "text"])
    d = d.unionByName(extra)
    d.createOrReplaceTempView("sqlf_docs")

    got = spark.sql(
        "SELECT doc_id, ss_token_count(text) AS tc, "
        "ss_bpe_token_count(text) AS btc, ss_punct_ratio(text) AS pr, "
        "ss_stopword_ratio(text) AS sw, ss_quality(text) AS q, "
        "ss_lang_id(text) AS lang, ss_fingerprint(text) AS fp, "
        "ss_dup_word_frac(text) AS dw, ss_dup_2gram_frac(text) AS d2, "
        "ss_redact_pii(text) AS red, ss_normalize_text(text) AS norm "
        "FROM sqlf_docs"
    ).collect()

    c = F.col("text")
    toks = X.words(c)
    want = d.select(
        "doc_id",
        X.token_count(c).alias("tc"),
        X.bpe_token_count(c).alias("btc"),
        X.punct_ratio(c).alias("pr"),
        X.stopword_ratio(c).alias("sw"),
        X.quality_score(c).alias("q"),
        X.lang_id(c).alias("lang"),
        X.fingerprint(c).alias("fp"),
        X.round_half_up(dup_frac(toks), 4).alias("dw"),
        X.round_half_up(dup_frac(_ngrams(toks, 2)), 4).alias("d2"),
        redact_pii(c).alias("red"),
        normalize_text(c).alias("norm"),
    ).collect()
    gd = {r["doc_id"]: r for r in got}
    for w in want:
        g = gd[w["doc_id"]]
        for f in ["tc", "btc", "pr", "sw", "q", "lang", "fp", "dw", "d2",
                  "red", "norm"]:
            assert g[f] == w[f], (w["doc_id"], f, g[f], w[f])


# ---------------------------------------------------------------------------
# SemDeDup semantic dedup
# ---------------------------------------------------------------------------

def test_semantic_dedup_min_id(spark):
    """Exact-direction duplicate groups (cos = 1.0 → identical SRP
    buckets, so the default banded-LSH path finds every pair
    deterministically): one survivor per group, min id, singletons
    untouched."""
    import numpy as np

    rng = np.random.default_rng(5)
    rows = []
    for g in range(3):
        d = rng.standard_normal(8)
        d /= np.linalg.norm(d)
        for j, scale in enumerate([1.0, 0.5, 2.0]):  # same direction
            rows.append((g * 10 + j, [float(x) for x in d * scale]))
        lone = rng.standard_normal(8)  # a genuinely distinct vector
        lone /= np.linalg.norm(lone)
        rows.append((g * 10 + 9, [float(x) for x in lone]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = S.semantic_dedup(
        df, k=3, threshold=0.999, keep="min_id", seed=9
    )
    ids = {r["vec_id"] for r in out.collect()}
    # every dup-group collapses to its min id; all loners survive
    assert {0, 10, 20} <= ids
    assert not ids & {1, 2, 11, 12, 21, 22}
    assert {9, 19, 29} <= ids


def test_semantic_dedup_far_from_centroid(spark):
    """The paper's keep policy: within a duplicate group the member with
    the LOWEST centroid affinity survives. Explicit centroids + exact
    within-cluster pairs (nbits=0) make the expectation computable by
    hand."""
    import numpy as np

    def unit(v):
        v = np.asarray(v, dtype=float)
        return (v / np.linalg.norm(v)).tolist()

    e0 = [1.0] + [0.0] * 7
    e2 = [0.0, 0.0, 1.0] + [0.0] * 5
    rows = [
        # cluster 0: three near-dups tilting away from the centroid
        (1, unit(np.array(e0) + 0.01 * np.eye(8)[1])),
        (2, unit(np.array(e0) + 0.05 * np.eye(8)[1])),  # farthest out
        (3, unit(np.array(e0) + 0.02 * np.eye(8)[1])),
        # cluster 1: two distinct singletons (below threshold)
        (4, unit(np.array(e2) + 0.4 * np.eye(8)[4])),
        (5, unit(np.array(e2) - 0.4 * np.eye(8)[4])),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = S.semantic_dedup(
        df,
        threshold=0.995,
        centroids=[e0, e2],
        keep="far_from_centroid",
        nbits=0,
    )
    ids = sorted(r["vec_id"] for r in out.collect())
    assert ids == [2, 4, 5]


def test_semantic_dedup_matches_union_find_oracle(spark, sf_dir):
    """End-to-end vs an independent driver-side oracle on the real
    embeddings table: exact within-cluster pairs → Python union-find →
    far-from-centroid keeper, recomputed with numpy from the same
    centroids. Proves the closure + keep stages, not just the pair
    stage."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = S.kmeans_fit(emb, k=4, iters=3, seed=13)
    got = {
        r["vec_id"]
        for r in S.semantic_dedup(
            emb, threshold=0.45, centroids=cents, nbits=0
        ).select("vec_id").collect()
    }

    # --- independent oracle ---------------------------------------------
    data = emb.select("vec_id", "embedding").collect()
    V = {r["vec_id"]: np.asarray(r["embedding"], dtype=float) for r in data}
    C = np.asarray(cents)

    def affinity(v):
        n = np.linalg.norm(v)
        return (C @ v) / max(n, 1e-12)

    cluster = {i: int(np.argmax(affinity(v))) for i, v in V.items()}
    sim = {i: float(np.max(affinity(v))) for i, v in V.items()}

    parent = {i: i for i in V}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(V)
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            i, j = ids[a], ids[b]
            if cluster[i] != cluster[j]:
                continue
            vi, vj = V[i], V[j]
            cos = round(
                float(vi @ vj)
                / (np.linalg.norm(vi) * np.linalg.norm(vj)),
                4,
            )
            if cos >= 0.45:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)

    groups: dict = {}
    for i in V:
        groups.setdefault(find(i), []).append(i)
    want = set()
    for members in groups.values():
        want.add(min(members, key=lambda i: (sim[i], i)))
    assert got == want


def test_skew_report(spark, sf_dir):
    """Top-key shuffle diagnostic vs a DuckDB oracle: same heavy keys,
    counts, shares; multi-column keys supported; plan uses a k-bounded
    top-k sort, not a global-window rank."""
    import duckdb

    from sea_serpent_spark.operators.profile import skew_report

    d = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rep = skew_report(d, ["o_orderpriority"], top=3)
    got = [
        (r["key"], r["n"], r["share"], r["cum_share"], r["rank"])
        for r in rep.orderBy("rank").collect()
    ]
    want = duckdb.sql(
        f"""
        WITH c AS (
            SELECT CAST(o_orderpriority AS VARCHAR) AS key, COUNT(*) AS n
            FROM '{sf_dir}/orders.parquet' GROUP BY 1
        ), t AS (SELECT SUM(n) AS tot FROM c)
        SELECT key, n,
               ROUND(n / tot, 6) AS share,
               ROUND(SUM(n) OVER (ORDER BY n DESC, key
                     ROWS UNBOUNDED PRECEDING) / tot, 6) AS cum_share,
               ROW_NUMBER() OVER (ORDER BY n DESC, key) AS rank
        FROM c, t ORDER BY rank LIMIT 3
        """
    ).fetchall()
    assert got == [tuple(w) for w in want]

    # multi-column key
    rep2 = skew_report(d, ["o_orderstatus", "o_orderpriority"], top=5)
    assert rep2.count() == 5
    assert "␟" in rep2.collect()[0]["key"]

    # the distinct-key side must be a TakeOrdered, not a global window
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# duplicate-span (exact-substring) dedup
# ---------------------------------------------------------------------------

def _py_spans(texts, span):
    """Brute-force window occurrences: {(id, pos): span_string}."""
    occ = {}
    for i, t in texts:
        ws = t.split()
        for p in range(max(len(ws) - span + 1, 0)):
            occ[(i, p)] = " ".join(ws[p:p + span])
    return occ


def test_duplicate_spans_vs_bruteforce(spark):
    """Flagged (id, pos) set == Python brute force: all repeat
    occurrences minus the corpus-wide first per span string."""
    from sea_serpent_spark.operators import spans as SP

    boiler = "terms of service apply to all users of this site"
    texts = [
        (1, f"alpha bravo charlie {boiler} delta echo"),
        (2, f"foxtrot golf {boiler} hotel india juliet kilo"),
        (3, "lima mike november oscar papa quebec romeo sierra"),
        (4, f"tango {boiler} uniform"),
    ]
    span = 5
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {
        (r["id"], r["pos"])
        for r in SP.duplicate_spans(
            df, span_tokens=span, keep_first=True
        ).collect()
    }

    occ = _py_spans(texts, span)
    by_str = {}
    for k, s in occ.items():
        by_str.setdefault(s, []).append(k)
    want = set()
    for s, ks in by_str.items():
        if len(ks) >= 2:
            ks = sorted(ks)
            want.update(ks[1:])  # all but the corpus-wide first
    assert got == want
    assert got  # the boilerplate actually repeats


def test_strip_duplicate_spans(spark):
    """The first document keeps the boilerplate; later ones lose every
    token the flagged windows cover; clean docs pass byte-identical."""
    from sea_serpent_spark.operators import spans as SP

    boiler = "one two three four five"
    texts = [
        (1, f"aa bb {boiler} cc"),
        (2, f"dd {boiler} ee ff"),
        (3, "gg hh ii jj kk ll"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["text"]
        for r in SP.strip_duplicate_spans(df, span_tokens=5).collect()
    }
    assert out[1] == texts[0][1]          # first occurrence kept
    assert "one" not in out[2] and "five" not in out[2]
    assert out[2].split() == ["dd", "ee", "ff"]  # surroundings survive
    assert out[3] == texts[2][1]          # untouched doc byte-identical


def test_duplicate_spans_short_docs_empty(spark):
    """Docs shorter than the span produce no windows and never flag."""
    from sea_serpent_spark.operators import spans as SP

    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], ["doc_id", "text"]
    )
    assert SP.duplicate_spans(df, span_tokens=5).count() == 0
    out = SP.strip_duplicate_spans(df, span_tokens=5)
    assert {r["text"] for r in out.collect()} == {"tiny doc"}


# ---------------------------------------------------------------------------
# edit-distance similarity join
# ---------------------------------------------------------------------------

def _brute_ed_pairs(rows, k):
    """Driver-side oracle: full quadratic Levenshtein."""
    def lev(a, b):
        if a == b:
            return 0
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[n]

    out = set()
    for x in range(len(rows)):
        for y in range(x + 1, len(rows)):
            (ia, sa), (ib, sb) = rows[x], rows[y]
            d = lev(sa, sb)
            if d <= k:
                out.add((min(ia, ib), max(ia, ib), d))
    return out


@pytest.mark.parametrize("k", [0, 1, 2])
def test_edit_distance_pairs_vs_bruteforce(spark, k):
    """Exact pair set at k=0/1/2 on a corpus mixing typo clusters,
    short strings (below the gram-filter floor), and empties."""
    from sea_serpent_spark.operators.fuzzy import edit_distance_pairs

    rows = [
        (1, "apache spark"),
        (2, "apache spark"),     # exact dup
        (3, "apache sparkk"),    # 1 insert
        (4, "apacha spark"),     # 1 sub
        (5, "apache hadoop"),    # far
        (6, "ab"),               # short path
        (7, "abc"),
        (8, "abd"),
        (9, ""),                 # empty
        (10, "b"),
        (11, "levenshtein"),
        (12, "levenshtien"),     # transposition = 2 edits
    ]
    df = spark.createDataFrame(rows, ["sid", "name"])
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in edit_distance_pairs(df, "name", "sid", k).collect()
    }
    assert got == _brute_ed_pairs(rows, k)


def test_edit_distance_pairs_on_real_column(spark, sf_dir):
    """Against a DuckDB levenshtein oracle on real data (supplier
    names: structured, shared prefixes — the worst case for a gram
    filter's selectivity, the best case for catching bugs)."""
    import duckdb

    from sea_serpent_spark.operators.fuzzy import edit_distance_pairs

    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in edit_distance_pairs(
            sup, "s_name", "s_suppkey", max_distance=2
        ).collect()
    }
    want = {
        tuple(r)
        for r in duckdb.sql(
            f"""
            SELECT a.s_suppkey, b.s_suppkey,
                   levenshtein(a.s_name, b.s_name) AS d
            FROM '{sf_dir}/supplier.parquet' a,
                 '{sf_dir}/supplier.parquet' b
            WHERE a.s_suppkey < b.s_suppkey
              AND levenshtein(a.s_name, b.s_name) <= 2
            """
        ).fetchall()
    }
    assert got == want
    assert want  # supplier names actually contain near-matches


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------

def test_pq_roundtrip_and_topk_recall(spark):
    """PQ on tightly clustered data: codebook shapes, deterministic
    encoding, and ADC top-k recovering within-cluster neighbors that
    exact brute force finds."""
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    for c in range(8):
        center = rng.standard_normal(16)
        center /= np.linalg.norm(center)
        for j in range(12):
            v = center + 0.03 * rng.standard_normal(16)
            rows.append((c * 100 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    books = S.pq_fit(df, m=4, ksub=8, iters=3, seed=7)
    assert len(books) == 4
    assert all(len(b) == 8 for b in books)
    assert all(len(c) == 4 for b in books for c in b)

    enc = S.pq_encode(df, books)
    codes = {r["vec_id"]: r["pq_code"] for r in enc.collect()}
    assert all(len(v) == 4 for v in codes.values())
    # deterministic re-encode
    codes2 = {r["vec_id"]: r["pq_code"] for r in S.pq_encode(df, books).collect()}
    assert codes == codes2
    # all codes within the codebook range
    assert all(0 <= x < 8 for v in codes.values() for x in v)

    q = df.where(F.col("vec_id") % 100 == 0)
    pq10 = {
        (r["query_id"], r["neighbor_id"])
        for r in S.pq_topk(enc, q, books, k=10).collect()
    }
    brute3 = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(df, q, k=3).collect()
    }
    # standard ANN measure (recall@10 vs exact top-3): a 4×8 code can't
    # rank within a tight cluster (distances quantize to ties) but the
    # true nearest must land in the shortlist a re-ranker would rescore
    recall = len(pq10 & brute3) / len(brute3)
    assert recall >= 0.9, recall
    # and the coarse geometry holds: retrieved = the query's own cluster
    assert all(qid // 100 == nid // 100 for qid, nid in pq10)


def test_pq_encode_bit_parity_with_sql_fold(spark):
    """The numpy encode path is BIT-identical to Spark's SQL fold for
    BOTH input dtypes — including float32, where parity requires
    squaring in the source dtype before widening (the q41 oracle only
    covers the cast-to-double path). Vectors include 1e±18 magnitude
    spikes so any accumulation-order or promotion difference actually
    changes the norm."""
    import numpy as np

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((20, 8))
    vecs[3, 0] = 1e18   # magnitude spike: order/promotion-sensitive
    vecs[7, 5] = 1e-18
    books = [[[float(x) for x in rng.standard_normal(4)]
              for _ in range(4)] for _ in range(2)]

    def ref_codes(df, vec_col):
        """The pre-round-8 pure-expression formulation: slice + fold
        subdistances, struct array_min argmin — the SQL-fold truth."""
        uv = F.transform(
            F.col(vec_col),
            lambda x: x / F.greatest(
                F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0),
                                   lambda a, v: a + v * v)),
                F.lit(1e-12),
            ),
        )
        codes = []
        for j in range(2):
            sub = F.slice(uv, j * 4 + 1, 4)
            scored = F.array(*[
                F.struct(
                    F.aggregate(
                        F.zip_with(sub, F.array(*[F.lit(x) for x in c]),
                                   lambda a, b: (a - b) * (a - b)),
                        F.lit(0.0), lambda acc, v: acc + v,
                    ).alias("d"),
                    F.lit(ci).alias("c"),
                )
                for ci, c in enumerate(books[j])
            ])
            codes.append(F.array_min(scored).getField("c"))
        return df.select("vec_id", F.array(*codes).alias("ref"))

    for dtype in ("float", "double"):
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            f"vec_id long, embedding array<{dtype}>",
        )
        got = {r["vec_id"]: list(r["pq_code"])
               for r in S.pq_encode(df, books).collect()}
        want = {r["vec_id"]: list(r["ref"])
                for r in ref_codes(df, "embedding").collect()}
        assert got == want, dtype


def test_pq_encode_degrades_on_null_and_ragged_vectors(spark):
    """NULL or dimension-mismatched vectors get a NULL code instead of
    failing the job under ANSI mode (round-7 ADVICE), and pq_topk keeps
    NULL-coded corpus rows out of the ranking — an unfiltered NULL
    distance would sort FIRST under the ascending window order."""
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [
        (i, [float(x) for x in rng.standard_normal(8)]) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = S.pq_fit(df, m=2, ksub=4, iters=2, seed=5)

    bad = spark.createDataFrame(
        [(100, None), (101, [0.1, 0.2]), (102, [])],
        "vec_id long, embedding array<double>",
    )
    enc = S.pq_encode(df.unionByName(bad), books)
    codes = {r["vec_id"]: r["pq_code"] for r in enc.collect()}
    assert codes[100] is None and codes[101] is None and codes[102] is None
    assert all(codes[i] is not None for i in range(6))

    out = S.pq_topk(enc, df.where(F.col("vec_id") == 0), books, k=100)
    neighbors = {r["neighbor_id"] for r in out.collect()}
    assert neighbors == {1, 2, 3, 4, 5}  # degraded rows never ranked


def test_staging_column_collisions_rejected(spark):
    """Operators that stage internal dunder columns refuse inputs that
    already carry those names instead of silently destroying them."""
    df = spark.createDataFrame(
        [(1, [0.1, 0.2], 7.0)], "vec_id long, embedding array<double>, __an double"
    )
    with pytest.raises(ValueError, match="__an"):
        S.ivf_assign(df, [[1.0, 0.0], [0.0, 1.0]])
    df2 = spark.createDataFrame(
        [(1, [0.1, 0.2], [0, 0])],
        "vec_id long, embedding array<double>, __code array<int>",
    )
    books = [[[0.0, 0.0], [1.0, 1.0]]]
    with pytest.raises(ValueError, match="__code"):
        S.pq_topk(df2, df2, books, k=1)


def test_ivf_pq_same_cluster_only(spark):
    """IVF-PQ: with cluster labels on both sides, only same-cluster
    candidates are scored (and the join is a broadcast equi-join, not a
    cross join)."""
    import numpy as np

    from sea_serpent_spark.operators.plan_report import plan_report

    rng = np.random.default_rng(9)
    rows = []
    for c in range(4):
        center = rng.standard_normal(8)
        center /= np.linalg.norm(center)
        for j in range(10):
            v = center + 0.02 * rng.standard_normal(8)
            rows.append((c * 100 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = S.kmeans_fit(df, k=4, iters=3, seed=2)
    lab = S.ivf_assign(df, cents)
    books = S.pq_fit(df, m=2, ksub=8, iters=2, seed=2)
    enc = S.pq_encode(lab, books)
    q = enc.where(F.col("vec_id") % 100 == 0)
    out = S.pq_topk(enc, q, books, k=3, cluster_col="label")
    pairs = {(r["query_id"], r["neighbor_id"]) for r in out.collect()}
    assert pairs
    assert all(a // 100 == b // 100 for a, b in pairs)
    rep = plan_report(out)
    assert not rep["has_cartesian"]


def test_connected_components_stats_hook(spark):
    """The optional stats dict reports rounds-to-convergence and
    per-round wall — scale-rehearsal observability with no extra jobs.
    Small inputs report the union-find fast path instead of rounds."""
    from sea_serpent_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    stats: dict = {}
    got = {
        r.id: r.component
        for r in connected_components(pairs, stats=stats).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert stats["small_graph"] and stats["rounds"] == 0

    stats = {}
    got2 = {
        r.id: r.component
        for r in connected_components(
            pairs, stats=stats, small_graph_threshold=0
        ).collect()
    }
    assert got2 == got
    assert stats["rounds"] >= 1
    assert len(stats["round_wall_s"]) == stats["rounds"]
    # the key is present (False) on the distributed path too — callers
    # may branch on stats["small_graph"] regardless of which path ran
    assert stats["small_graph"] is False
    assert all(w >= 0 for w in stats["round_wall_s"])


def test_connected_components_small_graph_parity(spark):
    """The union-find fast path and the distributed pointer-doubling
    loop label a messy random graph IDENTICALLY (min reachable id),
    for long ids and for string ids (UTF-8 order = code-point order)."""
    import random

    from sea_serpent_spark.operators.dedup import connected_components

    rng = random.Random(17)
    edges = [
        (rng.randrange(120), rng.randrange(120)) for _ in range(150)
    ]
    lp = spark.createDataFrame(edges, "id_a long, id_b long")
    sp = spark.createDataFrame(
        [(f"d{a:03d}", f"d{b:03d}") for a, b in edges],
        "id_a string, id_b string",
    )
    for pairs in (lp, sp):
        fast = {
            r.id: r.component for r in connected_components(pairs).collect()
        }
        dist = {
            r.id: r.component
            for r in connected_components(
                pairs, small_graph_threshold=0
            ).collect()
        }
        assert fast == dist and fast


def test_connected_components_long_chain_pointer_doubling(spark):
    """A 200-link chain (diameter ≫ the old per-hop round budget) still
    collapses to one component — pointer doubling needs only
    O(log n) rounds — and an impossible budget raises instead of
    returning silently-partial labels."""
    from sea_serpent_spark.operators.dedup import connected_components

    n = 200
    pairs = spark.createDataFrame(
        [(f"d{i:04d}", f"d{i + 1:04d}") for i in range(n)],
        "id_a string, id_b string",
    )
    # small_graph_threshold=0 forces the DISTRIBUTED loop — the pointer
    # doubling and the convergence budget are what this test pins
    got = {
        r.id: r.component
        for r in connected_components(
            pairs, small_graph_threshold=0
        ).collect()
    }
    assert set(got.values()) == {"d0000"}
    assert len(got) == n + 1

    with pytest.raises(RuntimeError):
        connected_components(
            pairs, max_iterations=2, small_graph_threshold=0
        )


def test_strip_duplicate_spans_with_id_column(spark):
    """A corpus that already has a column literally named 'id' must not
    make the flagged-set join ambiguous (review finding)."""
    from sea_serpent_spark.operators import spans as SP

    boiler = "one two three four five"
    df = spark.createDataFrame(
        [(1, 10, f"aa {boiler}"), (2, 20, f"bb {boiler}")],
        ["doc_id", "id", "text"],
    )
    out = {r["doc_id"]: r["text"]
           for r in SP.strip_duplicate_spans(df, span_tokens=5).collect()}
    assert out[1] == f"aa {boiler}"
    assert out[2] == "bb"


def test_expect_data_quality_gate(spark, sf_dir):
    """Expectation report: exact violation counts per rule on a frame
    with known defects; clean contracts report zero; raise mode fires."""
    from sea_serpent_spark import Table
    from sea_serpent_spark.operators.profile import expect

    rows = [
        (1, "a@x.com", 10),
        (2, None, 5),          # not_null violation
        (2, "b@x.com", -3),    # duplicate id + out-of-range
        (4, "not-an-email", 7),  # rlike violation
    ]
    df = spark.createDataFrame(rows, ["uid", "email", "score"])
    rep = {
        (r["column"], r["rule"]): r["violations"]
        for r in expect(
            df,
            {
                "uid": ["not_null", "unique"],
                "email": ["not_null", ("rlike", r"^[^@]+@[^@]+$")],
                "score": [("between", 0, 100)],
            },
        ).collect()
    }
    assert rep[("uid", "not_null")] == 0
    assert rep[("uid", "unique")] == 1
    assert rep[("email", "not_null")] == 1
    assert rep[("email", "rlike(^[^@]+@[^@]+$)")] == 1
    assert rep[("score", "between(0,100)")] == 1

    # clean contract on real data + raise mode
    docs = Table.from_parquet(f"{sf_dir}/documents.parquet", "documents",
                              spark)
    ok = docs.expect({"doc_id": ["not_null", "unique"],
                      "lang": [("in", ["en", "de", "fr", "es", "zh"])]})
    assert ok.df.where("violations > 0").count() == 0
    with pytest.raises(ValueError, match="violations"):
        Table(df, "bad", spark).expect(
            {"uid": ["unique"]}, raise_on_violation=True
        )
    with pytest.raises(ValueError):
        expect(df, {"nope": ["not_null"]})


def test_dataset_diff(spark):
    """Keyed diff: added/removed/changed classification with NULL-safe
    comparison and named changed columns; unchanged rows omitted;
    duplicate keys rejected."""
    from sea_serpent_spark.operators.profile import dataset_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 30), (4, "d", 40)],
        "k long, txt string, num long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10),        # unchanged → omitted
         (2, "b", 20),        # NULL → 20: changed(num)
         (3, "C", None),      # both changed
         (5, "e", 50)],       # added; 4 removed
        "k long, txt string, num long",
    )
    got = {
        r["k"]: (r["change"], sorted(r["changed_cols"]))
        for r in dataset_diff(old, new, on="k").collect()
    }
    assert got == {
        2: ("changed", ["num"]),
        3: ("changed", ["num", "txt"]),
        4: ("removed", []),
        5: ("added", []),
    }

    dup = spark.createDataFrame([(1, "x", 1), (1, "y", 2)],
                                "k long, txt string, num long")
    import pytest as _pt
    with _pt.raises(ValueError, match="duplicate"):
        dataset_diff(dup, new, on="k")


def test_embedding_spanning_component_equivalent(spark, sf_dir):
    """embedding emit='spanning' (exact-vector canonicalization + star
    edges) yields the same connected components as the full pair set —
    pinned on a corpus with injected byte-identical duplicates."""
    from sea_serpent_spark.operators.dedup import connected_components
    from sea_serpent_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    # clone 20 vectors under new ids → exact-duplicate groups
    dups = e.where(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = e.unionByName(dups)
    full = embedding_near_dup_pairs(corpus, threshold=0.9, nbits=0)
    span = embedding_near_dup_pairs(
        corpus, threshold=0.9, nbits=0, emit="spanning"
    )
    n_full, n_span = full.count(), span.count()
    assert 0 < n_span <= n_full
    cf = {r.id: r.component for r in connected_components(full).collect()}
    cs = {r.id: r.component for r in connected_components(span).collect()}
    assert cf == cs


@pytest.mark.parametrize("k", [0, 1, 2])
def test_edit_distance_join_vs_bruteforce(spark, k):
    """Cross-table fuzzy join equals the quadratic levenshtein truth,
    including empty strings and the short/long path boundary."""
    import itertools

    left = [
        (1, "kitten"), (2, "cat"), (3, ""), (4, "spark"), (5, "a"),
        (6, "sitting"),
    ]
    right = [
        (10, "sitting"), (11, "bat"), (12, "x"), (13, "spars"),
        (14, ""), (15, "kitten"),
    ]
    from sea_serpent_spark.operators.fuzzy import edit_distance_join

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    truth = {
        (i, j, lev(sa, sb))
        for (i, sa), (j, sb) in itertools.product(left, right)
        if lev(sa, sb) <= k
    }
    ldf = spark.createDataFrame(left, "sid long, name string")
    rdf = spark.createDataFrame(right, "rid long, label string")
    got = {
        (r["id_l"], r["id_r"], r["distance"])
        for r in edit_distance_join(
            ldf, rdf, "name", "label", "sid", "rid", max_distance=k
        ).collect()
    }
    assert got == truth, (k, got ^ truth)


def test_fuzzy_join_table_method(spark, sf_dir):
    import sea_serpent_spark as ss

    c = ss.Table.from_parquet(f"{sf_dir}/customer.parquet", "customer")
    s = ss.Table.from_parquet(f"{sf_dir}/supplier.parquet", "supplier")
    # different scaffolds ("Customer#…" vs "Supplier#…") — no matches
    out = c.fuzzy_join(s, "c_name", "s_name", "c_custkey", "s_suppkey",
                       max_distance=2)
    assert out.columns == ["id_l", "id_r", "distance"]
    assert len(out) == 0
    # against itself the join must at least find the identical names
    out2 = c.fuzzy_join(c, "c_name", "c_name", "c_custkey", "c_custkey",
                        max_distance=0)
    assert len(out2) == len(c)
