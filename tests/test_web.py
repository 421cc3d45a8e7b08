"""URL canonicalization + URL-keyed dedup (operators/web.py)."""

import pyspark.sql.functions as F
import pytest

from sea_serpent_spark.operators import web as W


@pytest.fixture(scope="module")
def urls(spark):
    rows = [
        (1, "HTTPS://Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag"),
        (2, "https://example.com/a/b?a=1&b=2"),       # == 1 canonical
        (3, "https://example.com/a/b?a=1&b=3"),       # different query
        (4, "http://Blog.example.CO.UK:80/post/"),
        (5, "ftp://files.example.org:21/x"),           # port kept
        (6, "example.com/no-scheme#frag"),             # passthrough
        (7, None),
        (8, "https://example.com/"),                   # root
        (9, "https://example.com"),                    # == 8 canonical
        (10, "https://example.com/?fbclid=abc"),       # == 8 canonical
    ]
    return spark.createDataFrame(rows, "doc_id long, url string")


def _m(df, expr, name="v"):
    return {
        r["doc_id"]: r[name]
        for r in df.select("doc_id", expr.alias(name)).collect()
    }


def test_normalize_url_policy(urls):
    got = _m(urls, W.normalize_url(F.col("url")))
    assert got[1] == "https://example.com/a/b?a=1&b=2"
    assert got[1] == got[2] and got[3] != got[2]
    assert got[4] == "http://blog.example.co.uk/post"
    assert got[5] == "ftp://files.example.org:21/x"  # non-http port kept
    assert got[6] == "example.com/no-scheme"  # scheme-less: frag strip only
    assert got[7] is None
    assert got[8] == got[9] == got[10] == "https://example.com"


def test_host_and_registered_domain(urls):
    host = _m(urls, W.url_host(F.col("url")))
    dom = _m(urls, W.registered_domain(F.col("url")))
    assert host[1] == "example.com" and dom[1] == "example.com"
    assert host[4] == "blog.example.co.uk" and dom[4] == "example.co.uk"
    assert dom[5] == "example.org"
    assert host[6] == "" and dom[6] == ""  # no scheme → no host claim
    assert host[7] is None


def test_url_dedup_keeps_min_id_and_nulls(urls):
    kept = sorted(r["doc_id"] for r in W.url_dedup(urls).collect())
    # canonical groups: {1,2}, {3}, {4}, {5}, {6}, {8,9,10}; NULL kept
    assert kept == [1, 3, 4, 5, 6, 7, 8]


def test_domain_stats(urls):
    stats = {
        r["domain"]: (r["n_docs"], r["n_hosts"])
        for r in W.domain_stats(urls.where("url is not null")).collect()
    }
    assert stats["example.com"] == (6, 1)
    assert stats["example.co.uk"] == (1, 1)
    assert stats["example.org"] == (1, 1)
    assert stats[""] == (1, 1)  # the scheme-less row


def test_zero_shuffle_normalization_plan(urls):
    plan = (
        urls.select(W.normalize_url(F.col("url")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # row-local, no shuffle
    assert "BatchEvalPython" not in plan  # no Python anywhere


def test_normalize_url_idempotent(spark):
    """Canonicalization must be IDEMPOTENT — normalizing a canonical
    URL changes nothing (otherwise two passes over the same corpus
    would disagree). Swept over a structured cross-product of schemes,
    hosts, ports, paths, queries, and fragments."""
    cases = []
    for scheme in ("http", "HTTPS", "ftp", ""):
        for host in ("Example.COM", "a.b.co.uk", "x.io:8080"):
            for path in ("", "/", "/p/q/", "/p", "/p%61th", "/%7Ex%"):
                for q in ("", "?b=2&a=1", "?utm_source=x",
                          "?a=1&utm_x=2", "?k=%2fv&j=%41"):
                    for frag in ("", "#f"):
                        pre = f"{scheme}://" if scheme else ""
                        cases.append(pre + host + path + q + frag)
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(cases)], "i long, url string"
    )
    out = df.select(
        "i",
        W.normalize_url(F.col("url")).alias("c1"),
        W.normalize_url(W.normalize_url(F.col("url"))).alias("c2"),
    ).collect()
    bad = [(r["c1"], r["c2"]) for r in out if r["c1"] != r["c2"]]
    assert not bad, bad[:5]


def test_percent_escape_normalization(spark):
    """RFC 3986: unreserved escapes decode (%41→A, %7E→~), other
    escapes keep their encoding with UPPERCASED hex (%2f→%2F),
    malformed escapes pass through verbatim (r13)."""
    rows = [
        (1, "https://ex.com/p%61th/1"),       # %61 → a
        (2, "https://ex.com/%7Euser"),        # %7E → ~
        (3, "https://ex.com/a?q=%2fx"),       # %2f stays, hex upper
        (4, "https://ex.com/a%ZZb%"),         # malformed: verbatim
        (5, "https://ex.com/a%4"),            # truncated: verbatim
        (6, "https://ex.com/%41%42?x=%7e"),   # mixed case decodes too
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = _m(df, W.normalize_url(F.col("url")))
    assert got[1] == "https://ex.com/path/1"
    assert got[2] == "https://ex.com/~user"
    assert got[3] == "https://ex.com/a?q=%2Fx"
    assert got[4] == "https://ex.com/a%ZZb%"
    assert got[5] == "https://ex.com/a%4"
    assert got[6] == "https://ex.com/AB?x=~"
    # escape folding feeds dedup: %61 form and plain form are one group
    pair = spark.createDataFrame(
        [(1, "https://ex.com/p%61th"), (2, "https://ex.com/path")],
        "doc_id long, url string",
    )
    assert [r["doc_id"] for r in W.url_dedup(pair).collect()] == [1]


def test_registered_domain_psl(spark):
    """Exact PSL lookup (r13): longest rule wins; `*.` wildcards add a
    label; `!` exceptions override their wildcard; a host that IS a
    public suffix has no registered domain; unknown TLDs get the
    implicit `*` rule. Pure broadcast joins — no shuffle."""
    psl = W.psl_rules_df(
        spark,
        ["// snapshot", "", "com", "uk", "co.uk", "io", "github.io",
         "ck", "*.ck", "!www.ck"],
    )
    rows = [
        (1, "https://a.b.example.co.uk/x", "example.co.uk"),
        (2, "https://foo.user.github.io/p", "user.github.io"),
        (3, "https://www.ck/z", "www.ck"),            # exception
        (4, "https://x.www.ck/z", "www.ck"),          # under exception
        (5, "https://shop.any.ck/z", "shop.any.ck"),  # wildcard
        (6, "https://example.com/x", "example.com"),
        (7, "https://co.uk/", None),                  # IS a suffix
        (8, "https://localhost/x", None),             # single label
        (9, "https://a.unknowntld/x", "a.unknowntld"),  # implicit *
        (10, "", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, exp string")
    out = W.registered_domain_psl(df, psl)
    assert out.count() == len(rows)  # folded keys: no row multiplication
    bad = [
        (r["url"], r["domain"], r["exp"])
        for r in out.collect()
        if r["domain"] != r["exp"]
    ]
    assert not bad, bad
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_fold_idn_host(spark):
    """r13: Unicode hosts fold to punycode, so the IRI form and the
    already-encoded form canonicalize identically; ASCII inputs and
    IPv6 literals pass through untouched; the fold composes with
    normalize_url."""
    rows = [
        (1, "https://MÜnchen.de/x"),            # IRI form
        (2, "https://xn--mnchen-3ya.de/x"),          # pre-encoded
        (3, "https://example.com/a?b=1"),            # pure ASCII
        (4, "https://[2001:db8::1]:8080/p"),         # IPv6 literal
        (5, "https://user@bücher.ch:8443/y"),   # userinfo + port
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = _m(df, W.normalize_url(W.fold_idn_host(F.col("url"))))
    assert got[1] == got[2] == "https://xn--mnchen-3ya.de/x"
    assert got[3] == "https://example.com/a?b=1"
    assert got[4] == "https://[2001:db8::1]:8080/p"
    assert got[5] == "https://user@xn--bcher-kva.ch:8443/y"
    assert got[6] is None
    # dedup across encodings: one survivor
    pair = spark.createDataFrame(rows[:2], "doc_id long, url string")
    folded = pair.select(
        "doc_id", W.fold_idn_host(F.col("url")).alias("url")
    )
    assert [r["doc_id"] for r in W.url_dedup(folded).collect()] == [1]


def test_psl_auto_widens_to_rule_width(spark):
    """r13: a snapshot with rules wider than the default join fan must
    auto-widen — a silently-out-of-fan 5-label rule would misresolve
    every host under it."""
    psl = W.psl_rules_df(
        spark, ["com", "a.b.c.d.e"]  # 5-label rule > default 4
    )
    df = spark.createDataFrame(
        [(1, "https://x.a.b.c.d.e/p")], "doc_id long, url string"
    )
    out = W.registered_domain_psl(df, psl).collect()
    assert out[0]["domain"] == "x.a.b.c.d.e"


def test_normalize_url_fuzz_idempotent(spark):
    """Seeded fuzz (r13): over arbitrary printable garbage — malformed
    escapes, stray separators, unicode — normalize_url must never
    throw and must stay idempotent (a second pass is a no-op). One
    Spark job for the whole deterministic corpus."""
    import random

    rng = random.Random(1306)
    alphabet = (
        "abcXYZ019 %/?#&=:@.~-_+[]%%éß́" + "%41%7e%2F%zz"
    )
    seeds = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(40)))
        for _ in range(60)
    ] + [
        "http://",
        "http://%",
        "http://a.b/%%41",
        "https://h/p?%3D=%3d&=&a",
        "a://b:c@d:e/f%g#h%41",
        "HTTP://[::1]/%7e",
    ]
    cases = []
    for i, s in enumerate(seeds):
        cases.append((2 * i, s))
        cases.append((2 * i + 1, f"https://ex.com/{s}"))
    df = spark.createDataFrame(cases, "i long, url string")
    out = df.select(
        W.normalize_url(F.col("url")).alias("c1"),
        W.normalize_url(W.normalize_url(F.col("url"))).alias("c2"),
    ).collect()
    bad = [(r["c1"], r["c2"]) for r in out if r["c1"] != r["c2"]]
    assert not bad, bad[:5]


def test_trailing_dot_fqdn_host(spark):
    """r14 (ADVICE): a trailing FQDN root dot is not part of the host
    identity — url_host strips it, so registered_domain(_psl) label
    matching sees canonical labels instead of firing the implicit '*'
    rule on an empty last label."""
    rows = [
        (1, "https://example.com./x"),
        (2, "https://example.com/x"),
        (3, "https://blog.example.co.uk.:443/p"),
        (4, "https://a.b.example.co.uk./q"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    host = _m(df, W.url_host(F.col("url")))
    assert host[1] == host[2] == "example.com"
    assert host[3] == "blog.example.co.uk"
    dom = _m(df, W.registered_domain(F.col("url")))
    assert dom[1] == dom[2] == "example.com"
    psl = W.psl_rules_df(spark, ["com", "uk", "co.uk"])
    out = {
        r["doc_id"]: r["domain"]
        for r in W.registered_domain_psl(df, psl).collect()
    }
    assert out[1] == out[2] == "example.com"
    assert out[3] == out[4] == "example.co.uk"


def test_psl_unicode_rules_fold(spark):
    """r14: unicode PSL rule lines IDNA-fold to punycode keys at parse
    time, so a real published snapshot (which carries both spellings)
    composes with fold_idn_host — the unicode and xn-- spellings of a
    rule produce IDENTICAL registered_domain output and fold to ONE
    rules row (no row multiplication)."""
    uni = W.psl_rules_df(spark, ["中国", "*.例え.jp", "com"])
    puny = W.psl_rules_df(
        spark, ["xn--fiqs8s", "*.xn--r8jz45g.jp", "com"]
    )
    assert sorted(r["key"] for r in uni.collect()) == sorted(
        r["key"] for r in puny.collect()
    )
    # both spellings in one snapshot fold to one key → one row
    both = W.psl_rules_df(spark, ["中国", "xn--fiqs8s"])
    assert both.count() == 1
    rows = [
        (1, "https://公司.中国/x"),        # IRI host, unicode TLD
        (2, "https://xn--55qx5d.xn--fiqs8s/x"),  # same, pre-encoded
        (3, "https://shop.site.例え.jp/y"),  # under the wildcard
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    folded = df.select(
        "doc_id", W.fold_idn_host(F.col("url")).alias("url")
    )
    for snapshot in (uni, puny):
        got = {
            r["doc_id"]: r["domain"]
            for r in W.registered_domain_psl(folded, snapshot).collect()
        }
        assert got[1] == got[2] == "xn--55qx5d.xn--fiqs8s"
        assert got[3] == "shop.site.xn--r8jz45g.jp"
