"""URL canonicalization and URL-keyed dedup for web-scrape corpora.

A crawl's rawest duplicate signal is the URL itself: the same page is
re-crawled as ``HTTP://Example.COM:80/a/`` vs ``http://example.com/a``
vs ``…/a?utm_source=feed``. Canonicalizing BEFORE content dedup removes
the bulk of exact re-crawls for the cost of a row-local expression —
no shingling, no shuffle — which is why every production pipeline runs
a URL pass first and content (minhash/semantic) dedup after.

Everything here is pure ``pyspark.sql.functions`` expressions —
whole-stage-codegen'd regexp/string ops plus interpreted-but-row-local
array ops for the query-parameter sort. Zero shuffles except the
``groupBy`` in :func:`url_dedup` / :func:`domain_stats`, which shuffle
narrow (url-hash / domain) keys only.

Normalization policy (documented, deterministic — the oracle replays
it in SQL):

- fragment stripped; scheme and host lowercased;
- default ports stripped (``:80`` for http, ``:443`` for https —
  other schemes keep their ports);
- tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``ref``, ``mc_cid``, ``mc_eid``), remaining parameters
  SORTED (param order is never semantic in practice, and unsorted
  params are the #1 cause of missed URL dups);
- percent-escapes of UNRESERVED characters decoded (``%7E`` → ``~``,
  ``%41`` → ``A`` — RFC 3986 §2.3: encoders differ, the octets are
  equivalent) and the hex of every REMAINING escape uppercased
  (``%2f`` → ``%2F`` — §2.1 case-insensitivity), applied to the
  path+query BEFORE param filtering/sorting so decoded params sort
  canonically; malformed escapes (``%4``, ``%zz``) pass through
  verbatim. Decoding only unreserved octets cannot create a
  delimiter, so the URL's structure is untouched;
- trailing path slashes stripped (root collapses to the bare
  authority);
- inputs WITHOUT a scheme pass through untouched except trim +
  fragment strip (no guessing).

``registered_domain`` uses the pragmatic 2/3-label heuristic (last two
labels, or three when the second-level label is a known generic like
``co``/``com``/``ac`` under a 2-character ccTLD — ``example.co.uk``).
It stays expression-only (zero dependencies, zero joins) and covers
the overwhelmingly common cases. :func:`registered_domain_psl` (r13)
is the exact variant: a snapshot Public Suffix List (normal, ``*.``
wildcard and ``!`` exception rules — parse raw lines with
:func:`psl_rules_df`) is BROADCAST-joined once per rule-label-width,
so the lookup is k map-side hash probes per row — no shuffle, no row
multiplication, scale-identical to the heuristic.

Reference: the reference has no web/URL surface (HTTP client for a
table server) — beyond-reference LLM-pipeline extension (SURVEY §7
Phase 5), same family as the text-analysis operators.
"""

from __future__ import annotations

import string

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

#: Tracking parameters dropped by :func:`normalize_url` — matched
#: against the full ``name=value`` token (or bare ``name``).
TRACKING_PARAM_RE = (
    r"^(utm_[^=]*|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)(=.*)?$"
)

#: uppercase-hex byte → decoded char for RFC 3986 unreserved octets
#: (ALPHA / DIGIT / ``-._~``) — the only escapes safe to decode
#: without changing URL structure.
_UNRESERVED = {
    f"{ord(c):02X}": c
    for c in string.ascii_letters + string.digits + "-._~"
}

#: Second-level labels that form a registered domain together with a
#: 2-character ccTLD (``example.co.uk`` → three labels).
_SECOND_LEVELS = ("co", "com", "net", "org", "ac", "gov", "edu")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def _parts(col: Column):
    """(scheme lower, authority, path+query) of a fragment-stripped
    trimmed url — '' scheme means "no scheme present"."""
    u = F.regexp_replace(F.trim(col), "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    auth = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    pathq = F.regexp_replace(rest, r"^[^/?#]*", "")
    return u, scheme, auth, pathq


def _pct_normalize(s: Column) -> Column:
    """Percent-escape normalization (module docstring): decode
    unreserved escapes, uppercase the hex of the rest, pass malformed
    escapes through verbatim. Pure array/string expressions: split on
    ``%``, rewrite the head of each following piece, rejoin — row-
    local, constant-foldable decode map, no UDF."""
    dec = F.create_map(
        *[F.lit(x) for kv in _UNRESERVED.items() for x in kv]
    )
    pieces = F.split(s, "%", -1)

    def _fix(p: Column, i: Column) -> Column:
        hx = F.upper(F.substring(p, 1, 2))
        rest = F.substring(p, 3, 1 << 30)
        decoded = F.element_at(dec, hx)
        return (
            F.when(i == 0, p)  # text before the first '%'
            .when(
                ~p.rlike("^[0-9A-Fa-f]{2}"),  # malformed: keep verbatim
                F.concat(F.lit("%"), p),
            )
            .when(decoded.isNotNull(), F.concat(decoded, rest))
            .otherwise(F.concat(F.lit("%"), hx, rest))
        )

    return F.array_join(F.transform(pieces, _fix), "")


def normalize_url(col: Column) -> Column:
    """Canonical form of a URL column (policy in the module docstring).
    NULL-safe; scheme-less inputs pass through (trim + fragment strip
    only).

    The built tree is memoized per input expression (r14): it is ~150
    py4j round-trips (~0.1 s of driver time) to construct, the result
    is an unresolved Column reusable across plans, and q30 alone
    builds it three times per call (url member, dedup keep side, dedup
    probe side)."""
    from .util import _expr_cache_get, _expr_cache_key, _expr_cache_put

    ck = _expr_cache_key("normalize_url", col._jc.toString())
    cached = _expr_cache_get(ck)
    if cached is not None:
        return cached
    u, scheme, auth, pathq = _parts(col)
    # decode/normalize percent-escapes BEFORE splitting params so
    # decoded params sort canonically; unreserved decodes cannot
    # introduce '/', '?', '&' or '=' (all reserved), so structure
    # parsing below is unaffected
    pathq = _pct_normalize(pathq)
    host = F.lower(auth)
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_replace(
        F.regexp_extract(pathq, r"^([^?]*)", 1), "/+$", ""
    )
    query = F.when(
        pathq.contains("?"),
        F.regexp_replace(pathq, r"^[^?]*\?", ""),
    ).otherwise(F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qn = F.array_join(F.array_sort(kept), "&")
    rebuilt = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qn != "", F.concat(F.lit("?"), qn)).otherwise(F.lit("")),
    )
    out = F.when(scheme == "", u).otherwise(rebuilt)
    _expr_cache_put(ck, out)
    return out


def url_host(col: Column) -> Column:
    """Lowercased host of a URL (port stripped unconditionally —
    hosts, unlike canonical URLs, are port-free identities; a trailing
    FQDN root dot — ``example.com.`` — is stripped too, so rule/label
    matching downstream sees canonical labels). Scheme-less inputs
    yield ''."""
    _, scheme, auth, _ = _parts(col)
    host = F.regexp_replace(F.lower(auth), r":\d+$", "")
    host = F.regexp_replace(host, r"\.$", "")
    return F.when(scheme == "", F.lit("")).otherwise(host)


def registered_domain(col: Column) -> Column:
    """Registered (pay-level) domain of a URL column, by the 2/3-label
    heuristic (module docstring). '' for scheme-less/hostless input."""
    host = url_host(col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    take3 = (
        (n >= 3)
        & F.element_at(parts, -2).isin(*_SECOND_LEVELS)
        & (F.length(F.element_at(parts, -1)) == 2)
    )
    return (
        F.when(host == "", host)
        .when(take3, F.array_join(F.slice(parts, -3, 3), "."))
        .when(n >= 2, F.array_join(F.slice(parts, -2, 2), "."))
        .otherwise(host)
    )


def fold_idn_host(col: Column) -> Column:
    """OPT-IN IDN fold (r13): rewrite a URL's host to its ASCII
    (punycode) form — ``https://MÜNCHEN.de/x`` and
    ``https://xn--mnchen-3ya.de/x`` then canonicalize identically
    through :func:`normalize_url`. Compose as
    ``normalize_url(fold_idn_host(col))``.

    The ASCII form is the canonical URI mapping (RFC 3987 → URI), so
    already-punycode hosts pass through unchanged and only hosts with
    non-ASCII labels are rewritten (stdlib ``idna`` codec — IDNA2003
    nameprep, the pragmatic crawl-dedup choice; labels the codec
    rejects pass through verbatim rather than failing the row). Needs
    per-string Python, so this is an Arrow-batched pandas UDF — the
    designed escape hatch, NOT part of the expression-only
    :func:`normalize_url` default; IPv6 literals and scheme-less
    inputs pass through."""
    import re as _re

    from pyspark.sql import functions as _F
    from pyspark.sql import types as _T

    auth_re = _re.compile(
        r"^([A-Za-z][A-Za-z0-9+.-]*://)([^/?#]*)(.*)$", _re.S
    )

    @_F.pandas_udf(_T.StringType())
    def _fold(s: pd.Series) -> pd.Series:
        def one(u):
            if u is None:
                return None
            if all(ord(c) < 128 for c in u):
                return u  # pure-ASCII fast path (the common case)
            m = auth_re.match(u)
            if not m:
                return u
            scheme, auth, rest = m.groups()
            userinfo, sep, hostport = auth.rpartition("@")
            if hostport.startswith("["):
                return u  # IPv6 literal — nothing to fold
            host, colon, port = hostport.partition(":")
            if host and any(ord(c) > 127 for c in host):
                try:
                    host = host.encode("idna").decode("ascii")
                except UnicodeError:
                    return u
            return scheme + userinfo + sep + host + colon + port + rest

        return s.map(one)

    return _fold(col)


def psl_rules_df(spark: SparkSession, rules: list[str]) -> DataFrame:
    """Parse raw Public-Suffix-List lines → a broadcast-joinable rules
    table ``[key, key_labels, is_norm, is_wild, is_exc]``. Comments
    (``//``) and blanks are skipped; ``*.foo`` stores key ``foo`` with
    ``is_wild`` (public suffix = any ``<label>.foo``); ``!bar.foo``
    stores key ``bar.foo`` with ``is_exc`` (overrides a covering
    wildcard: ``bar.foo`` is a REGISTERED domain, its public suffix is
    ``foo``). Kinds are FOLDED per key — ``foo`` + ``*.foo`` share one
    row — so keys are unique and the lookup join cannot multiply rows.
    Non-ASCII rule labels are IDNA-encoded at parse time (r14: the
    published PSL snapshot carries unicode lines like ``中国``
    alongside punycode ones; hosts arrive punycode after
    :func:`fold_idn_host`, so rule keys must be punycode too —
    unicode and ``xn--`` spellings of a rule fold to ONE key). The
    snapshot is caller-provided — the engine ships no PSL copy;
    pass the file's lines (https://publicsuffix.org/list/, MPL-2.0)."""

    def _ascii_key(body: str) -> str:
        if all(ord(c) < 128 for c in body):
            return body
        try:
            return body.encode("idna").decode("ascii")
        except UnicodeError:
            return body  # un-encodable label: keep verbatim

    folded: dict[str, list[bool]] = {}
    for raw in rules:
        r = raw.strip().lower()
        if not r or r.startswith("//"):
            continue
        if r.startswith("!"):
            body, slot = r[1:], 2
        elif r.startswith("*."):
            body, slot = r[2:], 1
        else:
            body, slot = r, 0
        folded.setdefault(_ascii_key(body), [False, False, False])[
            slot
        ] = True
    from .util import local_rows_df

    # LocalRelation, not createDataFrame (r15): every per-width
    # broadcast build over a parallelize-backed rules frame paid a
    # 1-task Spark job + a whole-stage-codegen compile on first
    # execution (~1.5 s cold EACH, measured on q30); a VALUES literal
    # relation broadcasts driver-side with neither.
    out = local_rows_df(
        spark,
        [
            (k, k.count(".") + 1, v[0], v[1], v[2])
            for k, v in folded.items()
        ],
        "key string, key_labels int, is_norm boolean, "
        "is_wild boolean, is_exc boolean",
    )
    # rule widths are known RIGHT HERE on the driver — stash them so
    # registered_domain_psl can skip its discovery job (r14). A frame
    # that went through any transformation loses the attribute and
    # falls back to the one-job discovery path.
    out._psl_widths = sorted(
        {k.count(".") + 1 for k in folded}
    )
    return out


def registered_domain_psl(
    df: DataFrame,
    psl: DataFrame,
    url_col: str = "url",
    out_col: str = "domain",
    max_rule_labels: int = 4,
) -> DataFrame:
    """``df`` + ``out_col`` = exact PSL registered domain of
    ``url_col`` (NULL when the host has no registered domain — empty,
    or itself a public suffix).

    Spark-first shape: one BROADCAST left join per rule width k
    (host's last-k labels vs the k-label rules) — map-side hash
    probes, zero shuffle, zero row multiplication (PSL keys are
    unique), so at 100 TB this costs the same as the heuristic
    expression. PSL algorithm: the longest matching rule wins, an
    exception rule beats everything (its public suffix is the rule
    minus its leftmost label); no match ⇒ the implicit ``*`` rule
    (public suffix = the last label).

    ``max_rule_labels`` AUTO-WIDENS to the snapshot's actual widest
    key — a 5-label rule silently outside the join fan would otherwise
    misresolve every host under it, the worst failure mode of a lookup
    table. Joins are built ONLY for rule widths the snapshot actually
    contains (r14): a width with zero rules is a left join against an
    empty build side — all-NULL match columns, output-identical, but
    it still cost a broadcast build job and a join operator per query.
    Width discovery is free for frames straight from
    :func:`psl_rules_df` (the parser stashes the widths); any other
    frame pays one collect over the broadcast-sized rules table."""
    widths = getattr(psl, "_psl_widths", None)
    if widths is None:
        widths = sorted(
            int(r[0])
            for r in psl.select("key_labels").distinct().collect()
        )
    else:
        widths = sorted(int(w) for w in widths)
    host = url_host(F.col(url_col))
    out = df.withColumn("__hl", F.split(host, r"\."))
    n = F.size("__hl")
    for k in widths:
        rules_k = F.broadcast(
            psl.where(F.col("key_labels") == k).select(
                F.col("key").alias(f"__pk{k}"),
                F.col("is_norm").alias(f"__nm{k}"),
                F.col("is_wild").alias(f"__wl{k}"),
                F.col("is_exc").alias(f"__xc{k}"),
            )
        )
        suffix_k = F.array_join(F.slice(F.col("__hl"), -k, k), ".")
        out = out.join(
            rules_k,
            (F.size("__hl") >= k) & (suffix_k == F.col(f"__pk{k}")),
            "left",
        )
    # public-suffix label count: exception (longest first) overrides;
    # else max over matches (norm rule of width k ⇒ k; wildcard key of
    # width k covers one extra label ⇒ k+1); default rule '*' ⇒ 1
    exc_len = F.coalesce(
        *[
            F.when(F.col(f"__xc{k}"), F.lit(k - 1))
            for k in reversed(widths)
        ],
        F.lit(None).cast("int"),
    )
    match_terms = [
        c
        for k in widths
        for c in (
            F.when(F.col(f"__nm{k}"), F.lit(k)),
            F.when(F.col(f"__wl{k}"), F.lit(k + 1)),
        )
    ]
    match_len = (
        F.greatest(F.lit(1), *match_terms) if match_terms else F.lit(1)
    )
    out = out.withColumn(
        "__pslen", F.coalesce(exc_len, match_len)
    ).withColumn(
        out_col,
        F.when(
            (F.element_at("__hl", 1) != "") & (n > F.col("__pslen")),
            F.expr(
                "array_join(slice(__hl, -(__pslen + 1), __pslen + 1),"
                " '.')"
            ),
        ),
    )
    drop = ["__hl", "__pslen"]
    for k in widths:
        drop += [f"__pk{k}", f"__nm{k}", f"__wl{k}", f"__xc{k}"]
    return out.drop(*drop)


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the min-``id_col`` row per CANONICAL URL — the first-stage
    dedup of a crawl pipeline (run content dedup on the survivors).
    One groupBy over (canonical url) + a broadcast-friendly semi-join;
    rows whose URL is NULL are kept (no URL ⇒ no URL-dup evidence).
    The semi-join keys on (id, canonical url) — id alone would keep
    EVERY row sharing a winning id when ``id_col`` is not unique
    (r12 advice); with unique ids the extra key is free (same shuffle,
    the url column rides along)."""
    canon = normalize_url(F.col(url_col)).alias("__cu")
    keep = (
        df.select(F.col(id_col).alias("__kid"), canon)
        .where(F.col("__cu").isNotNull())
        .groupBy("__cu")
        .agg(F.min("__kid").alias("__kid"))
    )
    kept = df.join(
        keep,
        (F.col(id_col) == F.col("__kid"))
        & (normalize_url(F.col(url_col)) == F.col("__cu")),
        "left_semi",
    )
    return kept.unionByName(
        df.where(F.col(url_col).isNull())
    )


def domain_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """→ [domain, n_docs, n_hosts]: corpus composition by registered
    domain — the first question asked of any crawl (what's the source
    mix, which domains dominate). One aggregation; narrow keys."""
    return (
        df.select(
            registered_domain(F.col(url_col)).alias("domain"),
            url_host(F.col(url_col)).alias("__h"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("__h").alias("n_hosts"),
        )
    )
