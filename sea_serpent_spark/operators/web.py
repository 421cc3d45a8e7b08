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
- trailing path slashes stripped (root collapses to the bare
  authority);
- inputs WITHOUT a scheme pass through untouched except trim +
  fragment strip (no guessing).

``registered_domain`` uses the pragmatic 2/3-label heuristic (last two
labels, or three when the second-level label is a known generic like
``co``/``com``/``ac`` under a 2-character ccTLD — ``example.co.uk``).
A full Public-Suffix-List lookup is a broadcast-joinable table a
deployment can layer on top; the heuristic covers the overwhelmingly
common cases and stays expression-only.

Reference: the reference has no web/URL surface (HTTP client for a
table server) — beyond-reference LLM-pipeline extension (SURVEY §7
Phase 5), same family as the text-analysis operators.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: Tracking parameters dropped by :func:`normalize_url` — matched
#: against the full ``name=value`` token (or bare ``name``).
TRACKING_PARAM_RE = (
    r"^(utm_[^=]*|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)(=.*)?$"
)

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


def normalize_url(col: Column) -> Column:
    """Canonical form of a URL column (policy in the module docstring).
    NULL-safe; scheme-less inputs pass through (trim + fragment strip
    only)."""
    u, scheme, auth, pathq = _parts(col)
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
    return F.when(scheme == "", u).otherwise(rebuilt)


def url_host(col: Column) -> Column:
    """Lowercased host of a URL (port stripped unconditionally —
    hosts, unlike canonical URLs, are port-free identities). Scheme-
    less inputs yield ''."""
    _, scheme, auth, _ = _parts(col)
    host = F.regexp_replace(F.lower(auth), r":\d+$", "")
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
