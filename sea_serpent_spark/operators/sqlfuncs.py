"""Native SQL surface for the text/curation functions.

The reference is SQL-first: every read compiles to a SQL string POSTed
to the server (reference base.py:1616), and our ``Table.query``
passthrough covers that surface for relational queries. This module
extends it to the text/curation functions: ``register_sql_functions``
creates Spark **SQL UDFs** (``CREATE FUNCTION ... RETURNS ... RETURN
<expr>`` — declarative bodies, inlined by Catalyst at plan time, NOT
Python UDFs) so `spark.sql` users get `ss_quality(text)` etc. with
bit-identical semantics to the Column API.

Bodies are GENERATED from the same constants the Column operators use
(LANG_MARKERS, PII_PATTERNS, GOPHER regexes) — one source of truth; the
parity test runs both surfaces over the same corpus and asserts equal
output. Because the bodies are pure SQL expressions, the functions cost
the same as the Column forms at 100 TB: same codegen, same single scan,
no serialization boundary.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .curation import PII_PATTERNS
from .text import BPE_TOKEN_RE, LANG_MARKERS, LANGS, PUNCT_RE

#: tokenized words of s (Spark SQL fragment)
_WORDS = r"split(lower(trim(s)), '\\s+')"
_DWORDS = f"array_distinct({_WORDS})"


def _sql_str(lit: str) -> str:
    """Spark SQL string literal with backslashes/quotes escaped (the
    session default treats backslash as an escape in literals)."""
    return "'" + lit.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _arr(vals: list[str]) -> str:
    return "array(" + ", ".join(_sql_str(v) for v in vals) + ")"


def _punct_ratio() -> str:
    strip = f"regexp_replace(s, {_sql_str(PUNCT_RE)}, '')"
    return (
        "CASE WHEN length(s) = 0 THEN CAST(0.0 AS DOUBLE) "
        f"ELSE (length(s) - length({strip})) / length(s) END"
    )


def _stopword_ratio() -> str:
    sw = _arr(LANG_MARKERS["en"])
    return (
        f"CASE WHEN size({_WORDS}) = 0 THEN CAST(0.0 AS DOUBLE) "
        f"ELSE size(filter({_WORDS}, w -> array_contains({sw}, w))) "
        f"/ size({_WORDS}) END"
    )


def _quality() -> str:
    pr, sw = _punct_ratio(), _stopword_ratio()
    raw = (
        f"0.4D * least(length(s) / 500.0D, 1.0D) "
        f"+ 0.3D * (1.0D - ({pr})) "
        f"+ 0.3D * (1.0D - abs(({sw}) - 0.3D) / 0.7D)"
    )
    return f"floor(({raw}) * 10000 + 0.5D) / 10000"


def _lang_id() -> str:
    scores = {
        lang: f"size(array_intersect({_DWORDS}, {_arr(ms)}))"
        for lang, ms in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(scores.values()) + ")"
    case = "CASE "
    for lang in LANGS:
        case += (
            f"WHEN {scores[lang]} > 0 AND {scores[lang]} = {best} "
            f"THEN '{lang}' "
        )
    return case + "ELSE 'und' END"


def _dup_frac(arr: str) -> str:
    return (
        f"CASE WHEN size({arr}) <= 0 THEN CAST(0.0 AS DOUBLE) "
        f"ELSE floor((1.0D - size(array_distinct({arr})) / size({arr})) "
        f"* 10000 + 0.5D) / 10000 END"
    )


def _grams2() -> str:
    m = f"greatest(size({_WORDS}) - 1, 0)"
    return (
        f"zip_with(slice({_WORDS}, 1, {m}), slice({_WORDS}, 2, {m}), "
        f"(a, b) -> concat(a, ' ', b))"
    )


def _redact() -> str:
    body = "s"
    for pat, repl in PII_PATTERNS.values():
        body = f"regexp_replace({body}, {_sql_str(pat)}, '{repl}')"
    return body


def _normalize() -> str:
    ctrl = _sql_str(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")
    hws = _sql_str(r"[ \t]+")
    nls = _sql_str(r"\n{3,}")
    c = f"regexp_replace(s, {ctrl}, '')"
    c = f"regexp_replace({c}, {hws}, ' ')"
    c = f"regexp_replace({c}, {nls}, '\\n\\n')"
    return f"trim({c})"


#: name → (return type, SQL body over parameter ``s STRING``)
SQL_FUNCTIONS: dict[str, tuple[str, str]] = {
    "token_count": (
        "INT",
        f"CASE WHEN length(trim(s)) = 0 THEN 0 ELSE size({_WORDS}) END",
    ),
    "bpe_token_count": (
        "INT",
        f"size(regexp_extract_all(lower(s), {_sql_str(BPE_TOKEN_RE)}, 0))",
    ),
    "punct_ratio": ("DOUBLE", _punct_ratio()),
    "stopword_ratio": ("DOUBLE", _stopword_ratio()),
    "quality": ("DOUBLE", _quality()),
    "lang_id": ("STRING", _lang_id()),
    "fingerprint": ("STRING", f"md5(concat_ws(' ', {_WORDS}))"),
    "dup_word_frac": ("DOUBLE", _dup_frac(_WORDS)),
    "dup_2gram_frac": ("DOUBLE", _dup_frac(_grams2())),
    "redact_pii": ("STRING", _redact()),
    "normalize_text": ("STRING", _normalize()),
}


def register_sql_functions(
    spark: SparkSession, prefix: str = "ss_", temporary: bool = True
) -> list[str]:
    """Register every text/curation function as a SQL UDF named
    ``{prefix}{name}(s STRING)``; returns the registered names.
    ``temporary=False`` persists them in the session catalog's current
    database (survives across sessions on a real metastore)."""
    kind = "TEMPORARY FUNCTION" if temporary else "FUNCTION"
    names = []
    for name, (rtype, body) in SQL_FUNCTIONS.items():
        fn = f"{prefix}{name}"
        spark.sql(
            f"CREATE OR REPLACE {kind} {fn}(s STRING) "
            f"RETURNS {rtype} RETURN {body}"
        )
        names.append(fn)
    return names
