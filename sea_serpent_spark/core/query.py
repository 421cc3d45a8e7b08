"""SQL passthrough preprocessing.

Reference parity: ``Table.query`` (base.py:1616-1649) accepts dtable-db SQL,
auto-appends ``FROM <table>`` when missing (base.py:1643-1644), and the
dialect uses MySQL-style ``LIMIT offset, count``.

Here the target dialect is Spark SQL; we keep the two reference-specific
habits as a tiny preprocessor (SURVEY §7 risk 6):
- auto-``FROM`` injection when the statement has no FROM clause;
- ``LIMIT a, b`` → ``LIMIT b OFFSET a``.
"""

from __future__ import annotations

import re

_LIMIT_COMMA = re.compile(r"\bLIMIT\s+(\d+)\s*,\s*(\d+)", re.IGNORECASE)
_HAS_FROM = re.compile(r"\bFROM\b", re.IGNORECASE)
_SELECT = re.compile(r"^\s*SELECT\b", re.IGNORECASE)
# Clause starting points after which an auto-FROM must be inserted *before*.
_TAIL = re.compile(
    r"\b(WHERE|GROUP\s+BY|HAVING|ORDER\s+BY|LIMIT|OFFSET)\b", re.IGNORECASE
)


def preprocess(sql: str, table_name: str) -> str:
    """Translate reference SQL habits to Spark SQL."""
    out = _LIMIT_COMMA.sub(lambda m: f"LIMIT {m.group(2)} OFFSET {m.group(1)}", sql)
    if _SELECT.match(out) and not _HAS_FROM.search(out):
        m = _TAIL.search(out)
        frm = f" FROM {table_name} "
        if m:
            out = out[: m.start()] + frm + out[m.start() :]
        else:
            out = out.rstrip().rstrip(";") + frm
    return out
