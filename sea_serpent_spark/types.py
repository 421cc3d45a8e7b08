"""SeaTable-ish type system mapped onto Spark types.

Reference parity: ``COLUMN_TYPES`` write-side aliases (utils.py:19-46), the
download-side dtype mapping (``map_columntype_inv``, utils.py:92-128), and
``Table.from_frame`` inference (base.py:437-473).

Deliberate divergences (SURVEY §1.2):
- no int64→int32/float downcasting (utils.py:497-506, 525-530 worked around
  a server limit; Spark is natively 64-bit);
- ±inf rejection is kept (utils.py:508-510, 531-533) but configurable.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import types as T

#: SeaTable column type → Spark type (SURVEY §1.2 table).
SEATABLE_TO_SPARK: dict[str, T.DataType] = {
    "number": T.DoubleType(),
    "number0": T.LongType(),  # precision-0 number
    "text": T.StringType(),
    "long text": T.StringType(),
    "checkbox": T.BooleanType(),
    "date": T.TimestampType(),
    "single-select": T.StringType(),
    "multiple-select": T.ArrayType(T.StringType()),
    "rate": T.IntegerType(),
    "duration": T.LongType(),  # seconds
    "auto-number": T.LongType(),
    "ctime": T.TimestampType(),
    "mtime": T.TimestampType(),
    "creator": T.StringType(),
    "last-modifier": T.StringType(),
    "url": T.StringType(),
    "email": T.StringType(),
    "image": T.ArrayType(T.StringType()),
    "file": T.ArrayType(T.StringType()),
    "collaborator": T.ArrayType(T.StringType()),
    "geolocation": T.StructType(
        [T.StructField("lat", T.DoubleType()), T.StructField("lng", T.DoubleType())]
    ),
    "link": T.ArrayType(T.StringType()),  # linked row ids
}

#: Write-side aliases (utils.py:19-46) normalized to canonical names.
ALIASES: dict[Any, str] = {
    int: "number0",
    float: "number",
    "i": "number0",
    "u": "number0",
    "f": "number",
    "number": "number",
    str: "text",
    "S": "text",
    "text": "text",
    "long_text": "long text",
    "long text": "long text",
    bool: "checkbox",
    "b": "checkbox",
    "checkbox": "checkbox",
    "date": "date",
    "M": "date",
    "select": "single-select",
    "single_select": "single-select",
    "single-select": "single-select",
    "multiple_select": "multiple-select",
    "multiple-select": "multiple-select",
    "rate": "rate",
    "duration": "duration",
    "auto_number": "auto-number",
    "auto-number": "auto-number",
    "ctime": "ctime",
    "mtime": "mtime",
    "creator": "creator",
    "last_modifier": "last-modifier",
    "last-modifier": "last-modifier",
    "url": "url",
    "email": "email",
    "image": "image",
    "file": "file",
    "collaborator": "collaborator",
    "location": "geolocation",
    "geolocation": "geolocation",
    "link": "link",
}


def normalize_type(col_type: Any) -> str:
    """Resolve a write-side alias to the canonical SeaTable type name."""
    if isinstance(col_type, str) and col_type in SEATABLE_TO_SPARK:
        return col_type
    try:
        import pandas as pd

        if isinstance(col_type, pd.CategoricalDtype):
            return "single-select"
    except ImportError:  # pragma: no cover
        pass
    if col_type in ALIASES:
        return ALIASES[col_type]
    raise ValueError(f"unknown column type {col_type!r}")


def spark_type(col_type: Any) -> T.DataType:
    return SEATABLE_TO_SPARK[normalize_type(col_type)]


def infer_seatable_type(series) -> tuple[str, dict]:
    """Infer a SeaTable type (+metadata) from a pandas Series
    (from_frame inference, base.py:437-473): object→text, lists→
    multiple-select, categorical→single-select with options, bool→checkbox,
    datetime→date, numeric→number."""
    import pandas as pd
    from pandas.api import types as pt

    meta: dict = {}
    if isinstance(series.dtype, pd.CategoricalDtype):
        meta["options"] = [str(c) for c in series.cat.categories]
        return "single-select", meta
    if pt.is_bool_dtype(series.dtype):
        return "checkbox", meta
    if pt.is_datetime64_any_dtype(series.dtype):
        return "date", meta
    if pt.is_integer_dtype(series.dtype):
        return "number0", meta
    if pt.is_float_dtype(series.dtype):
        return "number", meta
    non_null = series.dropna()
    if len(non_null) and non_null.map(lambda v: isinstance(v, (list, tuple))).all():
        return "multiple-select", meta
    return "text", meta


def infer_from_spark_type(dt: T.DataType) -> str:
    """Inverse mapping for distributed ingest (Base.from_df): Spark field
    type → canonical SeaTable type. Coarser than the pandas inference
    (no categorical options from a lazy DataFrame), by design."""
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "number0"
    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        return "number"
    if isinstance(dt, T.BooleanType):
        return "checkbox"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "date"
    if isinstance(dt, T.ArrayType):
        return "multiple-select"
    return "text"


def check_finite(value: Any) -> None:
    """Reject ±inf on write (utils.py:508-510, 531-533)."""
    if isinstance(value, float) and math.isinf(value):
        raise ValueError("±inf cannot be written (reference utils.py:508-510)")


_COMPATIBLE = {
    "number": (int, float),
    "number0": (int,),
    "rate": (int,),
    "duration": (int, float),
    "auto-number": (int,),
    "text": (str,),
    "long text": (str,),
    "single-select": (str,),
    "url": (str,),
    "email": (str,),
    "creator": (str,),
    "last-modifier": (str,),
    "checkbox": (bool,),
    "multiple-select": (list, tuple),
    "collaborator": (list, tuple),
    "image": (list, tuple, str),
    "file": (list, tuple, str),
}


def validate_scalar(value: Any, col_type: str) -> None:
    """Type-compat gate on writes (validate_dtype, utils.py:440-483)."""
    if value is None:
        return  # None clears the cell (base.py:269)
    check_finite(value)
    canonical = normalize_type(col_type)
    allowed = _COMPATIBLE.get(canonical)
    if allowed is None:
        return
    if isinstance(value, bool) and bool not in allowed and canonical != "checkbox":
        raise TypeError(f"cannot write bool to {canonical!r} column")
    if not isinstance(value, allowed):
        raise TypeError(
            f"cannot write {type(value).__name__!r} to {canonical!r} column"
        )
