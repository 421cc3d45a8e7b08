"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``sea_serpent_spark.workload`` (core relational
surface) and ``sea_serpent_spark.workload_ext`` (LLM-data-pipeline
extensions: dedup, similarity, text analysis, streaming shapes).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the engine's loc-read surface end-to-end (predicate pushdown +
    projection pruning through Table/Column/Filter)."""
    from sea_serpent_spark.workload import q22_tpch_q1

    return q22_tpch_q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sea_serpent_spark.workload import QUERIES

    out = dict(QUERIES)
    try:
        from sea_serpent_spark.workload_ext import QUERIES_EXT

        out.update(QUERIES_EXT)
    except ImportError:
        pass
    try:
        from sea_serpent_spark.workload_mut import QUERIES_MUT

        out.update(QUERIES_MUT)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from sea_serpent_spark.workload import ORACLES

    out = dict(ORACLES)
    try:
        from sea_serpent_spark.workload_ext import ORACLES_EXT

        out.update(ORACLES_EXT)
    except ImportError:
        pass
    try:
        from sea_serpent_spark.workload_mut import ORACLES_MUT

        out.update(ORACLES_MUT)
    except ImportError:
        pass
    return out
