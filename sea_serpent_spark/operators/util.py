"""Partitioning helpers shared by the pair-generating operators.

Local-mode scans of small files arrive as one split and AQE sizes stages
by their *inputs*, so compute-heavy or expansive operators need explicit
fan-out to use the cluster. At real scale inputs have thousands of splits
and these become no-ops / cheap narrow shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition iff the input has fewer partitions than the target.

    CPU-heavy per-row operators (hashing, shingling, vector math) are
    otherwise bound by scan parallelism — a single small parquet file is
    one split, so on local[32] the whole operator would run on one core."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def spread(df: DataFrame) -> DataFrame:
    """Unconditional round-robin repartition to the default parallelism.

    For candidate-pair sets before a verify join: candidate generation is
    *expansive*, and AQE sizes the enumerate stage by its (tiny) input,
    so the expensive verification would otherwise run in one or two
    tasks. An explicit repartition (which AQE honors) moves only narrow
    id-pairs and parallelizes the verify."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)
