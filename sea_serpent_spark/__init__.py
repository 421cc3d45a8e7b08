"""sea-serpent-spark — a PySpark-native analytics engine with the query and
data-processing capabilities of schlegelp/sea-serpent (reference at
/root/reference), re-expressed Spark-first.

Public surface:
- :class:`Table`, :class:`Column`, :class:`Filter` — the lazy pandas-flavored
  query API (reads compile to Catalyst plans, not SQL strings).
- :class:`Base` — a warehouse of managed, versioned tables (mutation + time
  travel over parquet snapshots; Delta/Iceberg drop-in at cluster scale).
- ``operators`` — links/rollups, dedup, similarity search, text analysis,
  multimodal plumbing.
- ``streaming`` — Structured Streaming over the op-log / events.
"""

from .core import Column, Filter, Table
from .mutation import Base, BundleEdits
from .session import get_spark

__all__ = ["Table", "Column", "Filter", "Base", "BundleEdits", "get_spark"]
__version__ = "0.1.0"
