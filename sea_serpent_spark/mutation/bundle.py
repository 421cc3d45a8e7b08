"""BundleEdits — write coalescing context manager.

Reference parity: ``BundleEdits`` (base.py:2629-2693) queues row updates,
merges records by row_id (per-column last-writer-wins) and flushes once on
exit.

Spark-first: each queued edit is a DataFrame transform layered on the
previous one (``F.when`` chains compose, so last-writer-wins per cell falls
out of expression ordering); exit writes ONE snapshot version and one
combined oplog — a single commit instead of the reference's batched HTTP
flushes."""

from __future__ import annotations


class BundleEdits:
    def __init__(self, table):
        if table.store is None:
            raise TypeError("BundleEdits requires a managed table")
        self.table = table
        self._ops: list[tuple] = []
        self._oplogs = []
        self._df = None

    def add(self, new_df, op, detail, oplog) -> None:
        self._df = new_df
        self._ops.append((op, detail))
        if oplog is not None:
            self._oplogs.append(oplog)

    def __enter__(self):
        self.table._bundle = self
        return self

    def __exit__(self, exc_type, exc, tb):
        self.table._bundle = None
        if exc_type is not None:
            # abandon queued edits; reload committed state
            self.table.df = self.table.store.table(self.table.name).df
            return False
        if self._df is not None:
            combined = None
            for ol in self._oplogs:
                combined = ol if combined is None else combined.unionByName(ol)
            self.table.store._commit(
                self.table.name,
                self._df,
                "bundle",
                {"ops": [op for op, _ in self._ops]},
                combined,
            )
            self.table.df = self.table.store.table(self.table.name).df
        return False
