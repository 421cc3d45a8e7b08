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
        self._touched_modes: list = []
        self._transforms: list = []
        self._cleanups: list = []  # run after flush (e.g. cache unpersist)

    def add(self, new_df, op, detail, oplog, touched=None,
            transform=None) -> None:
        self._df = new_df
        self._ops.append((op, detail))
        self._touched_modes.append(touched)
        self._transforms.append(transform)
        if oplog is not None:
            self._oplogs.append(oplog)

    def __enter__(self):
        self.table._bundle = self
        return self

    def __exit__(self, exc_type, exc, tb):
        try:
            return self._flush(exc_type)
        finally:
            for fn in self._cleanups:
                fn()

    def _flush(self, exc_type):
        self.table._bundle = None
        if exc_type is not None:
            # abandon queued edits; reload committed state
            fresh = self.table.store.table(self.table.name)
            self.table.df = fresh.df
            self.table._version = fresh._version
            return False
        if self._df is not None:
            combined = None
            for ol in self._oplogs:
                combined = ol if combined is None else combined.unionByName(ol)
            # COW mode: only when every queued edit is oplog-scoped can
            # the single flush rewrite just the touched buckets; any
            # schema change or append in the bundle forces a full write.
            all_oplog = self._touched_modes and all(
                m == "oplog" for m in self._touched_modes
            )
            composed = None
            if all_oplog and all(t is not None for t in self._transforms):
                ts = list(self._transforms)

                # replay each edit IN ORDER with its own captured change
                # set (opl=None) — the combined oplog can't tell two
                # edits on the same column apart (shared op_id)
                def composed(src, opl=None):
                    for t in ts:
                        src = t(src, None)
                    return src

            self.table.store._commit(
                self.table.name,
                self._df,
                "bundle",
                {"ops": [op for op, _ in self._ops]},
                combined,
                touched="oplog" if (all_oplog and combined is not None) else None,
                transform=composed,
            )
            fresh = self.table.store.table(self.table.name)
            self.table.df = fresh.df
            self.table._version = fresh._version
        return False
