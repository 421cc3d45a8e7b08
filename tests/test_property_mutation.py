"""Property-based mutation-store equivalence: a random sequence of edits
(scalar assignment, predicate write, append, predicate delete) applied
through the versioned store must leave exactly the state a pandas mirror
reaches applying the same edits — for EVERY random interleaving, not
just the README walkthrough the directed tests replay.

Each hypothesis example builds a fresh managed table (commits are real
file-granular COW writes), so examples are capped low; the value is the
interleaving coverage, not the count.
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sea_serpent_spark import Base

LABELS = ["A", "B", "C", "D"]


def _op_strategy():
    scalar_write = st.tuples(
        st.just("set_scalar"),
        st.sampled_from(["val", "flag"]),
        st.one_of(st.integers(-5, 5), st.none()),
    )
    pred_write = st.tuples(
        st.just("pred_write"),
        st.integers(0, 25),          # key threshold
        st.sampled_from(LABELS),     # new label
    )
    append = st.tuples(
        st.just("append"),
        st.integers(1, 3),           # rows to add
    )
    delete = st.tuples(
        st.just("delete"),
        st.integers(0, 19),          # delete the row with this key
    )
    upsert = st.tuples(
        st.just("upsert"),
        st.lists(                    # (key, new label) pairs, unique keys
            st.tuples(st.integers(0, 30), st.sampled_from(LABELS)),
            min_size=1, max_size=3,
            unique_by=lambda kv: kv[0],
        ),
    )
    return st.one_of(scalar_write, pred_write, append, delete, upsert)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(ops=st.lists(_op_strategy(), min_size=1, max_size=4))
def test_mutation_sequence_matches_pandas(spark, tmp_path_factory, ops):
    wh = tmp_path_factory.mktemp("wh")
    base = Base(str(wh), spark, user="prop")
    start = pd.DataFrame({
        "key": range(20),
        "val": [i % 7 for i in range(20)],
        "labels": [LABELS[i % 4] for i in range(20)],
    })
    name = "t_prop"
    base.from_frame(start, name)
    t = base.table(name)
    mirror = start.copy()
    next_key = 100
    # (version, mirror state) after every op — an op may commit more
    # than once (create-on-assign = add_column + set), so the version
    # is read back from the store's own history
    snapshots: list[tuple[int, pd.DataFrame]] = []

    for op in ops:
        if op[0] == "set_scalar":
            _, col, v = op
            if col == "flag" and "flag" not in t.columns:
                t.add_column("flag", int)
                mirror["flag"] = pd.Series([None] * len(mirror),
                                           dtype="object")
            t[col] = v
            mirror[col] = v
        elif op[0] == "pred_write":
            _, thr, lab = op
            t.loc[t.key >= thr, "labels"] = lab
            mirror.loc[mirror["key"] >= thr, "labels"] = lab
        elif op[0] == "append":
            _, n = op
            add = pd.DataFrame({
                "key": range(next_key, next_key + n),
                "val": [0] * n,
                "labels": ["A"] * n,
            })
            next_key += n
            t.append(add)
            mirror = pd.concat([mirror, add], ignore_index=True)
        elif op[0] == "delete":
            _, d = op
            t.delete_rows(t.key == d)
            mirror = mirror[mirror["key"] != d]
        else:  # upsert: matched keys update labels, new keys insert
            _, kvs = op
            src = pd.DataFrame(
                {"key": [k for k, _ in kvs],
                 "labels": [l for _, l in kvs]}
            )
            t.upsert(src, on="key")
            existing = set(mirror["key"])
            for k, lab in kvs:
                if k in existing:
                    mirror.loc[mirror["key"] == k, "labels"] = lab
                else:
                    row = {c: None for c in mirror.columns}
                    row["key"], row["labels"] = k, lab
                    mirror = pd.concat(
                        [mirror, pd.DataFrame([row])], ignore_index=True
                    )

        snapshots.append(
            (max(e["version"] for e in base.history(name)), mirror.copy())
        )

    norm = lambda x: (None if pd.isna(x) else x)  # noqa: E731

    def _check(table, expect, ctx):
        got = (
            table.to_frame(row_id_index=False)
            .drop(columns=["_seq", "_id"], errors="ignore")
            .sort_values("key")
            .reset_index(drop=True)
        )
        cols = [c for c in expect.columns]
        assert sorted(got.columns) == sorted(cols), (ctx, got.columns)
        for c in cols:
            g = [norm(x) for x in got[c].tolist()]
            m = [norm(x) for x in expect.sort_values("key")[c].tolist()]
            assert g == m, (ctx, c, ops)

    _check(t, mirror, "final")
    # time travel: EVERY intermediate version must reproduce the mirror
    # state as of that op — exact snapshots across a random history,
    # not just the version-0 round trip the directed q50 test replays
    for v, snap in snapshots:
        _check(base.table(name, version=v), snap, f"version={v}")
