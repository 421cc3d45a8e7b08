"""Version-log checkpoint tests (mutation/store.py `_last_checkpoint`).

The log is append-only JSONL with self-contained entries; the checkpoint
only accelerates lookups. Invariants pinned here:

- checkpoint + tail reads return exactly what a full scan returns
  (entry-for-entry, every version, every cadence phase);
- opens/commits work identically with the checkpoint deleted, corrupt,
  or stale (log externally rewritten) — it can change speed, never
  results;
- deep time travel resolves through the offset index;
- vacuum(trim_log=True) shrinks the log, keeps retained versions
  readable, and re-cuts a valid checkpoint;
- legacy stores (no checkpoint file at all) behave as before.
"""

import json
import os

import pandas as pd
import pytest

from sea_serpent_spark import Base


@pytest.fixture()
def base(spark, tmp_path):
    # small cadence so tests cross several checkpoint boundaries fast
    return Base(str(tmp_path / "wh"), spark, user="tester",
                checkpoint_every=5)


def _make_versions(base, name="t", n_commits=12):
    pdf = pd.DataFrame({"column1": range(1, 11),
                        "labels": [chr(65 + i) for i in range(10)]})
    base.from_frame(pdf, name)
    t = base.table(name)
    for i in range(n_commits - 1):
        t["column1"] = list(range(i, i + 10))
    return base.table(name)


def test_checkpoint_written_on_cadence(base):
    _make_versions(base, n_commits=12)  # versions 0..11
    ck = base._load_ckpt("t")
    assert ck is not None
    assert ck["version"] == 10  # last multiple of 5
    assert ck["entry"]["version"] == 10
    # offset SIDECAR covers every version up to the checkpoint (kept
    # out of _last_checkpoint.json so the open path stays O(1))
    assert "offsets" not in ck
    assert set(base._load_ckpt_idx("t")) == {str(v) for v in range(11)}


def test_ckpt_lookups_equal_full_scan(base):
    _make_versions(base, n_commits=13)
    hist = base.history("t")  # ground truth: full scan
    assert [e["version"] for e in hist] == list(range(13))
    for e in hist:
        got = base._log_entry("t", e["version"])
        assert got == e, f"checkpoint lookup diverged at v{e['version']}"
    assert base._current_version("t") == 12


def test_results_identical_without_checkpoint(base):
    t = _make_versions(base, n_commits=9)
    with_ck = t.to_frame().sort_values("_seq")["column1"].tolist()
    v_with = base._current_version("t")
    os.remove(base._ckpt_path("t"))
    assert base._load_ckpt("t") is None
    assert base._current_version("t") == v_with
    t2 = base.table("t")
    assert t2.to_frame().sort_values("_seq")["column1"].tolist() == with_ck


def test_corrupt_checkpoint_falls_back(base):
    _make_versions(base, n_commits=8)
    v = base._current_version("t")
    with open(base._ckpt_path("t"), "w") as f:
        f.write("{not json")
    assert base._load_ckpt("t") is None
    assert base._current_version("t") == v
    # and the next commit repairs the cadence (writes a fresh one at 10)
    t = base.table("t")
    for _ in range(3):
        t["column1"] = list(range(10))
    ck = base._load_ckpt("t")
    assert ck is not None and ck["version"] == 10


def test_stale_checkpoint_log_shrunk_is_ignored(base):
    _make_versions(base, n_commits=7)  # ckpt at v5
    lp = base._log_path("t")
    hist = base.history("t")
    # externally rewrite the log shorter than the ckpt's tail_offset
    with open(lp, "w") as f:
        for e in hist[:3]:
            f.write(json.dumps(e) + "\n")
    ck_raw = json.load(open(base._ckpt_path("t")))
    assert ck_raw["tail_offset"] > os.path.getsize(lp)
    assert base._load_ckpt("t") is None  # size check rejects it
    assert base._current_version("t") == 2


def test_time_travel_via_offset_index(base):
    base_tbl = _make_versions(base, n_commits=12)  # ckpt at v10
    assert base._load_ckpt("t")["version"] == 10
    # deep travel: v3 is far below the checkpoint → offset-index seek
    t3 = base.table("t", version=3)
    vals = t3.to_frame().sort_values("_seq")["column1"].tolist()
    # version 3 = third overwrite: column1 was set to range(2, 12)
    assert vals == list(range(2, 12))
    assert base_tbl is not None


def test_commit_cost_reads_tail_only(base, monkeypatch):
    """After a checkpoint exists, neither open nor commit calls
    history() (the full scan) — the operational guarantee the
    rehearsal measures in wall time."""
    _make_versions(base, n_commits=12)
    calls = {"n": 0}
    orig = Base.history

    def counting(self, name):
        calls["n"] += 1
        return orig(self, name)

    monkeypatch.setattr(Base, "history", counting)
    t = base.table("t")          # open
    t["column1"] = list(range(10))  # commit
    assert calls["n"] == 0


def test_vacuum_trim_log(base):
    _make_versions(base, n_commits=12)
    lp = base._log_path("t")
    size_before = os.path.getsize(lp)
    removed = base.vacuum("t", keep_versions=3, trim_log=True)
    assert removed  # old files actually went away
    assert os.path.getsize(lp) < size_before
    hist = base.history("t")
    assert [e["version"] for e in hist] == [9, 10, 11]
    # retained versions still fully readable
    for v in (9, 10, 11):
        assert base.table("t", version=v).to_frame().shape[0] == 10
    # checkpoint was re-cut and is valid against the trimmed log
    ck = base._load_ckpt("t")
    assert ck is not None and ck["version"] == 11
    assert base._current_version("t") == 11
    # trimmed version is gone — consistent with its files being gone
    with pytest.raises(FileNotFoundError):
        base._log_entry("t", 2)
    # and the table keeps working: next commit lands as v12
    t = base.table("t")
    t["column1"] = list(range(10))
    assert base._current_version("t") == 12


def test_checkpoint_disabled_store(spark, tmp_path):
    b = Base(str(tmp_path / "wh"), spark, user="tester",
             checkpoint_every=0)
    pdf = pd.DataFrame({"x": [1, 2, 3]})
    b.from_frame(pdf, "t")
    t = b.table("t")
    t["x"] = [4, 5, 6]
    assert not os.path.exists(b._ckpt_path("t"))
    assert b._current_version("t") == 1
    # legacy store later opened WITH checkpointing: reads fine, and the
    # next cadence commit starts checkpointing
    b2 = Base(str(tmp_path / "wh"), spark, user="tester",
              checkpoint_every=1)
    assert b2._current_version("t") == 1
    t2 = b2.table("t")
    t2["x"] = [7, 8, 9]
    assert b2._load_ckpt("t")["version"] == 2


def test_version_at_fast_path_equals_full_scan(base):
    """Timestamp time travel through the checkpoint fast path must
    return exactly what the full scan returns, at every boundary:
    before v0, on each commit ts, between commits, after the last."""
    from datetime import datetime, timedelta

    _make_versions(base, n_commits=13)  # ckpt at v10, tail v11-12
    hist = base.history("t")
    stamps = [datetime.fromisoformat(e["ts"]) for e in hist]

    def brute(at):
        best = None
        for e, ts in zip(hist, stamps):
            if ts <= at:
                best = e["version"]
        return best

    probes = []
    for ts in stamps:
        probes += [ts, ts + timedelta(microseconds=1)]
    probes += [stamps[-1] + timedelta(days=1)]
    for at in probes:
        expect = brute(at)
        got_fast = base._version_at_ckpt("t", at)
        got = base._version_at("t", at)
        assert got == expect, (at, got, expect)
        # deep targets (below the checkpoint) must resolve via the
        # fast path, not silently fall back
        if expect is not None and expect < 9:
            assert got_fast == expect, (at, got_fast, expect)
    with pytest.raises(ValueError):
        base._version_at(
            "t", stamps[0] - timedelta(days=1)
        )


def test_version_at_nonmonotonic_ts_falls_back(base):
    """A clock step (older ts on a newer version) must disable the
    binary-search path — the checkpoint records ts monotonicity when
    it scans the log, and a non-monotone region makes the fast path
    decline (it could otherwise return a version from the wrong side
    of the step; caught by this test's first formulation)."""
    from datetime import datetime, timedelta

    _make_versions(base, n_commits=12)
    lp = base._log_path("t")
    hist = base.history("t")
    # inject: v5's ts jumps far ahead (clock stepped back after v5)
    hist[5]["ts"] = (
        datetime.fromisoformat(hist[-1]["ts"]) + timedelta(hours=1)
    ).isoformat()
    with open(lp, "w") as f:
        for e in hist:
            f.write(json.dumps(e) + "\n")
    # external log surgery invalidates the incremental chain — rebuild
    # the checkpoint from a full scan (a REAL clock step would be seen
    # incrementally at the next cadence cut; byte-level edits are out
    # of protocol and need the rebuild)
    os.remove(base._ckpt_path("t"))
    os.remove(base._ckpt_idx_path("t"))
    base.checkpoint("t")
    assert base._load_ckpt("t")["ts_monotone"] is False
    at = datetime.fromisoformat(hist[7]["ts"])
    assert base._version_at_ckpt("t", at) is None  # declines
    # full scan semantics: last version (in order) with ts <= at
    expect = None
    for e in hist:
        if datetime.fromisoformat(e["ts"]) <= at:
            expect = e["version"]
    assert base._version_at("t", at) == expect


def test_version_at_clock_step_detected_incrementally(base):
    """The REAL clock-step path: commits continue after a backward
    step; the next cadence cut records ts_monotone=False with no
    external rebuild."""
    from datetime import datetime, timedelta

    import sea_serpent_spark.mutation.store as store_mod

    _make_versions(base, n_commits=7)  # ckpt at v5, monotone
    assert base._load_ckpt("t")["ts_monotone"] is True
    # step the commit clock back one hour for the next commits
    real_now = store_mod.datetime.now

    class _Back:
        @staticmethod
        def now(tz=None):
            return real_now(tz) - timedelta(hours=1)

        fromisoformat = datetime.fromisoformat

    t = base.table("t")
    orig = store_mod.datetime
    store_mod.datetime = _Back
    try:
        for i in range(5):  # crosses the v10 cadence cut
            t["column1"] = list(range(i, i + 10))
    finally:
        store_mod.datetime = orig
    ck = base._load_ckpt("t")
    assert ck["version"] == 10 and ck["ts_monotone"] is False
    # fast path declines; scan answers remain correct
    hist = base.history("t")
    at = datetime.fromisoformat(hist[-1]["ts"])
    assert base._version_at_ckpt("t", at) is None
    expect = None
    for e in hist:
        if datetime.fromisoformat(e["ts"]) <= at:
            expect = e["version"]
    assert base._version_at("t", at) == expect


def test_json_valid_but_malformed_checkpoint_falls_back(base):
    """r12 (r11 advice): JSON-valid checkpoints with a non-dict entry,
    a negative tail_offset, or a bool tail_offset must degrade to the
    full scan — never crash the read path."""
    import json as _json

    _make_versions(base, n_commits=8)
    v = base._current_version("t")
    good = _json.load(open(base._ckpt_path("t")))
    for mutate in (
        {"entry": "not-a-dict"},
        {"entry": None},
        {"tail_offset": -5},
        {"tail_offset": True},
        {"tail_offset": "12"},
    ):
        bad = dict(good)
        bad.update(mutate)
        with open(base._ckpt_path("t"), "w") as f:
            _json.dump(bad, f)
        assert base._load_ckpt("t") is None, mutate
        # reads still work via the full scan
        assert base._current_version("t") == v, mutate
    # restore the good checkpoint: accepted again
    with open(base._ckpt_path("t"), "w") as f:
        _json.dump(good, f)
    assert base._load_ckpt("t") is not None
