"""Single-writer lease tests (lease.py; store `_commit`, artifact
publish). The contract: a second live writer gets a clean
LeaseHeldError and mutates NOTHING; a holder that exits or crashes
releases automatically (kernel-owned flock — no stale-file
heuristics); the lease is re-entrant in-process so builder flows can
hold it across stage + publish; real multi-process contention never
yields two holders."""

import json
import os
import subprocess
import sys
import textwrap
import time

import pandas as pd
import pytest

from sea_serpent_spark import Base
from sea_serpent_spark.lease import (
    LEASE_NAME,
    LeaseHeldError,
    writer_lease,
)
from sea_serpent_spark.operators import artifact

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def base(spark, tmp_path):
    return Base(str(tmp_path / "wh"), spark, user="tester")


class _ForeignHolder:
    """A REAL other process holding the flock (not a simulated file):
    acquires the lease, prints READY, and sleeps until killed."""

    def __init__(self, root: str, crash_after: float | None = None):
        body = textwrap.dedent(f"""
            import sys, time
            sys.path.insert(0, {_REPO!r})
            from sea_serpent_spark.lease import writer_lease
            with writer_lease({root!r}, owner="other-writer"):
                print("READY", flush=True)
                time.sleep({crash_after if crash_after is not None else 3600})
            """)
        self.proc = subprocess.Popen(
            [sys.executable, "-c", body],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        line = self.proc.stdout.readline()
        assert line.strip() == "READY", self.proc.stderr.read()

    def release(self):
        self.proc.kill()
        self.proc.wait()
        # flock release on process death is immediate, but give the
        # kernel a beat on slow CI filesystems
        time.sleep(0.05)


def test_second_writer_errors_and_mutates_nothing(base):
    pdf = pd.DataFrame({"x": [1, 2, 3]})
    base.from_frame(pdf, "t")
    t = base.table("t")
    v = base._current_version("t")
    log_size = os.path.getsize(base._log_path("t"))
    holder = _ForeignHolder(base._tdir("t"))
    try:
        with pytest.raises(LeaseHeldError, match="other-writer"):
            t["x"] = [7, 8, 9]
        # nothing moved: same version, same log bytes, same data
        assert base._current_version("t") == v
        assert os.path.getsize(base._log_path("t")) == log_size
        assert base.table("t").to_frame()["x"].tolist() == [1, 2, 3]
    finally:
        holder.release()
    # winner proceeds once the holder is gone
    t["x"] = [7, 8, 9]
    assert sorted(base.table("t").to_frame()["x"]) == [7, 8, 9]


def test_crashed_holder_releases_automatically(base):
    """Kernel-owned crash recovery: a holder killed mid-hold releases
    the lock with no stale-file breaking, no TTL wait."""
    base.from_frame(pd.DataFrame({"x": [1]}), "t")
    t = base.table("t")
    holder = _ForeignHolder(base._tdir("t"))
    holder.proc.kill()  # simulate a crash while holding
    holder.proc.wait()
    time.sleep(0.05)
    t["x"] = [5]  # acquires immediately
    assert base.table("t").to_frame()["x"].tolist() == [5]


def test_lock_file_is_never_unlinked(tmp_path):
    """Unlinking a flock'd file is the classic two-inode double-holder
    pitfall — the lock file must persist across holds."""
    root = str(tmp_path / "a")
    with writer_lease(root, owner="one"):
        assert os.path.exists(os.path.join(root, LEASE_NAME))
    assert os.path.exists(os.path.join(root, LEASE_NAME))
    with writer_lease(root, owner="two"):  # re-acquirable
        pass


def test_diagnostics_payload_while_held(tmp_path):
    root = str(tmp_path / "a")
    holder = _ForeignHolder(root)
    try:
        info = json.load(open(os.path.join(root, LEASE_NAME)))
        assert info["owner"] == "other-writer"
        assert info["pid"] == holder.proc.pid
        with pytest.raises(LeaseHeldError, match=str(holder.proc.pid)):
            with writer_lease(root):
                pass
    finally:
        holder.release()


def test_reentrant_within_process(tmp_path):
    root = str(tmp_path / "a")
    with writer_lease(root, owner="outer"):
        with writer_lease(root, owner="inner"):  # no deadlock, no error
            pass
        # inner exit must NOT release the outer hold: a foreign
        # process must still be refused
        p = os.path.join(root, LEASE_NAME)
        probe = subprocess.run(
            [sys.executable, "-c", textwrap.dedent(f"""
                import sys
                sys.path.insert(0, {_REPO!r})
                from sea_serpent_spark.lease import (LeaseHeldError,
                                                     writer_lease)
                try:
                    with writer_lease({root!r}):
                        print("ACQUIRED")
                except LeaseHeldError:
                    print("HELD")
                """)],
            capture_output=True, text=True, timeout=60,
        )
        assert probe.stdout.strip() == "HELD", probe.stderr
        assert os.path.exists(p)


def test_publish_generation_respects_lease(tmp_path):
    root = str(tmp_path / "art")
    gen, staging = artifact.new_generation_dir(root)
    os.makedirs(staging)
    holder = _ForeignHolder(root)
    try:
        with pytest.raises(LeaseHeldError):
            artifact.publish_generation(root, gen)
        assert artifact.read_manifest(root) is None  # nothing published
    finally:
        holder.release()
    artifact.publish_generation(root, gen)
    assert artifact.read_manifest(root)["current"] == gen


def test_builder_holds_lease_across_stage_and_publish(tmp_path):
    """The stage+publish flow under one lease: publish's own acquire
    re-enters instead of deadlocking."""
    root = str(tmp_path / "art")
    with artifact.writer_lease(root, owner="build"):
        gen, staging = artifact.new_generation_dir(root)
        os.makedirs(staging)
        artifact.publish_generation(root, gen)
    assert artifact.read_manifest(root)["current"] == gen


def test_vacuum_respects_lease(base):
    base.from_frame(pd.DataFrame({"x": [1]}), "t")
    t = base.table("t")
    for i in range(3):
        t["x"] = [i]
    holder = _ForeignHolder(base._tdir("t"))
    try:
        with pytest.raises(LeaseHeldError):
            base.vacuum("t", keep_versions=1, trim_log=True)
    finally:
        holder.release()
    base.vacuum("t", keep_versions=1, trim_log=True)
    assert [e["version"] for e in base.history("t")] == [3]


def test_true_multiprocess_race(tmp_path):
    """N real processes race for the same lease concurrently: mutual
    exclusion must hold — the recorded critical sections may not
    overlap — and losers fail with LeaseHeldError only. This test
    caught two REAL protocol bugs in the round-11 lease-file design
    (torn-read stale-break of a live lease; breaker-vs-breaker unlink
    of a fresh lease) before flock replaced the heuristics.

    Mutual exclusion is asserted on EVERY attempt; the contention
    sanity check (some process actually lost a race) retries the whole
    race up to 3 times — on a steal-heavy virtualized box the four
    processes occasionally get scheduled in perfect series and nobody
    ever observes the lease held (seen 2026-08-17: got=3/lost=0 ×4)."""
    script = textwrap.dedent("""
        import json, os, sys, time
        sys.path.insert(0, {repo!r})
        from sea_serpent_spark.lease import LeaseHeldError, writer_lease
        root, tag, start_at = sys.argv[1], sys.argv[2], float(sys.argv[3])
        time.sleep(max(0.0, start_at - time.time()))  # synchronized start
        got = lost = 0
        deadline = time.time() + 30.0
        while time.time() < deadline and got < 3:
            try:
                with writer_lease(root, owner=tag):
                    # critical section: record an interval other holders
                    # must not overlap
                    t0 = time.time()
                    time.sleep(0.02)
                    with open(os.path.join(root, "trace.jsonl"), "a") as f:
                        f.write(json.dumps(
                            {{"tag": tag, "t0": t0, "t1": time.time()}}
                        ) + chr(10))
                    got += 1
            except LeaseHeldError:
                lost += 1
                time.sleep(0.005)
        print(json.dumps({{"got": got, "lost": lost}}))
    """).format(repo=_REPO)

    def _race(root):
        root.mkdir()
        start_at = time.time() + 1.0
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", script,
                 str(root), f"w{i}", str(start_at)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
            for i in range(4)
        ]
        results = []
        for p in procs:
            out, err = p.communicate(timeout=120)
            assert p.returncode == 0, err
            results.append(json.loads(out.strip()))
        # every process eventually got the lease
        assert all(r["got"] > 0 for r in results), results
        # mutual exclusion: recorded critical sections never overlap
        rows = [
            json.loads(ln)
            for ln in open(root / "trace.jsonl")
            if ln.strip()
        ]
        assert len(rows) == sum(r["got"] for r in results)
        rows.sort(key=lambda r: r["t0"])
        for a, b in zip(rows, rows[1:]):
            assert a["t1"] <= b["t0"] + 1e-6, (a, b)
        return sum(r["lost"] for r in results)

    lost = 0
    for attempt in range(3):
        lost += _race(tmp_path / f"contended{attempt}")
        if lost:
            break
    # contention was real in at least one attempt
    assert lost > 0, "no process ever observed the lease held (3 races)"


def test_second_thread_is_excluded(tmp_path):
    """r12: a second writer THREAD in the same process must be refused
    like a second process — the previous process-global guard let it
    enter WITHOUT the flock (silent interleaving). One winner holds;
    the racing thread gets LeaseHeldError; after release the other
    thread acquires fine."""
    import threading

    root = str(tmp_path / "a")
    inside = threading.Event()
    release = threading.Event()
    errors: list = []

    def holder():
        with writer_lease(root, owner="thread-one"):
            inside.set()
            release.wait(timeout=30)

    def challenger():
        inside.wait(timeout=30)
        try:
            with writer_lease(root, owner="thread-two"):
                errors.append("second thread entered while held")
        except LeaseHeldError as e:
            errors.append(e)

    t1 = threading.Thread(target=holder)
    t2 = threading.Thread(target=challenger)
    t1.start(); t2.start()
    t2.join(timeout=60)
    release.set()
    t1.join(timeout=60)
    assert len(errors) == 1 and isinstance(errors[0], LeaseHeldError), errors
    assert "another thread" in str(errors[0])
    # released: any thread may now acquire
    with writer_lease(root, owner="after"):
        pass


def test_reentrancy_is_per_thread_and_nested_release_safe(tmp_path):
    """Same-thread nesting stays a no-op; the inner exit must not drop
    the hold — a second thread is still refused until the OUTER exit."""
    import threading

    root = str(tmp_path / "a")
    refused: list = []

    def probe():
        try:
            with writer_lease(root, owner="probe"):
                refused.append("entered")
        except LeaseHeldError:
            refused.append("refused")

    with writer_lease(root, owner="outer"):
        with writer_lease(root, owner="inner"):
            pass
        t = threading.Thread(target=probe)
        t.start(); t.join(timeout=60)
    assert refused == ["refused"]
    t2 = threading.Thread(target=probe)
    t2.start(); t2.join(timeout=60)
    assert refused == ["refused", "entered"]
