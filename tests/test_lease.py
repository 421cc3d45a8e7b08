"""Single-writer lease tests (lease.py; store `_commit`, artifact
publish). The contract: a second live writer gets a clean
LeaseHeldError and mutates NOTHING; stale leases (dead local pid, TTL
expiry) break automatically; the lease is re-entrant in-process so
builder flows can hold it across stage + publish."""

import json
import os
import subprocess
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


@pytest.fixture()
def base(spark, tmp_path):
    return Base(str(tmp_path / "wh"), spark, user="tester")


def _foreign_live_lock(dirpath, pid=1, ts=None):
    """A lease held by someone else: pid 1 is always alive, hostname
    matches, timestamp fresh — not breakable."""
    import socket

    os.makedirs(dirpath, exist_ok=True)
    p = os.path.join(dirpath, LEASE_NAME)
    with open(p, "w") as fh:
        json.dump(
            {"pid": pid, "host": socket.gethostname(),
             "ts": ts if ts is not None else time.time(),
             "owner": "other-writer"},
            fh,
        )
    return p


def _dead_pid() -> int:
    proc = subprocess.Popen(["true"])
    proc.wait()
    return proc.pid


def test_second_writer_errors_and_mutates_nothing(base):
    pdf = pd.DataFrame({"x": [1, 2, 3]})
    base.from_frame(pdf, "t")
    t = base.table("t")
    v = base._current_version("t")
    log_size = os.path.getsize(base._log_path("t"))
    _foreign_live_lock(base._tdir("t"))
    with pytest.raises(LeaseHeldError, match="other-writer"):
        t["x"] = [7, 8, 9]
    # nothing moved: same version, same log bytes, same data
    assert base._current_version("t") == v
    assert os.path.getsize(base._log_path("t")) == log_size
    assert base.table("t").to_frame()["x"].tolist() == [1, 2, 3]
    # winner proceeds once the holder releases
    os.remove(os.path.join(base._tdir("t"), LEASE_NAME))
    t["x"] = [7, 8, 9]
    assert sorted(base.table("t").to_frame()["x"]) == [7, 8, 9]


def test_stale_dead_pid_lease_is_broken(base):
    base.from_frame(pd.DataFrame({"x": [1]}), "t")
    t = base.table("t")
    _foreign_live_lock(base._tdir("t"), pid=_dead_pid())
    t["x"] = [5]  # breaks the dead holder's lease and commits
    assert base.table("t").to_frame()["x"].tolist() == [5]
    assert not os.path.exists(os.path.join(base._tdir("t"), LEASE_NAME))


def test_ttl_expired_foreign_host_lease_is_broken(tmp_path):
    root = str(tmp_path / "a")
    p = os.path.join(root, LEASE_NAME)
    os.makedirs(root)
    with open(p, "w") as fh:
        json.dump({"pid": 1, "host": "elsewhere",
                   "ts": time.time() - 7200, "owner": "gone"}, fh)
    with writer_lease(root, ttl=3600.0):
        assert json.load(open(p))["host"] != "elsewhere"
    assert not os.path.exists(p)


def test_fresh_foreign_host_lease_is_respected(tmp_path):
    root = str(tmp_path / "a")
    _foreign_live_lock(root)
    # pid liveness cannot be probed cross-host semantics aside, pid 1
    # is alive locally AND fresh — either way, not breakable
    with pytest.raises(LeaseHeldError):
        with writer_lease(root, ttl=3600.0):
            pass


def test_reentrant_within_process(tmp_path):
    root = str(tmp_path / "a")
    with writer_lease(root, owner="outer"):
        with writer_lease(root, owner="inner"):  # no deadlock, no error
            assert os.path.exists(os.path.join(root, LEASE_NAME))
        # inner exit must NOT release the outer hold
        assert os.path.exists(os.path.join(root, LEASE_NAME))
    assert not os.path.exists(os.path.join(root, LEASE_NAME))


def test_publish_generation_respects_lease(tmp_path):
    root = str(tmp_path / "art")
    gen, staging = artifact.new_generation_dir(root)
    os.makedirs(staging)
    _foreign_live_lock(root)
    with pytest.raises(LeaseHeldError):
        artifact.publish_generation(root, gen)
    assert artifact.read_manifest(root) is None  # nothing published
    os.remove(os.path.join(root, LEASE_NAME))
    artifact.publish_generation(root, gen)
    assert artifact.read_manifest(root)["current"] == gen


def test_builder_holds_lease_across_stage_and_publish(tmp_path):
    """The stage+publish flow under one lease: publish's own acquire
    re-enters instead of deadlocking, and the lease is gone after."""
    root = str(tmp_path / "art")
    with artifact.writer_lease(root, owner="build"):
        gen, staging = artifact.new_generation_dir(root)
        os.makedirs(staging)
        artifact.publish_generation(root, gen)
    assert artifact.read_manifest(root)["current"] == gen
    assert not os.path.exists(os.path.join(root, LEASE_NAME))


def test_vacuum_respects_lease(base):
    base.from_frame(pd.DataFrame({"x": [1]}), "t")
    t = base.table("t")
    for i in range(3):
        t["x"] = [i]
    _foreign_live_lock(base._tdir("t"))
    with pytest.raises(LeaseHeldError):
        base.vacuum("t", keep_versions=1, trim_log=True)
    os.remove(os.path.join(base._tdir("t"), LEASE_NAME))
    base.vacuum("t", keep_versions=1, trim_log=True)
    assert [e["version"] for e in base.history("t")] == [3]
