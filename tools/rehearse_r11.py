"""Round-11 metadata-plane rehearsal: version-log checkpoint.

The claim to verify — OPEN and COMMIT cost flat in table age. Before
r11, every `Base.table()` open and every commit JSON-parsed the whole
`_log.jsonl` (one full manifest + cstats per entry), an O(versions)
driver-side scan that at 100 TB commit cadence becomes the Delta
"no checkpoint" problem. The `_last_checkpoint.json` (latest entry +
tail offset + version→byte-offset index) makes those paths
O(checkpoint_every).

Measures, across a 500-commit history on one table:
  - log-resolution cost of an open (`_current_version` + `_log_entry`
    of the current version — the metadata part of `Base.table()`,
    isolated from the constant parquet-read) sampled every 50 commits,
    with checkpointing ON vs OFF (full-scan legacy path);
  - deep time-travel entry lookup (v=3) at history depth 500;
  - log size and checkpoint size, before and after
    `vacuum(trim_log=True)`.

The Spark work per commit is constant (tiny table, one bucket) — the
rehearsal isolates the METADATA cost by timing only the log-resolution
calls, not the parquet write.

Usage: python tools/rehearse_r11.py [--commits 500] [--sample 50]
Writes one JSON blob to stdout; summary curated into BENCH_NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd  # noqa: E402


def _meta_open_cost(base, name: str, reps: int = 20) -> float:
    """Seconds for the log-resolution half of an open (current-version
    discovery + current entry fetch), best-of-reps to squeeze out fs
    cache noise."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        v = base._current_version(name)
        base._log_entry(name, v)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commits", type=int, default=500)
    ap.add_argument("--sample", type=int, default=50)
    args = ap.parse_args()

    from sea_serpent_spark import Base
    from sea_serpent_spark.session import get_spark

    spark = get_spark()
    root = Path("/tmp/ssp_rehearse_r11")
    shutil.rmtree(root, ignore_errors=True)

    out: dict = {"commits": args.commits, "curves": {}}

    for mode, every in (("ckpt_on", 20), ("ckpt_off", 0)):
        wh = root / mode
        b = Base(str(wh), spark, user="rehearse", checkpoint_every=every)
        pdf = pd.DataFrame({"x": range(10), "label": [f"r{i}" for i in range(10)]})
        b.from_frame(pdf, "t")
        t = b.table("t")
        curve = []
        commit_curve = []
        for i in range(1, args.commits):
            c0 = time.perf_counter()
            t["x"] = [(i + j) % 97 for j in range(10)]
            commit_wall = time.perf_counter() - c0
            if i % args.sample == 0 or i == args.commits - 1:
                curve.append(
                    {"version": i, "open_meta_sec": _meta_open_cost(b, "t"),
                     "log_bytes": os.path.getsize(b._log_path("t"))}
                )
                commit_curve.append(
                    {"version": i, "commit_sec": round(commit_wall, 4)}
                )
        # deep time travel at full depth
        t0 = time.perf_counter()
        b._log_entry("t", 3)
        deep = time.perf_counter() - t0
        out["curves"][mode] = {
            "open": curve,
            "commit_sampled": commit_curve,
            "deep_lookup_v3_sec": round(deep, 6),
        }

    # trim_log on the checkpointed store
    b = Base(str(root / "ckpt_on"), spark, user="rehearse",
             checkpoint_every=20)
    size_before = os.path.getsize(b._log_path("t"))
    b.vacuum("t", keep_versions=10, trim_log=True)
    size_after = os.path.getsize(b._log_path("t"))
    out["trim_log"] = {
        "log_bytes_before": size_before,
        "log_bytes_after": size_after,
        "open_meta_sec_after": _meta_open_cost(b, "t"),
        "versions_after": [e["version"] for e in b.history("t")][-3:],
    }

    # flatness verdict: last sampled open cost vs first, ckpt on
    opens = out["curves"]["ckpt_on"]["open"]
    out["flat"] = {
        "first_open_sec": opens[0]["open_meta_sec"],
        "last_open_sec": opens[-1]["open_meta_sec"],
        "ratio": round(opens[-1]["open_meta_sec"]
                       / max(opens[0]["open_meta_sec"], 1e-9), 2),
    }
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
