"""Round-13 rehearsal: the incremental probe's plan-size cut.

The r12 verdict's one `weak`: each streaming micro-batch paid ~7
driver actions + ~2 s of Catalyst planning across ~30 AQE stage-jobs —
a fixed per-batch floor that a real cluster's scheduler latency
multiplies. Round 13 attacks plan size, not gates:

- driver-assisted probe: ONE take() collects spanning edges + pruned
  old ids (with signature widths) + delta ids; union-find + the
  witness/keeper rule + the bloom reingest test run on the driver; the
  anti-join becomes an isin predicate (no CC checkpoint/take, no loser
  checkpoint, no delta-id job, no groups stat barrier, no broadcasts);
- the sink caches the index's analyzed main-bucket frame per
  GENERATION, derives survivor band rows from the cached delta
  signatures, builds the bloom delta from the survivor id list
  (zero jobs), and writes the tail from one task;
- `_batch_confs` disables AQE for the batch: per-exchange re-planning
  is pure job-count overhead at trigger volume.

This script reports both shapes:
1. sink-shaped serial batches (open → probe → output write → tail
   append) with per-phase wall + jobs, and
2. the q64 direct-probe shape (rehearse_r12's measurement) for
   round-over-round comparison against its 33-job r12 figure.

Usage: python tools/rehearse_r13.py [sf_dir] [n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402


def n_jobs(spark) -> int:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    jobs = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs")
    )
    return len(jobs)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("rehearse_r13")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.retainedJobs", "10000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sea_serpent_spark.operators.dedup import banded_signatures
    from sea_serpent_spark.operators.incremental import (
        _kb_expr,
        incremental_dedup,
        minhash_band_index,
        read_band_index,
        write_band_index,
    )
    from sea_serpent_spark.operators.util import FANOUT_CONF

    spark.conf.set(FANOUT_CONF, "8")
    docs = spark.read.option(
        "pathGlobFilter", "documents.parquet"
    ).parquet(sf_dir)
    root = os.path.join(tempfile.gettempdir(), "rehearse_r13_idx")
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(root + "_out", ignore_errors=True)
    write_band_index(
        minhash_band_index(docs.where(F.col("doc_id") < 250)),
        root, key_buckets=8,
    )

    out = {"sf_dir": sf_dir, "sink_batches": [], "direct_probe": []}
    main_cache: dict = {}
    for b in range(n_batches):
        lo = 250 + b * 350
        batch = docs.where(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 350)
        )
        t: dict = {}
        tb0, j0 = time.monotonic(), n_jobs(spark)
        t0 = time.monotonic()
        idx = read_band_index(spark, root, _main_cache=main_cache)
        t["open"] = round(time.monotonic() - t0, 3)
        res: dict = {}
        t0 = time.monotonic()
        kept = incremental_dedup(
            batch, idx, key_buckets=8, ingest_out=res
        )
        t["probe"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        kept.write.mode("append").parquet(root + "_out")
        t["write"] = round(time.monotonic() - t0, 3)
        ks = res["sigs"]
        if res["loser_ids"]:
            ks = ks.where(
                F.col("id").isNull()
                | ~F.col("id").isin(list(res["loser_ids"]))
            )
        br = banded_signatures(ks, 16, 4, keep=("sig",)).select(
            "id", "band", "key", "sig"
        ).withColumn("kb", _kb_expr(8))
        t0 = time.monotonic()
        write_band_index(
            br, root, mode="append", key_buckets=8,
            ids_hint=res["survivor_ids"],
        )
        t["append"] = round(time.monotonic() - t0, 3)
        out["sink_batches"].append(
            {
                "batch": b,
                "wall_s": round(time.monotonic() - tb0, 2),
                "jobs": n_jobs(spark) - j0,
                "phases": t,
                "survivors": len(res["survivor_ids"]),
                "driver_path": bool(res.get("driver_path")),
            }
        )

    # the q64 direct-probe shape (rehearse_r12's comparison point)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.unset(FANOUT_CONF)
    root2 = os.path.join(tempfile.gettempdir(), "rehearse_r13_q64")
    shutil.rmtree(root2, ignore_errors=True)
    write_band_index(
        minhash_band_index(docs.where(F.col("doc_id") < 250)),
        root2, key_buckets=8,
    )
    delta = docs.where(F.col("doc_id") < 600)
    for run in ("cold", "warm"):
        idx = read_band_index(spark, root2)
        j0, t0 = n_jobs(spark), time.monotonic()
        n = incremental_dedup(delta, idx, key_buckets=8).count()
        out["direct_probe"].append(
            {
                "run": run,
                "jobs_total_incl_count": n_jobs(spark) - j0,
                "wall_s": round(time.monotonic() - t0, 2),
                "survivors": n,
            }
        )
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
