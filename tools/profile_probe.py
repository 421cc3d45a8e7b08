"""Decompose the incremental probe's per-batch wall (r14): where do
the ~2.9 s go — Python-side plan construction (py4j expression
building), JVM job execution (REST job durations), or the residual
(Catalyst analysis/optimization/physical planning + scheduling gaps)?

Monkeypatches DataFrame.take/collect to time each driver action
separately, and reads job wall from the UI REST API.

Usage: python tools/profile_probe.py [sf_dir] [n_batches]
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
from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402


def jobs_info(spark):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    return json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("profile_probe")
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
    root = os.path.join(tempfile.gettempdir(), "profile_probe_idx")
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(root + "_out", ignore_errors=True)
    write_band_index(
        minhash_band_index(docs.where(F.col("doc_id") < 250)),
        root, key_buckets=8,
    )

    # time every driver action individually
    actions: list = []
    orig_take = DataFrame.take
    orig_collect = DataFrame.collect

    def timed_take(self, n):
        t0 = time.monotonic()
        r = orig_take(self, n)
        actions.append(("take", round(time.monotonic() - t0, 3)))
        return r

    def timed_collect(self):
        t0 = time.monotonic()
        r = orig_collect(self)
        actions.append(("collect", round(time.monotonic() - t0, 3)))
        return r

    DataFrame.take = timed_take
    DataFrame.collect = timed_collect

    main_cache: dict = {}
    out = []
    for b in range(n_batches):
        lo = 250 + b * 350
        batch = docs.where(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 350)
        )
        actions.clear()
        jobs_before = {j["jobId"] for j in jobs_info(spark)}
        t0 = time.monotonic()
        idx = read_band_index(spark, root, _main_cache=main_cache)
        res: dict = {}
        tp0 = time.monotonic()
        kept = incremental_dedup(batch, idx, key_buckets=8, ingest_out=res)
        t_probe = time.monotonic() - tp0
        tw0 = time.monotonic()
        kept.write.mode("append").parquet(root + "_out")
        t_write = time.monotonic() - tw0
        if not res.get("driver_path"):
            raise SystemExit(
                f"batch {b}: distributed fallback engaged — this "
                "rehearsal measures the driver path; shrink the batch"
            )
        ks = res["sigs"]
        if res["loser_ids"]:
            ks = ks.where(
                F.col("id").isNull()
                | ~F.col("id").isin(list(res["loser_ids"]))
            )
        br = banded_signatures(ks, 16, 4, keep=("sig",)).select(
            "id", "band", "key", "sig"
        ).withColumn("kb", _kb_expr(8))
        ta0 = time.monotonic()
        write_band_index(
            br, root, mode="append", key_buckets=8,
            ids_hint=res["survivor_ids"],
        )
        t_append = time.monotonic() - ta0
        wall = time.monotonic() - t0
        new_jobs = [
            j for j in jobs_info(spark) if j["jobId"] not in jobs_before
        ]
        job_exec = sum(
            (
                time.mktime(time.strptime(
                    j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
                + float(j["completionTime"][20:23]) / 1000
                - time.mktime(time.strptime(
                    j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
                - float(j["submissionTime"][20:23]) / 1000
            )
            for j in new_jobs
            if j.get("completionTime")
        )
        action_total = sum(d for _, d in actions)
        out.append(
            {
                "batch": b,
                "wall": round(wall, 3),
                "probe_call": round(t_probe, 3),
                "write": round(t_write, 3),
                "append": round(t_append, 3),
                "n_jobs": len(new_jobs),
                "job_exec_sum": round(job_exec, 3),
                "actions": list(actions),
                "action_wall_sum": round(action_total, 3),
                "py_construction": round(
                    t_probe - sum(
                        d for _, d in actions
                        if True
                    ),
                    3,
                ),
            }
        )
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
