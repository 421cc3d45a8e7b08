"""Round-14 rehearsal: the per-micro-batch Catalyst-analysis cut.

Measures both ingest loops against the r13 baseline shapes:

1. LSH sink-shaped serial batches (open → probe → output write → tail
   append) — r14 runs the WHOLE probe locally for trigger-sized deltas
   (``incremental._dedup_local_probe``): collect delta sigs + pruned
   old rows, band/canonicalize/pair/union-find on the driver. The
   groups-agg + rep-banding + probe-join + payload trees are no longer
   constructed per batch.
2. The SEMANTIC (IVF) sink loop — r14 caches the quantizer-literal
   Column trees (assignment argmax, probe selection) per content +
   session, and parsed sidecars per generation dir, so a micro-batch
   no longer pays the k·dim expression construction.
3. The q64 direct-probe shape for round-over-round comparison.

Usage: python tools/rehearse_r14.py [sf_dir] [n_batches]
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
    return len(
        json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/jobs"
            )
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("rehearse_r14")
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
    root = os.path.join(tempfile.gettempdir(), "rehearse_r14_idx")
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(root + "_out", ignore_errors=True)
    write_band_index(
        minhash_band_index(docs.where(F.col("doc_id") < 250)),
        root, key_buckets=8,
    )

    out = {"sf_dir": sf_dir, "sink_batches": [], "sem_batches": [],
           "direct_probe": []}
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

    # ------ the SEMANTIC (IVF) ingest loop ------
    from sea_serpent_spark.operators.ann_index import (
        append_to_ivf_index,
        build_ivf_index,
        incremental_semantic_dedup,
    )
    from sea_serpent_spark.operators.similarity import kmeans_fit

    emb = spark.read.option(
        "pathGlobFilter", "embeddings.parquet"
    ).parquet(sf_dir)
    sroot = os.path.join(tempfile.gettempdir(), "rehearse_r14_ivf")
    shutil.rmtree(sroot, ignore_errors=True)
    shutil.rmtree(sroot + "_out", ignore_errors=True)
    seedv = emb.where(F.col("vec_id") < 500)
    cents = kmeans_fit(seedv, "embedding", 8)
    build_ivf_index(seedv, sroot, centroids=cents)
    ivf_cache: dict = {}
    for b in range(n_batches):
        lo = 500 + b * 400
        batch = emb.where(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 400)
        )
        t = {}
        tb0, j0 = time.monotonic(), n_jobs(spark)
        res = {}
        t0 = time.monotonic()
        kept = incremental_semantic_dedup(
            batch, sroot, threshold=0.95, ingest_out=res,
            _main_cache=ivf_cache,
        )
        t["probe"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        kept.write.mode("append").parquet(sroot + "_out")
        t["write"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        if res.get("driver_path") and res.get("assigned") is not None:
            surv = res["assigned"]
            if res["loser_ids"]:
                surv = surv.where(
                    F.col("id").isNull()
                    | ~F.col("id").isin(list(res["loser_ids"]))
                )
            append_to_ivf_index(
                kept.select("vec_id", "embedding"), sroot,
                _assigned=surv.select(
                    F.col("id").alias("vec_id"),
                    F.col("v").alias("embedding"),
                    "label",
                ),
            )
        else:
            append_to_ivf_index(
                kept.select("vec_id", "embedding"), sroot
            )
        t["append"] = round(time.monotonic() - t0, 3)
        out["sem_batches"].append(
            {
                "batch": b,
                "wall_s": round(time.monotonic() - tb0, 2),
                "jobs": n_jobs(spark) - j0,
                "phases": t,
                "survivors": len(res.get("survivor_ids") or []),
                "driver_path": bool(res.get("driver_path")),
            }
        )

    # ------ the q64 direct-probe shape ------
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.unset(FANOUT_CONF)
    root2 = os.path.join(tempfile.gettempdir(), "rehearse_r14_q64")
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
