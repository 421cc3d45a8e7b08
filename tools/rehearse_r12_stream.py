"""Round-12 streaming-ingest rehearsal: per-batch floor with and
without trigger-sized parallelism.

Drains a 6-file delta (maxFilesPerTrigger=1 → 6 serial micro-batches)
through ``incremental_dedup_sink`` against a seeded band index, once
with the session-default 32-way fan-out and once with
``batch_parallelism=8`` (the r12 knob: operator fan-out + shuffle
partitions scoped to each batch). Reports per-batch wall seconds — the
claims under test: (a) per-batch wall stays ~flat as the index absorbs
each batch's survivors (the r9 pruning contract, re-checked), and
(b) the knob cuts the fixed floor without changing survivors.

Usage: python tools/rehearse_r12_stream.py [sf_dir] [n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402


def drain(spark, docs, root, n_batches, batch_parallelism):
    from sea_serpent_spark.operators.incremental import (
        minhash_band_index, write_band_index,
    )
    from sea_serpent_spark.streaming.dedup import incremental_dedup_sink

    shutil.rmtree(root, ignore_errors=True)
    idx, out = os.path.join(root, "idx"), os.path.join(root, "out")
    hist = docs.where(F.col("doc_id") < 250)
    write_band_index(minhash_band_index(hist), idx, key_buckets=8)

    delta_dir = os.path.join(root, "delta")
    os.makedirs(delta_dir)
    hi = 250 + 350 * n_batches
    span = 350
    for i in range(n_batches):
        lo = 250 + i * span
        stage = os.path.join(root, f"_s{i}")
        (
            docs.where(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + span)
            ).coalesce(1).write.mode("overwrite").parquet(stage)
        )
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dst = os.path.join(delta_dir, f"b{i}.parquet")
        os.replace(os.path.join(stage, part), dst)
        t = 1_000_000_000 + i * 1000
        os.utime(dst, (t, t))
        shutil.rmtree(stage, ignore_errors=True)

    walls: list[float] = []
    inner = incremental_dedup_sink(
        idx, out, batch_parallelism=batch_parallelism
    )

    def timed(df, bid):
        t0 = time.monotonic()
        inner(df, bid)
        walls.append(round(time.monotonic() - t0, 2))

    schema = docs.schema
    (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(delta_dir)
        .writeStream.foreachBatch(timed)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    survivors = spark.read.parquet(out).count()
    return walls, survivors, hi


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("rehearse_r12_stream")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.option(
        "pathGlobFilter", "documents.parquet"
    ).parquet(sf_dir)
    base = os.path.join(tempfile.gettempdir(), "rehearse_r12_stream")
    out = {"sf_dir": sf_dir, "n_batches": n_batches, "runs": []}
    for bp in (None, 8):
        walls, survivors, hi = drain(
            spark, docs, os.path.join(base, f"bp{bp}"), n_batches, bp
        )
        out["runs"].append(
            {
                "batch_parallelism": bp,
                "per_batch_wall_s": walls,
                "total_s": round(sum(walls), 2),
                "survivors": survivors,
            }
        )
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
