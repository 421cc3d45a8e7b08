"""Per-member wall decomposition of the q43 slot (r14 verdict task 6):
build vs inc probe vs streaming drain vs pair/semdedup members, so a
future q43 regression is attributable per member instead of slot-level.

Members are timed in the slot's own order (inc -> sink -> pairs/sem),
with the lazy pair/sem members forced by a noop write exactly as
bench.py forces the whole slot.

Usage: python tools/decompose_q43.py [sf_dir]
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("decompose_q43")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sea_serpent_spark import workload_ext as W

    # same Python-worker warmup as bench.py so the first Arrow member
    # isn't charged the pool fork
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    e = W.df(spark, sf_dir, "embeddings")
    ed = e.withColumn("embedding", F.col("embedding").cast("array<double>"))

    # two passes: pass 0 warms JIT/codegen/expression caches exactly
    # like the 40 bench slots that precede q43 do; pass 1 is the
    # decomposition — each member's marginal warm cost, the number a
    # slot-level regression should be attributed against.
    results = []
    for _pass in range(2):
        t = _measure(spark, W, e, ed, sf_dir)
        t["pass"] = "warmup" if _pass == 0 else "decomposition"
        results.append(t)
    print(json.dumps(results, indent=2))
    spark.stop()


def _measure(spark, W, e, ed, sf_dir) -> dict:
    import pyspark.sql.functions as F

    from sea_serpent_spark.operators.ann_index import (
        build_ivf_index,
        incremental_semantic_dedup,
        read_ivf_index,
    )
    from sea_serpent_spark.operators.pinned import SEMDEDUP_CENTROIDS
    from sea_serpent_spark.operators import similarity as S
    from sea_serpent_spark.streaming.dedup import (
        incremental_semantic_dedup_sink,
    )

    t: dict = {}
    scratch = os.path.join(tempfile.gettempdir(), "decompose_q43")
    shutil.rmtree(scratch, ignore_errors=True)
    semi = os.path.join(scratch, "seminc")

    t0 = time.perf_counter()
    build_ivf_index(
        ed.where(F.col("vec_id") < 300), semi,
        centroids=SEMDEDUP_CENTROIDS,
    )
    t["build_index"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    inc = incremental_semantic_dedup(
        ed.where(F.col("vec_id") >= 300), semi, threshold=0.45
    )
    inc.write.format("noop").mode("overwrite").save()
    t["inc_probe"] = round(time.perf_counter() - t0, 2)

    # the sink drain, staged exactly as the slot does it
    sroot = os.path.join(scratch, "semsink")
    sidx = os.path.join(sroot, "idx")
    sout = os.path.join(sroot, "out")
    delta_dir = os.path.join(sroot, "delta")
    os.makedirs(delta_dir, exist_ok=True)
    t0 = time.perf_counter()
    shutil.copytree(semi, sidx)
    for i, (lo, hi) in enumerate(((300, 400), (400, 500))):
        stage = os.path.join(sroot, f"stage{i}")
        (
            ed.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
            .coalesce(1).write.mode("overwrite").parquet(stage)
        )
        part = next(
            f for f in os.listdir(stage) if f.endswith(".parquet")
        )
        dst = os.path.join(delta_dir, f"batch{i}.parquet")
        os.replace(os.path.join(stage, part), dst)
        ts = 1_000_000_000 + i * 1000
        os.utime(dst, (ts, ts))
        shutil.rmtree(stage, ignore_errors=True)
    t["sink_stage_files"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    sschema = ed.where(F.col("vec_id") < 0).schema
    (
        spark.readStream.schema(sschema)
        .option("maxFilesPerTrigger", 1)
        .parquet(delta_dir)
        .writeStream.foreachBatch(incremental_semantic_dedup_sink(
            sidx, sout, threshold=0.45, batch_parallelism=8,
        ))
        .option("checkpointLocation", os.path.join(sroot, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    t["sink_drain_2_batches"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    n_idx = read_ivf_index(spark, sidx)[0].select(
        "vec_id"
    ).distinct().count()
    t["sink_idx_count"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    S.embedding_near_dup_pairs(e, threshold=0.45, nbits=0).write.format(
        "noop"
    ).mode("overwrite").save()
    t["pairs"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    S.semantic_dedup(
        ed, threshold=0.45, centroids=SEMDEDUP_CENTROIDS,
        keep="far_from_centroid", nbits=0,
    ).write.format("noop").mode("overwrite").save()
    t["semdedup"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    W.q43_embedding_near_dup(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    t["full_slot_cold_after_warm_members"] = round(
        time.perf_counter() - t0, 2
    )
    t["members_sum"] = round(
        sum(
            v for k, v in t.items()
            if k != "full_slot_cold_after_warm_members"
        ),
        2,
    )
    t["n_idx"] = n_idx
    t["loadavg_1m"] = round(os.getloadavg()[0], 1)
    shutil.rmtree(scratch, ignore_errors=True)
    return t


if __name__ == "__main__":
    main()
