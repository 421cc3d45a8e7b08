"""Round-8 scale rehearsals (VERDICT round-6 items 3, 4, 6).

1. ``dedup_corpus_100x`` — END-TO-END corpus dedup (pairs → spanning
   edges → connected components → keep) on the cached 500 k-doc corpus.
   The 100× *emission* was rehearsed in round 6 (283.9 s, 126 M edges);
   this closes the gap: CC itself over those edges, recording wall,
   rounds-to-convergence, per-round wall, worst-stage skew, and
   block-manager occupancy at convergence / after release.
2. ``stream_ingest_10x`` — the foreachBatch near-dup ingest loop
   (``streaming.dedup.incremental_dedup_sink``) over the 10× corpus in
   ~10 micro-batches, recording per-batch wall as the persisted LSH
   index grows. Healthy = per-batch cost tracks DELTA size, not index
   size.
3. ``fuzzy_k2_10x`` — k=2 point for the salted fuzzy-join scaling
   curve (k drives prefix length q·k+1 AND the grid factor, so the
   salting economics change shape vs the existing k=1 10×/30× points).

Usage: python tools/rehearse_r8.py [dedup_corpus_100x|stream_ingest_10x|fuzzy_k2_10x ...]
Writes one JSON document to stdout; paste the summary into
BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402


def next_stage(spark) -> int:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
    )
    return max((s["stageId"] for s in stages), default=-1) + 1


def stage_stats(spark, since_stage: int) -> list[dict]:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        )
    )
    out = []
    for s in stages:
        if s["stageId"] < since_stage:
            continue
        tasks = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages/{s['stageId']}/"
                f"{s['attemptId']}/taskSummary?quantiles=0.5,1.0"
            )
        )
        out.append(
            {
                "stage": s["stageId"],
                "tasks": s["numCompleteTasks"],
                "shuffle_read_mb": round(s["shuffleReadBytes"] / 1e6, 1),
                "shuffle_write_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
                "task_ms_p50": tasks["duration"][0],
                "task_ms_max": tasks["duration"][1],
            }
        )
    return out


def block_manager(spark) -> dict:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    rdds = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/storage/rdd")
    )
    return {
        "persistent_rdds": len(rdds),
        "memory_mb": round(sum(r["memoryUsed"] for r in rdds) / 1e6, 1),
        "disk_mb": round(sum(r["diskUsed"] for r in rdds) / 1e6, 1),
    }


def heavy_summary(stages: list[dict]) -> dict:
    worst = max(stages, key=lambda s: s["task_ms_max"], default=None)
    if worst is None:
        return {}
    skew = (
        round(worst["task_ms_max"] / max(worst["task_ms_p50"], 1.0), 2)
        if worst["task_ms_p50"]
        else None
    )
    return {"worst_stage": worst, "worst_skew_max_over_p50": skew}


def _docs_corpus(spark, replicas: int):
    path = f"/tmp/rehearse_docs_{replicas}x.parquet"
    if not os.path.exists(path + "/_SUCCESS"):
        docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        n0 = docs.count()
        reps = []
        for r in range(replicas):
            reps.append(
                docs.select(
                    (F.col("doc_id") + F.lit(r * n0)).alias("doc_id"),
                    F.when(
                        F.lit(r % 2 == 1),
                        F.concat(F.col("text"), F.lit(f" replica{r}")),
                    )
                    .otherwise(F.col("text"))
                    .alias("text"),
                )
            )
        big = reps[0]
        for d in reps[1:]:
            big = big.unionByName(d)
        big.repartition(32).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def run_dedup_corpus_100x(spark, replicas: int = 100) -> dict:
    from sea_serpent_spark.operators import dedup as D
    from sea_serpent_spark.operators.util import release_checkpoints

    corpus = _docs_corpus(spark, replicas)
    first = next_stage(spark)
    cc_stats: dict = {}
    t0 = time.perf_counter()
    survivors = D.dedup_corpus(
        corpus, threshold=0.5, cc_stats=cc_stats
    ).count()
    wall = round(time.perf_counter() - t0, 2)
    at_convergence = block_manager(spark)
    stages = stage_stats(spark, first)
    release_checkpoints()
    D.release_caches()
    after = block_manager(spark)
    return {
        "op": f"dedup_corpus end-to-end {replicas}x ({replicas*5}k docs, minhash t=0.5, spanning->CC->keep)",
        "wall_s": wall,
        "survivors": survivors,
        "cc_rounds": cc_stats.get("rounds"),
        "cc_round_wall_s": cc_stats.get("round_wall_s"),
        "n_stages": len(stages),
        "total_shuffle_write_mb": round(
            sum(s["shuffle_write_mb"] for s in stages), 1
        ),
        **heavy_summary(stages),
        "block_manager_at_convergence": at_convergence,
        "block_manager_after_release": after,
    }


def run_stream_ingest_10x(spark, seed: str = "small") -> dict:
    from sea_serpent_spark.operators.incremental import minhash_band_index
    from sea_serpent_spark.streaming.dedup import incremental_dedup_sink

    corpus = _docs_corpus(spark, 10)  # 50k docs
    base = f"/tmp/rehearse_r8_stream_{seed}"
    shutil.rmtree(base, ignore_errors=True)
    src, idx, outp, ckpt = (f"{base}/{d}" for d in
                            ("src", "idx", "out", "ckpt"))
    # 10 files -> maxFilesPerTrigger=1 -> 10 serial micro-batches
    corpus.repartition(10).write.parquet(src)
    # seed the index: "small" = 1% history (index grows from nothing),
    # "full" = the ENTIRE corpus as history (index is 100x the delta
    # from batch 1 — the per-batch-cost-vs-index-size control)
    history = (
        corpus if seed == "full"
        else corpus.where(F.col("doc_id") % 100 == 0)
    )
    minhash_band_index(history).write.partitionBy("band").parquet(idx)

    sink = incremental_dedup_sink(idx, outp)
    batch_walls: list[dict] = []

    def timed(batch_df, batch_id):
        t0 = time.perf_counter()
        n = batch_df.count()
        sink(batch_df, batch_id)
        batch_walls.append(
            {
                "batch": int(batch_id),
                "rows_in": n,
                "wall_s": round(time.perf_counter() - t0, 2),
                "index_mb": round(
                    sum(
                        f.stat().st_size
                        for f in Path(idx).rglob("*.parquet")
                    )
                    / 1e6,
                    1,
                ),
            }
        )

    t0 = time.perf_counter()
    q = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(timed)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = round(time.perf_counter() - t0, 2)
    kept = spark.read.parquet(outp).count()
    walls = [b["wall_s"] for b in batch_walls]
    return {
        "op": f"foreachBatch near-dup ingest 10x (50k docs, 10 batches, {seed}-seeded LSH index)",
        "wall_s": wall,
        "batches": batch_walls,
        "survivors_appended": kept,
        "first_batch_s": walls[0] if walls else None,
        "last_batch_s": walls[-1] if walls else None,
        "max_over_min_batch": (
            round(max(walls) / max(min(walls), 0.01), 2) if walls else None
        ),
    }


def run_stream_stateful_10x(spark) -> dict:
    """The in-query stateful LSH variant (applyInPandasWithState):
    per-batch wall + STATE-STORE size as the inverted index grows in
    stream state — the state axis the foreachBatch rehearsal doesn't
    have (its index lives in parquet)."""
    from sea_serpent_spark.streaming.dedup import streaming_minhash_pairs

    corpus = _docs_corpus(spark, 10)  # 50k docs
    base = "/tmp/rehearse_r8_stateful"
    shutil.rmtree(base, ignore_errors=True)
    src, outp, ckpt = (f"{base}/{d}" for d in ("src", "out", "ckpt"))
    corpus.repartition(10).write.parquet(src)
    # max_bucket=256: the state-size control the operator exposes — on
    # this near-clique corpus an unbounded bucket would make the
    # in-state comparison quadratic in corpus size, which is exactly
    # the deployment mistake the cap exists to prevent
    stream = streaming_minhash_pairs(
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        jaccard_threshold=0.5,
        max_bucket=256,
    )
    t0 = time.perf_counter()
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: bdf.write.mode("append").parquet(outp)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = round(time.perf_counter() - t0, 2)
    batches = []
    for p in q.recentProgress:
        so = (p.get("stateOperators") or [{}])[0]
        batches.append(
            {
                "batch": p.get("batchId"),
                "rows_in": p.get("numInputRows"),
                "wall_s": round(
                    (p.get("batchDuration") or 0) / 1000.0, 2
                ),
                "state_rows": so.get("numRowsTotal"),
                "state_mb": round(
                    (so.get("memoryUsedBytes") or 0) / 1e6, 1
                ),
            }
        )
    pairs = spark.read.parquet(outp).count()
    return {
        "op": "stateful LSH streaming dedup 10x (50k docs, applyInPandasWithState)",
        "wall_s": wall,
        "pairs_emitted": pairs,
        "batches": batches,
    }


def run_fuzzy_k2_10x(spark) -> dict:
    from sea_serpent_spark.operators.fuzzy import edit_distance_join

    # same 150k-name corpus as the k=1 rehearsal (rehearse_r6)
    path = "/tmp/rehearse_names_10x.parquet"
    if not os.path.exists(path + "/_SUCCESS"):
        cust = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
        n0 = cust.count()
        reps = []
        for r in range(10):
            reps.append(
                cust.select(
                    (F.col("c_custkey") + F.lit(r * n0)).alias("id"),
                    F.when(
                        F.lit(r % 2 == 1),
                        F.concat(F.col("c_name"), F.lit(chr(97 + r))),
                    )
                    .otherwise(F.col("c_name"))
                    .alias("name"),
                )
            )
        big = reps[0]
        for d in reps[1:]:
            big = big.unionByName(d)
        big.repartition(32).write.mode("overwrite").parquet(path)
    left = spark.read.parquet(path)
    right = spark.read.parquet(
        "/root/testdata/sf0.1/customer.parquet"
    ).select(F.col("c_custkey").alias("rid"), F.col("c_name").alias("rname"))
    first = next_stage(spark)
    t0 = time.perf_counter()
    rows = edit_distance_join(
        left, right, "name", "rname", "id", "rid", max_distance=2
    ).count()
    wall = round(time.perf_counter() - t0, 2)
    stages = stage_stats(spark, first)
    return {
        "op": "edit_distance_join salted (150k x 15k, k=2)",
        "wall_s": wall,
        "rows": rows,
        "n_stages": len(stages),
        "total_shuffle_write_mb": round(
            sum(s["shuffle_write_mb"] for s in stages), 1
        ),
        **heavy_summary(stages),
    }


RUNS = {
    "dedup_corpus_100x": run_dedup_corpus_100x,
    "dedup_corpus_30x": lambda spark: run_dedup_corpus_100x(spark, 30),
    "stream_ingest_10x": run_stream_ingest_10x,
    "stream_ingest_10x_fullindex": lambda spark: run_stream_ingest_10x(
        spark, seed="full"
    ),
    "stream_stateful_10x": run_stream_stateful_10x,
    "fuzzy_k2_10x": run_fuzzy_k2_10x,
}


def main() -> None:
    chosen = sys.argv[1:] or list(RUNS)
    from sea_serpent_spark.session import get_spark

    spark = get_spark(
        app_name="rehearse-r8", extra_conf={"spark.ui.enabled": "true"}
    )
    results = {}
    for name in chosen:
        print(f"# running {name}", file=sys.stderr)
        results[name] = RUNS[name](spark)
        print(f"# {name}: {results[name].get('wall_s')}s", file=sys.stderr)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
