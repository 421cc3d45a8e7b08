"""Round-6 scale rehearsals (VERDICT round-5 items 1, 4, 8).

Three scenarios, one per process (each fits the tool wall-clock budget;
corpora are cached under /tmp and reused):

- ``fuzzy_join``: the grid-salted ``edit_distance_join`` on the 10x
  shared-scaffold name corpus (150 k x 15 k, k=1) — the r4 rehearsal
  measured the UNSALTED join at 70.3 s; the claim under test is that
  the hot-gram buckets (every name shares the ``Customer#…`` scaffold
  grams) split into balanced sub-joins: max/p50 task skew <= 1.5 on
  the heaviest stage.
- ``token_budget_mix``: 10x documents with a 90/10 dominant source —
  the claim under test is that no stage has a task bounded by source
  size (the pre-r5 one-window-partition-per-source shape would put 90%
  of the corpus through one task).
- ``dedup_corpus``: the end-to-end minhash spanning -> CC -> anti-join
  pipeline at 10x on current (post-checkpoint-lifecycle) code — r4
  measured 25.1 s pre-lifecycle — plus block-manager occupancy
  (persistent RDDs, memory+disk bytes) before and after
  ``release_checkpoints()``, proving the lifecycle actually drains at
  rehearsal scale.

Usage: python tools/rehearse_r6.py <fuzzy_join|token_budget_mix|dedup_corpus>
Writes one JSON object to stdout; paste into BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402


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


def next_stage(spark) -> int:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
    )
    return max((s["stageId"] for s in stages), default=-1) + 1


def block_manager(spark) -> dict:
    """Persistent-RDD count + stored bytes from the UI storage API."""
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
    """Wall-dominant stage (by max task time) + its skew ratio."""
    worst = max(stages, key=lambda s: s["task_ms_max"], default=None)
    if worst is None:
        return {}
    skew = (
        round(worst["task_ms_max"] / max(worst["task_ms_p50"], 1.0), 2)
        if worst["task_ms_p50"]
        else None
    )
    return {"worst_stage": worst, "worst_skew_max_over_p50": skew}


def _names_corpus(spark, replicas: int = 10):
    """150 k shared-scaffold names: sf0.1 customer replicated with id
    offsets; odd replicas get a one-char suffix (dense distance-1
    structure) — the r4 rehearsal's generator, for comparability."""
    path = f"/tmp/rehearse_names_{replicas}x.parquet"
    if not os.path.exists(path + "/_SUCCESS"):
        cust = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
        n0 = cust.count()
        reps = []
        for r in range(replicas):
            reps.append(
                cust.select(
                    (F.col("c_custkey") + F.lit(r * n0)).alias("id"),
                    F.when(
                        F.lit(r % 2 == 1), F.concat("c_name", F.lit("x"))
                    )
                    .otherwise(F.col("c_name"))
                    .alias("name"),
                )
            )
        big = reps[0]
        for d in reps[1:]:
            big = big.unionByName(d)
        big.repartition(32).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def run_fuzzy_join(spark) -> dict:
    from sea_serpent_spark.operators.fuzzy import edit_distance_join

    left = _names_corpus(spark)
    right = spark.read.parquet(
        "/root/testdata/sf0.1/customer.parquet"
    ).select(F.col("c_custkey").alias("rid"), F.col("c_name").alias("rname"))
    first = next_stage(spark)
    t0 = time.perf_counter()
    rows = edit_distance_join(
        left, right, "name", "rname", "id", "rid", max_distance=1
    ).count()
    wall = round(time.perf_counter() - t0, 2)
    stages = stage_stats(spark, first)
    return {
        "op": "edit_distance_join salted (150k x 15k, k=1)",
        "wall_s": wall,
        "rows": rows,
        "n_stages": len(stages),
        "total_shuffle_write_mb": round(
            sum(s["shuffle_write_mb"] for s in stages), 1
        ),
        **heavy_summary(stages),
    }


def run_token_budget_mix(spark) -> dict:
    from sea_serpent_spark.operators.sampling import token_budget_mix
    from sea_serpent_spark.operators.util import release_checkpoints

    replicas = 100  # documents sf0.1 is only 5 k rows; 100x = 500 k
    path = f"/tmp/rehearse_docs_mix_{replicas}x.parquet"
    if not os.path.exists(path + "/_SUCCESS"):
        docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        n0 = docs.count()
        reps = []
        for r in range(replicas):
            reps.append(
                docs.select(
                    (F.col("doc_id") + F.lit(r * n0)).alias("doc_id"),
                    "text",
                    "n_chars",
                )
            )
        big = reps[0]
        for d in reps[1:]:
            big = big.unionByName(d)
        # 90/10 dominant source, assigned by id hash (layout-independent)
        big = big.withColumn(
            "source",
            F.when(
                F.pmod(F.xxhash64("doc_id"), F.lit(10)) < 9, "big"
            ).otherwise("small"),
        )
        big.repartition(32).write.mode("overwrite").parquet(path)
    corpus = spark.read.parquet(path)
    n_corpus = corpus.count()
    tot = {
        r["source"]: r["t"]
        for r in corpus.groupBy("source")
        .agg(F.sum("n_chars").alias("t"))
        .collect()
    }
    # budgets deep into each source: the running sum must scan ~all of
    # the dominant source's rows — the worst case for a per-source task
    budgets = {"big": int(tot["big"] * 0.8), "small": int(tot["small"] * 0.8)}
    first = next_stage(spark)
    t0 = time.perf_counter()
    rows = token_budget_mix(
        corpus, "source", "n_chars", budgets, "doc_id"
    ).count()
    wall = round(time.perf_counter() - t0, 2)
    stages = stage_stats(spark, first)
    release_checkpoints()
    return {
        "op": "token_budget_mix 90/10 dominant source, 80% budgets",
        "wall_s": wall,
        "rows": rows,
        "corpus_rows": n_corpus,
        "n_stages": len(stages),
        **heavy_summary(stages),
    }


def run_dedup_corpus(spark) -> dict:
    from sea_serpent_spark.operators import dedup as D
    from sea_serpent_spark.operators.util import release_checkpoints

    path = "/tmp/rehearse_docs_10x.parquet"
    if not os.path.exists(path + "/_SUCCESS"):
        docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        n0 = docs.count()
        reps = []
        for r in range(10):
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
    corpus = spark.read.parquet(path)
    first = next_stage(spark)
    t0 = time.perf_counter()
    rows = D.dedup_corpus(corpus, threshold=0.5).count()
    wall = round(time.perf_counter() - t0, 2)
    stages = stage_stats(spark, first)
    before = block_manager(spark)
    release_checkpoints()
    D.release_caches()
    after = block_manager(spark)
    return {
        "op": "dedup_corpus 10x (50k docs) post-lifecycle",
        "wall_s": wall,
        "survivors": rows,
        "n_stages": len(stages),
        "total_shuffle_write_mb": round(
            sum(s["shuffle_write_mb"] for s in stages), 1
        ),
        **heavy_summary(stages),
        "block_manager_before_release": before,
        "block_manager_after_release": after,
    }


def run_positional_qgram(spark) -> dict:
    """r4 item 5 / r5 item 7: does bucketing prefix grams by
    (gram, ⌊pos/(k+1)⌋) with ±1 band tolerance (the location-based
    mismatch filtering family of Ed-Join, Xiao et al. VLDB'08) beat the
    plain gram-type prefix join on the scaffold-heavy name corpora?

    Measures, for the current operator and the positional variant, on
    the q63 corpus (sf0.1 customer, 15 k) and the 10x name corpus
    (150 k): candidate enumerations (pre-verify join rows), wall with
    verify, and output parity vs the current (oracle-pinned) operator.
    """
    from sea_serpent_spark.operators.fuzzy import (
        edit_distance_pairs, qgrams,
    )
    from sea_serpent_spark.operators.util import fan_out
    from pyspark.sql import Window

    k, q = 1, 2
    short_len = q * (k + 1) - 1

    def positional(df, text_col, id_col, count_only=False):
        base = df.select(
            F.col(id_col).alias("id"),
            F.col(text_col).alias("s"),
            F.length(text_col).alias("ln"),
        ).where(F.col("s").isNotNull())
        long_side = fan_out(base.where(F.col("ln") > short_len))
        n = F.greatest(F.length("s") - (q - 1), F.lit(0))
        occ = F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.struct(
                F.substring("s", i, q).alias("g"), i.alias("p")
            ),
        )
        tok = long_side.select(
            "id", "ln", "s", F.explode(occ).alias("o")
        ).select("id", "ln", "s", F.col("o.g").alias("g"),
                 F.col("o.p").alias("p"))
        dfreq = tok.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
        ranked = tok.join(dfreq, "g").withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("id").orderBy(
                    F.asc("df"), F.asc("g"), F.asc("p")
                )
            ),
        )
        # k*q+1 rarest gram OCCURRENCES (vs gram types in the current
        # operator) — the positional count-filter's prefix
        prefix = ranked.where(F.col("rk") <= k * q + 1).select(
            "id", "ln", "g", "p", "s"
        )
        band = F.floor(F.col("p") / (k + 1))
        probe = prefix.select(
            F.col("id").alias("ida"), F.col("ln").alias("lna"),
            F.col("s").alias("sa"), "g", F.col("p").alias("pa"),
            F.explode(
                F.array(band - 1, band, band + 1)
            ).alias("b"),
        )
        build = prefix.select(
            F.col("id").alias("idb"), F.col("ln").alias("lnb"),
            F.col("s").alias("sb"), "g", F.col("p").alias("pb"),
            band.alias("b"),
        )
        cand = (
            probe.join(build, ["g", "b"])
            .where(
                (F.col("ida") < F.col("idb"))
                & (F.abs(F.col("pa") - F.col("pb")) <= k)
                & (F.abs(F.col("lna") - F.col("lnb")) <= k)
            )
        )
        if count_only:
            return cand
        pairs_long = (
            cand.withColumn("distance", F.levenshtein("sa", "sb", k))
            .where((F.col("distance") >= 0) & (F.col("distance") <= k))
            .select(
                F.col("ida").alias("id_a"), F.col("idb").alias("id_b"),
                "distance",
            )
            .distinct()
        )
        # short strings: same exact length-bucket path as the operator
        shorts = base.where(F.col("ln") <= short_len)
        sprobe = shorts.select(
            F.col("id").alias("ida"), F.col("s").alias("sa"),
            F.explode(F.sequence(F.col("ln") - k, F.col("ln") + k)).alias(
                "lb"
            ),
        ).where(F.col("lb") >= 0)
        sbuild = base.select(
            F.col("id").alias("idb"), F.col("s").alias("sb"),
            F.col("ln").alias("lb"),
        )
        pairs_short = (
            sprobe.join(sbuild, "lb")
            .where(F.col("ida") != F.col("idb"))
            .withColumn("distance", F.levenshtein("sa", "sb", k))
            .where((F.col("distance") >= 0) & (F.col("distance") <= k))
            .select(
                F.least("ida", "idb").alias("id_a"),
                F.greatest("ida", "idb").alias("id_b"),
                "distance",
            )
            .distinct()
        )
        return pairs_long.unionByName(pairs_short)

    def current_candidates(df, text_col, id_col):
        """Pre-verify enumeration count of the CURRENT operator's long
        path (prefix self-join on gram type, length filter in-join)."""
        base = df.select(
            F.col(id_col).alias("id"),
            F.col(text_col).alias("s"),
            F.length(text_col).alias("ln"),
        ).where(F.col("s").isNotNull())
        long_side = fan_out(base.where(F.col("ln") > short_len))
        tok = long_side.select(
            "id", "ln", F.explode(qgrams(F.col("s"), q)).alias("g")
        )
        dfreq = tok.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
        ranked = tok.join(dfreq, "g").withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("id").orderBy(F.asc("df"), F.asc("g"))
            ),
        )
        prefix = ranked.where(F.col("rk") <= k * q + 1).select(
            "id", "ln", "g"
        )
        a = prefix.select(
            F.col("id").alias("ida"), F.col("ln").alias("lna"), "g"
        )
        b = prefix.select(
            F.col("id").alias("idb"), F.col("ln").alias("lnb"), "g"
        )
        return a.join(b, "g").where(
            (F.col("ida") < F.col("idb"))
            & (F.abs(F.col("lna") - F.col("lnb")) <= k)
        )

    out: dict = {}
    corpora = {
        "customer_15k": (
            spark.read.parquet("/root/testdata/sf0.1/customer.parquet"),
            "c_name", "c_custkey",
        ),
        "names_150k": (_names_corpus(spark), "name", "id"),
    }
    chosen = [a for a in sys.argv[2:] if a in corpora]
    if chosen:
        corpora = {c: corpora[c] for c in chosen}
    for cname, (df, tcol, icol) in corpora.items():
        r: dict = {}
        r["cand_current"] = current_candidates(df, tcol, icol).count()
        r["cand_positional"] = positional(
            df, tcol, icol, count_only=True
        ).count()
        t0 = time.perf_counter()
        cur = edit_distance_pairs(df, tcol, icol, max_distance=k)
        r["rows_current"] = cur.count()
        r["wall_current_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        pos = positional(df, tcol, icol)
        r["rows_positional"] = pos.count()
        r["wall_positional_s"] = round(time.perf_counter() - t0, 2)
        if "noparity" not in sys.argv:
            r["output_parity"] = (
                cur.exceptAll(pos).isEmpty()
                and pos.exceptAll(cur).isEmpty()
            )
        out[cname] = r
    return out


def main() -> None:
    which = sys.argv[1]
    from sea_serpent_spark.session import get_spark

    spark = get_spark(
        app_name=f"rehearse-r6-{which}",
        extra_conf={"spark.ui.enabled": "true"},
    )
    fn = {
        "fuzzy_join": run_fuzzy_join,
        "token_budget_mix": run_token_budget_mix,
        "dedup_corpus": run_dedup_corpus,
        "positional_qgram": run_positional_qgram,
    }[which]
    print(json.dumps(fn(spark), indent=1))


if __name__ == "__main__":
    main()
