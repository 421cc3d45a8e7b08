"""r15 (VERDICT item 7): larger-SF scaling spot-check for the top-5
slots (q30/q37/q69 over 10x documents; q41/q43 over 5x embeddings),
8 vs 32 cores — converting the 100 TB posture from code-inspection
claims into measured core-scaling ratios. sf0.1 is driver-bound end to
end (every r14 c8/c32 ratio ~1); at 10x the data-parallel terms should
dominate and the ratio should open up toward the core ratio.

Usage:
  python tools/rehearse_scale_r15.py build     # write the scaled dirs
  SPARK_GRAFT_CPUS=8  python tools/rehearse_scale_r15.py run q30_text_analysis
(one slot per process — fresh JVM per measurement, like the driver's
c8 artifact).
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

DOCS_X = 10
EMB_X = 5
ROOT = "/tmp/scale_r15"


def build() -> None:
    from sea_serpent_spark.session import get_spark

    spark = get_spark(app_name="scale-build")
    os.makedirs(ROOT, exist_ok=True)
    # every other table symlinks to sf0.1 (bench_slot's warmup touches
    # lineitem; q-slots under test only read documents/embeddings)
    for f in os.listdir("/root/testdata/sf0.1"):
        dst = os.path.join(ROOT, f)
        if f in ("documents.parquet", "embeddings.parquet"):
            continue
        if not os.path.exists(dst):
            os.symlink(os.path.join("/root/testdata/sf0.1", f), dst)
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n0 = docs.count()
    reps = []
    for r in range(DOCS_X):
        reps.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * n0)).alias("doc_id"),
                # odd replicas perturbed: the corpus carries exact dups,
                # near dups and originals — the pair operators' regimes
                F.when(
                    F.lit(r % 2 == 1),
                    F.concat(F.col("text"), F.lit(f" replica{r}")),
                ).otherwise(F.col("text")).alias("text"),
                "lang", "source", "n_chars",
            )
        )
    big = reps[0]
    for d in reps[1:]:
        big = big.unionByName(d)
    big.repartition(32).write.mode("overwrite").parquet(
        os.path.join(ROOT, "documents.parquet")
    )
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    m0 = emb.count()
    ereps = []
    for r in range(EMB_X):
        ereps.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * m0)).alias("vec_id"),
                # rotate one coordinate per replica so replicas are near
                # (not exact) neighbors — keeps pair counts linear-ish
                F.transform(
                    "embedding",
                    lambda x, i: x + (i == F.lit(r % 16)).cast("float")
                    * F.lit(0.01 * r),
                ).alias("embedding"),
                "label",
            )
        )
    bige = ereps[0]
    for d in ereps[1:]:
        bige = bige.unionByName(d)
    bige.repartition(32).write.mode("overwrite").parquet(
        os.path.join(ROOT, "embeddings.parquet")
    )
    print("built", ROOT)


def run(slot: str) -> None:
    from sea_serpent_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark(app_name=f"scale-{slot}")
    fn = E.queries()[slot]
    t0 = time.monotonic()
    fn(spark, ROOT).write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    print(
        f'{{"slot": "{slot}", "cpus": '
        f'{os.environ.get("SPARK_GRAFT_CPUS", "32")}, '
        f'"wall_s": {round(wall, 2)}}}'
    )


if __name__ == "__main__":
    if sys.argv[1] == "build":
        build()
    else:
        run(sys.argv[2] if len(sys.argv) > 2 else sys.argv[1])
