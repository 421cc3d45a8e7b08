"""q61 member decomposition with loadavg bracketing (r14 measurement).

Each member is timed with the noop sink, 3 passes, min reported;
os.getloadavg()[0] printed before each pass so a load wave is visible
in the record instead of silently inflating a number.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sea_serpent_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main():
    spark = get_spark(app_name="q61-prof")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from sea_serpent_spark.workload_ext import df
    from sea_serpent_spark import workload_ext as W
    from sea_serpent_spark.operators import similarity as S
    from sea_serpent_spark.operators.dedup import (
        connected_components,
        dedup_corpus,
        release_caches,
    )
    from sea_serpent_spark.operators.util import release_checkpoints

    def noop(d):
        d.write.format("noop").mode("overwrite").save()

    def t(label, fn, n=3):
        best = None
        for i in range(n):
            release_caches()
            release_checkpoints()
            spark.sparkContext._jvm.System.gc()
            la = os.getloadavg()[0]
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            print(f"  {label} pass{i}: {dt:.2f}s (load {la:.1f})", flush=True)
        print(f"{label}: min {best:.2f}s", flush=True)

    W.q61_connected_components(spark, sf_dir).count()  # warmup

    emb = df(spark, sf_dir, "embeddings")
    t(
        "pairs-only",
        lambda: noop(S.embedding_near_dup_pairs(emb, threshold=0.45, nbits=0)),
    )
    t(
        "cc-member",
        lambda: noop(
            connected_components(
                S.embedding_near_dup_pairs(emb, threshold=0.45, nbits=0)
            )
        ),
    )
    docs = df(spark, sf_dir, "documents").where(F.col("doc_id") < 600)
    t(
        "best-member",
        lambda: noop(
            dedup_corpus(
                docs,
                method="minhash",
                threshold=0.5,
                keep="max",
                keep_col="n_chars",
            )
        ),
    )
    t("full-q61", lambda: noop(W.q61_connected_components(spark, sf_dir)))


if __name__ == "__main__":
    main()
