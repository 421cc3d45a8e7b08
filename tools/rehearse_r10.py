"""Round-10 scale rehearsal: persisted IVF / IVF-PQ probe cost vs
index size, and what the ADC (codes-only) scan buys.

The honest claim to verify — NOT "flat": with a FIXED coarse quantizer
(k lists), IVF probe work is proportional to the probed lists' sizes,
and lists grow linearly with the corpus. What the artifact buys is
(a) the constant-factor partition pruning (nprobe/k of the corpus read
per batch instead of all of it), and (b) for IVF-PQ, a probe scan that
reads m-int codes instead of dim-float vectors (column pruning) — the
production memory shape. At real scale you also grow k with the corpus
(more, not bigger, lists); the sandbox pins k=8 (the pinned SemDeDup
quantizer) so the per-scale growth here is the expected linear-in-list
term, measured against the no-index brute baseline.

Measures, at corpus scales 1x / 10x / 30x (sf0.1 embeddings replicated
with offset ids):
  - build wall (assign + PQ encode + partitioned write + manifest);
  - per-batch probe wall, 20 queries, nprobe=2: ivfp (vector ranking)
    and ivfpq (ADC over codes);
  - brute-force top-k over the same corpus (the no-index baseline).

Usage: python tools/rehearse_r10.py [--scales 1,10,30]
Writes one JSON blob to stdout; summary curated into BENCH_NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402


def _corpus(spark, sf_dir: str, mult: int):
    """sf0.1 embeddings replicated ``mult``× with offset ids. Replica
    r>0 gets a CYCLIC DIMENSION SHIFT by r%dim — genuinely different
    directions, so the scaled corpus is not 300 copies of each query
    (identical replicas made k-means degenerate and every probe list
    huge — the first r10 rehearsal run measured probes reading ~49% of
    rows for that reason, a data artifact, not an operator one).
    Replica 0 is the identity, so vec_id<20 queries stay original."""
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    if mult <= 1:
        return base

    def shifted(df, r):
        if r == 0:
            return df.select(
                F.col("vec_id"), F.col("embedding")
            )
        s = r % 64
        e = F.concat(
            F.slice("embedding", s + 1, 64 - s),
            F.slice("embedding", 1, s),
        )
        return df.select(F.col("vec_id"), e.alias("embedding"))

    parts = [
        shifted(base, i).select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            "embedding",
        )
        for i in range(mult)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10,30")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from sea_serpent_spark.operators import similarity as S
    from sea_serpent_spark.operators.ann_index import (
        build_ivf_index,
        ivf_index_pq_topk,
        ivf_index_topk,
    )
    from sea_serpent_spark.operators.pinned import (
        PQ_CODEBOOKS,
        SEMDEDUP_CENTROIDS,
    )
    from sea_serpent_spark.session import get_spark

    spark = get_spark(app_name="rehearse-r10")
    results = []
    for mult in [int(s) for s in args.scales.split(",")]:
        corpus = _corpus(spark, args.sf_dir, mult).localCheckpoint(
            eager=True
        )
        n = corpus.count()
        queries = corpus.where(F.col("vec_id") < 20)
        path = f"/tmp/rehearse_r10_ivf_{mult}x/idx"
        shutil.rmtree(f"/tmp/rehearse_r10_ivf_{mult}x", ignore_errors=True)
        t_build = _timed(
            lambda: build_ivf_index(
                corpus, path, centroids=SEMDEDUP_CENTROIDS,
                codebooks=PQ_CODEBOOKS,
            )
        )

        def _noop(df):
            df.write.format("noop").mode("overwrite").save()

        # one warm probe each (JIT/footers), then the measured run
        _noop(ivf_index_topk(spark, path, queries, k=3, nprobe=2))
        t_ivfp = _timed(
            lambda: _noop(
                ivf_index_topk(spark, path, queries, k=3, nprobe=2)
            )
        )
        _noop(ivf_index_pq_topk(spark, path, queries, k=3, nprobe=2))
        t_ivfpq = _timed(
            lambda: _noop(
                ivf_index_pq_topk(spark, path, queries, k=3, nprobe=2)
            )
        )
        _noop(S.brute_force_topk(corpus, queries, k=3))
        t_brute = _timed(
            lambda: _noop(S.brute_force_topk(corpus, queries, k=3))
        )
        row = {
            "mult": mult,
            "n_vectors": n,
            "build_s": t_build,
            "probe_ivfp_s": t_ivfp,
            "probe_ivfpq_s": t_ivfpq,
            "probe_brute_s": t_brute,
        }
        results.append(row)
        print(f"# {row}", file=sys.stderr, flush=True)
    print(json.dumps({"rehearsal": "r10_ivf_scale", "rows": results}))


if __name__ == "__main__":
    main()
