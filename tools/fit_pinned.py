"""Regenerate ``sea_serpent_spark/operators/pinned.py``.

Fits the two pinned quantizer models on the sf0.01 embeddings corpus and
embeds them as full-precision (``repr``) float literals — the same
pinned-constant route as the minhash coefficients (operators/hashing.py):
both the Spark operators and the generated DuckDB oracle SQL consume the
identical constants, so encode/assign arithmetic is bit-reproducible
across engines and across rounds. Run only when the fit recipe changes:

    python tools/fit_pinned.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from sea_serpent_spark.operators.similarity import kmeans_fit, pq_fit  # noqa: E402
from sea_serpent_spark.session import get_spark  # noqa: E402

SEM_K = 4
SEM_ITERS = 5
PQ_M = 4
PQ_KSUB = 16
PQ_ITERS = 4
SEED = 42

HEADER = '''"""Pinned quantizer models (generated — do not edit by hand).

Deterministically fit on the sf0.01 embeddings corpus by
``tools/fit_pinned.py`` (seeded sample in vec_id order, fixed iteration
count) and embedded as full-precision literals, the same
pinned-constant route as ``hashing.MINHASH_COEFFS``: the Spark
operators (``ivf_assign``/``semantic_dedup``, ``pq_encode``/``pq_topk``)
and the generated DuckDB oracle SQL (workload_ext) consume these same
constants, so cluster assignment and ADC distances are bit-reproducible
across engines. A pinned quantizer is also the production posture: at
100 TB the codebook/centroids are fit once on a sample, versioned, and
shipped to every encode/search job — never re-fit per query.
"""

# fmt: off
'''


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="fit-pinned")
    df = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
        .orderBy("vec_id")
    )
    cents = kmeans_fit(df, "embedding", k=SEM_K, iters=SEM_ITERS, seed=SEED)
    books = pq_fit(df, "embedding", m=PQ_M, ksub=PQ_KSUB, iters=PQ_ITERS,
                   seed=SEED)

    def fmt_vec(v: list[float], ind: str) -> str:
        parts = [repr(float(x)) for x in v]
        lines, cur = [], ""
        for p in parts:
            if cur and len(cur) + len(p) + 2 > 76 - len(ind):
                lines.append(cur)
                cur = p
            else:
                cur = f"{cur}, {p}" if cur else p
        lines.append(cur)
        body = f",\n{ind} ".join(lines)
        return f"{ind}[{body}]"

    out = Path(__file__).resolve().parent.parent / (
        "sea_serpent_spark/operators/pinned.py"
    )
    with out.open("w") as f:
        f.write(HEADER)
        f.write(
            f"\n# spherical k-means, k={SEM_K}, iters={SEM_ITERS}, "
            f"seed={SEED} (semantic_dedup coarse clusters)\n"
        )
        f.write("SEMDEDUP_CENTROIDS: list[list[float]] = [\n")
        for c in cents:
            f.write(fmt_vec(c, "    ") + ",\n")
        f.write("]\n")
        f.write(
            f"\n# product-quantization codebooks, m={PQ_M}, "
            f"ksub={PQ_KSUB}, iters={PQ_ITERS}, seed={SEED} "
            f"(pq_encode/pq_topk ADC)\n"
        )
        f.write("PQ_CODEBOOKS: list[list[list[float]]] = [\n")
        for book in books:
            f.write("    [\n")
            for c in book:
                f.write(fmt_vec(c, "        ") + ",\n")
            f.write("    ],\n")
        f.write("]\n")
    print(f"wrote {out}: {len(cents)} centroids of dim {len(cents[0])}, "
          f"{len(books)}x{len(books[0])} codebooks of dsub "
          f"{len(books[0][0])}")


if __name__ == "__main__":
    main()
