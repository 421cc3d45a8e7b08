"""Similarity search over embedding columns (array<float>).

Beyond-reference extensions (SURVEY §7 Phase 5): top-k nearest neighbors
by cosine similarity.

- **brute_force_topk** — exact: query×corpus join, cosine via
  ``zip_with``/``aggregate`` (JVM-side, no Python). The correctness
  baseline; at scale this is the right choice only for small query sets
  (broadcast the queries, stream the corpus — one pass, no shuffle of the
  corpus).
- **lsh_topk** — random-hyperplane-style LSH: bucket = sign bits of the
  first ``nbits`` dimensions; probes only same-bucket candidates. The
  scale path: corpus is bucketed once (narrow), each query touches one
  bucket. Recall < 1 by construction; verified rank-for-rank against the
  oracle running the identical bucketing.
- **ivf_topk** — inverted-file variant using a provided coarse label
  (cluster id) column as the quantizer: probe only same-cluster vectors.

All return (query_id, neighbor_id, rank) — rank-based output keeps the
oracle hash stable under float summation-order differences.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from .util import fan_out


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    """dot(a,b)/(‖a‖·‖b‖), left-to-right accumulation (oracle-portable).

    In pairwise joins prefer precomputing ``norm`` per *vector* side
    (see ``_sided``) — the quotient is then bit-identical to this form
    (same per-vector arithmetic) at a third of the per-pair HOF work."""
    return dot(a, b) / (norm(a) * norm(b))


def _sided(
    df: DataFrame, id_col: str, vec_col: str, id_as: str, vec_as: str,
    n_as: str, **extra: Column,
) -> DataFrame:
    """Project (id, vec, ‖vec‖ [, extras]): norms computed once per
    vector instead of once per pair. Higher-order array functions are
    interpreted in Spark, so per-pair work is the scale cost driver."""
    return df.select(
        F.col(id_col).alias(id_as),
        F.col(vec_col).alias(vec_as),
        norm(F.col(vec_col)).alias(n_as),
        *[c.alias(name) for name, c in extra.items()],
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: broadcast queries × corpus, rank by cosine.

    Scale: the corpus never shuffles — each partition scores its vectors
    against the broadcast query set and the window is per-query over a
    k-bounded candidate set (Catalyst folds rank+filter into a top-k sort)."""
    q = _sided(queries, id_col, vec_col, "query_id", "qv", "nq")
    c = fan_out(_sided(corpus, id_col, vec_col, "neighbor_id", "cv", "nc"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("cv")) / (F.col("nq") * F.col("nc"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def sign_bucket(vec: Column, nbits: int = 8) -> Column:
    """Random-hyperplane-style bucket id: sign bits of the first nbits
    dims (axis-aligned hyperplanes — deterministic and oracle-portable;
    swap in a seeded projection matrix for production recall)."""
    out = F.lit(0)
    for i in range(nbits):
        out = out + F.when(
            F.element_at(vec, i + 1) > 0, F.lit(2**i)
        ).otherwise(0)
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k probing only the query's sign bucket.

    Scale: corpus bucketing is a narrow projection; the equality join on
    bucket replaces the cross join — each query scores ~N/2^nbits
    candidates."""
    q = _sided(queries, id_col, vec_col, "query_id", "qv", "nq").withColumn(
        "bucket", sign_bucket(F.col("qv"), nbits)
    )
    c = fan_out(
        _sided(corpus, id_col, vec_col, "neighbor_id", "cv", "nc").withColumn(
            "bucket", sign_bucket(F.col("cv"), nbits)
        )
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("cv")) / (F.col("nq") * F.col("nc"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
) -> DataFrame:
    """IVF probe using an existing coarse-cluster column as quantizer."""
    q = _sided(
        queries, id_col, vec_col, "query_id", "qv", "nq",
        cl=F.col(cluster_col),
    )
    c = fan_out(
        _sided(
            corpus, id_col, vec_col, "neighbor_id", "cv", "nc",
            cl=F.col(cluster_col),
        )
    )
    scored = (
        c.join(F.broadcast(q), "cl")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("cv")) / (F.col("nq") * F.col("nc"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 0,
) -> DataFrame:
    """→ [id_a, id_b, cos ≥ threshold] near-duplicate vectors.

    nbits=0 → exact all-pairs (correctness baseline; quadratic).
    nbits>0 → LSH-bucketed: only same-bucket pairs compared (the 100 TB
    path; near-identical vectors share sign buckets with high prob.)."""
    extra = (
        {"bucket": sign_bucket(F.col(vec_col), nbits)} if nbits else {}
    )
    a = fan_out(
        _sided(df, id_col, vec_col, "id_a", "va", "na", **extra)
    )
    b = _sided(df, id_col, vec_col, "id_b", "vb", "nb", **extra)
    joined = a.join(b, "bucket") if nbits else a.crossJoin(F.broadcast(b))
    return (
        joined.where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                4,
            ).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )
