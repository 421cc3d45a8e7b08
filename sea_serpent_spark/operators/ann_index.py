"""Persisted IVF index for approximate nearest-neighbor search.

The similarity-search twin of the incremental LSH band index
(``operators/incremental.py``): ``ivf_topk`` answers "search THIS
corpus"; a production pipeline builds the index ONCE and serves probe
queries against the artifact without re-assigning the corpus per job.

Layout (the 100 TB design, same playbook as ``write_band_index``):

- the corpus is assigned to its argmax-cosine coarse centroid
  (``similarity.ivf_assign`` — the IVF list id) and written PARTITIONED
  BY ``label``, rows sorted by id within each list;
- the quantizer (k × dim centroids) rides a ``_ivf_index_meta.json``
  sidecar — centroids are a versioned artifact, pinned at build time
  (the ``kmeans_fit`` docstring's reproducibility posture);
- a probe computes each query's top-``nprobe`` lists from the sidecar
  centroids as a broadcast-literal expression, collects the DISTINCT
  probed list ids (bounded by the centroid count — a constant, never
  data-sized), and pushes them as literal partition predicates: the
  scan reads ONLY the probed list directories. Per-query work is then
  proportional to the probed lists' sizes, not the corpus — the IVF
  contract, realized at the file-layout level.

Exactness contract: with the same centroids, ``ivf_index_topk`` on the
persisted index equals ``ivf_topk`` over ``ivf_assign``-labeled frames
(nprobe=1), and multi-probe widens recall by scanning the next-best
lists — probe SELECTION is deterministic (affinity desc, index asc tie
order), which the q41 oracle replays in SQL.

Reference: the reference has no vector surface at all — this is a
beyond-reference LLM-pipeline extension (SURVEY §7 Phase 5).
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from . import artifact
from .similarity import dot, ivf_assign, kmeans_fit, norm
from .util import fan_out

_ANN_META = "_ivf_index_meta.json"

#: Query batches at or under this many (query, probe) rows broadcast in
#: the candidate join; ~512 B/row at dim=64 → ≈250 MB worst case.
_QUERY_BROADCAST_CAP = 500_000


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    centroids: list[list[float]] | None = None,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Assign every corpus vector to its IVF list and persist the
    list-partitioned layout + the quantizer sidecar. Returns the
    centroids actually used (pass pinned ones for byte-stable builds;
    ``kmeans_fit`` is the from-scratch path).

    Versioned-manifest commit (round 10): the layout lands in a fresh
    generation directory and is published by the atomic manifest swap
    of ``operators/artifact.py`` — a REBUILD over a live index cannot
    tear a concurrent probe (readers pin the generation they resolved;
    the previous one is retained through one publish)."""
    if centroids is None:
        centroids = kmeans_fit(corpus, vec_col, k)
    assigned = ivf_assign(
        corpus.select(id_col, vec_col), centroids, vec_col
    )
    legacy = artifact.read_manifest(path) is None and os.path.exists(
        os.path.join(path, _ANN_META)
    )
    gen, staging = artifact.new_generation_dir(path)
    (
        assigned.repartition("label")
        .sortWithinPartitions("label", id_col)
        .write.mode("overwrite")
        .partitionBy("label")
        .parquet(staging)
    )
    with open(os.path.join(staging, _ANN_META), "w") as fh:
        json.dump({"centroids": centroids}, fh)
    artifact.publish_generation(path, gen)
    if legacy:
        artifact.clear_legacy_layout(path)
        legacy_meta = os.path.join(path, _ANN_META)
        if os.path.exists(legacy_meta):
            os.remove(legacy_meta)
    return centroids


def _resolve(path: str) -> tuple[str, list[list[float]]]:
    """→ (pinned generation dir, its centroids) — legacy flat layouts
    (meta at the root) resolve to the root."""
    src = artifact.current_dir(path)
    meta = os.path.join(src, _ANN_META)
    if not os.path.exists(meta):  # legacy layout
        meta = os.path.join(path, _ANN_META)
        src = path
    with open(meta) as fh:
        return src, json.load(fh)["centroids"]


def read_ivf_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, list[list[float]]]:
    """→ (list-partitioned corpus frame, quantizer centroids), pinned
    to the manifest's current generation."""
    src, centroids = _resolve(path)
    return spark.read.parquet(src), centroids


def ivf_probes(
    df: DataFrame,
    centroids: list[list[float]],
    nprobe: int = 1,
    vec_col: str = "embedding",
    out_col: str = "probes",
) -> DataFrame:
    """Attach each row's top-``nprobe`` IVF list ids — the probe
    SELECTION, as a pure broadcast-literal expression (no shuffle, no
    join; the same staged-norm shape as ``ivf_assign``). Deterministic
    order: affinity descending, centroid index ascending on ties
    (array_sort over struct(−affinity, index) — the lexicographic tie
    rule the q41 oracle replays)."""
    for staging in ("__an",):
        if staging in df.columns:
            raise ValueError(
                f"ivf_probes stages an internal column {staging!r}; "
                "rename the conflicting input column first"
            )
    staged = df.withColumn(
        "__an", F.greatest(norm(F.col(vec_col)), F.lit(1e-12))
    )
    scored = F.array(
        *[
            F.struct(
                (
                    -(dot(F.col(vec_col),
                          F.array(*[F.lit(float(x)) for x in c]))
                      / F.col("__an"))
                ).alias("ns"),
                F.lit(i).alias("i"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    probes = F.transform(
        F.slice(F.array_sort(scored), 1, int(nprobe)), lambda x: x["i"]
    )
    return staged.withColumn(out_col, probes).drop("__an")


def ivf_index_topk(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ [query_id, neighbor_id, rank]: cosine top-k of each query over
    the PROBED lists of a persisted IVF index.

    Scale shape: probe selection is row-local; the distinct probed list
    ids (≤ centroid count, a CONSTANT-bounded collect) become literal
    partition predicates so the index scan opens only probed
    directories; the candidate join is (list id)-keyed with the query
    side exploded per probe and broadcast under a count gate (the list
    id is deliberately low-cardinality, so the shuffle fallback bounds
    parallelism by |probed| — split bulk batches instead); ranking is
    the standard per-query window."""
    src, centroids = _resolve(path)
    q = ivf_probes(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
        ),
        centroids, nprobe, vec_col="qv",
    ).withColumn(
        "nq", F.greatest(norm(F.col("qv")), F.lit(1e-12))
    ).select(
        "query_id", "qv", "nq", F.explode("probes").alias("label")
    )
    probed = sorted(
        {int(r["label"]) for r in q.select("label").distinct().collect()}
    )  # ≤ len(centroids) rows — constant-bounded collect
    idx = fan_out(
        spark.read.parquet(src).where(F.col("label").isin(probed))
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.greatest(norm(F.col(vec_col)), F.lit(1e-12)).alias("nc"),
        "label",
    )
    # the candidate join is keyed on the LIST id — a deliberately
    # low-cardinality key, so a shuffle join would collapse to
    # ≤ |probed| reducers. Broadcasting the (exploded) query side keeps
    # the index side map-local — but only while the batch is genuinely
    # broadcastable; a bulk scoring job (millions of queries) falls
    # back to the shuffle join and should split its batch instead.
    if q.count() <= _QUERY_BROADCAST_CAP:
        q = F.broadcast(q)
    scored = (
        idx.join(q, "label")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("cv"))
             / (F.col("nq") * F.col("nc"))).alias("cos"),
        )
        # a neighbor can sit in two probed lists of the SAME query only
        # if lists overlapped — they don't (argmax assignment is a
        # partition), so no dedup is needed
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
