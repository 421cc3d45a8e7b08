"""Deduplication operators — exact and near-duplicate, designed for 100 TB.

Beyond-reference extensions (SURVEY §7 Phase 5). All hot paths are
``pyspark.sql.functions`` expressions (JVM codegen); the only shuffles are
the group-bys/joins that the algorithms fundamentally require:

- **exact**: hash-groupBy on a normalized md5 fingerprint — one shuffle of
  (16-byte key, id), the minimum possible.
- **minhash-LSH**: per-doc signature (narrow, no shuffle) → band keys →
  self-join per band bucket → candidate pairs → exact Jaccard verify.
  At scale the band join shuffles only (band_key, doc_id) pairs, never
  documents; skewed buckets (boilerplate docs) are handled by AQE skew
  splitting plus an optional bucket-size cap.
- **simhash**: 48-bit signature via bitwise majority (portable hashing,
  see hashing.py) → near-dup = hamming distance ≤ k, found by banding the
  signature into 4 chunks (pigeonhole: any pair within distance 3 shares
  ≥1 exact chunk) — again joining only ids + 12-bit chunks.
- **ngram-jaccard**: token-shingle explode → inverted-index self-join →
  |∩| per pair → Jaccard. Quadratic only within shingle buckets.
- **embedding near-dup**: cosine ≥ threshold via the similarity module.

Every operator is verified against a DuckDB oracle running the *same*
portable hash arithmetic (workload_ext).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from .hashing import MINHASH_COEFFS, P, SIMHASH_BITS, h48, perm
from .text import fingerprint, words


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ [id, fp, is_canonical]: canonical = min id per fingerprint group.
    ``dropDuplicates`` equivalent but keeps full group visibility."""
    fp = fingerprint(F.col(text_col)).alias("fp")
    w = Window.partitionBy("fp").orderBy(F.asc(id_col))
    return (
        df.select(F.col(id_col), fp)
        .withColumn("rn", F.row_number().over(w))
        .select(
            id_col, "fp", (F.col("rn") == 1).alias("is_canonical")
        )
    )


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ [fp, n_dups, canonical_id] one row per distinct content."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("canonical_id"),
        )
    )


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

def shingles(col: Column, n: int = 1) -> Column:
    """Distinct word n-gram shingles. n=1 → distinct words; n>1 → joined
    n-word windows."""
    ws = words(col)
    if n == 1:
        return F.array_distinct(ws)
    idx = F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(-1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ws, i + 1, n)))
    )


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 1,
) -> DataFrame:
    """→ [id, sig array<bigint>] minhash signature, all JVM-side.

    sig[i] = min over shingles of ((md5_32(s) mod P) * a_i + b_i) mod P —
    the portable universal-hash family shared with the DuckDB oracle."""
    if num_hashes > len(MINHASH_COEFFS):
        raise ValueError(f"at most {len(MINHASH_COEFFS)} hashes supported")
    sh = shingles(F.col(text_col), shingle_n)
    def _minexpr(a: int, b: int):
        return F.array_min(F.transform(sh, lambda s: perm(s, a, b)))

    sig = F.array(*[_minexpr(a, b) for a, b in MINHASH_COEFFS[:num_hashes]])
    return df.select(F.col(id_col).alias("id"), sig.alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 1,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """→ [id_a, id_b, jaccard] candidate pairs sharing ≥1 LSH band,
    verified with exact shingle-set Jaccard ≥ threshold.

    Scale shape: signatures are narrow (id + 16 longs); the band self-join
    shuffles (band_idx, band_key) — documents themselves never move. The
    verify join re-reads only candidate docs' shingle sets."""
    rows = num_hashes // bands
    sigs = minhash_signature(df, text_col, id_col, num_hashes, shingle_n)
    band_cols = [
        F.struct(
            F.lit(i).alias("band"),
            F.concat_ws(
                "-", *[F.element_at("sig", i * rows + r + 1).cast("string")
                       for r in range(rows)]
            ).alias("key"),
        )
        for i in range(bands)
    ]
    banded = sigs.select(
        "id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "key"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    sh = df.select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(inter / union, 4).alias("jaccard"),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, inverted-index join)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 1,
    threshold: float = 0.8,
) -> DataFrame:
    """→ [id_a, id_b, jaccard ≥ threshold] via shingle inverted index.

    The explode/self-join shuffles (shingle, id) pairs; |∩| computed by
    group-count, sizes joined back broadcast. Exact (no sketch error) —
    the verify baseline for minhash."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("s"),
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    pairs = (
        sh.alias("x")
        .join(sh.alias("y"), "s")
        .where(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        pairs.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                4,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash(col: Column, bits: int = SIMHASH_BITS) -> Column:
    """48-bit simhash: bit j of the signature = majority vote of bit j
    across the 48-bit md5 hashes of the document's distinct words.
    Pure integer expression tree — portable to the DuckDB oracle."""
    ws = F.array_distinct(words(col))
    hashes = F.transform(ws, h48)
    def _vote(j: int):
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(
                F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1),
        )

    out = F.lit(0).cast("long")
    for j in range(bits):
        out = out + F.when(_vote(j) > 0, F.lit(2**j).cast("long")).otherwise(0)
    return out


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("sim")
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """→ [id_a, id_b, hamming ≤ max_hamming] via chunk banding.

    Pigeonhole: with 4 chunks of 12 bits, any pair within hamming ≤ 3
    agrees exactly on ≥1 chunk — candidates come from equality joins on
    (chunk_idx, chunk_value), so the shuffle is ids + 12-bit ints."""
    sigs = simhash_signatures(df, text_col, id_col)
    width = SIMHASH_BITS // chunks
    mask = (1 << width) - 1
    chunk_cols = [
        F.struct(
            F.lit(i).alias("c"),
            F.shiftright("sim", i * width).bitwiseAND(F.lit(mask)).alias("v"),
        )
        for i in range(chunks)
    ]
    banded = sigs.select(
        "id", "sim", F.explode(F.array(*chunk_cols)).alias("ck")
    ).select("id", "sim", F.col("ck.c").alias("c"), F.col("ck.v").alias("v"))
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["c", "v"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.sim").alias("sim_a"),
            F.col("y.sim").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.select("id_a", "id_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )
