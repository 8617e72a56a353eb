"""Deduplication operators for training-data pipelines (charter X1/X2).

Scale design notes (100 TB posture):
- Exact dedup hashes content (sha2-256) and keeps a deterministic survivor via
  ``row_number`` per hash — one shuffle on the hash, no full-text comparisons.
- MinHash signatures are computed per-document entirely JVM-side
  (``transform``/``array_min`` over char shingles — no explode, no Python),
  then LSH banding turns the quadratic candidate search into a groupBy on
  (band, band_hash): only same-bucket pairs are compared, and only candidates
  get the exact Jaccard verification.
- SimHash packs a 64-bit signature per document (again pure column exprs);
  near-dup = small Hamming distance, found via band-of-bits buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalized_text(text: Column) -> Column:
    """Whitespace/case normalization used before hashing for exact dedup."""
    return F.regexp_replace(F.trim(F.lower(text)), "\\s+", " ")


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Keep one deterministic survivor (lowest id) per distinct content hash.

    Returns the survivors with ``content_hash`` and ``n_copies``.
    """
    content = normalized_text(F.col(text_col)) if normalize else F.col(text_col)
    hashed = df.withColumn("content_hash", F.sha2(content, 256))
    w = Window.partitionBy("content_hash").orderBy(F.col(id_col).asc())
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(Window.partitionBy("content_hash")))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (X2)
# ---------------------------------------------------------------------------

def char_shingles(text: Column, k: int = 5) -> Column:
    """Distinct k-char shingles of the normalized text (array<string>)."""
    norm = normalized_text(text)
    n = F.length(norm)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
            lambda i: norm.substr(i, F.lit(k)),
        )
    )


_MERSENNE_31 = 2147483647  # 2^31-1; keeps h1 + i*h2 far from long overflow (ANSI mode)


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature (array<bigint>) via double hashing:
    ``h_i(s) = (h1(s) + i * h2(s)) mod p`` with two xxhash64 draws reduced mod
    a Mersenne prime (Kirsch-Mitzenmacher) — k permutations from two 64-bit
    hashes, all inside codegen, no overflow under ANSI arithmetic."""
    p = F.lit(_MERSENNE_31).cast("long")
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                shingles,
                lambda s: F.pmod(
                    F.pmod(F.xxhash64(s), p)
                    + i.cast("long") * F.pmod(F.xxhash64(s, F.lit("mh-salt")), p),
                    p,
                ),
            )
        ),
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    threshold: float = 0.6,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH with exact-Jaccard verification.

    Pipeline: signature (map-side) -> explode into ``bands`` band-hashes ->
    self-join within (band, band_hash) buckets -> distinct candidate pairs ->
    verify with exact Jaccard over distinct shingle sets. Output:
    (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    """
    rows_per_band = num_hashes // bands
    sig_df = df.select(
        F.col(id_col).alias("_id"),
        char_shingles(F.col(text_col), shingle_k).alias("_shingles"),
    ).withColumn("_sig", minhash_signature(F.col("_shingles"), num_hashes))
    banded = sig_df.select(
        "_id",
        "_shingles",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band),
                    b,
                ),
            )
        ).alias("_band", "_bucket"),
    )
    left = banded.select(
        F.col("_band"), F.col("_bucket"), F.col("_id").alias("id_a"), F.col("_shingles").alias("_sh_a")
    )
    right = banded.select(
        F.col("_band"), F.col("_bucket"), F.col("_id").alias("id_b"), F.col("_shingles").alias("_sh_b")
    )
    candidates = (
        left.join(right, on=["_band", "_bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_sh_a", "_sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect(F.col("_sh_a"), F.col("_sh_b")))
    union = F.size(F.array_union(F.col("_sh_a"), F.col("_sh_b")))
    return (
        candidates.withColumn(
            "jaccard", F.round(inter.cast("double") / union, 6)
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >= 1 shingle.

    Explode distinct shingles, self-join on shingle (the inverted-index join),
    count intersections per pair, derive the union from per-doc set sizes.
    SQL-oracle-able; for very large corpora prefer minhash_near_duplicates.
    """
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(char_shingles(F.col(text_col), shingle_k)).alias("_sh"),
    )
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), on="_sh")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    out = (
        pairs.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("_sz", "_sz_a"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("_sz", "_sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("_inter").cast("double")
                / (F.col("_sz_a") + F.col("_sz_b") - F.col("_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# SimHash (X2 variant)
# ---------------------------------------------------------------------------

def simhash_expr(tokens_col: str = "_tokens", bits: int = 63) -> Column:
    """SimHash signature as a bigint: per-token 64-bit hashes vote per bit;
    bit j of the signature is 1 iff tokens with bit j set are the majority.
    Uses the low 63 bits to stay inside a signed long under ANSI mode.
    Pure SQL higher-order functions — runs fully inside codegen."""
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, j) -> acc + "
        f"CASE WHEN aggregate({tokens_col}, 0L, (a, t) -> a + getbit(xxhash64(t), j)) * 2 "
        f">= size({tokens_col}) THEN shiftleft(1L, j) ELSE 0L END)"
    )


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= ``max_hamming``.

    Pigeonhole banding: signatures within distance d must agree exactly on at
    least one of ``bands`` 16-bit bands when ``d < bands`` — candidates come
    from a groupBy on (band, band_value), then exact popcount verification.
    """
    sig = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(F.split(normalized_text(F.col(text_col)), " ")).alias("_tokens"),
    ).select("_id", simhash_expr("_tokens").alias("_sig"))
    band_width = 64 // bands
    mask = (1 << band_width) - 1
    banded = sig.select(
        "_id",
        "_sig",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> shiftrightunsigned(_sig, b * {band_width}) & {mask}L)"
            )
        ).alias("_band", "_bucket"),
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), on=["_band", "_bucket"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sig").alias("_sig_a"),
            F.col("b._sig").alias("_sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    xor = F.col("_sig_a").bitwiseXOR(F.col("_sig_b"))
    hamming = F.bit_count(xor)
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
