"""Deduplication operators for training-data pipelines.

Four tiers, increasing fuzziness, each designed around its shuffle shape:

* **exact**            — hash-groupBy on a normalized fingerprint.  One
  shuffle on a short key; at 100 TB the md5 key (16B) shuffles, never the
  document text.
* **MinHash + LSH**    — shingle → K minhashes → B bands; duplicates are
  candidate pairs sharing a band bucket.  The band join is an equi-join on
  (band_id, band_hash) so Catalyst shuffles only (doc_id, band_hash) pairs;
  verification (exact Jaccard) runs only on candidates.
* **SimHash**          — 64-bit fingerprint from token-hash bit voting;
  near-dups share the fingerprint (or a rotated band of it).
* **n-gram Jaccard**   — exact verification metric over candidate pairs.

All hashing is xxhash64-based (JVM, codegen); shingling uses built-in
``F.transform``/``F.slice`` over a token array — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from logshipper_spark.functions.textstats import fingerprint


# ---------------------------------------------------------------- exact --
def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group by normalized fingerprint; keep the min-id canonical doc.
    Returns (fp, keep_id, n_dups) for groups with >1 member."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
        .where(F.col("n_dups") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Return the deduplicated set: one doc (min id) per fingerprint."""
    keep = (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
        .drop("fp")
    )
    return df.join(keep, on=id_col, how="left_semi")


# ------------------------------------------------------------- shingles --
def _shingles(text_col: Column, k: int = 3) -> Column:
    """k-token shingles as an array of strings (lowercased words)."""
    toks = F.split(F.lower(F.regexp_replace(text_col, r"[^A-Za-z0-9\s]+", " ")), r"\s+")
    toks = F.filter(toks, lambda t: t != "")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))


def ngram_set(text_col: Column, k: int = 3) -> Column:
    return F.array_distinct(_shingles(text_col, k))


# -------------------------------------------------------------- minhash --
def minhash_signature(text_col: Column, num_hashes: int = 32, k: int = 3,
                      seed: int = 7) -> Column:
    """K minhash values in ONE pass over the shingle set.

    ``aggregate(shingles, [MAX]*K, (acc, s) -> zip_with(acc, 0..K-1,
    min(acc_i, xxhash64(s, i))))`` — the shingling (regex split + distinct)
    is evaluated once per row; per shingle we only pay K hashes.  (A
    transform-per-hash-index formulation re-inlines the shingle expression
    K times — ~30x slower, measured.)  Returns array<bigint>.
    """
    sh = ngram_set(text_col, k)
    init = F.array_repeat(F.lit(2**63 - 1).cast("long"), num_hashes)
    idx = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    return F.aggregate(
        sh,
        init,
        lambda acc, s: F.zip_with(acc, idx, lambda a, i: F.least(a, F.xxhash64(s, i + seed))),
    )


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """LSH banding: docs sharing any (band_id, band_hash) bucket become
    candidate pairs.  Plan shape: narrow signature compute → explode to
    B rows/doc → ONE shuffle on the band hash → per-bucket self-join.

    Returns (id_a, id_b) with id_a < id_b, distinct.
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(F.col(text_col), num_hashes, k).alias("sig"),
    )
    banded = sig.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(",", F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)), b
                ),
            )
        ).alias("band_id", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return pairs


def jaccard(df_pairs: DataFrame, docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (the verify stage).
    Joins the (small) candidate set back to docs twice; at scale the
    candidate side is tiny relative to the corpus, so both joins broadcast
    the pair list or shuffle only candidates."""
    g = docs.select(F.col(id_col).alias("id"), ngram_set(F.col(text_col), k).alias("grams"))
    out = (
        df_pairs.join(g.withColumnsRenamed({"id": "id_a", "grams": "ga"}), "id_a")
        .join(g.withColumnsRenamed({"id": "id_b", "grams": "gb"}), "id_b")
        .withColumn("inter", F.size(F.array_intersect("ga", "gb")))
        .withColumn("uni", F.size(F.array_union("ga", "gb")))
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / F.greatest(F.col("uni"), F.lit(1)).cast("double"), 6),
        )
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_dedup_pairs(df: DataFrame, threshold: float = 0.8, **kw) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard ≥ threshold."""
    cands = minhash_candidates(df, **kw)
    return jaccard(cands, df, text_col=kw.get("text_col", "text"),
                   id_col=kw.get("id_col", "doc_id"), k=kw.get("k", 3)).where(
        F.col("jaccard") >= threshold
    )


# -------------------------------------------------------------- simhash --
def simhash64(text_col: Column) -> Column:
    """64-bit SimHash via per-bit voting over token hashes — ONE pass.

    Pure column expressions: tokens → xxhash64 → 64-char two's-complement
    bit string (``bin``) → zip_with accumulates ±1 votes per bit → sign
    bits re-packed as a 16-char hex fingerprint (string key; a production
    variant packs to long, but variable-distance shifts on signed longs
    aren't expressible as built-ins, and a 16-byte key shuffles just as
    well).  Narrow, no shuffle.
    """
    toks = F.filter(
        F.split(F.lower(F.regexp_replace(text_col, r"[^A-Za-z0-9\s]+", " ")), r"\s+"),
        lambda t: t != "",
    )
    votes = F.aggregate(
        toks,
        F.array_repeat(F.lit(0), 64),
        lambda acc, t: F.zip_with(
            acc,
            F.split(F.lpad(F.bin(F.xxhash64(t)), 64, "0"), "(?!^)"),
            lambda a, c: a + F.when(c == "1", 1).otherwise(-1),
        ),
    )
    bits = F.aggregate(
        votes, F.lit(""), lambda acc, v: F.concat(acc, F.when(v > 0, "1").otherwise("0"))
    )
    # hex-pack halves separately: conv() on the full 64 bits overflows the
    # signed long under ANSI mode
    return F.concat(
        F.lpad(F.conv(F.substring(bits, 1, 32), 2, 16), 8, "0"),
        F.lpad(F.conv(F.substring(bits, 33, 32), 2, 16), 8, "0"),
    )


def simhash_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Docs sharing an identical 64-bit simhash — one shuffle on an 8-byte
    key.  (Hamming-distance≤k variants band the 64 bits into k+1 chunks and
    reuse the LSH join above.)"""
    sh = df.select(F.col(id_col), simhash64(F.col(text_col)).alias("simhash"))
    return (
        sh.groupBy("simhash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
        .where(F.col("n_dups") > 1)
    )
