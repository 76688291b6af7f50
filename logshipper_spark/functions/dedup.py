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
    """K minhash values in ONE pass over the shingle set — the composable
    Column form.

    NOTE: higher-order-function lambdas are interpreted (not codegen'd), so
    this costs ~ms per row.  The scale path is ``minhash_signatures`` below
    (explode + codegen hash-aggregate, ~20x faster, measured); this form is
    kept for inline/streaming use where a groupBy is awkward.
    """
    sh = ngram_set(text_col, k)
    init = F.array_repeat(F.lit(2**63 - 1).cast("long"), num_hashes)
    idx = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    return F.aggregate(
        sh,
        init,
        lambda acc, s: F.zip_with(acc, idx, lambda a, i: F.least(a, F.xxhash64(s, i + seed))),
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    k: int = 3,
    seed: int = 7,
) -> DataFrame:
    """(id, sig: array<bigint>) via explode + hash aggregate.

    Shingling runs ONCE per doc in the Generate; the K ``min(xxhash64)``
    aggregates are whole-stage-codegen'd with map-side partial aggregation,
    so the shuffle carries one (id, K longs) row per doc.
    """
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(ngram_set(F.col(text_col), k)).alias("s")
    )
    aggs = [
        F.min(F.xxhash64(F.col("s"), F.lit(i + seed))).alias(f"h{i}") for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs).select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_signatures_pandas(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    k: int = 3,
    seed: int = 7,
) -> DataFrame:
    """(id, sig) via ONE Arrow-batched numpy pass — the fastest signature
    path (~20x over interpreted higher-order functions, measured).

    Per batch: regex-tokenize, k-gram shingle, crc32 base hash, then the
    whole K-signature as one universal-hash broadcast
    ``min((A·h + B) mod p)`` in numpy.  crc32 + seeded RandomState keep it
    deterministic across workers and runs (no reliance on PYTHONHASHSEED).
    """
    import numpy as np
    import pandas as pd
    import re as _re
    import zlib

    out_schema = f"id long, sig array<long>"
    MASK = np.int64((1 << 61) - 1)

    def run(batches):
        rx = _re.compile(r"[^a-z0-9\s]+")
        rng = np.random.RandomState(seed)
        A = rng.randint(1, 1 << 61, size=num_hashes).astype(np.int64)
        B = rng.randint(0, 1 << 61, size=num_hashes).astype(np.int64)
        for pdf in batches:
            ids, sigs = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                toks = rx.sub(" ", (t or "").lower()).split()
                if len(toks) >= k:
                    grams = {" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)}
                else:
                    grams = {" ".join(toks)}
                h = np.fromiter(
                    (zlib.crc32(g.encode()) for g in grams), dtype=np.int64, count=len(grams)
                )
                sig = ((A[:, None] * h[None, :] + B[:, None]) & MASK).min(axis=1)
                ids.append(i)
                sigs.append(sig.tolist())
            yield pd.DataFrame({"id": ids, "sig": sigs})

    return df.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(run, out_schema)


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    strategy: str = "pandas",
    bucket_cap: int = 1000,
    seed: int = 7,
) -> DataFrame:
    """LSH banding: docs sharing any (band_id, band_hash) bucket become
    candidate pairs.  Plan shape: narrow signature compute → explode to
    B rows/doc → ONE shuffle on the band hash → per-bucket self-join.

    ``strategy``: 'pandas' (numpy batch, fastest) or 'jvm' (explode +
    codegen aggregate, zero Python).  Returns (id_a, id_b), id_a < id_b,
    distinct.

    ``bucket_cap`` — the degenerate-bucket guard: a bucket holding n docs
    produces n(n-1)/2 pairs inside ONE task, so a boilerplate/empty-doc
    bucket with 10^5 members is a 5·10^9-pair task at corpus scale.
    Buckets with more than ``bucket_cap`` members are NOT silently dropped:
    they emit STAR pairs (min-id hub × every member, O(n) pairs) instead of
    all-pairs — downstream exact-Jaccard verification still sees every
    member of the bucket, and identical-doc floods resolve through the hub
    (connected components / keep-min-id semantics are unaffected).  Genuine
    near-dup pairs between two non-hub members of an oversize bucket may be
    missed — the standard LSH recall/cost trade, bounded and explicit.
    Set ``bucket_cap=0`` to disable.
    """
    rows_per_band = num_hashes // bands
    sig_fn = minhash_signatures_pandas if strategy == "pandas" else minhash_signatures
    sig = sig_fn(df, text_col, id_col, num_hashes, k, seed)
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
    # Materialize the banded signatures ONCE (r6 optimization, guide §2.4/
    # §3.3): downstream this frame is consumed by the bucket stats
    # aggregate, the stats join, BOTH sides of the candidate self-join and
    # the hub-star branch — and because the small stats side broadcasts,
    # no exchange-reuse ever fires, so Catalyst re-executed the WHOLE
    # signature pipeline (the corpus-wide Arrow pass) once per consumer:
    # SIX MapInPandas nodes in the r6-before plan, measured 5.3 s vs
    # 0.86 s for one signature pass at sf0.1.  localCheckpoint pins
    # (id, band_id, band_hash) — 8 short rows per doc, never the text —
    # and cuts the plan to ONE signature pass.  Recomputed from parquet
    # on every invocation (no cross-run state).
    banded = banded.localCheckpoint()
    if not bucket_cap:
        a, b = banded.alias("a"), banded.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
    # per-bucket size + hub in one aggregate; the groupBy exchange on the
    # band key is reused by the subsequent joins (same partitioning)
    stats = banded.groupBy("band_id", "band_hash").agg(
        F.count("*").alias("bn"), F.min("id").alias("hub")
    )
    tagged = banded.join(stats, ["band_id", "band_hash"])
    small = tagged.where(F.col("bn") <= bucket_cap)
    a, b = small.alias("a"), small.alias("b")
    pairs_small = a.join(
        b,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    pairs_star = tagged.where((F.col("bn") > bucket_cap) & (F.col("id") != F.col("hub"))).select(
        F.col("hub").alias("id_a"), F.col("id").alias("id_b")
    )
    return pairs_small.unionByName(pairs_star).distinct()


def jaccard(df_pairs: DataFrame, docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", k: int = 3,
            broadcast_pairs: bool = True) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (the verify stage).

    Semi-joins the pair ids into docs first and shingles each candidate
    doc ONCE (never the full corpus — measured ~18s vs ~1s at sf0.1 —
    and never per pair-side: a doc in d pairs pays one shingle pass, not
    d).  With ``broadcast_pairs=True`` (default) the pair-list side is
    EXPLICITLY broadcast in both joins (not left to the 64 MB
    auto-threshold): a candidate list near the threshold silently
    degrading to a sort-merge join would shuffle the gram arrays.
    Plan-asserted in tools/explain_audit.py.

    On dup-heavy corpora the candidate set × document text can exceed
    broadcast limits — an unconditional hint then turns a slow-but-working
    shuffle plan into a hard job failure.  Pass ``broadcast_pairs=False``
    to fall back to Spark's size-based decision (auto-broadcast when the
    side is genuinely small, sort-merge otherwise).
    """
    # r6 verify-stage rework (guide §4.1/§2.3), two changes vs the
    # join-text-then-shingle-per-pair form, output-identical:
    #
    # 1. Grams come from the Arrow kernel, not the interpreted-HOF
    #    ngram_set: the transform lambda re-evaluates the tokenize
    #    subexpression PER ELEMENT (tokens × grams evals per text;
    #    measured 1.6 s of a 1.85 s verify for 256 pairs at sf0.1).
    #    Identical output (textstats.ngram_array_pandas: differentially
    #    tested, ASCII-pinned regex mirrors Java semantics), and jaccard
    #    only consumes set sizes, so gram order can't matter either.
    # 2. Grams are computed ONCE PER UNIQUE CANDIDATE DOC (semi-join the
    #    pair ids into docs first, shingle, pin), then the pair joins
    #    attach the precomputed arrays.  The old shape shingled per
    #    pair-SIDE, so a doc in d pairs paid d shingle passes — on a
    #    dup-heavy corpus (the exact case LSH surfaces) that is the
    #    whole wall: measured 12 s → ~1 s verify for 225k pairs over
    #    50k docs (10× stress table).
    from logshipper_spark.functions.textstats import ngram_array_pandas

    # the pair list is consumed three times below (two id projections +
    # the pair join); pin it so an expensive upstream candidate plan
    # (LSH banding + bucket-cap joins) is not re-executed per consumer
    df_pairs = df_pairs.localCheckpoint()
    ids = (
        df_pairs.select(F.col("id_a").alias("id"))
        .unionByName(df_pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    if broadcast_pairs:
        ids = F.broadcast(ids)
    g = (
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
        .join(ids, "id", "left_semi")
        .select("id", ngram_array_pandas(k)(F.col("t")).alias("g"))
        .localCheckpoint()  # candidate-bounded; reused by BOTH pair joins
    )
    pairs = F.broadcast(df_pairs) if broadcast_pairs else df_pairs
    joined_a = pairs.join(g.withColumnsRenamed({"id": "id_a", "g": "ga"}), "id_a")
    if broadcast_pairs:
        # first join's output is pairs + candidate-A grams: still candidate-
        # bounded (≪ corpus), so broadcast it into the second join too
        joined_a = joined_a.hint("broadcast")
    out = (
        joined_a
        .join(g.withColumnsRenamed({"id": "id_b", "g": "gb"}), "id_b")
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
    broadcast_pairs = kw.pop("broadcast_pairs", True)
    cands = minhash_candidates(df, **kw)
    return jaccard(cands, df, text_col=kw.get("text_col", "text"),
                   id_col=kw.get("id_col", "doc_id"), k=kw.get("k", 3),
                   broadcast_pairs=broadcast_pairs).where(
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


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", hash_fn: str = "xxhash64") -> DataFrame:
    """(id, simhash hex) via explode + 64 codegen'd vote aggregates — the
    scale path (the Column form above pays interpreted-lambda cost per
    token × bit).

    Per token row: one hash; the 64 ``sum(±1)`` aggregates test a
    LITERAL bit each (shiftright with a constant is codegen'd).  Shuffle
    carries (id, 64 ints) partial vote rows.

    ``hash_fn``: ``"xxhash64"`` (default — one 64-bit non-crypto hash per
    token, the cheapest scale path) or ``"md5"`` (token hash = first 16
    hex chars of md5 as two 32-bit halves — md5 exists in DuckDB too, so
    this variant is ORACLE-CHECKABLE cross-engine; same plan shape, only
    the leaf hash differs).
    """
    toks = F.filter(
        F.split(F.lower(F.regexp_replace(F.col(text_col), r"[^A-Za-z0-9\s]+", " ")), r"\s+"),
        lambda t: t != "",
    )
    t = df.select(F.col(id_col).alias("id"), F.explode(toks).alias("tok"))
    if hash_fn == "xxhash64":
        h = F.xxhash64("tok")

        def bit(b: int):
            return F.shiftright(h, b).bitwiseAND(F.lit(1))
    elif hash_fn == "md5":
        # two 32-bit halves: conv() on 16 hex chars would overflow the
        # signed long under ANSI; subexpression elimination computes the
        # md5 once per row
        hi = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(F.md5(F.col("tok")), 9, 8), 16, 10).cast("long")

        def bit(b: int):
            return F.shiftright(lo if b < 32 else hi, b % 32).bitwiseAND(F.lit(1))
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    aggs = [
        F.sum(F.when(bit(b) == 1, 1).otherwise(-1)).alias(f"v{b}")
        for b in range(64)
    ]
    votes = t.groupBy("id").agg(*aggs)
    # MSB-first bit string → two 32-bit hex halves (full 64-bit conv would
    # overflow the signed long under ANSI)
    bits = F.concat(*[F.when(F.col(f"v{b}") > 0, "1").otherwise("0") for b in range(63, -1, -1)])
    sim = F.concat(
        F.lpad(F.conv(F.substring(bits, 1, 32), 2, 16), 8, "0"),
        F.lpad(F.conv(F.substring(bits, 33, 32), 2, 16), 8, "0"),
    )
    return votes.select("id", sim.alias("simhash"))


def simhash_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       hash_fn: str = "xxhash64") -> DataFrame:
    """Docs sharing an identical 64-bit simhash — one shuffle on a 16-char
    key.  (For Hamming-distance≤k near-dups see ``simhash_near_duplicates``.)"""
    sh = simhash_signatures(df, text_col, id_col, hash_fn=hash_fn)
    return (
        sh.groupBy("simhash")
        .agg(F.min("id").alias("keep_id"), F.count("*").alias("n_dups"))
        .where(F.col("n_dups") > 1)
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Duplicate-cluster assignment: connected components of the near-dup
    pair graph, so dedup can keep ONE representative per cluster (min id).

    Iterative min-label propagation WITH pointer jumping (label-of-label),
    the distributed-CC shape of large-star/small-star: plain propagation
    needs O(diameter) rounds — a 500-doc chain is 500 shuffles — pointer
    jumping halves the remaining distance every round, so convergence is
    O(log diameter).  Each round is two equi-joins + a hash aggregate; the
    frame is localCheckpoint()ed per round to cut the iterative lineage
    (Catalyst plans grow exponentially otherwise).  Convergence is detected
    by counting changed labels (one small action per round).

    Returns (id, component) where component = min id reachable.
    """
    # materialize the (possibly expensive) edge plan ONCE — the propagation
    # loop joins against sym every round and would otherwise re-run the
    # whole candidate-generation plan per iteration
    sym = edges.select(F.col(id_a).alias("a"), F.col(id_b).alias("b")).unionByName(
        edges.select(F.col(id_b).alias("a"), F.col(id_a).alias("b"))
    ).distinct().localCheckpoint()
    if nodes is None:
        nodes = sym.select(F.col("a").alias("id")).distinct()
    else:
        cols = nodes.columns
        nodes = nodes.select(F.col(cols[0]).alias("id")).distinct()
    labels = nodes.select("id", F.col("id").alias("lbl")).localCheckpoint()
    for _ in range(max_iter):
        neigh = (
            sym.join(labels.withColumnsRenamed({"id": "nid", "lbl": "nlbl"}),
                     sym["b"] == F.col("nid"))
            .groupBy("a")
            .agg(F.min("nlbl").alias("nl"))
        )
        prop = labels.join(neigh, labels["id"] == neigh["a"], "left").select(
            "id", F.least(F.col("lbl"), F.coalesce("nl", F.col("lbl"))).alias("lbl")
        )
        # pointer jump: lbl := label(lbl)
        jump = prop.withColumnsRenamed({"id": "jid", "lbl": "jlbl"})
        jumped = prop.join(jump, prop["lbl"] == F.col("jid"), "left").select(
            "id", F.coalesce("jlbl", F.col("lbl")).alias("lbl")
        ).localCheckpoint()
        changed = (
            jumped.withColumnsRenamed({"lbl": "new_lbl"})
            .join(labels, "id")
            .where(F.col("new_lbl") != F.col("lbl"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels.select("id", F.col("lbl").alias("component"))


def hamming64_hex(a: Column, b: Column) -> Column:
    """Hamming distance between two 16-char hex simhash fingerprints —
    xor + bit_count on the two 32-bit halves (full 64-bit conv would
    overflow the signed long under ANSI mode)."""
    d = F.lit(0)
    for i in (1, 9):
        ai = F.conv(F.substring(a, i, 8), 16, 10).cast("long")
        bi = F.conv(F.substring(b, i, 8), 16, 10).cast("long")
        d = d + F.bit_count(ai.bitwiseXOR(bi))
    return d


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bucket_cap: int = 1000,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs within Hamming distance ``max_hamming`` of the 64-bit
    SimHash — the banded variant: split the fingerprint into
    ``max_hamming + 1`` chunks; by pigeonhole, two fingerprints differing in
    ≤ k bits agree EXACTLY on at least one chunk, so an equi-join on
    (chunk_id, chunk_value) finds every such pair with zero false negatives;
    exact Hamming verification prunes false positives.  Shuffle key is the
    (chunk_id, chunk hex substring) pair — the text never shuffles.

    Oversize chunk buckets (boilerplate floods) emit hub-star candidates
    instead of all-pairs, same trade as ``minhash_candidates``.
    Returns (id_a, id_b, hamming), id_a < id_b.
    """
    chunks = max_hamming + 1
    if not 1 <= chunks <= 16:
        raise ValueError("max_hamming must be in [0, 15] (16 hex chars)")
    sh = simhash_signatures(df, text_col, id_col, hash_fn=hash_fn)
    # one row per doc (id + 16-char hex); consumed by the chunk explode,
    # the bucket stats join, both self-join sides and the hub-star lookup
    # — same repeated-subtree recompute as minhash_candidates (the 64
    # vote aggregates re-ran per consumer).  Pin it once per invocation.
    sh = sh.localCheckpoint()
    width = 16 // chunks  # hex chars per chunk; remainder folds into the last
    bounds = [(c * width + 1, width if c < chunks - 1 else 16 - (chunks - 1) * width)
              for c in range(chunks)]
    chunk_arr = F.array(*[F.substring("simhash", s, w) for s, w in bounds])
    banded = sh.select("id", "simhash", F.posexplode(chunk_arr).alias("chunk_id", "chunk_val"))
    stats = banded.groupBy("chunk_id", "chunk_val").agg(
        F.count("*").alias("bn"), F.min("id").alias("hub")
    )
    tagged = banded.join(stats, ["chunk_id", "chunk_val"])
    small = tagged.where(F.col("bn") <= bucket_cap) if bucket_cap else tagged
    a, b = small.alias("a"), small.alias("b")
    cand_small = a.join(
        b,
        (F.col("a.chunk_id") == F.col("b.chunk_id"))
        & (F.col("a.chunk_val") == F.col("b.chunk_val"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.col("a.simhash").alias("sim_a"),
        F.col("b.simhash").alias("sim_b"),
    )
    cand = cand_small
    if bucket_cap:
        big = tagged.where((F.col("bn") > bucket_cap) & (F.col("id") != F.col("hub")))
        sh_short = sh.withColumnsRenamed({"id": "hub_join_id", "simhash": "hub_sim"})
        cand_star = (
            big.join(sh_short, big["hub"] == sh_short["hub_join_id"])
            .select(
                F.least("hub", "id").alias("id_a"),
                F.greatest("hub", "id").alias("id_b"),
                F.col("hub_sim").alias("sim_a"),
                F.col("simhash").alias("sim_b"),
            )
        )
        cand = cand_small.unionByName(cand_star)
    return (
        cand.withColumn("hamming", hamming64_hex(F.col("sim_a"), F.col("sim_b")))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def canonical_pick(
    components: DataFrame,
    docs: DataFrame,
    score_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Representative selection after clustering — the "keep the best copy"
    half of a dedup pipeline: for each connected component, pick the member
    with the highest ``score_col`` (ties → lowest id) and report the
    cluster size.  ``components`` is ``connected_components`` output
    (id, component).

    Plan: one join to attach scores, then ONE aggregate on the component id
    — ``max(struct(score, -id))`` does the argmax inside the partial
    aggregate (combiner-friendly), so no per-component window and no
    sort; output is one row per cluster."""
    scored = components.join(
        docs.select(F.col(id_col).alias("id"), F.col(score_col).alias("_score")), "id"
    )
    best = F.max(F.struct(F.col("_score"), (-F.col("id")).alias("_negid")))
    return (
        scored.groupBy("component")
        .agg(best.alias("_b"), F.count("*").alias("n_members"))
        .select(
            "component",
            (-F.col("_b._negid")).alias("canonical_id"),
            F.col("_b._score").alias("canonical_score"),
            "n_members",
        )
    )
