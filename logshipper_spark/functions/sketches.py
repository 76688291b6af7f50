"""Mergeable frequency sketches — bounded-memory heavy hitters.

``approx_count_distinct`` (HLL) covers distinct counting; this module adds
the other classic streaming summary: FREQUENT ITEMS.  An exact global
``groupBy(col).count()`` shuffles one row per distinct key — fine until the
key space is the problem (URLs, user agents, raw messages: 10^9+ distinct
at 100 TB).  The Misra-Gries summary keeps a fixed ``capacity`` of counters
per partition and is MERGEABLE (Agarwal et al., "Mergeable Summaries",
PODS 2012): merging per-partition summaries and re-pruning preserves the
error bound, so the reduce side sees ``capacity`` rows per partition, never
the key space.

Guarantees (standard MG, surfaced as columns):

* ``n_lo`` (the summed counter) is a LOWER bound on the true count;
* ``true <= n_lo + deficit_total`` where ``deficit_total`` is the summed
  per-partition decrement mass (``n_hi`` column);
* every item with true count > ``deficit_total`` is PRESENT in the output
  (in particular any item with frequency > n/(capacity+1) survives).

With ``capacity`` >= the per-partition distinct count no decrement ever
fires, the deficit is 0, and the result is EXACT — which is what the
oracle entry pins (the approximation regime is pytest-verified against
planted skew instead: a hash gate can't check a bound).

The per-partition pass is an Arrow ``mapInPandas`` with vectorized
batch-merge (value_counts + nlargest prune), never per-row Python.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, functions as F


def mg_summarize(df: DataFrame, col: str, capacity: int = 1024) -> DataFrame:
    """Per-partition Misra-Gries summaries: at most ``capacity`` counter
    rows plus ONE deficit sentinel row (``item`` NULL, ``cnt`` = the
    partition's deficit) per input partition, schema
    ``(item, cnt, part_id, deficit)``.

    ``cnt`` underestimates the partition-local true count by at most
    ``deficit`` (the partition's accumulated decrement mass).  Batch
    merge: counters absorb each Arrow batch's exact ``value_counts``;
    when over capacity, the (capacity+1)-th largest counter value is
    subtracted from ALL counters and non-positives drop — the mergeable-
    summaries prune, vectorized.
    """
    cap = int(capacity)
    if cap < 1:
        raise ValueError("capacity must be >= 1")
    schema = "item string, cnt long, part_id string, deficit long"

    def part(batches):
        import pandas as pd

        counters = pd.Series(dtype="int64")
        deficit = 0
        for pdf in batches:
            vc = pdf[col].dropna().astype(str).value_counts()
            if vc.empty:
                continue
            counters = counters.add(vc, fill_value=0).astype("int64")
            if len(counters) > cap:
                # subtract the (cap+1)-th largest from everything; items
                # hitting <= 0 drop.  Exactly the MG merge-prune: error
                # grows by the subtracted value, bound stays additive.
                t = int(counters.nlargest(cap + 1).iloc[-1])
                counters = counters - t
                counters = counters[counters > 0]
                deficit += t
        if len(counters) or deficit:
            pid = uuid.uuid4().hex
            if len(counters):
                yield pd.DataFrame(
                    {
                        "item": counters.index,
                        "cnt": counters.values,
                        "part_id": pid,
                        "deficit": deficit,
                    }
                )
            # deficit SENTINEL row (item NULL): lets a consumer fold the
            # per-partition deficits through the SAME groupBy(item) that
            # sums the counters — one aggregation, one exchange, so the
            # summary pass runs once (real items are never NULL: the
            # value_counts input is dropna'd).  Emitted whenever
            # deficit > 0 even if the final prune emptied the counter set
            # (e.g. a uniform long tail where every survivor equals the
            # (cap+1)-th largest): dropping it would silently lose the
            # partition's deficit mass and break the n_hi upper bound
            # (r5 advice, pinned in tests).
            yield pd.DataFrame(
                {
                    "item": [None],
                    "cnt": [deficit],
                    "part_id": [pid],
                    "deficit": [deficit],
                }
            )

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        part, schema=schema
    )


def heavy_hitters(
    df: DataFrame, col: str, k: int = 10, capacity: int = 1024
) -> DataFrame:
    """Top-k frequent items with MG bounds: ``(item, n_lo, n_hi)``,
    ordered by ``n_lo`` desc with the item as a deterministic tiebreak.

    Plan shape: map-side summaries (``capacity`` rows/partition) → one
    shuffle on the ITEM (short key) → global counter sum + a broadcast
    1-row deficit total → TakeOrderedAndProject.  The raw key space
    never shuffles.
    """
    # ONE linear consumer tree, so the summary pass provably runs once:
    # counter rows and the NULL-item deficit sentinels flow through the
    # same groupBy(item); the deficit total is then folded in by an
    # unpartitioned window over the AGGREGATED frame (≤ capacity ×
    # partitions rows — the single-task window is over summaries, never
    # data).  Every two-branch formulation tried re-executed mapInPandas:
    # Catalyst specializes each branch's subtree (per-branch column
    # pruning, grouping-key filter pushdown), the exchanges stop being
    # identical, and exchange reuse never fires.  Plan-asserted (single
    # MapInPandas) in tools/explain_audit.py.
    from pyspark.sql.window import Window

    summ = mg_summarize(df, col, capacity=capacity).select("item", "cnt")
    agg = summ.groupBy("item").agg(F.sum("cnt").alias("n"))
    w = Window.partitionBy(F.lit(1))
    d = F.coalesce(
        F.sum(F.when(F.col("item").isNull(), F.col("n"))).over(w), F.lit(0)
    )
    return (
        agg.withColumn("__d", d)
        .where(F.col("item").isNotNull())
        .select(
            "item",
            F.col("n").alias("n_lo"),
            (F.col("n") + F.col("__d")).alias("n_hi"),
        )
        .orderBy(F.desc("n_lo"), F.asc("item"))
        .limit(k)
    )


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Shuffle-key skew diagnostics — the one-row report you read BEFORE
    picking a partition strategy: distinct-key count, total rows, the
    heaviest key and its share, and the Gini coefficient of the per-key
    count distribution (0 = uniform, →1 = one hub key owns everything).

    Plan: the corpus collapses to |keys| rows in ONE partial-friendly
    aggregate; every statistic after that (rank window for Gini, max_by,
    sums) runs over the bounded key table only.  The single-partition
    window is over |keys| rows by design — documented bound, same class as
    vocab_zipf's ranking window."""
    from pyspark.sql.window import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(F.count("*").alias("n"))
    w = Window.orderBy(F.col("n").asc(), F.col("key").asc())
    ranked = counts.select("key", "n", F.row_number().over(w).alias("i"))
    return ranked.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").alias("total"),
        F.max("n").alias("max_n"),
        F.max_by("key", F.struct(F.col("n"), F.col("key"))).alias("top_key"),
        F.round(F.max("n") / F.sum("n"), 6).alias("max_share"),
        F.round(
            (F.lit(2.0) * F.sum(F.col("i") * F.col("n")))
            / (F.count("*") * F.sum("n"))
            - (F.count("*") + F.lit(1.0)) / F.count("*"),
            6,
        ).alias("gini"),
    )
