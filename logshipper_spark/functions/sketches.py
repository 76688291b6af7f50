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
    """Per-partition Misra-Gries summaries: at most ``capacity`` rows per
    input partition, schema ``(item, cnt, part_id, deficit)``.

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
        if len(counters):
            yield pd.DataFrame(
                {
                    "item": counters.index,
                    "cnt": counters.values,
                    "part_id": uuid.uuid4().hex,
                    "deficit": deficit,
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
    # both consumers hang off ONE explicit exchange: without it the n_lo
    # branch and the deficit branch are two different shuffles over the
    # same mapInPandas subplan, and Spark re-executes the summary pass
    # (exchange reuse is per-identical-exchange, not per-subplan — the
    # CLAUDE/infra note about materializing via an exchange).  groupBy on
    # the already-item-partitioned frame adds no second shuffle.
    summ = mg_summarize(df, col, capacity=capacity).repartition("item")
    per_item = summ.groupBy("item").agg(F.sum("cnt").alias("n_lo"))
    # one row per partition survived in summ (same part_id ⇒ same deficit);
    # the distinct reshuffles only summary rows (≤ capacity × partitions)
    d_total = (
        summ.select("part_id", "deficit")
        .distinct()
        .agg(F.coalesce(F.sum("deficit"), F.lit(0)).alias("__d"))
    )
    return (
        per_item.crossJoin(F.broadcast(d_total))
        .select(
            "item",
            "n_lo",
            (F.col("n_lo") + F.col("__d")).alias("n_hi"),
        )
        .orderBy(F.desc("n_lo"), F.asc("item"))
        .limit(k)
    )
