"""Multi-sink fan-out ("redistribute") writes.

In the reference every forward-phase output handler of a matching step fires
per message (``logshipper/pipeline.py::Step.process`` [approx]) — one
message can land in several sinks.  Columnar equivalents, both implemented
so they can be benchmarked against each other (SURVEY.md §4):

* **explode** (default): build ``sinks: array<string>`` per row, explode,
  write ONCE partitioned by ``(sink, bucket)``.  Single scan of the input,
  single shuffle; output bucketed by ``pmod(xxhash64(conv_id), B)`` so a
  downstream per-conversation consumer gets co-located files.
* **per-sink**: cache upstream once, then N filtered writes.  Wins only when
  sink predicates are highly selective and the cache fits memory.

Skew: mega-conversations are salted on the WRITE path only —
``salt = pmod(xxhash64(conv_id, turn_idx), S)`` spreads one hot conv over S
write tasks.  Ordering windows NEVER use the salt (correctness first,
SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def with_bucket(df: DataFrame, key: str = "conv_id", n_buckets: int = 64,
                salt_buckets: int = 0) -> DataFrame:
    """Routing bucket + optional skew salt (write-path only)."""
    out = df.withColumn("bucket", F.pmod(F.xxhash64(key), F.lit(n_buckets)).cast("int"))
    if salt_buckets > 1:
        out = out.withColumn(
            "salt", F.pmod(F.xxhash64(key, "turn_idx"), F.lit(salt_buckets)).cast("int")
        )
    return out


def write_fanout_explode(
    routed: DataFrame,
    out_dir: str,
    n_buckets: int = 64,
    key: str = "conv_id",
    order_cols: list[str] | None = None,
    mode: str = "overwrite",
    salt_buckets: int = 4,
) -> None:
    """Single-pass fan-out: expects ``routed`` to carry a ``sink`` column
    (from ``Pipeline.routed``).  One write, partitioned by (sink, bucket).

    ``salt_buckets``: the write-path skew guard.  The shuffle key is
    (sink, bucket, salt) so a mega-conversation spreads over up to S write
    tasks instead of landing in one; the salt column is dropped before the
    file layout, so output directories stay (sink, bucket) and ordering
    windows upstream never see it.  Each task writes sorted runs — a
    per-conversation consumer merges by (conv_id, turn_idx) across ≤S files.
    Set to 0/1 to disable (single sorted file per (sink, bucket))."""
    order_cols = order_cols or ["conv_id", "turn_idx"]
    out = with_bucket(routed, key=key, n_buckets=n_buckets, salt_buckets=salt_buckets)
    shuffle_cols = ["sink", "bucket"] + (["salt"] if salt_buckets > 1 else [])
    # the sort LEADS with the write-partition columns: otherwise
    # FileFormatWriter inserts its own sort on (sink, bucket), and that
    # sort is only tie-stable while in-memory — a spilling task's merge
    # interleaves same-partition rows and silently breaks the sorted-run
    # contract at exactly the scale it matters (r4 review finding).  With
    # the prefix satisfied, the writer adds NO extra sort.
    shaped = out.repartition(*shuffle_cols).sortWithinPartitions(
        "sink", "bucket", *order_cols
    )
    if salt_buckets > 1:
        shaped = shaped.drop("salt")
    (
        shaped.write.mode(mode)
        .partitionBy("sink", "bucket")
        .parquet(out_dir)
    )


def write_fanout_per_sink(
    df_with_sinks: DataFrame,
    sink_names: list[str],
    out_dir: str,
    n_buckets: int = 64,
    key: str = "conv_id",
    mode: str = "overwrite",
) -> None:
    """Alternative strategy: persist once, one filtered write per sink.

    Filters on sink membership ONLY — not ``__active``: a forward that fired
    before a later drop already delivered (same contract as
    ``Pipeline.routed`` and ``CheckpointedRunner.run``; drop only prevents
    FUTURE forwards, which step gating handles).

    Delivery MULTIPLICITY matches the explode strategy: two steps both
    forwarding to the same sink deliver the row twice (the reference fires
    each output handler per message) — hence the size(filter(...)) +
    explode(sequence) copy expansion rather than a plain array_contains,
    which would dedupe (r4 review finding)."""
    from concurrent.futures import ThreadPoolExecutor

    from logshipper_spark.plans.spec import ACTIVE, SINKS

    cached = df_with_sinks.persist()
    try:
        def _write(sink: str) -> None:
            n_onto = F.size(F.filter(F.col(SINKS), lambda s: s == F.lit(sink)))
            sel = (
                cached.withColumn("__n_onto", n_onto)
                .where(F.col("__n_onto") > 0)
                .withColumn("__copy", F.explode(F.sequence(F.lit(1), F.col("__n_onto"))))
                .drop("__n_onto", "__copy", ACTIVE, SINKS)
            )
            sel = with_bucket(sel, key=key, n_buckets=n_buckets)
            (
                sel.repartition("bucket")
                .sortWithinPartitions("bucket", "conv_id", "turn_idx")
                .write.mode(mode)
                .partitionBy("bucket")
                .parquet(os.path.join(out_dir, f"sink={sink}"))
            )

        # Per-sink writes are independent jobs over the shared cache —
        # submit them concurrently so later sinks' tasks back-fill the
        # scheduler while an earlier sink drains its write tail (guide
        # §2.6; a real multi-sink pipeline submits its sink actions
        # concurrently, exactly as the aggregate sinks already do).
        # FIFO scheduling keeps the earlier sink ahead; the block-manager
        # serializes first-computation of cached partitions.
        # cap at 8: this host (and most) degrades past ~8 saturated
        # concurrent jobs (CLAUDE.md steal hazard); the back-fill benefit
        # saturates well below that (review r6)
        with ThreadPoolExecutor(max_workers=max(1, min(8, len(sink_names)))) as ex:
            for f in [ex.submit(_write, s) for s in sink_names]:
                f.result()
    finally:
        cached.unpersist()


def read_sink(spark: SparkSession, out_dir: str, sink: str) -> DataFrame:
    return spark.read.parquet(out_dir).where(F.col("sink") == sink)
