"""Structured Streaming variant of the pipeline.

The reference tails files with green threads — best-effort, in-order per
file, at-most-once, no watermarks (SURVEY.md §2.9).  The streaming engine
strengthens that: ``readStream`` over the same transcripts table,
watermarked event-time windows for late data, ``foreachBatch`` fan-out for
exactly-once sink writes, and stateful edge detection.

Batch and streaming share the SAME transformation code: a compiled
``Pipeline`` is a DataFrame→DataFrame function, and Spark applies it to a
streaming frame unchanged — the one thing this module adds is source/sink/
state wiring.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState

from logshipper_spark.sources.transcripts import TRANSCRIPT_SCHEMA


def read_transcript_stream(spark: SparkSession, path: str,
                           max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream over a transcripts directory — the batch table and
    the stream are the same rows (Iceberg streaming reads in production)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def events_per_minute_stream(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window counter — late rows beyond the watermark
    are dropped (and surface in StreamingQueryProgress metrics)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 minute").alias("w"), F.col("role"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("minute"), "role", "n_events")
    )


def session_windows_stream(stream: DataFrame, gap: str = "30 minutes",
                           watermark: str = "10 minutes") -> DataFrame:
    """Gap-based session windows per conversation (built-in session_window)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("conv_id"))
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "conv_id",
            "n_turns",
        )
    )


def edge_stream(stream: DataFrame, trigger_col: str = "role",
                key_col: str = "conv_id", idle_timeout_ms: int | None = None):
    """Stateful change-detection across micro-batches — the streaming twin
    of the batch ``edge`` window (logshipper/filters.py::prepare_edge
    [approx]).  State = last seen trigger value per key, kept in
    ``applyInPandasWithState`` (Arrow-batched, not per-row).

    ``idle_timeout_ms``: state TTL.  At 10^12 turns the state store grows
    with DISTINCT conversations ever seen unless idle keys are evicted;
    with a TTL, a conversation idle longer than the timeout drops its
    state (its next turn is treated as a fresh edge — the correct
    behavior for change-detection after a long gap).
    """
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("value", T.StringType()),
        ]
    )
    state_schema = T.StructType([T.StructField("last", T.StringType())])
    timeout_conf = "ProcessingTimeTimeout" if idle_timeout_ms else "NoTimeout"

    def fn(key, pdf_iter, state: GroupState):
        if idle_timeout_ms and state.hasTimedOut:
            state.remove()  # evict idle conversation state; nothing to emit
            return
        last = state.get[0] if state.exists else None
        # a group can span several Arrow chunks in arbitrary order —
        # concatenate BEFORE sorting or the change-detection order is wrong
        pdf = pd.concat(list(pdf_iter), ignore_index=True).sort_values("turn_idx")
        keep = []
        for v, idx in zip(pdf[trigger_col], pdf["turn_idx"]):
            if last is None or v != last:
                keep.append((key[0], int(idx), v))
            last = v
        state.update((last,))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(keep, columns=[key_col, "turn_idx", "value"])

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(fn, out_schema, state_schema, "append", timeout_conf)
    )


def edge_stream_tws(stream: DataFrame, trigger_col: str = "role",
                    key_col: str = "conv_id", ttl_ms: int | None = None):
    """Spark-4-native stateful change-detection via
    ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState`` (typed per-key value state, built-in state
    TTL instead of hand-rolled timeout timers, RocksDB-backed).

    EXPERIMENTAL / UNVERIFIED — ENVIRONMENT-BLOCKED in this sandbox: the
    transformWithState Python state client speaks protobuf to the JVM
    state server, and ``google.protobuf`` is not installed here
    (re-checked round 4; no pip allowed).  The import gate below raises a
    clear error; ``edge_stream`` (applyInPandasWithState) remains the
    tested default.  Because this path has never executed against a live
    transformWithStateInPandas runtime, its API details (getValueState
    schema string, timeMode casing, handleInputRows contract) are written
    from the public Spark 4 docs but UNVERIFIED — validate on a
    protobuf-equipped cluster before relying on it.  Once verified, it is
    the preferable path there: value-state TTL evicts idle conversations
    inside RocksDB without a timer firing per evicted key.
    """
    try:
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor, StatefulProcessorHandle,
        )
        import google.protobuf  # noqa: F401 — the runtime dep TWS needs
    except ImportError as e:  # pragma: no cover — absent in this container
        raise ImportError(
            "transformWithStateInPandas requires google.protobuf, which is "
            "not installed in this environment; use edge_stream() instead"
        ) from e

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("value", T.StringType()),
        ]
    )

    class EdgeProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # TTL is declarative: RocksDB drops idle keys; no timer path,
            # no per-eviction callback, no empty emission
            self.last = handle.getValueState("last", "last STRING", ttl_ms)

        def handleInputRows(self, key, rows, timer_values):
            got = self.last.get()
            last = got[0] if got is not None else None
            pdf = pd.concat(list(rows), ignore_index=True).sort_values("turn_idx")
            keep = []
            for v, idx in zip(pdf[trigger_col], pdf["turn_idx"]):
                if last is None or v != last:
                    keep.append((key[0], int(idx), v))
                last = v
            self.last.update((last,))
            yield pd.DataFrame(keep, columns=[key_col, "turn_idx", "value"])

        def close(self) -> None:
            pass

    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=EdgeProcessor(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="ProcessingTime" if ttl_ms else "None",
    )


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact-dedup: ``dropDuplicatesWithinWatermark`` keeps the
    FIRST arrival per key and drops re-deliveries arriving within the
    watermark — the streaming twin of ``dedup_exact``.  State is bounded:
    keys older than the watermark are evicted by the engine, so the state
    store scales with the key arrival rate × watermark horizon, never with
    total stream history (the property that makes at-least-once upstream
    delivery safe at 10^12 turns)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join with a time-range condition:
    a right-side row matches a left row of the same key when it occurred
    within ``tolerance`` BEFORE the left event — streaming enrichment
    against a second live stream (the reference only joins static lookups;
    SURVEY §2.6 [approx]).

    Both sides carry watermarks and the join predicate bounds right_ts to
    a window around left_ts, so the state store retains each side only for
    watermark + tolerance — bounded, like every stateful op here.  Column
    names are disambiguated with a ``r_`` prefix on the right."""
    r = right.select(
        F.col(key_col).alias("r_key"),
        F.col(right_ts).alias("r_ts"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (key_col, right_ts)
        ],
    ).withWatermark("r_ts", watermark)
    l = left.withWatermark(left_ts, watermark)
    cond = (
        (F.col(key_col) == F.col("r_key"))
        & (F.col("r_ts") >= F.col(left_ts) - F.expr(f"INTERVAL {tolerance}"))
        & (F.col("r_ts") <= F.col(left_ts))
    )
    return l.join(r, cond, "inner").drop("r_key")


def run_stream_to_memory(agg: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming aggregate synchronously to a memory sink (test/dev
    harness): processAllAvailable folds every pending file batch."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    return q


def foreach_batch_fanout(
    routed_fn: Callable[[DataFrame], DataFrame],
    out_dir: str,
    checkpoint_dir: str,
):
    """Exactly-once streaming fan-out: foreachBatch writes each micro-batch
    to epoch-scoped directories; the checkpoint makes batch ids stable
    across restarts, so a re-delivered epoch overwrites its own output."""

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        out = routed_fn(df)
        (
            out.write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"epoch={epoch_id}"))
        )

    def start(stream: DataFrame):
        return (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(processingTime="0 seconds")
            .start()
        )

    return start


def enrich_stream(stream: DataFrame, dim: DataFrame, key_col: str,
                  how: str = "left") -> DataFrame:
    """Stream-static enrichment: join each micro-batch against a static
    dimension with an explicit broadcast hint — the streaming twin of the
    batch enrichment join (operators/enrich.py).  The dimension is re-read
    per micro-batch by Structured Streaming's stream-static join rules, so
    a slowly-refreshed lookup (reference data re-written by another job)
    is picked up without restarting the query; state-free, unlike the
    stream-stream join."""
    return stream.join(F.broadcast(dim), key_col, how)
