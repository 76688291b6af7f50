"""Raw text log-file ingestion — the reference's PRIMARY input.

``logshipper/tail.py`` [approx] follows plain log files line by line
(logrotate-sized, per-file ordered) and feeds each line through the
pipeline.  The Spark-native batch form must preserve that per-file line
ORDER deterministically — which ``spark.read.text`` alone cannot: line
order inside a task is preserved, but file→partition assignment and
split points vary with parallelism, and ``monotonically_increasing_id``
values change across reruns.  Two deterministic strategies:

* ``read_log_lines(..., strategy="wholetext")`` — one row per FILE
  (``wholetext=True``), then ``posexplode(split(content, '\\n'))`` gives
  (file, line_no, line) with line numbers that are a pure function of the
  data.  A file is never split across partitions, matching the
  reference's per-file tail semantics.  Memory bound: one file must fit
  in one task (logrotate-sized files — MBs — are fine; do NOT point this
  at a single monolithic 100 GB file: rotate, or pre-convert to a table).
* ``read_log_lines(..., strategy="indexed")`` — ``spark.read.text`` with
  per-partition line numbering via ``mapInPandas`` over
  (file, partition-local order).  Scales to huge files (splits stay
  splittable) but line numbers are per SPLIT, not per file — stable for
  routing/dedup keys, NOT a global per-file order.  Use wholetext when
  order matters; indexed when files are huge and order is per-split.

The streaming form (``stream_log_lines``) is ``readStream.text`` over a
directory — new files picked up per micro-batch, the Structured-Streaming
equivalent of tail's inotify loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_log_lines(spark: SparkSession, path: str,
                   strategy: str = "wholetext",
                   drop_blank: bool = True) -> DataFrame:
    """(file, line_no, line) from a directory/glob of text log files.
    ``line_no`` is 0-based; see module docstring for strategy trade-offs."""
    if strategy == "wholetext":
        whole = spark.read.text(path, wholetext=True).select(
            F.input_file_name().alias("file"), F.col("value")
        )
        out = whole.select(
            "file",
            # \r?\n: CRLF log files must not leave a trailing \r on every
            # line (spark.read.text strips both, so the indexed strategy
            # already behaves this way)
            F.posexplode(F.split(F.col("value"), r"\r?\n")).alias("line_no", "line"),
        )
    elif strategy == "indexed":
        import pandas as pd

        def number(batches):
            # partition-local, per-file counter: deterministic given the
            # split layout (stable for keys, not a global file order)
            counts: dict[str, int] = {}
            for pdf in batches:
                nos = []
                for f in pdf["file"]:
                    nos.append(counts.get(f, 0))
                    counts[f] = counts.get(f, 0) + 1
                yield pd.DataFrame(
                    {"file": pdf["file"], "line_no": nos, "line": pdf["line"]}
                )

        raw = spark.read.text(path).select(
            F.input_file_name().alias("file"), F.col("value").alias("line")
        )
        out = raw.mapInPandas(number, "file string, line_no long, line string")
    else:
        raise ValueError(f"strategy must be 'wholetext' or 'indexed', got {strategy!r}")
    if drop_blank:
        out = out.where(F.col("line") != "")
    return out


def stream_log_lines(spark: SparkSession, path: str) -> DataFrame:
    """Streaming tail over a log directory: each new file becomes rows in
    the next micro-batch (file + line, no cross-batch line numbering —
    attach event-time from the parsed timestamp, not arrival order)."""
    return (
        spark.readStream.text(path)
        .select(F.input_file_name().alias("file"), F.col("value").alias("line"))
        .where(F.col("line") != "")
    )


def as_transcript_frame(lines: DataFrame) -> DataFrame:
    """Adapt (file, line_no, line) to the engine's transcript shape so the
    full pipeline-spec machinery (match/mangle/route) applies unchanged:
    conv_id = source file, turn_idx = line number, text = line."""
    return lines.select(
        F.col("file").alias("conv_id"),
        F.col("line_no").cast("int").alias("turn_idx"),
        F.lit("log").alias("role"),
        F.col("line").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
