"""`command` input: run a shell command, emit its output lines as messages.

The reference's Command input (logshipper/input.py::Command [approx,
SURVEY §2.1]) periodically runs a command on its single node and feeds each
stdout line into the pipeline.  The distributed translation keeps the same
contract but is deliberately DRIVER-side: the command runs once per batch
on the driver (commands are config/ops-scale inputs — `df -h`, a metrics
dump — never 100 TB data), and its lines become a small DataFrame that the
same compiled pipelines process.  Executors never fork processes.

For a periodic feed, call ``command_source`` inside a foreachBatch/cron
tick; each invocation stamps rows with the invocation time and index so
stable ordering and edge detection work unchanged.
"""

from __future__ import annotations

import subprocess
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession


def command_source(
    spark: SparkSession,
    cmd: list[str],
    conv_id: str = "command",
    timeout: float = 30.0,
    now: datetime | None = None,
) -> DataFrame:
    """Run ``cmd`` (argv list, no shell) once; return its stdout lines in
    the transcripts shape (conv_id, turn_idx, role, text, tool, ts) so every
    downstream operator applies unchanged."""
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout, check=False
    )
    ts = now or datetime.now(timezone.utc)
    rows = [
        (conv_id, i, "command", line, None, ts)
        for i, line in enumerate(proc.stdout.splitlines())
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
