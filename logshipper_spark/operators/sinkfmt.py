"""Sink wire-format renderers: statsd lines and Elasticsearch bulk bodies.

The reference's outputs emit WIRE formats — statsd UDP datagrams
(``name:value|type[|@rate]``, logshipper/outputs.py::prepare_statsd
[approx]) and Elasticsearch bulk HTTP bodies (action line + doc line,
``prepare_elasticsearch`` [approx]).  The columnar engine renders the same
bytes as string columns (pure format_string/to_json, codegen'd); the actual
network send is the sink adapter's job (foreachPartition / connector), so
the testable, oracle-checkable part — byte-exact payloads — lives here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def format_stat_value(value: Column) -> Column:
    """Plain-decimal rendering of a numeric stat value.

    ``CAST(double AS STRING)`` switches to scientific notation outside
    [1e-3, 1e7) (0.0001 -> '1.0E-4'), which real statsd servers reject and
    which diverges from printf-style oracles.  Render with fixed 6-decimal
    printf, then trim trailing zeros (and a bare trailing dot): 0.0001 ->
    '0.0001', 1 -> '1', 12.5 -> '12.5'.  Pure codegen string ops."""
    return F.regexp_replace(
        F.format_string("%.6f", value.cast("double")), r"\.?0+$", ""
    )


def statsd_counter_line(name: Column, value: Column, rate: float | None = None) -> Column:
    """``name:value|c`` (+``|@rate`` when sampled) — the statsd counter
    datagram."""
    base = F.format_string("%s:%s|c", name, format_stat_value(value))
    if rate is None or rate >= 1.0:
        return base
    return F.concat(base, F.lit(f"|@{rate:g}"))


def statsd_timer_line(name: Column, ms: Column) -> Column:
    """``name:ms|ms`` — the statsd timer datagram."""
    return F.format_string("%s:%s|ms", name, format_stat_value(ms))


def statsd_gauge_line(name: Column, value: Column) -> Column:
    """``name:value|g`` — the statsd gauge datagram."""
    return F.format_string("%s:%s|g", name, format_stat_value(value))


def statsd_set_line(name: Column, member: Column) -> Column:
    """``name:member|s`` — the statsd set datagram (server counts unique
    members per flush; the batch twin is ``countDistinct``).  Members are
    strings, so no numeric formatting."""
    return F.format_string("%s:%s|s", name, member.cast("string"))


def es_bulk_lines(df: DataFrame, index: str, id_col: str, doc_cols: list[str]) -> DataFrame:
    """Elasticsearch bulk-API body per row: the ``{"index": ...}`` action
    line and the JSON document, newline-joined — exactly what a bulk POST
    body carries (one string column ``bulk``, ready for a foreachPartition
    HTTP sink that concatenates a partition's rows)."""
    action = F.format_string(
        '{"index": {"_index": "%s", "_id": "%s"}}', F.lit(index), F.col(id_col).cast("string")
    )
    doc = F.to_json(F.struct(*[F.col(c) for c in doc_cols]))
    return df.withColumn("bulk", F.concat_ws("\n", action, doc))
