"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship parse → enrich → route → aggregate slice over
the sf0.001 testdata.  ``queries()``/``oracle_sql()`` — the full operator
registry (one entry per SURVEY.md §2 operator / training-data op), defined
in ``logshipper_spark/queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from logshipper_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference pipeline in
    miniature — regex parse of the json props payload, lookup enrichment,
    multi-sink routing, per-sink aggregate counts."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    parsed = ev.withColumn(
        "k_val", F.regexp_extract("props", '"k": ([0-9]+)', 1).try_cast("int")
    )
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"), ("purchase", "revenue"),
         ("signup", "growth"), ("error", "ops")],
        "event_type string, kind string",
    )
    enriched = parsed.join(F.broadcast(dim), "event_type", "left")
    sinks = F.concat(
        F.array(F.lit("archive")),
        F.when(F.col("event_type") == "error", F.array(F.lit("errors"))).otherwise(F.array()),
        F.when(F.col("kind") == "revenue", F.array(F.lit("billing"))).otherwise(F.array()),
    )
    routed = enriched.withColumn("sink", F.explode(sinks))
    return (
        routed.groupBy("sink", "kind")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.round(F.avg("k_val"), 6).alias("avg_k"),
        )
        .orderBy("sink", "kind")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ training-data
    ops).  Each callable takes (spark, sf_dir) and returns a DataFrame."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() entry; keys without SQL are
    non-SQL-expressible (LSH/minhash/simhash) → rows-only check."""
    return dict(ORACLES)
