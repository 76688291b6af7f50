"""Lookup-style enrichment as first-class broadcast hash joins.

The reference enriches via in-process lookup tables (severity/facility name
maps in ``logshipper/syslog.py`` [approx]; SURVEY.md §2.3).  At cluster
scale a dimension lookup is a broadcast hash join: the dim ships once per
executor, the fact side never shuffles.  Miss policy matches the reference
(absent lookup ⇒ field absent): LEFT join, nulls preserved, with optional
defaults via ``coalesce``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    defaults: dict[str, object] | None = None,
    how: str = "left",
) -> DataFrame:
    """LEFT broadcast-join ``dim`` onto ``fact`` by column ``on``.

    ``defaults``: dim-column → value used when the key misses (reference
    leaves fields absent on miss ⇒ default is nulls; defaults are opt-in).
    """
    out = fact.join(F.broadcast(dim), on=on, how=how)
    for col, val in (defaults or {}).items():
        out = out.withColumn(col, F.coalesce(F.col(col), F.lit(val)))
    return out


def allowlist(fact: DataFrame, keys: DataFrame, on: str) -> DataFrame:
    """Keep rows whose key appears in ``keys`` — broadcast LEFT SEMI join."""
    return fact.join(F.broadcast(keys), on=on, how="left_semi")


def denylist(fact: DataFrame, keys: DataFrame, on: str) -> DataFrame:
    """Drop rows whose key appears in ``keys`` — broadcast LEFT ANTI join."""
    return fact.join(F.broadcast(keys), on=on, how="left_anti")
