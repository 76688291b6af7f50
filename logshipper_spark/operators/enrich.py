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


def skew_salted_join(
    big: DataFrame,
    medium: DataFrame,
    key_col: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Hot-key join mitigation for the case AQE's skew splitting doesn't
    reach (or the medium side is too big to broadcast): the big side gets
    a DETERMINISTIC salt (xxhash64 of the whole row, pmod buckets — no
    rand(), so retries/resumes produce identical partitioning), the medium
    side replicates ×``salt_buckets`` via a sequence explode, and the join
    runs on (key, salt) — a hub key's rows now spread over ``salt_buckets``
    tasks instead of one straggler.

    Result rows are EXACTLY the plain join's (the salt only refines the
    partitioning; every big row still meets every matching medium row in
    exactly one bucket) — flag-equality is the correctness test, same
    contract as ``asof_join(ts_bucket=...)``.  Cost: medium side shuffles
    ×buckets; pick buckets ≈ (hot-key rows / healthy-partition rows).

    Only big-side-preserving join types are allowed: under right/full
    outer joins the replicated medium rows whose salt matched no big row
    would survive as spurious NULL-extended output (×buckets duplicates),
    breaking the plain-join contract — rejected loudly."""
    allowed = {"inner", "left", "leftouter", "left_outer",
               "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"skew_salted_join: how={how!r} would emit spurious rows for "
            f"unmatched medium-side salt replicas; allowed: {sorted(allowed)}"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    b = big.withColumn("_salt", salt)
    m = medium.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return b.join(m, [key_col, "_salt"], how).drop("_salt")
