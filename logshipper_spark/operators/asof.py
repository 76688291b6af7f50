"""As-of (nearest-event) join — an operator Spark lacks natively.

Implemented as a composition of built-ins (SURVEY task rule: prefer
DataFrame composition over pandas fallbacks): tag both sides, UNION, one
window per key ordered by (ts, side-tag), carry the right side's payload
forward with ``last(..., ignoreNulls)``, keep left rows.

Scale shape: ONE shuffle on the join key (the window partition), no
N×M join blowup, no per-group python.  This is the standard big-data
as-of pattern (vs ``pd.merge_asof`` per group, which ships whole groups
through Arrow).  Skewed keys behave like any window: the partition for a
hot key is one task — acceptable because the state per row is O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach ``payload_cols`` from the latest right row
    with ``right.ts <= left.ts`` (``<`` when ``strict``) and same ``key``.

    Left rows with no prior right row get nulls (left-join semantics).
    """
    lt = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    rt = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    # align schemas for the union
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))
    for c in rt.columns:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None).cast(rt.schema[c].dataType))
    u = lt.select(rt.columns).unionByName(rt.select(rt.columns))

    # right rows sort before left rows at equal ts unless strict: then the
    # window range excludes the current ts for left rows via ordering tag
    order = [F.col("__ts"), F.col("__side")] if not strict else [F.col("__ts"), -F.col("__side")]
    w = Window.partitionBy(key).orderBy(*order).rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    out = u
    for c in payload_cols:
        out = out.withColumn(f"__v_{c}", F.last(f"__p_{c}", ignorenulls=True).over(w))
    out = out.where(F.col("__side") == 1)
    keep = [c for c in left.columns]
    return out.select(
        *keep, *[F.col(f"__v_{c}").alias(f"asof_{c}") for c in payload_cols]
    )
