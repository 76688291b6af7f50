"""Range (interval-containment) join — points matched to the intervals
that contain them, without a cartesian or broadcast-nested-loop plan.

The reference's pipeline steps only ever match per-message predicates
([approx] public ondergetekende/logshipper: no range operator), but every
log-analytics deployment eventually joins events against time windows
(maintenance windows, incident spans, promo periods).  Spark lowers a raw
``ON p.ts BETWEEN i.start AND i.end`` join with no equality conjunct to
BroadcastNestedLoopJoin (small side) or CartesianProduct — both O(n·m)
and both fatal at 100 TB.

Strategy here is the standard bucketized overlap join:

1. pick a bucket width W (seconds);
2. each interval EXPLODES to the bucket ids it covers
   (``sequence(floor(start/W), floor(end/W))`` — one row per covered
   bucket, so the blow-up factor is ``len(interval)/W``, bounded and
   chosen by the caller);
3. each point computes its single bucket id ``floor(ts/W)``;
4. shuffle equi-join on the bucket id, then apply the exact
   ``BETWEEN`` predicate as a post-filter.

A point has exactly ONE bucket, and an interval containing the point
necessarily covers that bucket, so every true (point, interval) pair is
produced exactly once — no dedup pass needed.  The join is a plain
hash/sort-merge equi-join: partitioned, skew-manageable (AQE), and the
exact predicate prunes the same-bucket-but-outside pairs.

Choosing W: ~the median interval length.  Too small → interval explode
rows; too large → each bucket pairs points with intervals they miss
(post-filter discards).  Either way the plan stays an equi-join; W only
tunes constant factors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= ts <= end`` (closed on both ends, mirroring SQL BETWEEN).

    ``points`` / ``intervals`` must not share column names (pre-alias on
    the caller side — same contract as a raw join).  ``how`` is ``inner``
    or ``left`` (left: points with no containing interval survive with
    null interval columns).

    Timestamps are compared at full (sub-second) precision; only the
    bucket assignment truncates, and truncation is monotone, so no true
    match can land in a different bucket than its point.
    """
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"points/intervals share column names {sorted(overlap)}; "
            "alias one side before range_join"
        )
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    w = int(bucket_seconds)
    if w <= 0:
        raise ValueError("bucket_seconds must be positive")

    # unix_timestamp() truncates to whole seconds — fine for BUCKETS
    # (monotone); the exact predicate below compares the raw columns.
    # NTZ columns (parquet timestamp[us]) chain through cast("timestamp")
    # — unix_timestamp does not accept NTZ directly; session TZ is UTC.
    def _sec(c: str):
        return F.unix_timestamp(F.col(c).cast("timestamp"))

    p_bucket = F.floor(_sec(point_ts) / F.lit(w))
    i_first = F.floor(_sec(start_col) / F.lit(w))
    i_last = F.floor(_sec(end_col) / F.lit(w))

    pts = points.withColumn("__rj_bucket", p_bucket)
    ivs = intervals.withColumn(
        "__rj_bucket", F.explode(F.sequence(i_first, i_last))
    )
    exact = (F.col(point_ts) >= F.col(start_col)) & (
        F.col(point_ts) <= F.col(end_col)
    )
    if how == "inner":
        out = pts.join(ivs, on=["__rj_bucket"], how="inner").where(exact)
    else:
        # left: the equi-join alone would duplicate a point across the
        # interval rows sharing its bucket that DON'T contain it; fold
        # the exact predicate into the join condition instead, so
        # non-matches collapse to one null-extended row per point.
        cond = (pts["__rj_bucket"] == ivs["__rj_bucket"]) & exact
        out = pts.join(ivs, on=cond, how="left").drop(ivs["__rj_bucket"])
    return out.drop("__rj_bucket")
