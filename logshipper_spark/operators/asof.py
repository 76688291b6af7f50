"""As-of (nearest-event) join — an operator Spark lacks natively.

Implemented as a composition of built-ins (SURVEY task rule: prefer
DataFrame composition over pandas fallbacks): tag both sides, UNION, one
window per key ordered by (ts, side-tag), carry the right side's payload
forward with ``last(..., ignoreNulls)``, keep left rows.

Scale shape: ONE shuffle on the join key (the window partition), no
N×M join blowup, no per-group python.  This is the standard big-data
as-of pattern (vs ``pd.merge_asof`` per group, which ships whole groups
through Arrow).  Skewed keys behave like any window: the partition for a
hot key is one task — acceptable when keys are balanced because the state
per row is O(1).  For skewed keys pass ``ts_bucket`` (seconds): the window
partitions on (key, time-bucket) so a hot key splits across tasks, and a
per-(key, bucket) boundary aggregate carries the last payload forward
across buckets — same results, bounded task size.
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
    ts_bucket: int | None = None,
    tiebreakers: list[str] | None = None,
    tolerance: float | None = None,
) -> DataFrame:
    """For each left row, attach ``payload_cols`` from the latest right row
    with ``right.ts <= left.ts`` (``<`` when ``strict``) and same ``key``.

    Left rows with no prior right row get nulls (left-join semantics).

    ``tiebreakers`` (optional, names from ``payload_cols``): appended to
    the window ordering so two right rows with EQUAL (key, ts) resolve
    deterministically (highest tiebreaker wins) instead of arbitrarily per
    engine/run — required for oracle-exact parity when the right side can
    carry duplicate timestamps.

    ``ts_bucket`` (seconds, optional): skew mitigation.  Partition the
    window by (key, floor(unix_ts / ts_bucket)) so a hot key's rows spread
    over many tasks instead of one; the value crossing a bucket boundary
    is recovered by a per-(key, bucket) aggregate of each bucket's last
    right-row payload, cumulatively carried forward over the (tiny)
    bucket-level frame and joined back.  Bucket assignment truncates to
    whole seconds, which is monotone in ts, so an earlier bucket implies a
    strictly earlier timestamp — correct for both strict modes.  Ties on
    (key, ts) among RIGHT rows are resolved arbitrarily in both paths
    (same caveat as the plain window).

    ``tolerance`` (seconds, optional — pandas ``merge_asof(tolerance=...)``
    semantics): the matched right row must additionally satisfy
    ``left_ts - right_ts <= tolerance``; stale matches yield nulls, same
    as no match.  Implemented by carrying the matched right timestamp as
    an internal extra payload and nulling the outputs post-window, so it
    costs no extra shuffle in either the plain or the ts_bucket path.
    The comparison uses FRACTIONAL epoch seconds (double cast, not
    unix_timestamp truncation) on both sides.
    """
    payload_cols = list(payload_cols)
    carried = payload_cols
    order_only: list[str] = []
    if tolerance is not None:
        # ATOMIC row carry (r5 advice, pinned in tests): one struct of
        # (payloads + right ts) goes through last(ignorenulls), so the
        # matched row is all-or-nothing — per-column carries could pair a
        # STALE payload value (from an older right row, when the newest
        # in-tolerance row holds a NULL in that column) with the newest
        # row's freshness timestamp, emitting beyond-tolerance data as
        # fresh.  The struct is never NULL for right rows, so
        # last(ignorenulls) picks exactly the newest right row in frame —
        # pandas merge_asof(tolerance=...) semantics, as documented.
        right = right.withColumn(
            "__row",
            F.struct(
                *[F.col(c).alias(c) for c in payload_cols],
                F.col(right_ts).alias("__rts"),
            ),
        )
        carried = ["__row"]
        # tiebreaker columns still need to exist for the window ORDERING
        order_only = [c for c in (tiebreakers or []) if c not in carried]

    def _tol_filtered(out: DataFrame) -> DataFrame:
        if tolerance is None:
            return out.select(
                *keep, *[F.col(f"__v_{c}").alias(f"asof_{c}") for c in payload_cols]
            )
        gap = (
            F.col(left_ts).cast("timestamp").cast("double")
            - F.col("__v___row.__rts").cast("timestamp").cast("double")
        )
        ok = F.col("__v___row").isNotNull() & (gap <= float(tolerance))
        return out.select(
            *keep,
            *[
                F.when(ok, F.col(f"__v___row.{c}")).alias(f"asof_{c}")
                for c in payload_cols
            ],
        )

    lt = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    rt = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__p_{c}") for c in carried],
        *[F.col(c).alias(f"__p_{c}") for c in order_only],
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
    tiebreakers = tiebreakers or []
    order = order + [F.col(f"__p_{c}") for c in tiebreakers]
    frame_end = -1 if strict else 0
    keep = [c for c in left.columns]

    if ts_bucket is None:
        w = Window.partitionBy(key).orderBy(*order).rowsBetween(Window.unboundedPreceding, frame_end)
        out = u
        for c in carried:
            out = out.withColumn(f"__v_{c}", F.last(f"__p_{c}", ignorenulls=True).over(w))
        out = out.where(F.col("__side") == 1)
        return _tol_filtered(out)

    # skew path: (key, bucket) windows + boundary carry-forward
    u = u.withColumn("__bk", F.floor(F.unix_timestamp(F.col("__ts")) / F.lit(int(ts_bucket))))
    w_in = Window.partitionBy(key, "__bk").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, frame_end
    )
    for c in carried:
        u = u.withColumn(f"__pre_{c}", F.last(f"__p_{c}", ignorenulls=True).over(w_in))
    # each bucket's LAST NON-NULL right-row payload per column: the window
    # path uses last(ignorenulls), which skips null payloads — a plain
    # max_by(ts) would carry a trailing NULL payload across the boundary
    # and diverge.  max_by with a null-when-payload-null ordering key
    # ignores exactly those rows (verified: max_by skips null keys).
    tb_cols = [F.col(f"__p_{c}") for c in tiebreakers]
    bucket_last = (
        u.where(F.col("__side") == 0)
        .groupBy(key, "__bk")
        .agg(*[
            F.max_by(
                f"__p_{c}",
                F.when(
                    F.col(f"__p_{c}").isNotNull(),
                    # struct key: (ts, tiebreakers) — lexicographic max
                    # matches the window ordering's tie resolution
                    F.struct(F.col("__ts"), *tb_cols) if tb_cols else F.col("__ts"),
                ),
            ).alias(f"__bl_{c}")
            for c in carried
        ])
    )
    # ... on the FULL bucket set (buckets holding only left rows still need
    # a carry-in), cumulatively carried over strictly-earlier buckets.
    # This frame is one row per (key, bucket) — the hot key's window here
    # is #buckets rows, not #rows.
    all_buckets = u.select(key, "__bk").distinct().join(bucket_last, [key, "__bk"], "left")
    w_carry = Window.partitionBy(key).orderBy("__bk").rowsBetween(Window.unboundedPreceding, -1)
    for c in carried:
        all_buckets = all_buckets.withColumn(
            f"__ci_{c}", F.last(f"__bl_{c}", ignorenulls=True).over(w_carry)
        )
    carry = all_buckets.select(key, "__bk", *[f"__ci_{c}" for c in carried])
    out = u.join(carry, [key, "__bk"], "left")
    for c in carried:
        out = out.withColumn(f"__v_{c}", F.coalesce(F.col(f"__pre_{c}"), F.col(f"__ci_{c}")))
    out = out.where(F.col("__side") == 1)
    return _tol_filtered(out)
