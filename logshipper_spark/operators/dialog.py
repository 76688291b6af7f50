"""Dialog / event-sequence analytics over keyed, time-ordered streams —
the transcript-native operators: training-example context extraction,
state-transition statistics, and sequence schema linting.

Reference parity note: the public logshipper reference is a per-message
shipper with no sequence operators; these generalize its per-conversation
ordering invariant (SURVEY §2.5 [approx]) into the sequence analytics a
transcripts pipeline needs.  All three are pure codegen window/agg plans:
ONE shuffle on the sequence key, no Python, no state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def context_windows(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    label_col: str,
    k: int = 4,
    target: str | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Sliding-context training-example extraction: for every row (or only
    rows whose label == ``target``), emit the concatenation of the previous
    ``k`` labels in the key's time order as ``context`` plus the row's own
    label as ``target_label`` — the (context, completion) pair shape used
    to turn transcripts into next-turn training examples.

    Plan: ONE shuffle on the key; ``collect_list`` over a BOUNDED row frame
    (-k..-1) — state per row is at most k labels, so a million-turn
    conversation costs O(k) per row, never O(len).  The frame is ordered by
    (ts, tiebreaks), making the output deterministic and oracle-checkable
    (DuckDB: string_agg over the identical frame, coalesced to '' for the
    empty first-row frame to match array_join's '').

    Filtering to ``target`` happens AFTER the window (the context must see
    all rows) but Catalyst still prunes every non-window column upstream.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreak_cols or [])]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-k, -1)
    )
    out = df.withColumn(
        "context", F.array_join(F.collect_list(F.col(label_col)).over(w), " ")
    ).withColumn("target_label", F.col(label_col))
    if target is not None:
        out = out.where(F.col(label_col) == target)
    return out


def transition_matrix(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """First-order state-transition statistics: counts and conditional
    probabilities P(state | prev_state) over each key's time-ordered
    sequence (the Markov "session path" matrix of log analytics).

    Plan: ONE shuffle on the key computes lag(state); the aggregation key
    then shrinks to (prev_state, state) — partial-agg friendly, output is
    |states|² rows regardless of input size, and the normalizing window
    runs over that tiny aggregate only.  First rows (no predecessor) are
    excluded, matching the textbook definition.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = (
        df.select(
            F.lag(state_col).over(w).alias("prev_state"),
            F.col(state_col).alias("state"),
        )
        .where(F.col("prev_state").isNotNull())
        .groupBy("prev_state", "state")
        .agg(F.count("*").alias("n"))
    )
    norm = Window.partitionBy("prev_state")
    return pairs.withColumn(
        "p", F.round(F.col("n") / F.sum("n").over(norm), 6)
    )


def sequence_lint(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    expected_start: str | None = None,
    max_gap_s: float | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Sequence schema validation — the data-quality pass a chat-training
    pipeline runs before packing: per key, count (a) consecutive repeats of
    the same state (role alternation violations), (b) inter-row gaps larger
    than ``max_gap_s`` (stale/spliced conversations), and flag (c) a first
    state that isn't ``expected_start``.

    Plan: ONE shuffle on the key; lag comparisons are pure codegen; the
    per-key aggregate emits one short row per key.  Gaps use FRACTIONAL
    epoch seconds (ts cast timestamp→double — unix_timestamp truncates and
    would flip boundary gaps vs an oracle's epoch()).
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    frac = F.col(ts_col).cast("timestamp").cast("double")
    prev_state = F.lag(state_col).over(w)
    gap = frac - F.lag(frac).over(w)
    repeat = F.when(F.col(state_col).eqNullSafe(prev_state) & prev_state.isNotNull(), 1).otherwise(0)
    big_gap = (
        F.when(gap > F.lit(float(max_gap_s)), 1).otherwise(0)
        if max_gap_s is not None
        else F.lit(0)
    )
    first_state = F.when(F.lag(state_col).over(w).isNull(), F.col(state_col))
    agg = (
        df.select(
            F.col(key_col).alias("key"),
            repeat.alias("rep"),
            big_gap.alias("bg"),
            first_state.alias("fs"),
        )
        .groupBy("key")
        .agg(
            F.sum("rep").alias("n_repeats"),
            F.sum("bg").alias("n_large_gaps"),
            F.first("fs", ignorenulls=True).alias("_first"),
        )
    )
    bad_start = (
        (F.col("_first") != F.lit(expected_start)).cast("int")
        if expected_start is not None
        else F.lit(0)
    )
    return agg.select(
        F.col("key").alias(key_col),
        "n_repeats",
        "n_large_gaps",
        bad_start.alias("bad_start"),
    )


def budget_truncate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    cost_col: str,
    budget: float,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Context-budget prefix truncation: per key, keep the longest prefix of
    the time-ordered sequence whose cumulative cost stays within ``budget``
    — the max-context cut an SFT/packing pipeline applies before batching
    (a conversation longer than the model context is cut at a turn
    boundary, never mid-turn).  Costs are assumed non-negative (token
    counts are), which makes the running sum monotone and ``cum_cost <=
    budget`` exactly the prefix predicate.

    Plan: ONE shuffle on the key; the running sum is an ordered prefix
    window (unbounded preceding..current — both engines fold the same
    order left-to-right, so the double is reproducible); the filter is a
    scalar predicate on the materialized cumulative column.  Nothing here
    is per-sequence-length state: a million-turn key costs O(1) per row.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreak_cols or [])]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("cum_cost", F.round(F.sum(F.col(cost_col)).over(w), 6))
        .where(F.col("cum_cost") <= F.lit(float(budget)))
    )


def chat_export(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    role_col: str,
    content_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Chat-format training-example export: one JSON line per key holding
    the time-ordered ``[{"role": ..., "content": ...}, ...]`` message array
    — the JSONL shape an SFT fine-tune job ingests.  The struct leads with
    the sort keys so ``array_sort`` (which compares struct fields in order)
    reproduces the time order inside the aggregated array without a
    per-key window; the sort keys are then dropped by a second projection
    over the SORTED array.

    Plan: ONE aggregate on the key (collect_list is the unavoidable
    gather — the payload IS the conversation); per-key cost is the
    conversation length, the same bound the output line itself carries.
    ``to_json`` emits compact JSON with struct-field key order — byte-
    identical to DuckDB's ``to_json(list(struct_pack(...) ORDER BY ...))``
    (oracle-verified), so the export is engine-portable."""
    order_cols = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    gathered = (
        df.select(
            F.col(key_col),
            F.struct(
                *[c.alias(f"_s{i}") for i, c in enumerate(order_cols)],
                F.col(role_col).alias("role"),
                F.col(content_col).alias("content"),
            ).alias("_m"),
        )
        .groupBy(key_col)
        .agg(F.array_sort(F.collect_list("_m")).alias("_msgs"))
    )
    clean = F.transform(
        F.col("_msgs"),
        lambda m: F.struct(m["role"].alias("role"), m["content"].alias("content")),
    )
    return gathered.select(
        F.col(key_col),
        F.size("_msgs").cast("int").alias("n_turns"),
        # ignoreNullFields=false: a NULL content must serialize as
        # "content":null (DuckDB's to_json does), not vanish from the
        # message — downstream SFT loaders key on the field being present
        F.to_json(clean, {"ignoreNullFields": "false"}).alias("payload"),
    )
