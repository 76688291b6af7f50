"""Ranking utilities for retrieval / eval pipelines — rank fusion and
quantile bucketing.  Both are pure codegen window/agg plans whose windows
run over bounded or per-group inputs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rrf_fusion(
    rank_a: DataFrame,
    rank_b: DataFrame,
    id_col: str,
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of two rankings (the standard hybrid-search
    combiner: RRF(d) = Σ 1/(k + rank_i(d)) — robust to incomparable score
    scales, which is why retrieval stacks fuse BM25 and embedding lists
    this way).  Inputs are (id, rank) frames — top-k lists are fine: an id
    missing from one list simply contributes nothing from it (full-outer
    join, null rank → 0 contribution).

    The fused score is rounded to 9 places and ties break on the id so two
    engines cannot disagree on ordering; output carries both source ranks
    for debugging.  Plan: ONE join on the id, no window."""
    a = rank_a.select(F.col(id_col), F.col("rank").alias("rank_a"))
    b = rank_b.select(F.col(id_col), F.col("rank").alias("rank_b"))
    contrib_a = F.when(
        F.col("rank_a").isNotNull(), F.lit(1.0) / (F.lit(float(k)) + F.col("rank_a"))
    ).otherwise(F.lit(0.0))
    contrib_b = F.when(
        F.col("rank_b").isNotNull(), F.lit(1.0) / (F.lit(float(k)) + F.col("rank_b"))
    ).otherwise(F.lit(0.0))
    return a.join(b, id_col, "full_outer").select(
        id_col,
        "rank_a",
        "rank_b",
        F.round(contrib_a + contrib_b, 9).alias("rrf_score"),
    )


def ntile_buckets(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    group_col: str | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Quantile bucketing (deciles by default) with per-bucket stats — the
    quality-tier analysis a curation pipeline runs before choosing mix
    cutoffs: which decile holds how many rows and what the tier's mean is.

    ntile's fill rule (first n_buckets buckets get the remainder rows) is
    SQL-standard and identical across engines PROVIDED the ordering is
    total — so the window orders by (value, tiebreak) and the caller must
    pass a unique tiebreak.  The window partitions on the group (never
    global when a group is given); the output is n_buckets rows per group.
    """
    order = [F.col(value_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = (
        Window.partitionBy(group_col).orderBy(*order)
        if group_col is not None
        else Window.orderBy(*order)
    )
    bucketed = df.withColumn("bucket", F.ntile(n_buckets).over(w))
    keys = ([group_col] if group_col is not None else []) + ["bucket"]
    return bucketed.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.round(F.avg(value_col), 6).alias("avg_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )
