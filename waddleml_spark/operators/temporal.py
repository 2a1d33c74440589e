"""Temporal operators Spark lacks natively: as-of join, range join,
time-bucket (hypertable-style) rollup.  (SURVEY.md §2.3 notes the reference
has none of these; they're required custom operators for the north star.)

Design notes (guide §Common OLAP patterns):
- as-of join = union-marker + last-non-null window: ONE shuffle on
  (keys, time) — no per-group Python, no merge_asof UDF needed.  Exactly
  DuckDB's ASOF JOIN semantics (right.ts <= left.ts, greatest wins).
- range join = bucketize the range key + equi-join on neighboring buckets +
  exact residual filter: turns an O(n·m) inequality join into a bounded
  hash join.  Bucket width trades join fan-out vs candidate count.
- time_bucket = date_trunc / arbitrary-width epoch bucketing; hierarchical
  rollups reaggregate coarse from fine (hypertable continuous-aggregate
  pattern) so each level is one cheap pass over the previous.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_values: Sequence[str],
    how: str = "inner",
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_time <= left_time within the `on` group.

    Implementation: union both sides with a side marker (right sorts before
    left at equal times, matching ASOF's <=), then
    last_value(..., ignorenulls) over (partition ON order time, marker).
    Output: all left columns + right_time+suffix + right_values+suffix.
    """
    lcols = left.columns
    marker = "__side"
    time_col = "__t"
    carried = [right_time] + list(right_values)

    l_tagged = left.select(
        *lcols,
        F.col(left_time).alias(time_col),
        F.lit(1).alias(marker),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in carried],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
        *[F.col(c) for c in on],
        F.col(right_time).alias(time_col),
        F.lit(0).alias(marker),
        *[F.col(c).alias(f"__r_{c}") for c in carried],
    ).select(*l_tagged.columns)  # align column order

    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(time_col), F.col(marker))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[c for c in unioned.columns if not c.startswith("__r_")],
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in carried
        ],
    )
    out = filled.filter(F.col(marker) == 1).drop(marker, time_col)
    if how == "inner":
        out = out.filter(F.col(f"{right_time}{suffix}").isNotNull())
    return out


def range_join_bucketized(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_val: str,
    right_val: str,
    max_distance: float,
    bucket_width: float | None = None,
) -> DataFrame:
    """Join rows with |left_val - right_val| <= max_distance (plus equi
    keys): bucket both sides at `bucket_width` (default = max_distance),
    explode the left side into its 3 neighboring buckets, hash-join on
    (keys..., bucket), then apply the exact residual predicate.
    """
    width = bucket_width or max_distance
    lb = left.withColumn(
        "__bk",
        F.explode(
            F.array(
                (F.floor(F.col(left_val) / width) - 1).cast("long"),
                F.floor(F.col(left_val) / width).cast("long"),
                (F.floor(F.col(left_val) / width) + 1).cast("long"),
            )
        ),
    )
    rb = right.withColumn("__bk", F.floor(F.col(right_val) / width).cast("long"))
    joined = lb.join(rb, on=[*on, "__bk"]).drop("__bk")
    return joined.filter(
        F.abs(F.col(left_val) - F.col(right_val)) <= max_distance
    )


def time_bucket(col: Column, width_seconds: int) -> Column:
    """Arbitrary-width epoch bucket start (timestamp), hypertable-style.
    For calendar units prefer date_trunc (DST-aware)."""
    epoch = col.cast("double")
    start = F.floor(epoch / width_seconds) * width_seconds
    return F.timestamp_seconds(start.cast("long"))


def rollup_hierarchy(
    df: DataFrame,
    time_col: str,
    levels: Sequence[str],
    group_cols: Sequence[str],
    value_col: str,
) -> dict[str, DataFrame]:
    """Hierarchical continuous-aggregate rollups: the finest level scans the
    data once; each coarser level reaggregates the previous (sum/count
    compose; avg derives from them) — the hypertable pattern that keeps
    100 TB rollups incremental."""
    out: dict[str, DataFrame] = {}
    finest = levels[0]
    cur = (
        df.groupBy(F.date_trunc(finest, F.col(time_col)).alias("bucket"), *group_cols)
        .agg(
            F.count("*").alias("n"),
            F.sum(value_col).alias("sum_v"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
    )
    out[finest] = cur
    for lvl in levels[1:]:
        cur = (
            cur.groupBy(F.date_trunc(lvl, F.col("bucket")).alias("bucket"), *group_cols)
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_v").alias("sum_v"),
                F.min("min_v").alias("min_v"),
                F.max("max_v").alias("max_v"),
            )
        )
        out[lvl] = cur
    return out
