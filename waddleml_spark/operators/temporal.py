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


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
) -> DataFrame:
    """Resample each key's irregular series onto a regular time grid with
    linear interpolation — the hypertable `time_bucket_gapfill` +
    `interpolate` analog.

    Relational construction (no per-key Python, no UDFs):
      1. per-key grid = explode(sequence(ceil(min/step), floor(max/step)))
         — grid rows carry NULL values;
      2. union grid with the real points and window-fill BOTH directions:
         last(ignorenulls) over preceding rows → the previous real point,
         first(ignorenulls) over following rows → the next one (value AND
         timestamp each);
      3. y = py + (ny − py) · (t − pt)/(nt − pt), degenerating to the
         single neighbor at the series edges and to the exact value when
         a real point lands on the grid.
    One shuffle on the key (the fact's natural bucketing); the grid adds
    ≤ span/step rows per key.  Interpolated values are floor-rounded to
    6 digits by the caller when cross-engine hashing matters.
    """
    ep = F.col(ts_col).cast("double")
    pts = df.select(
        F.col(key_col).alias("k"), ep.alias("t"), F.col(value_col).alias("v")
    )
    ext = pts.groupBy("k").agg(F.min("t").alias("lo"), F.max("t").alias("hi"))
    grid = ext.select(
        "k",
        F.explode(
            F.sequence(
                F.ceil(F.col("lo") / step_seconds).cast("long"),
                F.floor(F.col("hi") / step_seconds).cast("long"),
            )
        ).alias("slot"),
    ).select("k", (F.col("slot") * float(step_seconds)).alias("t"))
    unioned = pts.select(
        "k", "t", "v", F.lit(0).alias("is_grid")
    ).unionByName(grid.select("k", "t", F.lit(None).cast("double").alias("v"), F.lit(1).alias("is_grid")))
    # real points sort BEFORE the grid row at the same instant, so an
    # exact-hit grid row sees that point as its "previous" neighbor and
    # interpolation degenerates to the exact value
    w_prev = (
        Window.partitionBy("k")
        .orderBy("t", "is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("k")
        .orderBy("t", "is_grid")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pv = F.when(F.col("is_grid") == 0, F.col("v"))
    pt = F.when(F.col("is_grid") == 0, F.col("t"))
    filled = (
        unioned.withColumn("py", F.last(pv, ignorenulls=True).over(w_prev))
        .withColumn("pt", F.last(pt, ignorenulls=True).over(w_prev))
        .withColumn("ny", F.first(pv, ignorenulls=True).over(w_next))
        .withColumn("nt", F.first(pt, ignorenulls=True).over(w_next))
        .filter(F.col("is_grid") == 1)
    )
    y = (
        F.when(F.col("py").isNull(), F.col("ny"))
        .when(F.col("ny").isNull(), F.col("py"))
        .when(F.col("nt") == F.col("pt"), F.col("py"))
        .otherwise(
            F.col("py")
            + (F.col("ny") - F.col("py"))
            * (F.col("t") - F.col("pt"))
            / (F.col("nt") - F.col("pt"))
        )
    )
    return filled.select(
        F.col("k").alias(key_col),
        F.col("t").alias("grid_ts"),
        y.alias("value_interp"),
    )
