"""HLL sketch rollups: estimates within the configured error bound of
exact distinct counts, and sketch-merge == whole-range sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from waddleml_spark.operators.sketches import bucket_sketches, merge_sketches
from tests.conftest import SF_SMOKE


def _events(spark):
    # read_table, not raw spark.read: events.ts is TIMESTAMP(NANOS) and
    # needs the session's nanos conversion (see session.read_table)
    from waddleml_spark.session import read_table

    return read_table(spark, SF_SMOKE, "events").withColumn(
        "day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )


def test_daily_estimates_within_error_bound(spark):
    ev = _events(spark)
    est = {r.day: r.estimate for r in bucket_sketches(ev, "day", "user_id").collect()}
    exact = {
        r.day: r.n
        for r in ev.groupBy("day").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert set(est) == set(exact)
    for day, n in exact.items():
        assert abs(est[day] - n) <= max(0.05 * n, 2), (day, est[day], n)


def test_merged_sketch_matches_whole_range_estimate(spark):
    ev = _events(spark)
    daily = bucket_sketches(ev, "day", "user_id")
    merged = merge_sketches(daily).collect()[0].merged_estimate
    exact = ev.select("user_id").distinct().count()
    assert abs(merged - exact) <= max(0.05 * exact, 2)
    # merging materialized sketches == sketching the whole range directly
    whole = (
        ev.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))))
        .collect()[0][0]
    )
    assert merged == whole
