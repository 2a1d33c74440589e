"""SnapTable via the Python Data Source API: batch read/write, pushed-
filter file skipping, time travel, and the streaming changefeed."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    LessThanOrEqual,
)

from waddleml_spark.sources import pyds
from waddleml_spark.sources import snaptable as st
from waddleml_spark.sources.pyds import SnapTableReader, _file_bounds


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    pyds.register(spark)


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id"), F.lit(tag).alias("tag"), (F.col("id") * 2).alias("v")
    )


def test_format_read_matches_native_and_time_travels(spark, tmp_path):
    tbl = str(tmp_path / "t1")
    st.write(_df(spark, 0, 100, "a"), tbl)
    st.write(_df(spark, 100, 150, "b"), tbl)
    got = spark.read.format("snaptable").load(tbl)
    assert got.columns == ["id", "tag", "v"]
    assert got.count() == 150
    assert (
        spark.read.format("snaptable").option("version", 1).load(tbl).count() == 100
    )
    # row-level filters still correct (pruning is only an optimization)
    assert got.filter((F.col("id") >= 120) & (F.col("tag") == "b")).count() == 30


def test_pushed_filters_skip_files(spark, tmp_path):
    tbl = str(tmp_path / "t2")
    # three commits → three disjoint id-range files with footer stats
    for lo in (0, 100, 200):
        st.write(_df(spark, lo, lo + 100, "x").coalesce(1), tbl)
    reader = SnapTableReader(tbl, None)
    assert len(reader.partitions()) == 3
    reader.pushFilters([GreaterThan(("id",), 205)])
    assert len(reader.partitions()) == 1
    reader.pushFilters([EqualTo(("id",), 150)])
    assert len(reader.partitions()) == 1
    reader.pushFilters([LessThanOrEqual(("id",), -1)])
    [p] = reader.partitions()  # empty sentinel partition
    assert p.path == ""
    # end-to-end: the filtered query is still value-correct
    got = spark.read.format("snaptable").load(tbl).filter("id > 205")
    assert got.count() == 94


def test_bounds_folding():
    b, temporal = _file_bounds(
        [GreaterThan(("id",), 5), LessThanOrEqual(("id",), 10), EqualTo(("t",), "a")]
    )
    assert b == {"id": (5, 10), "t": ("a", "a")}
    assert temporal == set()


def test_bounds_folding_temporal_naive_utc():
    import datetime as dt

    aware = dt.datetime(2024, 1, 1, 10, 0, 0, tzinfo=dt.timezone.utc)
    naive = dt.datetime(2024, 1, 1, 10, 0, 0)
    ba, ta = _file_bounds([GreaterThanOrEqual(("ts",), aware)])
    bn, tn = _file_bounds([GreaterThanOrEqual(("ts",), naive)])
    # tz-aware and naive bounds canonicalize to the SAME naive-UTC ISO
    assert ba == bn == {"ts": ("2024-01-01T10:00:00", None)}
    assert ta == tn == {"ts"}


def test_format_write_commits_one_version(spark, tmp_path):
    tbl = str(tmp_path / "t3")
    # python data sources support only append/overwrite save modes
    _df(spark, 0, 100, "w").repartition(4).write.format("snaptable").mode(
        "append"
    ).save(tbl)
    assert st.current_version(tbl) == 1
    assert st.read(spark, tbl).count() == 100
    # multiple task files, one manifest commit
    assert len(st.file_list(tbl)) > 1
    _df(spark, 100, 120, "w").write.format("snaptable").mode("append").save(tbl)
    assert st.current_version(tbl) == 2
    assert spark.read.format("snaptable").load(tbl).count() == 120
    _df(spark, 0, 7, "z").write.format("snaptable").mode("overwrite").save(tbl)
    assert spark.read.format("snaptable").load(tbl).count() == 7
    assert st.history(tbl)[-1]["operation"] == "overwrite"
    # old snapshot still time-travels
    assert spark.read.format("snaptable").option("version", 2).load(tbl).count() == 120


def test_streaming_changefeed_delivers_commit_deltas(spark, tmp_path):
    tbl = str(tmp_path / "t4")
    ckpt = str(tmp_path / "ckpt")
    st.write(_df(spark, 0, 30, "s1"), tbl)
    st.write(_df(spark, 30, 50, "s2"), tbl)

    out = str(tmp_path / "out")

    def run_batch():
        q = (
            spark.readStream.format("snaptable")
            .load(tbl)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    run_batch()
    assert spark.read.parquet(out).count() == 50  # initial offset: everything
    st.write(_df(spark, 50, 55, "s3"), tbl)
    run_batch()  # checkpoint resumes from version 2 → delivers only the delta
    total = spark.read.parquet(out)
    assert total.count() == 55
    assert total.select(F.count_distinct("id")).first()[0] == 55
    assert total.filter(F.col("tag") == "s3").count() == 5
