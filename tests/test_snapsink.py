"""Streaming micro-batch -> SnapTable version commits (snapsink)."""

from __future__ import annotations

from pyspark.sql import functions as F

from waddleml_spark.sources import snaptable as st
from waddleml_spark.streaming import snapsink


def test_each_epoch_becomes_one_version(spark, tmp_path):
    tbl = str(tmp_path / "s1")
    sink = snapsink.snapshot_sink(tbl)
    sink(spark.range(0, 10).withColumn("v", F.col("id") * 2), 0)
    sink(spark.range(10, 25).withColumn("v", F.col("id") * 2), 1)
    assert st.read(spark, tbl).count() == 25
    log = snapsink.epoch_log(tbl)
    assert [(e["version"], e["epoch"], e["rows"]) for e in log] == [
        (1, 0, 10),
        (2, 1, 25),
    ]
    # time travel to the first batch boundary
    assert st.read(spark, tbl, version=1).count() == 10


def test_redelivered_epoch_is_skipped(spark, tmp_path):
    tbl = str(tmp_path / "s2")
    sink = snapsink.snapshot_sink(tbl)
    df = spark.range(0, 5)
    sink(df, 7)
    sink(df, 7)  # restart re-delivers epoch 7: no duplicate version/rows
    assert st.current_version(tbl) == 1
    assert st.read(spark, tbl).count() == 5
    sink(spark.range(5, 8), 8)
    assert st.read(spark, tbl).count() == 8


def test_empty_batch_commits_nothing(spark, tmp_path):
    tbl = str(tmp_path / "s3")
    sink = snapsink.snapshot_sink(tbl)
    sink(spark.range(0, 0), 0)
    assert st.current_version(tbl) == 0


def test_dedup_sink_skips_known_and_internal_dups(spark, tmp_path):
    tbl = str(tmp_path / "d1")
    sink = snapsink.dedup_snapshot_sink(tbl)

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    # batch 0: one internal dup -> 2 docs land
    sink(docs([(1, "alpha beta"), (2, "alpha beta"), (3, "gamma")]), 0)
    assert st.read(spark, tbl).count() == 2
    # batch 1: one known dup, one fresh -> only the fresh doc lands
    sink(docs([(4, "gamma"), (5, "delta")]), 1)
    got = st.read(spark, tbl)
    assert got.count() == 3
    assert {r.text for r in got.collect()} == {"alpha beta", "gamma", "delta"}
    # batch 2: everything known -> no new version
    v = st.current_version(tbl)
    sink(docs([(6, "delta"), (7, "alpha beta")]), 2)
    assert st.current_version(tbl) == v


def test_streaming_end_to_end_rate_source(spark, tmp_path):
    import time

    tbl = str(tmp_path / "s4")
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 50)
        .load()
        .select("value")
    )
    q = (
        stream.writeStream.foreachBatch(snapsink.snapshot_sink(tbl))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline and st.current_version(tbl) == 0:
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(30)
    assert st.current_version(tbl) >= 1
    got = st.read(spark, tbl)
    n = got.count()
    assert n > 0 and got.columns == ["value"]
    assert got.distinct().count() == n  # no duplicate rows across versions
    assert st.current_version(tbl) == len(snapsink.epoch_log(tbl))
