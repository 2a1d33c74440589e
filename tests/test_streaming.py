"""Streaming tests (T1/T2): live bus fan-out, parquet-tail metric stream,
watermarked window agg, sampler feed."""

from __future__ import annotations

import pytest

import waddleml_spark as w
from waddleml_spark import state
from waddleml_spark.streaming.live import LiveBus, MetricStream, metric_window_agg


@pytest.fixture(autouse=True)
def reset_state():
    state.set_active_run(None)
    yield
    run = state.get_active_run()
    if run is not None:
        run._finished = True
    state.set_active_run(None)


def test_live_bus_publish_and_prune():
    bus = LiveBus()
    got = []
    bus.subscribe(lambda rows: got.extend(rows))

    def bad(rows):
        raise RuntimeError("dead socket")

    bus.subscribe(bad)
    bus.publish([{"k": 1}])
    bus.publish([{"k": 2}])
    assert [r["k"] for r in got] == [1, 2]
    assert len(bus._subs) == 1  # dead subscriber pruned (ref T5)


def test_run_publishes_to_live_bus(spark, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    run = w.init(project="live", system_metrics=False, spark=spark)
    bus = LiveBus()
    seen = []
    bus.subscribe(lambda rows: seen.extend(rows))
    run._live_bus = bus
    run.log({"loss": 0.5})
    run.finish()
    assert [ (r["key"], r["value"]) for r in seen ] == [("loss", 0.5)]


def test_metric_stream_tails_store(spark, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    run = w.init(project="stream", system_metrics=False, spark=spark)
    run.log({"loss": 1.0})
    run.flush()

    ms = MetricStream(run._store, trigger_seconds=0.5)
    got = []
    ms.bus.subscribe(lambda rows: got.extend(rows))
    ms.start()
    ms.process_all_available()
    assert {(r["key"], r["value"]) for r in got} == {("loss", 1.0)}

    # new micro-batch lands → stream delivers it
    run.log({"loss": 0.5})
    run.flush()
    ms.process_all_available()
    assert {(r["key"], r["value"]) for r in got} == {("loss", 1.0), ("loss", 0.5)}
    ms.stop()
    run.finish()


def test_metric_window_agg(spark, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    run = w.init(project="winagg", system_metrics=False, spark=spark)
    base = 1_700_000_010.0  # divisible by 30 → windows align with the data
    for i in range(6):
        run.log_metric("loss", i, float(i), ts=base + i * 10)
    run.flush()

    agg = metric_window_agg(spark, run._store, window="30 seconds")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("winagg_out")
        .start()
    )
    q.processAllAvailable()
    rows = spark.sql(
        "SELECT n, avg_value FROM winagg_out ORDER BY window.start"
    ).collect()
    q.stop()
    # 60s of points at 10s spacing over 30s tumbling windows → 3/3 split
    assert [r.n for r in rows] == [3, 3]
    assert rows[0].avg_value == pytest.approx(1.0)
    run.finish()


def test_metric_session_agg(spark, tmp_path, monkeypatch):
    from waddleml_spark.streaming.live import metric_session_agg

    monkeypatch.chdir(tmp_path)
    run = w.init(project="sess", system_metrics=False, spark=spark)
    base = 1_700_000_000.0
    # two bursts separated by > gap (5 min): expect two sessions
    for i in range(3):
        run.log_metric("loss", i, float(i), ts=base + i * 10)
    for i in range(2):
        run.log_metric("loss", 10 + i, float(i), ts=base + 1000 + i * 10)
    run.flush()
    agg = metric_session_agg(spark, run._store, gap="5 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    q.processAllAvailable()
    rows = spark.sql(
        "SELECT n FROM sess_out ORDER BY session_window.start"
    ).collect()
    q.stop()
    assert [r.n for r in rows] == [3, 2]
    run.finish()


def test_sampler_writes_system_metrics(spark, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from waddleml_spark.sysmetrics import sample_system_metrics

    sample = sample_system_metrics()
    run = w.init(project="sys", system_metrics=False, spark=spark)
    if sample:  # psutil present: keys match the reference naming
        assert "system/cpu_percent" in sample
        run.log_system(sample, 0)
        run.flush()
        keys = [
            r[0]
            for r in run._store.duck.execute(
                "SELECT DISTINCT key FROM metrics WHERE run_id = ? AND key LIKE 'system/%'",
                [run.id],
            ).fetchall()
        ]
        assert "system/cpu_percent" in keys
    run.finish()


def test_metric_pair_stream_stream_join(spark, tmp_path, monkeypatch):
    from waddleml_spark.streaming.live import metric_pair_join

    monkeypatch.chdir(tmp_path)
    run = w.init(project="pairjoin", system_metrics=False, spark=spark)
    base = 1_700_000_000.0
    # loss every 20s; lr 5s after each — with ±6s tolerance each loss
    # pairs with exactly its own lr (neighbors are 15s away); the lr at
    # +300s is beyond every loss's tolerance
    for i in range(3):
        run.log_metric("loss", i, 1.0 * i, ts=base + i * 20)
        run.log_metric("lr", i, 0.1 * i, ts=base + i * 20 + 5)
    run.log_metric("lr", 99, 9.9, ts=base + 300)
    run.flush()

    joined = metric_pair_join(spark, run._store, "loss", "lr", tolerance_seconds=6)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("pair_out")
        .start()
    )
    q.processAllAvailable()
    rows = spark.sql(
        "SELECT l_step, r_step FROM pair_out ORDER BY l_step"
    ).collect()
    q.stop()
    assert [(r.l_step, r.r_step) for r in rows] == [(0, 0), (1, 1), (2, 2)]
    run.finish()


def test_metric_stream_checkpoint_resumes_after_restart(spark, tmp_path, monkeypatch):
    """Restart-recovery: a NEW MetricStream on the same store resumes from
    the checkpoint — already-delivered micro-batches are not re-delivered,
    only rows logged after the stop arrive (file-source offsets + the
    persisted checkpoint give exactly-once across restarts here; the
    docstring's at-least-once caveat is about checkpoint deletion)."""
    monkeypatch.chdir(tmp_path)
    run = w.init(project="ckpt", system_metrics=False, spark=spark)
    run.log({"loss": 1.0})
    run.flush()

    ms1 = MetricStream(run._store, trigger_seconds=0.5)
    got1 = []
    ms1.bus.subscribe(lambda rows: got1.extend(rows))
    ms1.start()
    ms1.process_all_available()
    ms1.stop()
    assert {(r["key"], r["value"]) for r in got1} == {("loss", 1.0)}

    run.log({"loss": 0.5})
    run.flush()

    ms2 = MetricStream(run._store, trigger_seconds=0.5)
    got2 = []
    ms2.bus.subscribe(lambda rows: got2.extend(rows))
    ms2.start()
    ms2.process_all_available()
    ms2.stop()
    run.finish()
    # only the post-restart row — nothing replayed
    assert [(r["key"], r["value"]) for r in got2] == [("loss", 0.5)]


def test_stream_dedup_drops_repeats_within_watermark(spark, tmp_path):
    """Streaming exact-dedup: duplicate text arriving in the same or a later
    micro-batch (inside the watermark) is dropped; distinct text passes."""
    from datetime import datetime, timedelta

    from pyspark.sql import types as T

    from waddleml_spark.streaming.live import stream_dedup

    src = tmp_path / "docs_in"
    src.mkdir()
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ingest_time", T.TimestampType()),
        ]
    )
    t0 = datetime(2024, 1, 1, 12, 0, 0)

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    # batch 1: A, B, and an in-batch dup of A
    write_batch(
        [
            (1, "alpha document body", t0),
            (2, "beta document body", t0 + timedelta(seconds=1)),
            (3, "alpha document body", t0 + timedelta(seconds=2)),
        ]
    )

    stream = spark.readStream.schema(schema).parquet(str(src))
    out = stream_dedup(stream, watermark="10 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .start()
    )
    q.processAllAvailable()

    # batch 2: cross-batch dup of A (within watermark) + fresh C
    write_batch(
        [
            (4, "alpha document body", t0 + timedelta(seconds=30)),
            (5, "gamma document body", t0 + timedelta(seconds=31)),
        ]
    )
    q.processAllAvailable()
    rows = spark.sql("SELECT doc_id, text FROM dedup_out").collect()
    q.stop()

    kept = sorted(r.doc_id for r in rows)
    assert kept == [1, 2, 5]  # 3 (in-batch dup) and 4 (cross-batch dup) dropped
    assert {r.text.split()[0] for r in rows} == {"alpha", "beta", "gamma"}


def test_streaming_cms_accumulates_to_whole_corpus_sketch(spark, tmp_path):
    # count-min is a LINEAR sketch: summing per-micro-batch partial
    # matrices equals the batch sketch of the whole stream — the
    # streaming frequency-monitoring shape (one constant-size matrix per
    # trigger, merged driver-side; never a vocabulary-sized state store)
    import numpy as np
    from pyspark.sql import functions as F

    from waddleml_spark.operators import sketches

    df = spark.range(0, 3000).select(
        F.concat(F.lit("tok"), (F.col("id") % 97).cast("string")).alias("v"),
        (F.col("id") % 5).alias("part"),
    )
    whole = sketches.cms_build(df, "v", width=1 << 10, depth=4)
    acc = np.zeros_like(whole)
    for b in range(5):  # five "micro-batches" arriving over time
        acc += sketches.cms_build(
            df.filter(F.col("part") == b), "v", width=1 << 10, depth=4
        )
    assert np.array_equal(acc, whole)
    # and the merged sketch serves estimates identical to the whole-corpus one
    exact = df.groupBy("v").agg(F.count("*").alias("n"))
    est = sketches.cms_estimates(exact, "v", acc).collect()
    assert all(r.cms_est >= r.n for r in est)


def test_stream_url_dedup_collapses_canonical_variants(spark, tmp_path):
    """Streaming crawl-frontier dedup: scheme/tracking/slash variants of
    one page collapse to the first arrival within the watermark; a
    genuinely different page passes; a later-batch variant (inside the
    watermark) is dropped too."""
    from datetime import datetime, timedelta

    from pyspark.sql import types as T

    from waddleml_spark.streaming.live import stream_url_dedup

    src = tmp_path / "urls_in"
    src.mkdir()
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("url", T.StringType()),
            T.StructField("ingest_time", T.TimestampType()),
        ]
    )
    t0 = datetime(2024, 1, 1, 12, 0, 0)

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    # doc 1 arrives ALONE in batch 1: dropDuplicatesWithinWatermark keeps
    # an arbitrary first-PROCESSED row within a batch, so the survivor is
    # only deterministic across batch boundaries (review find — the
    # variants go in later batches)
    write_batch([(1, "https://example.com/page/1", t0)])

    stream = spark.readStream.schema(schema).parquet(str(src))
    out = stream_url_dedup(stream, watermark="10 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("url_dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()

    # batch 2: scheme/case/www/port/slash/tracking variant of doc 1
    # (drops), a distinct page, and a NULL url (must PASS THROUGH, not
    # collapse into the constant 'https:///' group)
    write_batch(
        [
            (2, "HTTP://WWW.Example.COM:80/page/1/?utm_source=x",
             t0 + timedelta(seconds=10)),
            (3, "https://example.com/other", t0 + timedelta(seconds=11)),
            (6, None, t0 + timedelta(seconds=12)),
        ]
    )
    q.processAllAvailable()

    # batch 3: fragment variant of doc 1 (drops), a fresh page, a
    # second NULL url (also passes — url-less rows never dedup), and
    # TWO whitespace-only urls (advisor find: ' ' slipped past the
    # NULL/'' guard, collapsed into one canonical group, and every such
    # row after the first was dropped — both must pass through)
    write_batch(
        [
            (4, "https://example.com/page/1#frag",
             t0 + timedelta(seconds=30)),
            (5, "https://example.com/fresh", t0 + timedelta(seconds=31)),
            (7, None, t0 + timedelta(seconds=32)),
            (8, " ", t0 + timedelta(seconds=33)),
            (9, " \t ", t0 + timedelta(seconds=34)),
        ]
    )
    q.processAllAvailable()
    got = sorted(
        r.doc_id for r in spark.sql("SELECT doc_id FROM url_dedup_out").collect()
    )
    q.stop()
    # docs 2 and 4 both canonicalize to https://example.com/page/1 and
    # drop; the first arrival, the two distinct pages, BOTH url-less
    # rows, and BOTH whitespace-only rows survive
    assert got == [1, 3, 5, 6, 7, 8, 9]
