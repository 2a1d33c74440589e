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
    # rows = rows committed BY the epoch (manifests are cumulative; the
    # log diffs against the parent — round-6 fix: this read 25 before)
    assert [(e["version"], e["epoch"], e["rows"]) for e in log] == [
        (1, 0, 10),
        (2, 1, 15),
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


def test_new_stream_id_is_not_conflated_with_old_epochs(spark, tmp_path):
    tbl = str(tmp_path / "t_streams")
    df = spark.range(0, 10).select(F.col("id"), F.lit("x").alias("text"))
    old = snapsink.snapshot_sink(tbl)  # stream "default"
    for e in range(3):
        old(df, e)
    assert st.current_version(tbl) == 3
    # a fresh checkpoint restarts epochs at 0: same id would wrongly skip,
    # a new stream_id delivers
    assert old.__closure__ is not None  # (guard the closure-based API shape)
    snapsink.snapshot_sink(tbl)(df, 0)  # same stream id: replay -> skipped
    assert st.current_version(tbl) == 3
    fresh = snapsink.snapshot_sink(tbl, stream_id="run2")
    fresh(df, 0)
    assert st.current_version(tbl) == 4
    log = snapsink.epoch_log(tbl)
    assert [(e["stream"], e["epoch"]) for e in log] == [
        ("default", 0), ("default", 1), ("default", 2), ("run2", 0)
    ]


def test_stream_state_rebuilds_without_sidecar(spark, tmp_path):
    import os

    tbl = str(tmp_path / "t_rebuild")
    df = spark.range(0, 5).select(F.col("id"), F.lit("y").alias("text"))
    sink = snapsink.snapshot_sink(tbl, stream_id="s1")
    sink(df, 0)
    sink(df, 1)
    os.unlink(snapsink._streams_path(tbl))  # lose the O(1) sidecar
    sink(df, 1)  # still detected as replay via manifest rebuild
    assert st.current_version(tbl) == 2
    sink(df, 2)
    assert st.current_version(tbl) == 3


def test_legacy_flat_sidecar_still_blocks_replays(spark, tmp_path):
    import json, os

    tbl = str(tmp_path / "t_legacy")
    df = spark.range(0, 5).select(F.col("id"), F.lit("z").alias("text"))
    sink = snapsink.snapshot_sink(tbl)
    sink(df, 0)
    # simulate the pre-watermark sidecar shape {stream: epoch} claiming
    # epochs beyond any surviving manifest
    with open(snapsink._streams_path(tbl), "w") as f:
        json.dump({"default": 7}, f)
    sink(df, 7)  # must be treated as a replay
    assert st.current_version(tbl) == 1
    sink(df, 8)  # genuinely new epoch still lands
    assert st.current_version(tbl) == 2


def test_neardup_sink_drops_near_matches_against_snapshot(spark, tmp_path):
    tbl = str(tmp_path / "t_near")
    base_text = "the quick brown fox jumps over the lazy dog near the old river bank today"
    rows1 = [
        (1, base_text),
        (2, "completely different content about distributed query engines and planners"),
    ]
    sink = snapsink.neardup_snapshot_sink(tbl, jaccard_threshold=0.5)
    sink(spark.createDataFrame(rows1, "doc_id long, text string"), 0)
    assert st.read(spark, tbl).count() == 2
    rows2 = [
        (3, base_text),                                     # exact dup -> dropped
        (4, base_text.replace("today", "tonight")),         # near dup  -> dropped
        (5, "a genuinely novel document mentioning photosynthesis and chlorophyll"),
    ]
    sink(spark.createDataFrame(rows2, "doc_id long, text string"), 1)
    got = st.read(spark, tbl)
    assert sorted(r.doc_id for r in got.collect()) == [1, 2, 5]
    # replay of epoch 1 is skipped; a new epoch with all-dups commits nothing
    sink(spark.createDataFrame(rows2, "doc_id long, text string"), 1)
    sink(spark.createDataFrame([(6, base_text)], "doc_id long, text string"), 2)
    assert sorted(r.doc_id for r in st.read(spark, tbl).collect()) == [1, 2, 5]


def test_neardup_sink_id_not_first_column_and_in_batch_pairs(spark, tmp_path):
    # regression: joins move the USING key first; the order-sensitive
    # append-schema check must still pass on the second batch.  Also:
    # two near-dup docs arriving IN THE SAME batch keep only the lower id.
    tbl = str(tmp_path / "t_near2")
    base_text = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                 "lambda mu nu xi omicron pi rho sigma")
    sink = snapsink.neardup_snapshot_sink(tbl, jaccard_threshold=0.5)
    b1 = spark.createDataFrame(
        [(base_text, 10), (base_text.replace("sigma", "tau"), 11),
         ("unrelated words about parquet manifests and atomic renames", 12)],
        "text string, doc_id long",
    )
    sink(b1, 0)
    got1 = sorted(r.doc_id for r in st.read(spark, tbl).collect())
    assert got1 == [10, 12]  # in-batch near-dup 11 dropped
    # sigma->tau is hamming-4 from base with a clean 8-bit band (the
    # banded-recall guarantee covers <=3 bits; this pair measured
    # in-radius) — alpha->omega measured hamming 5 with all bands dirty,
    # i.e. an honest LSH recall miss, so it can't serve as the fixture
    b2 = spark.createDataFrame(
        [(base_text.replace("sigma", "tau"), 20),     # near-dup vs snapshot
         ("fresh content mentioning tokenizers and byte pair encodings", 21)],
        "text string, doc_id long",
    )
    sink(b2, 1)  # must not raise schema mismatch
    got2 = sorted(r.doc_id for r in st.read(spark, tbl).collect())
    assert got2 == [10, 12, 21]


def test_vacuum_preserves_epoch_record_after_lost_sidecar(spark, tmp_path):
    """Double-failure replay guard: sidecar write lost (crash between
    _commit and _record_epoch) AND the epoch's manifest later vacuumed.
    vacuum must fold manifest epochs into the sidecar before dropping
    them, or a restarted query re-delivers the epoch and duplicates rows."""
    import os

    tbl = str(tmp_path / "s_vac")
    sink = snapsink.snapshot_sink(tbl)
    sink(spark.range(0, 5), 0)
    sink(spark.range(5, 9), 1)
    # simulate the crash: the sidecar write never landed
    os.unlink(snapsink._streams_path(tbl))
    # out-of-band maintenance expires epoch 0's manifest
    st.vacuum(tbl, keep_versions=1, retain_minutes=0)
    assert snapsink._stream_state(tbl) == {"default": 1}
    # the restarted query re-delivers both epochs: both must skip
    sink(spark.range(0, 5), 0)
    sink(spark.range(5, 9), 1)
    assert st.read(spark, tbl).count() == 9
    assert st.current_version(tbl) == 2


def test_vacuum_grace_window_spares_young_files(spark, tmp_path):
    """An unreferenced file younger than retain_minutes may be an
    in-flight writer's staging; vacuum must not delete it."""
    import os

    tbl = str(tmp_path / "s_grace")
    sink = snapsink.snapshot_sink(tbl)
    sink(spark.range(0, 5), 0)
    staged = os.path.join(tbl, st._DATA_DIR, "inflight")
    os.makedirs(staged)
    young = os.path.join(staged, "part-0.parquet")
    open(young, "wb").close()
    assert st.vacuum(tbl, keep_versions=1) == []
    assert os.path.exists(young)
    # age the file past the window: now it is a crashed-commit orphan
    os.utime(young, (0, 0))
    deleted = st.vacuum(tbl, keep_versions=1)
    assert any("inflight" in p for p in deleted)


def test_neardup_sink_honors_custom_id_col(spark, tmp_path):
    # round-6 review find: the two band_rows calls dropped the sink's
    # id_col and crashed UNRESOLVED_COLUMN('doc_id') on the first
    # non-replay batch against an existing snapshot
    tbl = str(tmp_path / "t_near_id")
    base_text = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                 "lambda mu nu xi omicron pi rho sigma")
    sink = snapsink.neardup_snapshot_sink(
        tbl, id_col="rec_id", jaccard_threshold=0.5
    )
    sink(spark.createDataFrame(
        [(1, base_text), (2, "unrelated parquet manifest words")],
        "rec_id long, text string"), 0)
    sink(spark.createDataFrame(
        [(3, base_text.replace("sigma", "tau")),   # near-dup vs snapshot
         (4, "fresh tokenizer content entirely")],
        "rec_id long, text string"), 1)
    got = sorted(r.rec_id for r in st.read(spark, tbl).collect())
    assert got == [1, 2, 4]
