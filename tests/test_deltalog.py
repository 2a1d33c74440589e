"""Pure-Python Delta log: commits, time travel, partitions, checkpoint,
history, vacuum — all without delta-spark jars (deltalog.py)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from waddleml_spark.sources import deltalog as dl
from waddleml_spark.sources import lakehouse


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id"), F.lit(tag).alias("tag"), (F.col("id") * 2.0).alias("v")
    )


def test_append_read_back_and_layout(spark, tmp_path):
    tbl = str(tmp_path / "t1")
    v0 = dl.write_delta(_df(spark, 0, 100, "a"), tbl)
    v1 = dl.write_delta(_df(spark, 100, 150, "b"), tbl)
    assert (v0, v1) == (0, 1)  # delta versions are 0-based
    got = dl.read_delta(spark, tbl)
    assert got.count() == 150
    assert got.filter(F.col("tag") == "b").count() == 50
    # spec layout: %020d.json commits; first commit has protocol+metaData
    log = sorted(os.listdir(os.path.join(tbl, "_delta_log")))
    assert log[0] == f"{0:020d}.json"
    actions = [
        json.loads(line)
        for line in open(os.path.join(tbl, "_delta_log", log[0]))
        if line.strip()
    ]
    kinds = [next(iter(a)) for a in actions]
    assert kinds[0] == "protocol" and "metaData" in kinds and "add" in kinds


def test_overwrite_and_time_travel(spark, tmp_path):
    tbl = str(tmp_path / "t2")
    dl.write_delta(_df(spark, 0, 100, "old"), tbl)
    dl.write_delta(_df(spark, 0, 10, "new"), tbl, mode="overwrite")
    assert dl.read_delta(spark, tbl).count() == 10
    old = dl.read_delta(spark, tbl, version=0)
    assert old.count() == 100
    assert old.select(F.collect_set("tag")).first()[0] == ["old"]


def test_partitioned_write_reconstructs_typed_columns(spark, tmp_path):
    tbl = str(tmp_path / "t3")
    df = spark.range(0, 90).select(
        F.col("id"),
        (F.col("id") % 3).alias("bucket"),
        F.concat(F.lit("doc"), F.col("id")).alias("body"),
    )
    dl.write_delta(df, tbl, partition_by=["bucket"])
    got = dl.read_delta(spark, tbl)
    assert got.count() == 90
    assert dict(got.dtypes)["bucket"] == "bigint"  # cast back per schemaString
    assert got.filter(F.col("bucket") == 2).count() == 30
    assert got.columns == ["id", "bucket", "body"]  # metaData column order
    # partition append keeps partitioning; mismatch is rejected
    dl.write_delta(
        spark.range(90, 120).select(
            F.col("id"), (F.col("id") % 3).alias("bucket"), F.lit("x").alias("body")
        ),
        tbl,
    )
    assert dl.read_delta(spark, tbl).count() == 120
    with pytest.raises(ValueError, match="partition_by"):
        dl.write_delta(df, tbl, partition_by=["body"])


def test_checkpoint_replaces_json_prefix(spark, tmp_path):
    tbl = str(tmp_path / "t4")
    for i in range(4):
        dl.write_delta(_df(spark, i * 10, (i + 1) * 10, f"c{i}"), tbl)
    v = dl.create_checkpoint(tbl)
    assert v == 3
    # drop every JSON commit the checkpoint covers: reads must still work
    for i in range(v + 1):
        os.unlink(os.path.join(tbl, "_delta_log", f"{i:020d}.json"))
    assert dl.read_delta(spark, tbl).count() == 40
    with open(os.path.join(tbl, "_delta_log", "_last_checkpoint")) as f:
        assert json.load(f)["version"] == 3
    # appends continue past the checkpoint
    dl.write_delta(_df(spark, 40, 50, "c4"), tbl)
    assert dl.read_delta(spark, tbl).count() == 50


def test_history_vacuum_and_schema_guard(spark, tmp_path):
    tbl = str(tmp_path / "t5")
    dl.write_delta(_df(spark, 0, 20, "a"), tbl)
    dl.write_delta(_df(spark, 0, 5, "b"), tbl, mode="overwrite")
    h = dl.history(tbl)
    assert [e["version"] for e in h] == [0, 1]
    assert h[1]["operationParameters"]["mode"] == "overwrite"
    deleted = dl.vacuum(tbl, retain_minutes=0)
    assert deleted, "overwritten files should be collected"
    assert dl.read_delta(spark, tbl).count() == 5
    with pytest.raises(ValueError, match="schema mismatch"):
        dl.write_delta(spark.range(3), tbl)  # missing tag/v columns


def test_lakehouse_read_delta_falls_back(spark, tmp_path):
    tbl = str(tmp_path / "t6")
    dl.write_delta(_df(spark, 0, 7, "x"), tbl)
    # no delta jars in this container → must route through deltalog
    assert not lakehouse.lakehouse_available(spark, "delta")
    assert lakehouse.read_delta(spark, tbl).count() == 7
    assert lakehouse.read_delta(spark, tbl, version=0).count() == 7


def test_partition_values_needing_escapes_round_trip(spark, tmp_path):
    # Spark hive-escapes ':' and '%' in partition dir names (k=a%3Ab);
    # the add.path must encode the LITERAL dir name so reads resolve it
    # and vacuum never mistakes the on-disk file for garbage
    tbl = str(tmp_path / "t_esc")
    df = spark.createDataFrame(
        [(1, "a:b"), (2, "a:b"), (3, "p%q"), (4, "plain")], "id long, k string"
    )
    dl.write_delta(df, tbl, partition_by=["k"])
    got = dl.read_delta(spark, tbl)
    assert got.count() == 4
    assert {r.k for r in got.select("k").distinct().collect()} == {
        "a:b", "p%q", "plain"
    }
    assert got.filter(F.col("k") == "a:b").count() == 2
    # vacuum on the latest snapshot must delete nothing
    assert dl.vacuum(tbl, retain_minutes=0) == []
    assert dl.read_delta(spark, tbl).count() == 4


def test_concurrent_delta_appenders_all_land(spark, tmp_path):
    """8 threads race append commits through the os.link claim + rebase
    loop; every batch must land in its own version with no loss."""
    from concurrent.futures import ThreadPoolExecutor

    tbl = str(tmp_path / "race")
    dl.write_delta(_df(spark, 0, 10, "seed"), tbl)

    def append(i):
        return dl.write_delta(
            _df(spark, 100 * (i + 1), 100 * (i + 1) + 10, f"w{i}"), tbl
        )

    with ThreadPoolExecutor(max_workers=8) as ex:
        versions = list(ex.map(append, range(8)))
    assert len(set(versions)) == 8  # every commit claimed a unique version
    final = dl.read_delta(spark, tbl)
    assert final.count() == 90  # seed + 8 batches of 10, none lost
    assert final.select("tag").distinct().count() == 9
    # the log replays cleanly at every intermediate version
    for v in sorted(versions):
        assert dl.read_delta(spark, tbl, version=v).count() % 10 == 0


def test_checkpoint_carries_full_action_schema(spark, tmp_path):
    """Spec checkpoint completeness: remove tombstones, txn and metaData
    configuration/format.options columns must exist (nullable) so a real
    Delta client replaying checkpoint + newer commits sees the same state
    — a checkpoint without tombstones can resurrect overwritten files."""
    import pyarrow.parquet as pq

    tbl = str(tmp_path / "t_cp")
    dl.write_delta(_df(spark, 0, 20, "a"), tbl)
    dl.write_delta(_df(spark, 0, 5, "b"), tbl, mode="overwrite")  # -> removes
    v = dl.create_checkpoint(tbl)
    t = pq.read_table(dl._checkpoint_path(tbl, v))
    assert set(t.column_names) == {"txn", "add", "remove", "metaData", "protocol"}
    recs = t.to_pylist()
    removed = [r["remove"]["path"] for r in recs if r["remove"] is not None]
    added = [r["add"]["path"] for r in recs if r["add"] is not None]
    assert removed and not (set(removed) & set(added))
    meta = next(r["metaData"] for r in recs if r["metaData"] is not None)
    assert meta["format"]["provider"] == "parquet"
    assert "configuration" in meta and "options" in meta["format"]
    # checkpoint-only replay: drop the JSON prefix, state must survive
    import os

    for cv in range(v + 1):
        p = dl._commit_path(tbl, cv)
        if os.path.exists(p):
            os.unlink(p)
    assert dl.read_delta(spark, tbl).count() == 5
    # tombstones survive a replay THROUGH the checkpoint
    state = dl._replay_state(tbl, v)
    assert set(state["removes"]) == set(removed)


def test_spec_reader_clean_room_replay(spark, tmp_path):
    """Jar-free interop proxy: a CLEAN-ROOM reader that follows only the
    public Delta protocol rules (delta-io PROTOCOL.md) — read
    ``_last_checkpoint``, load the checkpoint parquet's add/remove
    actions, apply newer ``%020d.json`` commits in order, surviving adds
    = the table — with NO calls into deltalog's own replay code.  If
    this reconstruction matches, a real Delta client following the same
    spec reads the table too (the jar-gated test below stays the direct
    proof where jars exist)."""
    import json as _json
    import os

    import pyarrow.parquet as pq

    tbl = str(tmp_path / "t_spec")
    dl.write_delta(_df(spark, 0, 10, "a"), tbl)
    dl.write_delta(_df(spark, 0, 4, "b"), tbl, mode="overwrite")
    dl.create_checkpoint(tbl)
    dl.write_delta(_df(spark, 100, 103, "c"), tbl, mode="append")

    log = os.path.join(tbl, "_delta_log")
    with open(os.path.join(log, "_last_checkpoint")) as f:
        cp = _json.load(f)
    assert set(cp) >= {"version", "size"}
    cp_table = pq.read_table(
        os.path.join(log, f"{cp['version']:020d}.checkpoint.parquet")
    ).to_pylist()
    live: dict[str, dict] = {}
    n_proto = n_meta = 0
    for action in cp_table:
        # checkpoint rows: exactly one non-null action struct per row
        present = {k for k, v in action.items() if v is not None}
        assert len(present) == 1, present
        if "add" in present:
            live[action["add"]["path"]] = action["add"]
        elif "remove" in present:
            live.pop(action["remove"]["path"], None)
        elif "protocol" in present:
            n_proto += 1
            assert action["protocol"]["minReaderVersion"] >= 1
        elif "metaData" in present:
            n_meta += 1
            assert _json.loads(action["metaData"]["schemaString"])["type"] == "struct"
    assert n_proto == 1 and n_meta == 1  # spec: exactly one of each
    for v in range(cp["version"] + 1, 10**6):
        p = os.path.join(log, f"{v:020d}.json")
        if not os.path.exists(p):
            break
        with open(p) as f:
            for line in f:
                a = _json.loads(line)
                if "add" in a:
                    live[a["add"]["path"]] = a["add"]
                elif "remove" in a:
                    live.pop(a["remove"]["path"], None)
    # the spec reconstruction must equal what the engine itself serves
    import urllib.parse

    got = 0
    for add in live.values():
        fpath = os.path.join(tbl, urllib.parse.unquote(add["path"]))
        assert os.path.exists(fpath), add["path"]
        got += pq.read_metadata(fpath).num_rows
    assert got == dl.read_delta(spark, tbl).count() == 7


def test_checkpoint_interop_with_delta_spark(spark, tmp_path):
    """Guarded interop: only runs when the delta-spark jars are present
    (absent in this container -> skip)."""
    import pytest

    from waddleml_spark.sources import lakehouse

    if not lakehouse.lakehouse_available(spark, "delta"):
        pytest.skip("delta-spark jars not on the classpath")
    tbl = str(tmp_path / "t_interop")
    dl.write_delta(_df(spark, 0, 10, "a"), tbl)
    dl.write_delta(_df(spark, 0, 4, "b"), tbl, mode="overwrite")
    dl.create_checkpoint(tbl)
    assert spark.read.format("delta").load(tbl).count() == 4
