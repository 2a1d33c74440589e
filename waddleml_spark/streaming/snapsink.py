"""Streaming sink committing each micro-batch as a SnapTable version.

Bridges Structured Streaming to the snapshot table format
(sources/snaptable.py): every non-empty micro-batch becomes one atomic
manifest commit, so downstream readers only ever see whole batches —
never a half-written file set — and any historical batch boundary can be
time-traveled back to.  This is the exactly-once-ish pattern Delta's
streaming sink uses (idempotent versioned commits per epoch); here the
epoch->version mapping is recorded in the manifest operation string so a
restarted query re-delivering an epoch can be detected and skipped.

At scale the sink's cost per trigger is one Spark parquet write (the
data plane) plus one footer-stat pass and one JSON rename (metadata
plane) — no compaction stalls; run snaptable.vacuum out of band.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from waddleml_spark.sources import snaptable


def _delivered_epochs(table: str) -> set[int]:
    epochs: set[int] = set()
    for v in snaptable._versions(table):
        op = snaptable._load_manifest(table, v)["operation"]
        if op.startswith("append-epoch-"):
            epochs.add(int(op.rsplit("-", 1)[1]))
    return epochs


def snapshot_sink(table: str):
    """foreachBatch function: ``stream.writeStream.foreachBatch(
    snapshot_sink(path))``.  Commits each micro-batch as one snapshot
    version tagged with its epoch; re-delivered epochs (query restart
    without a new checkpoint) are skipped, keeping the table exactly-once
    at batch grain."""

    def sink(df: DataFrame, epoch_id: int) -> None:
        if df.isEmpty():
            return
        if epoch_id in _delivered_epochs(table):
            return
        parent = snaptable.current_version(table)
        commit_dir = os.path.join(snaptable._DATA_DIR, f"epoch-{epoch_id}")
        df.write.mode("overwrite").parquet(os.path.join(table, commit_dir))
        entries = snaptable._collect_entries(table, commit_dir)
        if parent > 0:
            prev = snaptable._load_manifest(table, parent)
            entries = [
                snaptable.FileEntry(
                    f["path"], f["rows"],
                    {c: tuple(v) for c, v in f["stats"].items()},
                )
                for f in prev["files"]
            ] + entries
        snaptable._commit(
            table, entries, df.schema, f"append-epoch-{epoch_id}", parent
        )

    return sink


def dedup_snapshot_sink(table: str, text_col: str = "text", id_col: str = "doc_id"):
    """foreachBatch function: the streaming half of the corpus-ingestion
    loop (examples/snapshot_lakehouse.py) — every micro-batch is exact-
    deduped against the CURRENT snapshot's content fingerprints (anti-
    join on 16-byte hashes; the stored corpus never rescans its text),
    then within itself, and only the surviving representatives commit as
    the next snapshot version.  Restart-idempotent like snapshot_sink
    (re-delivered epochs skip); a batch whose docs are all already known
    commits nothing.

    At scale the fingerprint index should be a stored column: the read
    here projects (id, text) -> fingerprints per batch, which Spark
    prunes to just those columns via the manifest-listed files.
    """
    from waddleml_spark.llmops import dedup

    base = snapshot_sink(table)

    def sink(df: DataFrame, epoch_id: int) -> None:
        if df.isEmpty():
            return
        fresh = df
        if snaptable.current_version(table) > 0:
            # spark here is the micro-batch's session — never a global
            spark = df.sparkSession
            index = snaptable.read(spark, table)
            keep = dedup.incremental_dedup(
                df, index, text_col=text_col, id_col=id_col
            )
            fresh = df.join(
                keep.select(F.col("keeper_id").alias(id_col)), id_col, "semi"
            )
        else:
            fresh = dedup.exact_dedup_keep(df, text_col=text_col, id_col=id_col)
        base(fresh, epoch_id)

    return sink


def epoch_log(table: str) -> list[dict]:
    """Version -> epoch mapping for the sink's commits (audit surface)."""
    out = []
    for v in snaptable._versions(table):
        m = snaptable._load_manifest(table, v)
        if m["operation"].startswith("append-epoch-"):
            out.append(
                {
                    "version": v,
                    "epoch": int(m["operation"].rsplit("-", 1)[1]),
                    "rows": sum(f["rows"] for f in m["files"]),
                }
            )
    return out
