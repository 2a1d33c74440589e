"""Streaming sink committing each micro-batch as a SnapTable version.

Bridges Structured Streaming to the snapshot table format
(sources/snaptable.py): every non-empty micro-batch becomes one atomic
manifest commit, so downstream readers only ever see whole batches —
never a half-written file set — and any historical batch boundary can be
time-traveled back to.  This is the exactly-once-ish pattern Delta's
streaming sink uses (idempotent versioned commits per epoch).

Epoch identity is scoped by ``stream_id``: Structured Streaming epoch
ids are monotone only WITHIN one checkpoint, so "epoch seen before"
is meaningful only per (checkpoint ≙ stream_id).  A query restarted
from the SAME checkpoint re-delivers its last epoch and is skipped; a
query started with a NEW checkpoint (or a second query feeding the same
table) must pass its own ``stream_id`` — with the default id its fresh
epochs 0..N would collide with the old stream's and be dropped as
replays.  Delta's transactional sink keys idempotence by (appId,
version) the same way.

The per-stream high-water mark lives in ``_snaptable/streams.json``
(atomic tmp+rename; one writer per stream by Structured Streaming's
serial-epoch guarantee), so the replay check is O(1) per trigger —
rebuilt once from manifest operation strings when absent.  Per trigger
the sink costs one Spark parquet write (data plane) plus one
footer-stat pass and two JSON renames (metadata plane) — no compaction
stalls; run snaptable.vacuum out of band.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from waddleml_spark.sources import snaptable

_STREAMS = "streams.json"


def _parse_epoch_op(op: str) -> tuple[str, int] | None:
    """'append-epoch-<epoch>' (legacy → stream 'default') or
    'append-epoch-<stream_id>-<epoch>' → (stream_id, epoch)."""
    if not op.startswith("append-epoch-"):
        return None
    rest = op[len("append-epoch-"):]
    head, _, tail = rest.rpartition("-")
    return (head or "default", int(tail))


def _streams_path(table: str) -> str:
    return os.path.join(table, snaptable._MANIFEST_DIR, _STREAMS)


def _stream_state_scan(table: str) -> tuple[dict[str, int], int]:
    """(per-stream max delivered epoch, highest manifest version the
    scan actually covered).

    The MANIFESTS are the atomic record (the sidecar write is a separate
    step that can be lost to a crash or to a concurrent stream's
    read-modify-write), so the sidecar is only a scan watermark: take
    its per-stream values, then merge every manifest NEWER than its
    ``at_version``.  A stale/lost sidecar costs one longer scan, never a
    wrong answer.  A pre-watermark sidecar (the legacy flat
    {stream: epoch} shape) is parsed as streams with at_version=0 —
    discarding it would forget epochs whose manifests were vacuumed."""
    p = _streams_path(table)
    state: dict[str, int] = {}
    at_version = 0
    if os.path.exists(p):
        with open(p) as f:
            raw = json.load(f)
        if "streams" in raw:
            at_version = int(raw.get("at_version", 0))
            state = {k: int(v) for k, v in raw["streams"].items()}
        else:  # legacy flat shape
            state = {k: int(v) for k, v in raw.items()}
    covered = at_version
    for v in snaptable._versions(table):
        covered = max(covered, v)
        if v <= at_version:
            continue
        parsed = _parse_epoch_op(snaptable._load_manifest(table, v)["operation"])
        if parsed:
            sid, epoch = parsed
            state[sid] = max(state.get(sid, -1), epoch)
    return state, covered


def _stream_state(table: str) -> dict[str, int]:
    return _stream_state_scan(table)[0]


def _write_sidecar(table: str, state: dict[str, int], covered: int) -> None:
    tmp = os.path.join(
        table, snaptable._MANIFEST_DIR, f".tmp-streams-{uuid.uuid4().hex}"
    )
    with open(tmp, "w") as f:
        json.dump({"at_version": covered, "streams": state}, f)
    os.replace(tmp, _streams_path(table))


def _record_epoch(table: str, stream_id: str, epoch_id: int) -> None:
    # merge against a FRESH read so a concurrent stream's watermark is
    # never regressed, and stamp at_version with the max version the
    # merge scan actually COVERED — a fresh current_version() here could
    # exceed the scan (a concurrent stream's manifest landed in between)
    # and permanently hide that stream's epochs behind the watermark.
    # Correctness doesn't depend on this write landing at all.
    state, covered = _stream_state_scan(table)
    state[stream_id] = max(state.get(stream_id, -1), epoch_id)
    _write_sidecar(table, state, covered)


def persist_stream_state(table: str) -> None:
    """Fold every manifest's epoch record into the sidecar NOW.

    snaptable.vacuum calls this before expiring manifests: the manifests
    are the durable epoch record and the sidecar only a scan watermark,
    so dropping a manifest whose epoch never reached the sidecar (crash
    between _commit and _record_epoch) would erase the only evidence the
    epoch was delivered — a restarted query would replay it."""
    state, covered = _stream_state_scan(table)
    if not state:
        return
    _write_sidecar(table, state, covered)


def snapshot_sink(table: str, stream_id: str = "default"):
    """foreachBatch function: ``stream.writeStream.foreachBatch(
    snapshot_sink(path))``.  Commits each micro-batch as one snapshot
    version tagged (stream_id, epoch); a re-delivered epoch of the SAME
    stream (query restart from its checkpoint) is skipped, keeping the
    table exactly-once at batch grain.  Pass a fresh ``stream_id`` when
    starting over with a new checkpoint — epoch numbering restarts there,
    and under the old id the new batches would look like replays."""

    def sink(df: DataFrame, epoch_id: int) -> None:
        if df.isEmpty():
            return
        if epoch_id <= _stream_state(table).get(stream_id, -1):
            return
        parent = snaptable.current_version(table)
        # uuid suffix: a replay that slipped past the check (both records
        # lost) must land in a FRESH dir — overwriting the epoch-named
        # dir would delete part files the earlier manifest references
        commit_dir = os.path.join(
            snaptable._DATA_DIR,
            f"epoch-{stream_id}-{epoch_id}-{uuid.uuid4().hex[:8]}",
        )
        df.write.mode("overwrite").parquet(os.path.join(table, commit_dir))
        entries = snaptable._collect_entries(table, commit_dir)
        # only the new files: _commit hydrates the tip's file list and
        # validates the append schema atomically with the version claim
        snaptable._commit(
            table, entries, df.schema,
            f"append-epoch-{stream_id}-{epoch_id}", parent,
        )
        _record_epoch(table, stream_id, epoch_id)

    return sink


def dedup_snapshot_sink(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    stream_id: str = "default",
):
    """foreachBatch function: the streaming half of the corpus-ingestion
    loop (examples/snapshot_lakehouse.py) — every micro-batch is exact-
    deduped against the CURRENT snapshot's content fingerprints (anti-
    join on 16-byte hashes; the stored corpus never rescans its text),
    then within itself, and only the surviving representatives commit as
    the next snapshot version.  Restart-idempotent like snapshot_sink
    (same-stream re-delivered epochs skip); a batch whose docs are all
    already known commits nothing.

    At scale the fingerprint index should be a stored column: the read
    here projects (id, text) -> fingerprints per batch, which Spark
    prunes to just those columns via the manifest-listed files.
    """
    from waddleml_spark.llmops import dedup

    base = snapshot_sink(table, stream_id=stream_id)

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
        # the semi-join moves id_col first; the snapshot append-schema
        # check is column-order-sensitive by design.  localCheckpoint
        # cuts lineage at BATCH grain (bounded, unlike a corpus-scale
        # checkpoint): base() runs isEmpty() and then the write, and
        # without the cut each action re-executes the whole plan —
        # including the snapshot-wide fingerprint scan — twice per
        # micro-batch (round-6 review find; the neardup sink already
        # checkpoints for the same reason)
        base(fresh.select(*df.columns).localCheckpoint(), epoch_id)

    return sink


def epoch_log(table: str) -> list[dict]:
    """Version -> (stream, epoch) mapping for the sink's commits.

    ``rows`` is the rows COMMITTED BY that epoch: manifests store the
    cumulative hydrated file list, so the per-epoch count is the rows
    of files NEW relative to the immediately preceding version (summing
    the raw manifest was reporting ever-growing whole-table counts —
    round-6 review find)."""
    out = []
    prev_paths: set = set()
    for v in snaptable._versions(table):
        m = snaptable._load_manifest(table, v)
        files = {f["path"]: f["rows"] for f in m["files"]}
        parsed = _parse_epoch_op(m["operation"])
        if parsed:
            sid, epoch = parsed
            out.append(
                {
                    "version": v,
                    "stream": sid,
                    "epoch": epoch,
                    "rows": sum(
                        r for p, r in files.items() if p not in prev_paths
                    ),
                }
            )
        prev_paths = set(files)
    return out


def neardup_snapshot_sink(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    stream_id: str = "default",
    band_bits: int = 8,
    max_bucket: int = 64,
    jaccard_threshold: float = 0.8,
):
    """foreachBatch function: streaming NEAR-dup ingest — the LSH version
    of dedup_snapshot_sink.  Per micro-batch: exact dedup within the
    batch, exact fingerprint anti-join against the snapshot, banded
    32-bit SimHash near-dup removal WITHIN the batch, then against the
    stored corpus — every candidate verified at exact n-gram Jaccard >=
    ``jaccard_threshold`` before a drop.  Survivors commit as the next
    snapshot version.

    band_bits=8 gives 4 bands: by pigeonhole every pair within hamming
    distance 3 of the 32-bit signature shares a clean band — the right
    recall default for one-edit near-dups (16-bit bands measured missing
    a 3-bit-distant pair).  The mega-bucket star guard caps snapshot
    buckets at ``max_bucket``; capped buckets fall back to verifying
    against ONE representative (min id) per bucket, so the dominant
    boilerplate cluster cannot grow unboundedly through the guard's
    blind spot (recall trade: a capped bucket is checked via its
    representative only).

    Replays skip O(1) at the top (stream-scoped high-water check before
    any compute).  The deduped batch and the drop-id sets are
    localCheckpointed — the anti-join filter sets derive from the
    expensive SimHash/Jaccard branch, and without the cut the committed
    plan re-evaluates that branch per reference (the CLAUDE.md
    filter-set rule).  Doc ids must be globally unique across batches.
    At large snapshots, persist the signature column in the table
    instead of recomputing per batch."""
    from waddleml_spark.llmops import dedup
    from waddleml_spark.llmops.textstats import fingerprint

    base = snapshot_sink(table, stream_id=stream_id)

    def _drop_verified(frame, cand):
        """Anti-join frame by the id_a side of Jaccard-verified pairs."""
        near = dedup.jaccard_pairs(
            frame,
            candidates=cand,
            text_col=text_col,
            id_col=id_col,
            threshold=jaccard_threshold,
        )
        drops = near.select(F.col("id_a").alias(id_col)).distinct().localCheckpoint()
        return frame.join(drops, id_col, "anti")

    def sink(df, epoch_id: int) -> None:
        if epoch_id <= _stream_state(table).get(stream_id, -1):
            return  # replay: skip before ANY compute
        if df.isEmpty():
            return
        cols = df.columns
        # exact within batch, then near-dup within batch (keep lower id)
        batch = dedup.exact_dedup_keep(df, text_col=text_col, id_col=id_col)
        in_batch = dedup.simhash32_band_pairs(
            batch, text_col=text_col, id_col=id_col,
            band_bits=band_bits, max_bucket=max_bucket,
        ).select("id_a", "id_b")
        # drop the HIGHER id of each verified in-batch pair
        batch = _drop_verified(
            batch, in_batch.select(F.col("id_b").alias("id_a"),
                                   F.col("id_a").alias("id_b")),
        ).localCheckpoint()
        if snaptable.current_version(table) > 0:
            spark = df.sparkSession
            snap = snaptable.read(spark, table)
            # exact vs snapshot: one fingerprint anti-join
            batch = batch.join(
                snap.select(fingerprint(F.col(text_col)).alias("__fp")).distinct(),
                fingerprint(F.col(text_col)) == F.col("__fp"),
                "left_anti",
            ).localCheckpoint()
            b_keys = dedup.band_rows(
                dedup.simhash32_jvm(batch, text_col, id_col),
                band_bits,
                id_col=id_col,
            )
            # ONE evaluation of the snapshot signature pipeline: bucket
            # size + representative come from a single window pass, and
            # the mega-bucket guard is one filter — keep a bucket's rows
            # when it is small enough, else only its min-id
            # representative (not zero coverage).  The previous
            # ok_keys ∪ reps construction referenced the keys subtree
            # four times, and Catalyst re-executes the corpus-scale
            # signature projection once per reference.
            from pyspark.sql import Window

            w = Window.partitionBy("band", "bucket")
            s_annot = (
                dedup.band_rows(
                    dedup.simhash32_jvm(snap, text_col, id_col),
                    band_bits,
                    id_col=id_col,
                )
                .withColumn("__n", F.count("*").over(w))
                .withColumn("__min", F.min("id").over(w))
            )
            snap_keys = s_annot.filter(
                (F.col("__n") <= max_bucket) | (F.col("id") == F.col("__min"))
            ).select(F.col("id").alias("snap_id"), "band", "bucket")
            cand = (
                b_keys.join(snap_keys, ["band", "bucket"])
                .select(F.col("id").alias("id_a"), F.col("snap_id").alias("id_b"))
                .distinct()
            )
            union = batch.select(id_col, text_col).unionByName(
                snap.select(id_col, text_col)
            )
            near = dedup.jaccard_pairs(
                union,
                candidates=cand,
                text_col=text_col,
                id_col=id_col,
                threshold=jaccard_threshold,
            )
            drops = (
                near.select(F.col("id_a").alias(id_col)).distinct().localCheckpoint()
            )
            batch = batch.join(drops, id_col, "anti")
        # joins reorder columns (USING keys move first); the snapshot's
        # append-schema check is order-sensitive by design
        base(batch.select(*cols), epoch_id)

    return sink
