"""Multimodal columns: opaque binary payloads + typed metadata
(SURVEY.md §2.12; the reference's BLOB inline_bytes is the seed —
waddle/_schema.py:70).

Design: image/audio/video travel as `binary` columns with a metadata
struct (modality, mime, width/height/duration...).  Decode / resize /
frame-sample run as Arrow-batched functions over mapInPandas so each
partition processes a columnar batch; the *decode kernel itself* is
STUBBED (codec libraries are not in this container) behind
`decode_stub`, which produces a deterministic fake so the Spark-side
plumbing — schema, partitioning, batch shape — is real and tested.

At 100 TB: payloads dominate bytes; always project metadata-only unless
the stage genuinely needs bytes (column pruning keeps payload IO zero
for metadata queries), and repartition by size class before decode so
batches are uniform.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.StringType(), True),  # JSON sidecar
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("payload_sha", T.StringType(), True),
        T.StructField("feat_mean", T.DoubleType(), True),
        T.StructField("feat_dim", T.IntegerType(), True),
    ]
)


def docs_as_media(documents: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as fake media payloads so the
    binary plumbing is exercised with the driver fixtures."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.to_json(F.struct(F.col("lang"), F.col("source"))).alias("meta"),
    )


def decode_stub(payload: bytes) -> list[float]:
    """STUB decode kernel — deterministic fake feature vector.

    Real deployments drop in PIL/libav here; the container has neither,
    so features derive from the payload digest (stable across runs).
    """
    if payload is None:
        raise NotImplementedError("no payload; real decoder not bundled")
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: per-batch decode → fixed schema.

    Arrow batches in/out; bytes never round-trip through Python row
    objects.  Output is metadata + small features only (payload dropped) —
    the pattern that keeps downstream stages payload-free."""
    from waddleml_spark.session import ensure_shipped, fan_out

    ensure_shipped(media.sparkSession)
    media = fan_out(media)

    def batches(it):
        for pdf in it:
            feats = [decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "modality": pdf["modality"].values,
                    "n_bytes": [len(p) if p is not None else None for p in pdf["payload"]],
                    "payload_sha": [
                        hashlib.sha256(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feat_mean": [sum(f) / len(f) for f in feats],
                    "feat_dim": [len(f) for f in feats],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB resize kernel: deterministic fake — real deployments drop in
    PIL here.  Produces a payload whose size tracks the target dims so
    downstream size accounting is testable."""
    if payload is None:
        raise NotImplementedError("no payload; real decoder not bundled")
    digest = hashlib.sha256(payload).digest()
    need = max(1, (width * height) // 64)
    return (digest * (need // len(digest) + 1))[:need]


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize over mapInPandas: Arrow batches in/out, payload →
    payload, metadata updated.  The Spark-side contract (schema, batch
    shape, partition-parallel) is real; the pixel kernel is stubbed."""
    from waddleml_spark.session import ensure_shipped, fan_out

    ensure_shipped(media.sparkSession)
    src = fan_out(media.select("media_id", "payload"))

    def batches(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": width,
                    "height": height,
                    "payload": [resize_stub(p, width, height) for p in pdf["payload"]],
                }
            )

    return src.mapInPandas(batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_sha", T.StringType(), True),
    ]
)


def sample_frames(media: DataFrame, every_nth: int = 10, max_frames: int = 8) -> DataFrame:
    """Video frame sampling over mapInPandas: one input row fans out to N
    frame rows (batch shape change is the point — the output iterator is
    not 1:1 with the input).  Frame decode is stubbed: frame identity
    derives from (payload digest, frame index)."""
    from waddleml_spark.session import ensure_shipped, fan_out

    ensure_shipped(media.sparkSession)
    src = fan_out(media.select("media_id", "payload"))

    def batches(it):
        for pdf in it:
            ids, idxs, shas = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                # stub: pretend the payload has len(payload)//32 frames
                n_frames = max(1, len(payload) // 32)
                for k, frame in enumerate(range(0, n_frames, every_nth)):
                    if k >= max_frames:
                        break
                    ids.append(mid)
                    idxs.append(frame)
                    shas.append(
                        hashlib.sha256(payload + frame.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_sha": shas}
            )

    return src.mapInPandas(batches, schema=FRAME_SCHEMA)


def payload_stats(media: DataFrame) -> DataFrame:
    """Metadata-only stats — pure expressions, payload column pruned except
    for octet_length which parquet can answer from the binary column
    without decoding:  per modality count / total / avg bytes, sha sample."""
    return media.groupBy("modality").agg(
        F.count("*").alias("n"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.min(F.octet_length("payload")).alias("min_bytes"),
        F.max(F.octet_length("payload")).alias("max_bytes"),
    )


def chunk_fingerprints(
    media: DataFrame, chunk_bytes: int = 32, max_chunks: int = 64
) -> DataFrame:
    """Content-defined frame fingerprints: hash each aligned chunk_bytes
    slice of the payload (up to max_chunks).  Unlike sample_frames —
    whose stub derives frame identity from the WHOLE payload digest —
    each fingerprint covers only its own bytes, so payloads sharing
    aligned content (same video with trailing edits, re-muxed streams,
    doc re-encodes) share fingerprints.  All JVM-side (substring on
    binary + sha2 inside a transform) — no Python, no decode.
    Returns (media_id, chunk_idx, chunk_sha).
    """
    n = F.least(
        F.ceil(F.octet_length("payload") / F.lit(chunk_bytes)).cast("int"),
        F.lit(max_chunks),
    )
    idx = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))
    shas = F.transform(
        idx,
        lambda i: F.sha2(
            F.substring(F.col("payload"), i * chunk_bytes + 1, chunk_bytes), 256
        ),
    )
    return media.select(
        "media_id", F.posexplode(shas).alias("chunk_idx", "chunk_sha")
    )


def frame_neardup_pairs(
    media: DataFrame,
    chunk_bytes: int = 32,
    max_chunks: int = 64,
    min_shared: int = 4,
) -> DataFrame:
    """Media near-dup candidates by shared content chunks: media pairs
    with ≥ min_shared identical chunk fingerprints.

    Plan shape: explode fingerprints → self-join ON THE HASH (each hash
    bucket holds only payloads containing that exact 32-byte slice —
    bounded fan-out, the binary analog of shingle-bucket joins; payload
    bytes never shuffle, only 32-byte digests) → pair count ≥ threshold.
    Returns (id_a, id_b, shared_chunks).
    """
    fp = chunk_fingerprints(media, chunk_bytes, max_chunks).select(
        F.col("media_id").alias("id"), "chunk_sha"
    ).distinct()
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_sha") == F.col("b.chunk_sha"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("shared_chunks"))
        .filter(F.col("shared_chunks") >= min_shared)
    )
