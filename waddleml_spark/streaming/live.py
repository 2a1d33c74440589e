"""Live metric streaming (ref semantics T1/T2/T5, SURVEY.md §2.10).

The reference pushes each metric INSERT to WebSocket clients across a
thread boundary (waddle/_run.py:128-136 → waddle/_server.py:115-124); its
client debounces redraws at 500 ms, so per-event delivery is explicitly
not required — micro-batched delivery is semantics-preserving.

Two delivery paths, same subscriber interface:

- LiveBus: in-process fan-out fed directly by Run.flush() micro-batches
  (zero-latency path the dashboard uses when it shares the process —
  the analog of the reference's shared-connection cursor S4);
- MetricStream: Structured Streaming over the metrics Parquet append log →
  foreachBatch → the same subscribers.  This is the cross-process path:
  any number of dashboard processes can tail the store independently.

Watermarked windowed aggregation (metric_window_agg) goes beyond the
reference (which has no event-time windows at all — staleness T3 is a
query-time batch expression, see operators.core.stale_status).
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from waddleml_spark import schemas
from waddleml_spark.store import WaddleStore

Subscriber = Callable[[list[dict]], None]


class LiveBus:
    """In-process metric fan-out: Run.flush() publishes each micro-batch;
    dead subscribers are pruned on send failure (ref T5 prune behavior)."""

    def __init__(self):
        self._subs: list[Subscriber] = []
        self._lock = threading.Lock()

    def subscribe(self, fn: Subscriber) -> None:
        with self._lock:
            self._subs.append(fn)

    def publish(self, rows: list[dict]) -> None:
        with self._lock:
            subs = list(self._subs)
        dead = []
        for fn in subs:
            try:
                fn(rows)
            except Exception:
                dead.append(fn)
        if dead:
            with self._lock:
                self._subs = [s for s in self._subs if s not in dead]


class MetricStream:
    """Structured Streaming tail of the metrics append log.

    readStream(parquet) → foreachBatch → subscriber fan-out.  Exactly-once
    per micro-batch within a run of the query; the UI's debounce makes
    at-least-once across restarts acceptable (ref T1 analysis).
    """

    def __init__(self, store: WaddleStore, trigger_seconds: float = 1.0):
        self.store = store
        self.trigger = trigger_seconds
        self.bus = LiveBus()
        self._query = None

    def start(self) -> None:
        spark = self.store.spark
        src = (
            spark.readStream.schema(schemas.METRICS)
            .option("maxFilesPerTrigger", 64)
            .parquet(self.store._dir("metrics"))
        )

        def deliver(df: DataFrame, epoch_id: int) -> None:
            rows = [r.asDict() for r in df.collect()]
            if rows:
                self.bus.publish(rows)

        self._query = (
            src.writeStream.foreachBatch(deliver)
            .trigger(processingTime=f"{self.trigger} seconds")
            .option(
                "checkpointLocation",
                self.store.root + "/_checkpoints/metric_stream",
            )
            .start()
        )

    def process_all_available(self) -> None:
        """Synchronous drain — lets tests and batch jobs pump the stream."""
        if self._query is not None:
            self._query.processAllAvailable()

    def stop(self) -> None:
        if self._query is not None:
            self._query.stop()
            self._query = None


def metric_window_agg(
    spark: SparkSession,
    store: WaddleStore,
    window: str = "30 seconds",
    slide: str | None = None,
    watermark: str = "2 minutes",
):
    """Watermarked event-time windowed aggregation over the live metric
    stream: per (window, run_id, key) count/avg/min/max.  Late rows beyond
    the watermark are dropped — the engine's late-data story, absent in the
    reference (extension operator).

    Returns the streaming DataFrame; callers attach a sink
    (memory sink for tests, foreachBatch→store for materialized rollups).
    """
    src = (
        spark.readStream.schema(schemas.METRICS)
        .parquet(store._dir("metrics"))
        .withColumn("event_time", F.timestamp_seconds(F.col("ts")))
        .withWatermark("event_time", watermark)
    )
    win = F.window("event_time", window, slide) if slide else F.window("event_time", window)
    return src.groupBy(win, "run_id", "key").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def metric_session_agg(
    spark: SparkSession,
    store: WaddleStore,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
):
    """Session-window aggregation over the live metric stream: dynamic
    per-(run, key) sessions that close after `gap` of event-time silence —
    the streaming rendition of the batch sessionize operator
    (catalog `sessionize_users`).  Extension beyond the reference."""
    src = (
        spark.readStream.schema(schemas.METRICS)
        .parquet(store._dir("metrics"))
        .withColumn("event_time", F.timestamp_seconds(F.col("ts")))
        .withWatermark("event_time", watermark)
    )
    return src.groupBy(
        F.session_window("event_time", gap), "run_id", "key"
    ).agg(F.count("*").alias("n"), F.avg("value").alias("avg_value"))


def stream_dedup(
    docs,
    text_col: str = "text",
    time_col: str = "ingest_time",
    watermark: str = "10 minutes",
):
    """Streaming exact-dedup of a document stream: drop any doc whose
    normalized content fingerprint was already seen within the watermark
    horizon (dropDuplicatesWithinWatermark).

    The streaming twin of llmops.dedup.incremental_dedup: that one is the
    recurring-crawl batch shape (anti join against the FULL stored index —
    exact forever, one scheduled job per crawl); this one is the live-firehose
    shape, where exactness-forever would mean unbounded state.  Keyed state
    holds one 16-byte fingerprint per distinct doc seen within the watermark
    and is evicted as event time advances, so state is O(ingest rate ×
    watermark), independent of corpus size — the property that keeps the
    query runnable forever on a 1000-executor cluster.  Re-crawls typically
    re-surface a URL within minutes; anything beyond the horizon is caught
    by the nightly incremental_dedup pass (belt and suspenders).

    `docs` is a STREAMING DataFrame with `text_col` and an event-time
    `time_col`; returns the deduplicated stream (original columns).
    Extension beyond the reference (no streaming surface there at all).
    """
    from waddleml_spark.llmops.textstats import fingerprint

    deduped = (
        docs.withColumn("__fp", fingerprint(F.col(text_col)))
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
    )
    return deduped.drop("__fp")


def stream_url_dedup(
    docs,
    url_col: str = "url",
    time_col: str = "ingest_time",
    watermark: str = "10 minutes",
):
    """Streaming crawl-frontier dedup: drop any document whose CANONICAL
    URL (llmops.urlnorm — scheme/www/port/slash/fragment/tracking-param
    normalization) was already seen within the watermark horizon.

    The live twin of the batch url_dedup_report: a crawl frontier
    re-surfaces the same page as scheme/tracking variants within
    minutes, and canonicalization is a stateless map-only projection,
    so it composes with dropDuplicatesWithinWatermark exactly like
    stream_dedup's content fingerprint — keyed state is one canonical
    string per distinct page within the watermark, O(ingest rate x
    watermark), corpus-size-independent.  Content-level dups that
    survive (different URL, same text) fall through to stream_dedup /
    the nightly incremental_dedup pass downstream.

    NULL/empty/WHITESPACE-ONLY urls PASS THROUGH undeduplicated (review
    + advisor find): urlnorm folds NULL/'' to the constant 'https:///'
    (and every all-whitespace url to one 'https://<ws>/' family), so
    keying state on them would collapse every url-less row (unresolved
    redirect, sitemap stub) after the first into "duplicates" — data
    loss, not dedup.  The emptiness check strips the shared explicit
    whitespace class (WS_TRIM_RE — never the engine trim builtins, the
    CLAUDE.md rule) so ' ' takes the pass-through branch too.  The
    url-less branch unions back in; the source re-reads each
    micro-batch once per branch, the standard cost of a streaming
    split.
    """
    from waddleml_spark.llmops import WS_TRIM_RE
    from waddleml_spark.llmops.urlnorm import with_canonical_url

    has_url = F.col(url_col).isNotNull() & (
        F.regexp_replace(F.col(url_col), WS_TRIM_RE, "") != ""
    )
    deduped = (
        with_canonical_url(docs.filter(has_url), url_col, out_col="__curl")
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["__curl"])
        .drop("__curl")
    )
    return deduped.unionByName(docs.filter(~has_url))


def metric_pair_join(
    spark: SparkSession,
    store: WaddleStore,
    left_key: str,
    right_key: str,
    tolerance_seconds: int = 30,
    watermark: str = "2 minutes",
):
    """Stream-stream inner join: correlate two live metric keys of the
    same run whose event times fall within ±tolerance (e.g. pair each
    `loss` point with the `lr` in effect around it).

    The canonical watermarked interval join: BOTH sides carry a
    watermark and the join condition bounds event-time distance, so the
    engine can expire state — each side buffers only
    watermark + tolerance of data per run, regardless of stream length.
    Without the time bound this would be an ever-growing state table;
    with it, state is O(rate × window) — the property that keeps the
    join runnable forever at scale.  Extension beyond the reference
    (its dashboard correlates metrics only at query time over DuckDB).
    """
    def side(key: str, alias: str):
        return (
            spark.readStream.schema(schemas.METRICS)
            .parquet(store._dir("metrics"))
            .filter(F.col("key") == key)
            .withColumn("event_time", F.timestamp_seconds(F.col("ts")))
            .withWatermark("event_time", watermark)
            .select(
                F.col("run_id").alias(f"{alias}_run"),
                F.col("step").alias(f"{alias}_step"),
                F.col("value").alias(f"{alias}_value"),
                F.col("event_time").alias(f"{alias}_time"),
            )
        )

    a, b = side(left_key, "l"), side(right_key, "r")
    tol = F.expr(f"INTERVAL {int(tolerance_seconds)} SECONDS")
    return a.join(
        b,
        (F.col("l_run") == F.col("r_run"))
        & (F.col("r_time") >= F.col("l_time") - tol)
        & (F.col("r_time") <= F.col("l_time") + tol),
        "inner",
    )
