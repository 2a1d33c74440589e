"""Rate-source-driven system-metrics stream (SURVEY.md S8 mapping).

The reference samples psutil every 5 s on a daemon thread
(waddle/_sysmetrics.py:13-66) — sysmetrics.SystemMonitor keeps that exact
behavior for the logging API.  This module is the Structured-Streaming
rendition: a `rate` source ticks on the trigger cadence, each tick fans
out into one row per sampled metric via foreachBatch, appending through
the store's normal micro-batch path.  Use it when the sampler should be
a managed streaming query (checkpointed, observable in the UI) rather
than a thread.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession

from waddleml_spark.sysmetrics import sample_system_metrics


class RateSampler:
    def __init__(
        self,
        spark: SparkSession,
        store,
        run_id: str,
        interval_seconds: float = 5.0,
    ):
        self.spark = spark
        self.store = store
        self.run_id = run_id
        self.interval = interval_seconds
        self._step = 0
        self._query = None

    def start(self) -> None:
        src = (
            self.spark.readStream.format("rate")
            .option("rowsPerSecond", 1)
            .load()
        )

        def tick(df, epoch_id: int) -> None:
            # one sample per trigger regardless of accumulated rate rows
            if df.isEmpty():
                return
            metrics = sample_system_metrics()
            if not metrics:
                return
            ts = time.time()
            rows = [
                {
                    "run_id": self.run_id,
                    "key": k,
                    "step": self._step,
                    "ts": ts,
                    "value": float(v),
                }
                for k, v in metrics.items()
            ]
            self._step += 1
            self.store.append("metrics", rows)

        self._query = (
            src.writeStream.foreachBatch(tick)
            .trigger(processingTime=f"{self.interval} seconds")
            .option(
                "checkpointLocation",
                self.store.root + f"/_checkpoints/rate_sampler_{self.run_id}",
            )
            .start()
        )

    def stop(self) -> None:
        if self._query is not None:
            self._query.stop()
            self._query = None
