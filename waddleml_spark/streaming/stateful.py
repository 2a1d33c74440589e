"""Custom stateful streaming operator: incremental per-(run,key) metric
statistics via applyInPandasWithState (SURVEY.md §2.10 extension — the
reference has no stateful streaming at all; this is the engine's scale
path for live leaderboards/summaries that must not rescan history).

State per group: (count, sum, min, max, last_step, last_value).  Each
micro-batch updates state in O(batch) and emits one refreshed summary row
per touched group — downstream sinks (dashboard, DuckDB rollup table) get
an always-current metric summary without re-aggregating the append log.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from waddleml_spark import schemas
from waddleml_spark.store import WaddleStore

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_v", T.DoubleType()),
        T.StructField("min_v", T.DoubleType()),
        T.StructField("max_v", T.DoubleType()),
        T.StructField("last_step", T.IntegerType()),
        T.StructField("last_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("sum_v", T.DoubleType()),
        T.StructField("min_v", T.DoubleType()),
        T.StructField("max_v", T.DoubleType()),
        T.StructField("last_step", T.IntegerType()),
        T.StructField("last_value", T.DoubleType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, sum_v, min_v, max_v, last_step, last_value = state.get
    else:
        n, sum_v, min_v, max_v, last_step, last_value = 0, 0.0, None, None, -1, None
    for pdf in pdfs:
        if pdf.empty:
            continue
        # NaN is a legal logged value (loss=nan): pandas sum/min/max
        # SKIP NaN while len() counts it, so the naive form produced an
        # internally inconsistent summary and one all-NaN batch poisoned
        # min/max forever via Python min(NaN, x) (round-6 review find).
        # Stats summarize the NON-NaN values; n counts them; last_value
        # stays the literal latest logged value, NaN included.
        vals = pdf["value"].astype(float)
        vals = vals[vals.notna()]
        n += int(vals.size)
        if vals.size:
            sum_v += float(vals.sum())
            bmin, bmax = float(vals.min()), float(vals.max())
            min_v = bmin if min_v is None else min(min_v, bmin)
            max_v = bmax if max_v is None else max(max_v, bmax)
        # latest by step: the run's step counter is monotonic
        top = pdf.loc[pdf["step"].astype(int).idxmax()]
        if int(top["step"]) >= last_step:
            last_step = int(top["step"])
            last_value = float(top["value"])
    state.update((n, sum_v, min_v, max_v, last_step, last_value))
    yield pd.DataFrame(
        [
            {
                "run_id": key[0],
                "key": key[1],
                "n": n,
                "sum_v": sum_v,
                "min_v": min_v,
                "max_v": max_v,
                "last_step": last_step,
                "last_value": last_value,
            }
        ]
    )


ROLLUP_DDL = """
CREATE TABLE IF NOT EXISTS metric_rollup (
    run_id VARCHAR NOT NULL, key VARCHAR NOT NULL, n BIGINT,
    sum_v DOUBLE, min_v DOUBLE, max_v DOUBLE,
    last_step INTEGER, last_value DOUBLE,
    PRIMARY KEY (run_id, key));
"""


def start_rollup_sink(store: WaddleStore, trigger_seconds: float = 2.0):
    """Materialize the stateful summaries into a DuckDB `metric_rollup`
    table (upsert per micro-batch): the dashboard's live leaderboard reads
    a tiny always-current table instead of aggregating the append log.
    Returns the StreamingQuery (caller stops it)."""
    with store._duck_lock:
        store.duck.execute(ROLLUP_DDL)

    def sink(df: DataFrame, epoch_id: int) -> None:
        pdf = df.toPandas()
        if pdf.empty:
            return
        with store._duck_lock:
            store.duck.register("_rollup_batch", pdf)
            store.duck.execute(
                "INSERT INTO metric_rollup SELECT * FROM _rollup_batch "
                "ON CONFLICT (run_id, key) DO UPDATE SET n=EXCLUDED.n, "
                "sum_v=EXCLUDED.sum_v, min_v=EXCLUDED.min_v, "
                "max_v=EXCLUDED.max_v, last_step=EXCLUDED.last_step, "
                "last_value=EXCLUDED.last_value"
            )
            store.duck.unregister("_rollup_batch")

    agg = running_metric_summary(store)
    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(sink)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .option(
            "checkpointLocation", store.root + "/_checkpoints/rollup_sink"
        )
        .start()
    )


def running_metric_summary(store: WaddleStore) -> DataFrame:
    """Streaming DataFrame of incrementally-maintained per-(run_id, key)
    summaries over the metrics append log.  Attach a sink (memory for
    tests; foreachBatch→DuckDB for a live rollup table)."""
    from waddleml_spark.session import ensure_shipped

    spark = store.spark
    ensure_shipped(spark)
    src = spark.readStream.schema(schemas.METRICS).parquet(store._dir("metrics"))
    return src.groupBy("run_id", "key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_metric_summary_tws(store: WaddleStore) -> DataFrame:
    """The running per-(run,key) summary on Spark 4's transformWithState
    API — the successor of applyInPandasWithState used by
    running_metric_summary.  Differences that matter at scale: named,
    TYPED state slots (ValueState here; List/MapState available for
    richer operators), per-key timers, and the RocksDB state store —
    state no longer lives on the JVM heap, so a million live (run, key)
    groups is a disk/block-cache problem, not a GC problem.

    Same semantics as the applyInPandasWithState twin:
    state O(groups), updates O(batch), one refreshed row per touched
    group per micro-batch.

    Environment gate: the TWS worker protocol imports google.protobuf at
    runtime; containers without it fail at stream start (the test skips
    there).  running_metric_summary (applyInPandasWithState) is the
    dependency-free fallback with identical output.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    # The TWS driver worker is a separate long-lived Python process that
    # does NOT see sys.path additions or addPyFile archives — the
    # processor must pickle BY VALUE: class defined in this closure, no
    # references to module globals (schema rebuilt locally, pandas
    # imported inside the method).
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("sum_v", T.DoubleType()),
            T.StructField("min_v", T.DoubleType()),
            T.StructField("max_v", T.DoubleType()),
            T.StructField("last_step", T.IntegerType()),
            T.StructField("last_value", T.DoubleType()),
        ]
    )

    class RunningSummary(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd  # worker-local import (see pickling note)

            if self._agg.exists():
                n, sum_v, min_v, max_v, last_step, last_value = self._agg.get()
            else:
                n, sum_v, min_v, max_v, last_step, last_value = (
                    0, 0.0, None, None, -1, None,
                )
            for pdf in rows:
                if pdf.empty:
                    continue
                # NaN handling mirrors _update (see comment there)
                vals = pdf["value"].astype(float)
                vals = vals[vals.notna()]
                n += int(vals.size)
                if vals.size:
                    sum_v += float(vals.sum())
                    bmin, bmax = float(vals.min()), float(vals.max())
                    min_v = bmin if min_v is None else min(min_v, bmin)
                    max_v = bmax if max_v is None else max(max_v, bmax)
                top = pdf.loc[pdf["step"].astype(int).idxmax()]
                if int(top["step"]) >= last_step:
                    last_step = int(top["step"])
                    last_value = float(top["value"])
            self._agg.update((n, sum_v, min_v, max_v, last_step, last_value))
            run_id, metric_key = key
            yield pd.DataFrame(
                {
                    "run_id": [run_id],
                    "key": [metric_key],
                    "n": [n],
                    "sum_v": [sum_v],
                    "min_v": [min_v],
                    "max_v": [max_v],
                    "last_step": [last_step],
                    "last_value": [last_value],
                }
            )

        def close(self) -> None:
            pass

    spark = store.spark
    src = spark.readStream.schema(schemas.METRICS).parquet(store._dir("metrics"))
    return (
        src.select("run_id", "key", "step", "value")
        .groupBy("run_id", "key")
        .transformWithStateInPandas(
            RunningSummary(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
