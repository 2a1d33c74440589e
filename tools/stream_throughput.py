#!/usr/bin/env python
"""Streaming sink throughput: rate source → snapshot_sink end to end.

Measures committed rows/sec and batches/sec of the SnapTable streaming
sink (streaming/snapsink.py) at increasing source rates — the streaming
analog of scale_study.py.  Each run streams for --secs wall seconds with
a 500 ms trigger, then reports what actually LANDED (committed versions
and their row counts from the table manifests, not source-side claims).

Usage: python tools/stream_throughput.py [--rates 1000,10000,100000]
                                         [--secs 20]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from waddleml_spark.session import get_spark  # noqa: E402
from waddleml_spark.sources import snaptable as st  # noqa: E402
from waddleml_spark.streaming import snapsink  # noqa: E402


def run_rate(spark, rows_per_sec: int, secs: float) -> dict:
    tmp = tempfile.mkdtemp(prefix="stream_tp_")
    tbl = f"{tmp}/t"
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .option("numPartitions", 8)
        .load()
        .select("value")
    )
    q = (
        stream.writeStream.foreachBatch(snapsink.snapshot_sink(tbl))
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    t0 = time.time()
    try:
        time.sleep(secs)
    finally:
        q.stop()
        q.awaitTermination(60)
    wall = time.time() - t0
    versions = st.current_version(tbl)
    rows = st.read(spark, tbl).count() if versions else 0
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "rate_rows_s": rows_per_sec,
        "wall_s": round(wall, 1),
        "versions": versions,
        "rows_committed": rows,
        "committed_rows_s": round(rows / wall, 1),
        "batches_s": round(versions / wall, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rates", default="1000,10000,100000")
    ap.add_argument("--secs", type=float, default=20.0)
    args = ap.parse_args()
    spark = get_spark(app_name="stream-throughput", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    out = [run_rate(spark, int(r), args.secs) for r in args.rates.split(",")]
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
