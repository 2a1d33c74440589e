#!/usr/bin/env python
"""Spark-vs-DuckDB per-query timing at the same scale factor.

The reference engine IS DuckDB (it embeds it for every query —
/root/reference/waddle/_db.py:12), so DuckDB wall time on the same
parquet at the same SF is the reference's single-node throughput for
each query shape.  This harness times every oracle-paired catalog query
in both engines (warm, best-of-two, full materialization) and writes
BENCH_VS_ORACLE.md.

Usage: python bench_vs_oracle.py [--sf-dir /root/testdata/sf0.1]

Caveats recorded in the output: single-process local[|cpus|] Spark pays
JVM task-scheduling overhead per stage that a real cluster amortizes;
DuckDB numbers are its vectorized single-node best.  The honest claim is
the ratio column, not any absolute number.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import duckdb  # noqa: E402

from bench import _cpu_ticks  # noqa: E402 — ONE steal reader for all artifacts
from waddleml_spark import catalog  # noqa: E402
from waddleml_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--out", default="BENCH_VS_ORACLE.md")
    args = ap.parse_args()
    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # Production session config (AQE ON — the shipped default): the
    # LSH-fed verifiers hydrate pairs through joins whose keys are
    # skewed (one doc -> many pairs), and AQE's skew-join splitting is
    # worth ~2x there (measured: jaccard_verify_lsh 10s -> 5s at sf0.1).
    # SPARK_GRAFT_AQE=0 reproduces the old static-plan numbers.  NOTE:
    # bench.py defaults AQE OFF when the env is unset (its measured
    # headline optimum); explicit =0/=1 means off/on in BOTH tools —
    # set it when comparing numbers across the two benches.
    spark = get_spark(
        app_name="waddleml-bench-vs-oracle",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8")),
        extra_conf={
            "spark.sql.adaptive.enabled": (
                "false" if os.environ.get("SPARK_GRAFT_AQE") == "0" else "true"
            )
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for n in TABLES:
        con.execute(
            f"CREATE VIEW {n} AS SELECT * FROM read_parquet('{args.sf_dir}/{n}.parquet')"
        )

    names = sorted(catalog.ORACLE)
    rows = []
    # Queries slower than this on their FIRST pass get ONE extra timed
    # pass (min of the two): a first execution can be inflated several
    # seconds by plan compilation + C2 JIT, and recording it cold
    # penalizes whichever query pays it.  Past very_slow_cutoff the
    # first pass stands — re-warming a minutes-long query measures
    # nothing new.
    slow_cutoff = float(os.environ.get("SPARK_GRAFT_SLOW_CUTOFF", "5.0"))
    very_slow_cutoff = float(os.environ.get("SPARK_GRAFT_VERY_SLOW_CUTOFF", "30.0"))
    # Session warmup so the alphabetically-first query doesn't absorb
    # executor/codegen startup (~5 s) into its own number.
    force(catalog.QUERIES[names[0]](spark, args.sf_dir))

    # steal/window self-adjudication (the bench.py r11 rule): the run's
    # own /proc/stat steal fraction (bench._cpu_ticks — one shared
    # reader across all three bench artifacts) is written into the
    # artifact, and DuckDB's total doubles as a HOST-SPEED CONTROL —
    # the same SQL on the same engine and data moves only with the
    # machine, so a run whose duckdb total sits far above the best
    # recorded one is a slow window, not a Spark change.
    _s0, _c0 = _cpu_ticks()
    for name in names:
        q = catalog.QUERIES[name]
        sql = catalog.ORACLE[name]
        t0 = time.perf_counter()
        force(q(spark, args.sf_dir))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        td = time.perf_counter() - t0
        first_pass_max = max(ts, td)
        if slow_cutoff <= first_pass_max < very_slow_cutoff:
            t0 = time.perf_counter()
            force(q(spark, args.sf_dir))
            ts = min(ts, time.perf_counter() - t0)
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            td = min(td, time.perf_counter() - t0)
        # branch on the ORIGINAL first-pass numbers: a slow-branch query
        # whose re-time warmed below the cutoff must not also run the
        # three-pass warm branch (it already got its extra pass)
        if first_pass_max < slow_cutoff:
            # warm, then best-of-two (first pass above was the warmup)
            force(q(spark, args.sf_dir))
            con.execute(sql).fetchall()
            ts, td = 9e9, 9e9
            for _ in range(2):
                t0 = time.perf_counter()
                force(q(spark, args.sf_dir))
                ts = min(ts, time.perf_counter() - t0)
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                td = min(td, time.perf_counter() - t0)
        rows.append((name, round(ts, 3), round(td, 3)))
        print(f"{name:36s} spark={ts:7.3f}s duckdb={td:7.3f}s", file=sys.stderr)

    total_s = round(sum(r[1] for r in rows), 3)
    total_d = round(sum(r[2] for r in rows), 3)
    _s1, _c1 = _cpu_ticks()
    steal_pct = round(100.0 * (_s1 - _s0) / max(1, _c1 - _c0), 2)
    with open(args.out, "w") as f:
        f.write(
            "# BENCH_VS_ORACLE — Spark vs DuckDB per-query wall time\n\n"
            f"sf={sf} (`{args.sf_dir}`), warm best-of-two, full materialization\n"
            "(Spark: noop sink; DuckDB: fetchall).  DuckDB is the engine the\n"
            "reference embeds for every query, so its column is the reference's\n"
            "single-node throughput on identical parquet.  Spark runs one local\n"
            "JVM and pays per-stage scheduling overhead a cluster amortizes —\n"
            "compare ratios, not absolutes; the design target is the 100 TB\n"
            "plan shape (see PLANS.md), which DuckDB cannot scale to.\n"
            "Queries that persist a shared sub-frame serve repeat passes\n"
            "from that cache (Spark dedupes persist() by canonical plan),\n"
            "so their number is the steady-state serving cost; the\n"
            "first-invocation build cost is what SCALING.md measures.\n\n"
            f"**Totals: spark {total_s}s, duckdb {total_d}s, "
            f"{len(rows)} oracle-paired queries "
            f"(window: {steal_pct}% steal — read the duckdb total as "
            "the host-speed control: it moves only with the machine).**\n\n"
            "| query | spark s | duckdb s | spark/duckdb |\n|---|---|---|---|\n"
        )
        for name, ts, td in rows:
            ratio = round(ts / td, 1) if td > 0 else float("inf")
            f.write(f"| {name} | {ts} | {td} | {ratio} |\n")
    print(
        json.dumps(
            {
                "metric": "spark_vs_duckdb_total_sec",
                "spark": total_s,
                "duckdb": total_d,
                "n_queries": len(rows),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
