#!/usr/bin/env python
"""Measure the bucketed-layout answer to the one deliberate fact-fact
shuffle (SCALING.md: revenue_by_priority 100x = 28.4x).

The catalog docstring for revenue_by_priority promises "at scale both
sides should be bucketed by orderkey so this is a shuffle-free
sort-merge join"; tests/test_bucketed.py proves the ZERO-Exchange plan
on toy data.  This tool turns the claim into a measured number at the
100x replica: write the replica's lineitem/orders bucketed by orderkey
(sources/bucketed.write_bucketed — the one-time layout shuffle a 100 TB
fact table pays at ingest), then time the identical join+agg on

  - the plain parquet replica (both sides shuffle per query), vs
  - the bucketed tables (co-located: the planner drops both Exchanges),

asserting the bucketed executed plan really has no shuffle on the join
keys.  Prints ONE JSON line; SCALING.md records the result.

Usage:
    python tools/bucketed_study.py [--replica /tmp/scale100] [--factor 100]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import uuid
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_BUCKETS = 32


def revenue_query(li, o):
    """The revenue_by_priority shape on explicit frames — THE shared
    definition (catalog.revenue_join), so the study can never measure a
    shape that drifted from the certified catalog query."""
    from waddleml_spark.catalog import revenue_join

    return revenue_join(li, o)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replica", default="/tmp/scale100")
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--warehouse", default="/tmp/bucketed100")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    if SparkSession.getActiveSession() is not None:
        print("bucketed_study: refusing a pre-built session (warehouse "
              "conf must be set at startup)", file=sys.stderr)
        return 2

    from waddleml_spark.session import get_spark

    spark = get_spark(
        app_name="bucketed-study",
        shuffle_partitions=32,
        extra_conf={
            "spark.driver.memory": "100g",
            "spark.sql.warehouse.dir": args.warehouse,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # replica (reuses scale_gate's; built once, factor-checked)
    meta_p = Path(args.replica) / "_replica_meta.json"
    meta = None
    if meta_p.exists():
        try:
            meta = json.loads(meta_p.read_text())
        except ValueError:
            meta = None
    if meta is None or meta.get("factor") != args.factor:
        from scale_study import build_replica

        print(f"bucketed_study: building {args.factor}x replica at "
              f"{args.replica}", file=sys.stderr)
        build_replica(spark, args.base, args.replica, args.factor)
        meta = {
            "factor": args.factor,
            "base": args.base,
            "build_id": uuid.uuid4().hex,
        }
        meta_p.write_text(json.dumps(meta))
    elif "build_id" not in meta:
        # legacy replica meta predates build-id stamping: assign one now
        # (the data is unchanged) — any layout meta without a matching id
        # fails the completeness check below and is rewritten once.
        meta["build_id"] = uuid.uuid4().hex
        meta_p.write_text(json.dumps(meta))
    replica_build_id = meta["build_id"]

    from waddleml_spark.sources.bucketed import read_bucketed, write_bucketed

    # one-time layout write (the ingest-side cost a real deployment pays
    # once per fact table) — timed and reported, not hidden.  The
    # default in-memory catalog forgets saveAsTable metadata when the
    # session ends, but the bucketed FILES survive under the warehouse
    # dir — re-registering an external table over them (bucket spec in
    # the DDL) skips the ~85 s rewrite on every rerun.  Reuse is
    # FACTOR-GUARDED per table via a marker file (a --factor change or
    # replica rebuild must not time a stale layout), and recovery is
    # PER TABLE: a run interrupted between the two writes leaves one
    # complete table (reused) and one partial dir (cleared and
    # rewritten) — write-both-on-any-miss would CTAS onto the surviving
    # table's non-empty location and wedge every later run.
    import shutil

    li_plain = spark.read.parquet(f"{args.replica}/lineitem.parquet")
    o_plain = spark.read.parquet(f"{args.replica}/orders.parquet")

    def _ensure_table(table: str, df, keys: list[str]) -> bool:
        """Register the existing layout if complete and factor-matched,
        else clear and rewrite.  Returns True if a write happened."""
        loc = Path(args.warehouse) / table
        marker = loc / "_layout_meta.json"
        complete = (loc / "_SUCCESS").exists() and marker.exists()
        if complete:
            try:
                meta = json.loads(marker.read_text())
            except ValueError:
                meta = {}
            complete = (
                meta.get("factor") == args.factor
                and meta.get("replica") == args.replica
                # a replica rebuilt in place (same path + factor) gets a
                # fresh build_id, so a stale layout over new data cannot
                # pass the marker check
                and meta.get("build_id") == replica_build_id
            )
        if complete:
            if not spark.catalog.tableExists(table):
                cols = ", ".join(
                    f"`{f.name}` {f.dataType.simpleString()}"
                    for f in df.schema.fields
                )
                kl = ", ".join(keys)
                spark.sql(
                    f"CREATE TABLE {table} ({cols}) USING parquet "
                    f"CLUSTERED BY ({kl}) SORTED BY ({kl}) "
                    f"INTO {N_BUCKETS} BUCKETS LOCATION '{loc}'"
                )
            return False
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        if loc.exists():
            shutil.rmtree(loc)
        write_bucketed(df, table, keys, n_buckets=N_BUCKETS, sort_by=keys)
        marker.write_text(
            json.dumps({
                "factor": args.factor,
                "replica": args.replica,
                "build_id": replica_build_id,
            })
        )
        return True

    t0 = time.perf_counter()
    wrote_li = _ensure_table("li_b100", li_plain, ["l_orderkey"])
    wrote_o = _ensure_table("o_b100", o_plain, ["o_orderkey"])
    # layout_write_sec is the FULL two-table ingest cost; a one-table
    # recovery rewrite is a different (partial) number, so it is reported
    # only via the per-table flags and never as layout_write_sec —
    # SCALING.md must not record a half-layout time as the ingest cost.
    layout_sec = (
        round(time.perf_counter() - t0, 2) if (wrote_li and wrote_o) else None
    )

    li_b, o_b = read_bucketed(spark, "li_b100"), read_bucketed(spark, "o_b100")

    # plan assertion: the bucketed join must carry ZERO Exchange below
    # the join (i.e. no shuffle on the join keys).  Walk the actual
    # plan TREE rather than grepping the rendered string — with AQE the
    # pre-execution AdaptiveSparkPlan rendering and node naming
    # (AQEShuffleRead, ReusedExchange) make substring slicing unreliable,
    # so AQE is disabled for this shape check only (it cannot invent an
    # exchange; it can only hide one in the rendering).
    def _subtree(node):
        yield node
        ch = node.children()
        for i in range(ch.size()):
            yield from _subtree(ch.apply(i))

    def _join_subtree_exchange_free(df) -> bool:
        plan = df._jdf.queryExecution().executedPlan()
        for n in _subtree(plan):
            if "SortMergeJoin" in n.getClass().getSimpleName():
                return not any(
                    "ShuffleExchange" in m.getClass().getSimpleName()
                    for m in _subtree(n)
                )
        return False  # no SMJ at all: not the layout-proof plan

    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        zero_exchange_join = _join_subtree_exchange_free(
            revenue_query(li_b, o_b)
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
    if not zero_exchange_join:
        print("bucketed_study: join subtree still contains an Exchange",
              file=sys.stderr)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # INTERLEAVED min-of-5: this host's noisy-neighbor bursts are
    # bimodal (10-30 s swings in BOTH directions, measured r8) and do
    # NOT always show in /proc/stat steal — consecutive best-of-3 on
    # one arm can land entirely inside a burst and invert the verdict
    # (one run recorded plain 9.2 s vs bucketed 20.7 s; the interleaved
    # rerun minutes later: bucketed 2.6 s vs plain 9.2 s).  Alternating
    # arms pass-by-pass and taking each arm's min makes a single burst
    # hit both arms equally instead of one.
    force(revenue_query(li_plain, o_plain))  # warm both
    force(revenue_query(li_b, o_b))
    plain_sec = bucketed_sec = float("inf")
    for _ in range(5):
        t = time.perf_counter()
        force(revenue_query(li_plain, o_plain))
        plain_sec = min(plain_sec, time.perf_counter() - t)
        t = time.perf_counter()
        force(revenue_query(li_b, o_b))
        bucketed_sec = min(bucketed_sec, time.perf_counter() - t)
    plain_sec, bucketed_sec = round(plain_sec, 2), round(bucketed_sec, 2)

    # sanity: same groups/counts exactly; revenue within relative
    # tolerance.  The two layouts aggregate ~12M doubles per group in
    # different orders at 100x, and summation-order error (~sqrt(n)·ulp
    # of a ~1e11 sum) can legitimately cross the 2-digit floor-rounding
    # grain — an exact compare would flake on a correct run.  Exactness
    # vs the oracle is the driver gate's job at sf0.01; this check only
    # guards against a wrong-plan blunder (missing rows, wrong join).
    def rows(df):
        return {
            r.o_orderpriority: (r.n_items, r.revenue) for r in df.collect()
        }

    pa, pb = rows(revenue_query(li_plain, o_plain)), rows(revenue_query(li_b, o_b))
    results_match = set(pa) == set(pb) and all(
        pa[k][0] == pb[k][0]
        and abs(pa[k][1] - pb[k][1]) <= 1e-9 * max(abs(pa[k][1]), 1.0)
        for k in pa
    )
    print(json.dumps({
        "study": "bucketed_join_100x",
        "factor": args.factor,
        "n_buckets": N_BUCKETS,
        "layout_write_sec": layout_sec,
        "wrote_li": wrote_li,
        "wrote_o": wrote_o,
        "plain_sec": plain_sec,
        "bucketed_sec": bucketed_sec,
        "speedup_x": round(plain_sec / bucketed_sec, 2) if bucketed_sec else None,
        "zero_exchange_join": zero_exchange_join,
        "results_match": results_match,
    }))
    spark.stop()
    return 0 if (zero_exchange_join and results_match) else 1


if __name__ == "__main__":
    sys.exit(main())
