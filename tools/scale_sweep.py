#!/usr/bin/env python
"""Full-catalog 100× coverage sweep — every query runs at scale once.

Why (round 11): winnowing_overlap_pairs hid a per-doc QUADRATIC for two
rounds because only oracle-paired and watch-listed queries ever took the
100× gate.  This tool closes the coverage hole by construction: it
enumerates EVERY catalog query, subtracts the ones SCALING.md already
carries a measured row for (--skip), and runs the rest once each against
the 100× replica under the same bounded driver heap as scale_gate —
so a scale-killer in ANY catalog path surfaces as a slow row, an OOM,
or a timeout here, by command rather than by accident.

Usage:
    python tools/scale_sweep.py                    # all not-yet-measured
    python tools/scale_sweep.py --queries a,b,c    # explicit set
    python tools/scale_sweep.py --out-json /tmp/sweep.json

Output: one JSON line per query on stdout ({"q": ..., "wall_sec": ...,
"err": ...}) plus a final summary line with the steal fraction of the
whole window; --out-json also collects everything into one file.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


from bench import _cpu_ticks as _steal  # noqa: E402 — one shared steal reader


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/scale100")
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--budget-gb", type=int, default=100)
    ap.add_argument("--queries", default="",
                    help="comma list; default = every catalog query "
                         "not already named in SCALING.md")
    ap.add_argument("--out-json", default="")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    if SparkSession.getActiveSession() is not None:
        print("scale_sweep: refusing a pre-built session (heap bound "
              "would not apply)", file=sys.stderr)
        return 2

    from waddleml_spark.session import get_spark

    spark = get_spark(
        app_name="scale-sweep",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": f"{args.budget_gb}g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from scale_study import build_replica

    from waddleml_spark import catalog

    if args.queries:
        names = args.queries.split(",")
    else:
        scaling = (Path(__file__).resolve().parent.parent / "SCALING.md")
        text = scaling.read_text() if scaling.exists() else ""

        # "already measured" must mean a RECORDED MEASUREMENT, not any
        # substring hit (r11 review find: a prose mention, or a longer
        # name containing this one, would silently re-open the exact
        # unmeasured-at-100x hole this tool closes by construction).
        # A query counts as measured only as a markdown table CELL
        # (| name |) or as a backticked `name` in a sweep paragraph.
        import re

        paras = text.split("\n\n")

        def measured(n: str) -> bool:
            if re.search(rf"\|\s*{re.escape(n)}\s*\|", text):
                return True  # a markdown table cell IS a recorded row
            # prose measurement: the backticked name inside a paragraph
            # that states a sweep wall (paragraph-bounded so a bare
            # mention in commentary elsewhere doesn't count)
            tick = f"`{n}`"
            return any(
                tick in p and ("swept" in p or "s cold" in p)
                for p in paras
            )

        names = sorted(n for n in catalog.QUERIES if not measured(n))
    unknown = set(names) - set(catalog.QUERIES)
    if unknown:
        print(f"scale_sweep: unknown queries {sorted(unknown)}",
              file=sys.stderr)
        return 2

    meta_p = Path(args.out) / "_replica_meta.json"
    meta = None
    if meta_p.exists():
        try:
            meta = json.loads(meta_p.read_text())
        except ValueError:
            meta = None
    if meta is None or meta.get("factor") != args.factor or meta.get(
        "base"
    ) != args.base:
        print(f"scale_sweep: building {args.factor}x replica at "
              f"{args.out}", file=sys.stderr)
        build_replica(spark, args.base, args.out, args.factor)
        meta_p.write_text(
            json.dumps({"factor": args.factor, "base": args.base})
        )

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    rows = []
    ok = True
    s0, c0 = _steal()
    for n in names:
        t0 = time.perf_counter()
        err = None
        try:
            force(catalog.QUERIES[n](spark, args.out))
        except Exception as e:  # OOM / analysis failures surface here
            ok = False
            err = f"{type(e).__name__}: {str(e)[:200]}"
        rec = {
            "q": n,
            "wall_sec": round(time.perf_counter() - t0, 2),
            "err": err,
        }
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    s1, c1 = _steal()
    summary = {
        "factor": args.factor,
        "n_queries": len(names),
        "n_failed": sum(1 for r in rows if r["err"]),
        "steal_pct": round(100.0 * (s1 - s0) / max(1, c1 - c0), 2),
        "total_wall_sec": round(sum(r["wall_sec"] for r in rows), 1),
    }
    print(json.dumps(summary), flush=True)
    if args.out_json:
        Path(args.out_json).write_text(
            json.dumps({"summary": summary, "rows": rows}, indent=1)
        )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
