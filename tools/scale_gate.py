#!/usr/bin/env python
"""One-command 100× memory/scale smoke — the round checklist gate.

A 100× run is a MEMORY test as much as a throughput test: the round-5
apply_bpe OOM (pinned localCheckpoint blocks + an unconditional
broadcast hint) passed every per-query isolation test and only fell
over in a SEQUENCED warm session, where unevictable blocks accumulate
across queries.  This gate reproduces that failure mode on demand: one
warm session, a bounded driver heap, the worst-scaling queries from
SCALING.md run back-to-back TWICE (the second pass is the one that
meets the first pass's leftover cache blocks), failing non-zero on any
error — so regressions of the pinned-block / unbounded-collect class
are caught by command, not by accident.

Usage:
    python tools/scale_gate.py                      # defaults below
    python tools/scale_gate.py --factor 100 --budget-gb 100
    python tools/scale_gate.py --queries a,b,c      # override the set

The replica at --out is built once (scale_study.build_replica,
deterministic — bit-stable rebuilds) and reused afterwards.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# the standing worst-ratio set (SCALING.md 100× table): a deliberate
# fact-fact shuffle, the heaviest text pipeline, the two-pass BPE
# encode whose checkpoint OOM motivated this gate, the sketch
# audit that carries full per-doc shingle SETS through two hydration
# joins (the row-width class the warm pass has twice caught OOMs in),
# and the r8 containment op whose two gram-grain count windows sort
# the full gram table twice (the only windowed occurrence-grain plan)
DEFAULT_QUERIES = [
    "revenue_by_priority",
    "bloom_decontamination_report",
    "bpe_encode_report",
    "minhash_estimate_audit",
    "doc_containment_pairs",
    # r9: worst new-operator 100x ratio (4.6x) — two occurrence-grain
    # passes (bucket counts + the scoring join back to occurrences)
    "dsir_importance_by_source",
    # r11 sweep: the catalog's worst absolute 100x wall (was 516 s on
    # a hard-coded 8-cell IVF; adaptive cells cut it to ~200 s, most
    # of it the KMeans fit) — watched so the cell sizing never
    # regresses to a fixed blocking key
    "semantic_dedup_report",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/scale100")
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument(
        "--budget-gb",
        type=int,
        default=100,
        help="driver heap bound (local mode: driver IS the executor)",
    )
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    args = ap.parse_args()

    # memory bound must be set BEFORE the JVM starts — so configure it
    # here instead of reusing a session something else may have built
    from pyspark.sql import SparkSession

    if SparkSession.getActiveSession() is not None:
        print("scale_gate: refusing to run in a pre-built session "
              "(the heap bound would not apply)", file=sys.stderr)
        return 2

    from waddleml_spark.session import get_spark

    spark = get_spark(
        app_name="scale-gate",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": f"{args.budget_gb}g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from waddleml_spark import catalog
    from scale_study import build_replica

    names = args.queries.split(",")
    unknown = set(names) - set(catalog.QUERIES)
    if unknown:
        print(f"scale_gate: unknown queries {sorted(unknown)}", file=sys.stderr)
        return 2

    # replica reuse must be FACTOR-checked: a wrong-factor or
    # partially-built replica silently reused would print a green
    # {"factor": 100} verdict that never exercised 100x.  The meta file
    # is written LAST, so a crashed build (meta absent) rebuilds too.
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
        print(f"scale_gate: building {args.factor}x replica at {args.out} "
              "(one-time; deterministic)", file=sys.stderr)
        build_replica(spark, args.base, args.out, args.factor)
        meta_p.write_text(json.dumps({"factor": args.factor, "base": args.base}))

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    results: dict[str, list[float | None]] = {n: [] for n in names}
    ok = True
    for pass_i in (1, 2):  # pass 2 runs against pass 1's leftover caches
        for n in names:
            t0 = time.perf_counter()
            try:
                force(catalog.QUERIES[n](spark, args.out))
                results[n].append(round(time.perf_counter() - t0, 2))
            except Exception as e:  # OOM class surfaces here
                ok = False
                # None -> JSON null; float('nan') would print a bare
                # NaN literal, which is INVALID JSON exactly on the
                # failure path the gate exists to report
                results[n].append(None)
                print(f"scale_gate FAIL pass {pass_i} {n}: {e}",
                      file=sys.stderr)

    # Bloom one-sided-error invariant AT SCALE (round-6 verdict item):
    # the no-false-negative guarantee (n_flagged >= n_contaminated per
    # source) was only ever asserted at pytest scale, where the bitset
    # is nearly empty; 100x is where it is actually loaded.  The collect
    # is per-source (bounded: tens of rows).
    bloom_audit = None
    if "bloom_decontamination_report" in names:
        try:
            rows = catalog.QUERIES["bloom_decontamination_report"](
                spark, args.out
            ).collect()
            viol = [
                r.source for r in rows if r.n_flagged < r.n_contaminated
            ]
            flagged = sum(r.n_flagged for r in rows)
            exact = sum(r.n_contaminated for r in rows)
            bloom_audit = {
                "sources": len(rows),
                "n_flagged": flagged,
                "n_contaminated": exact,
                "false_negative_sources": viol,
            }
            if viol:
                ok = False
                print(f"scale_gate FAIL bloom audit: n_flagged < "
                      f"n_contaminated in {viol}", file=sys.stderr)
        except Exception as e:
            ok = False
            print(f"scale_gate FAIL bloom audit: {e}", file=sys.stderr)

    print(json.dumps({
        "gate": "scale100",
        "factor": args.factor,
        "budget_gb": args.budget_gb,
        "passes": results,
        "bloom_audit": bloom_audit,
        "ok": ok,
    }))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
