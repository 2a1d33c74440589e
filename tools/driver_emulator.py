#!/usr/bin/env python
"""Emulate the driver's correctness gate locally, BEFORE the driver runs.

Runs every _DRIVER_WINDOW query at sf0.01 under a BARE SparkSession (the
driver builds its own session with no repo configs — read_table must be
self-sufficient), compares against the DuckDB oracle with the strictest
plausible semantics:

- row count,
- column-name sets,
- order-insensitive exact value equality,
- and TYPE compatibility per column (the round-3 lesson: DuckDB HUGEINT vs
  Spark BIGINT hash-mismatches even when every value is equal).

Usage:  python tools/driver_emulator.py [names ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.01"

_TYPE_FAMILY = {
    "bigint": "int", "int": "int", "integer": "int", "smallint": "int",
    "tinyint": "int", "hugeint": "int128", "int128": "int128",
    "double": "float", "float": "float", "real": "float",
    "decimal": "decimal",
}


def family(t: str) -> str:
    t = str(t).lower()
    for k, v in _TYPE_FAMILY.items():
        if t.startswith(k):
            return v
    return t


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    from waddleml_spark.testing import compare, duckdb_conn

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-emulator")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_conn(SF_DIR)

    targets = sys.argv[1:] or list(e._DRIVER_WINDOW)
    q, o = e.queries(), e.oracle_sql()
    failed = []
    for name in targets:
        try:
            df = q[name](spark, SF_DIR)
            ok, msg = compare(df, con, o[name], name=name)
            # type family check: spark dtype vs duckdb relation type
            rel = con.sql(o[name])
            duck_types = {c: family(t) for c, t in zip(rel.columns, rel.types)}
            spark_types = {c: family(t) for c, t in df.dtypes}
            mismatch = {
                c: (spark_types[c], duck_types[c])
                for c in duck_types
                if c in spark_types
                and {spark_types[c], duck_types[c]} & {"int128", "decimal"}
                and spark_types[c] != duck_types[c]
            }
            if mismatch:
                ok, msg = False, f"{name}: TYPE mismatch {mismatch}"
        except Exception as ex:  # noqa: BLE001
            ok, msg = False, f"{name}: ERROR {ex}"
        status = "ok " if ok else "FAIL"
        print(f"{status} {msg if not ok else name}")
        if not ok:
            failed.append(name)
    print(f"\n{len(targets) - len(failed)}/{len(targets)} green")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
