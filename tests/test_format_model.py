"""Model-based randomized walks over the two table formats.

A seeded random sequence of append / overwrite / checkpoint / read /
vacuum ops runs against the real implementation (snaptable, deltalog)
and an in-memory model (version -> expected row multiset); after every
op the latest snapshot — and a randomly chosen still-readable
historical version — must match the model exactly.  The walk shape is
what unit tests miss: interleavings like append→overwrite→checkpoint→
append→vacuum→read(old) where state machines usually crack.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from waddleml_spark.sources import deltalog as dl
from waddleml_spark.sources import snaptable as st

SCHEMA = "id long, tag string"


def _batch(spark, rng, lo):
    n = rng.randint(1, 6)
    tag = f"t{rng.randint(0, 4)}"
    rows = [(lo + i, tag) for i in range(n)]
    return spark.createDataFrame(rows, SCHEMA), set(rows)


def _collect(df):
    return {(r.id, r.tag) for r in df.collect()}


class _SnapAdapter:
    first_version = 1

    def __init__(self, tbl):
        self.tbl = tbl

    def write(self, df, mode):
        return st.write(df, self.tbl, mode=mode)

    def read(self, spark, version=None):
        return st.read(spark, self.tbl, version=version)

    def checkpoint(self):
        return None  # snaptable manifests are already self-contained

    def vacuum(self):
        st.vacuum(self.tbl, keep_versions=1, retain_minutes=0)


class _DeltaAdapter:
    first_version = 0

    def __init__(self, tbl):
        self.tbl = tbl

    def write(self, df, mode):
        return dl.write_delta(df, self.tbl, mode=mode)

    def read(self, spark, version=None):
        return dl.read_delta(spark, self.tbl, version=version)

    def checkpoint(self):
        return dl.create_checkpoint(self.tbl)

    def vacuum(self):
        dl.vacuum(self.tbl, retain_minutes=0)


@pytest.mark.parametrize("fmt", ["snaptable", "delta"])
@pytest.mark.parametrize("seed", [11, 23])
def test_random_walk_matches_model(spark, tmp_path, fmt, seed):
    rng = random.Random(seed)
    adapter = (_SnapAdapter if fmt == "snaptable" else _DeltaAdapter)(
        str(tmp_path / f"{fmt}-{seed}")
    )
    model: dict[int, set] = {}  # version -> expected rows
    readable_from = adapter.first_version
    next_id = 0

    df, rows = _batch(spark, rng, next_id)
    next_id += 100
    v = adapter.write(df, "append")
    model[v] = rows

    for _ in range(10):
        op = rng.choice(["append", "append", "overwrite", "checkpoint", "vacuum"])
        cur = max(model)
        if op == "append":
            df, rows = _batch(spark, rng, next_id)
            next_id += 100
            v = adapter.write(df, "append")
            model[v] = model[cur] | rows
        elif op == "overwrite":
            df, rows = _batch(spark, rng, next_id)
            next_id += 100
            v = adapter.write(df, "overwrite")
            model[v] = rows
        elif op == "checkpoint":
            adapter.checkpoint()
        elif op == "vacuum":
            adapter.vacuum()
            readable_from = max(model)
        cur = max(model)
        assert _collect(adapter.read(spark)) == model[cur]
        historical = [
            h for h in model if readable_from <= h <= cur
        ]
        h = rng.choice(historical)
        assert _collect(adapter.read(spark, version=h)) == model[h], (
            f"{fmt} seed={seed}: version {h} diverged after {op}"
        )
