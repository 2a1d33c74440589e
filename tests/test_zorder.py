"""Z-order layout: Morton key correctness + multi-column file skipping."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from waddleml_spark.sources import snaptable as st
from waddleml_spark.sources import zorder


def test_morton_key_interleaves_bits(spark):
    # bits=2, 2 cols, bounds [0,3]: cell == value; col 0's bits land at
    # even key positions, col 1's at odd.
    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (3, 3), (2, 1)], "a int, b int"
    )
    key = zorder.morton_key(["a", "b"], {"a": (0, 3), "b": (0, 3)}, bits=2)
    got = {(r["a"], r["b"]): r["k"] for r in df.select("a", "b", key.alias("k")).collect()}
    assert got[(0, 0)] == 0
    assert got[(3, 0)] == 0b0101  # a bits at positions 0 and 2
    assert got[(0, 3)] == 0b1010  # b bits at positions 1 and 3
    assert got[(3, 3)] == 0b1111
    assert got[(2, 1)] == 0b0110  # a=10 -> bit2=1... a:pos{0,2}=0,1  b=01 -> pos{1,3}=1,0


def test_morton_key_validates_args(spark):
    with pytest.raises(ValueError, match=">= 2"):
        zorder.morton_key(["a"], {"a": (0, 1)})
    with pytest.raises(ValueError, match="exceeds"):
        zorder.morton_key(["a", "b", "c"], {}, bits=21)


def test_nulls_and_outliers_clamp_not_crash(spark):
    df = spark.createDataFrame([(None, 5), (10**9, -5)], "a long, b long")
    key = zorder.morton_key(["a", "b"], {"a": (0, 100), "b": (0, 100)}, bits=4)
    vals = [r[0] for r in df.select(key).collect()]
    assert all(v is not None and 0 <= v < 256 for v in vals)


def test_zorder_layout_skips_files_on_both_columns(spark, tmp_path):
    # 4k rows over two INDEPENDENT uniform dims; a plain x-sort gives
    # tight x ranges but every file spans all of y. The z-order layout
    # must prune files for narrow predicates on EITHER column.
    n = 4096
    df = (
        spark.range(n)
        .select(
            F.col("id"),
            (F.col("id") * 2654435761 % n).alias("x"),
            (F.col("id") * 40503 % n).alias("y"),
        )
    )
    ztbl, xtbl = str(tmp_path / "z"), str(tmp_path / "x")
    st.write(zorder.zorder_layout(df, ["x", "y"], n_files=16, bits=8), ztbl)
    st.write(df.repartitionByRange(16, "x").sortWithinPartitions("x"), xtbl)
    zfiles, xfiles = st.file_list(ztbl), st.file_list(xtbl)
    assert len(zfiles) == 16 and len(xfiles) == 16

    lo, hi = n // 2, n // 2 + n // 16  # a 1/16th slice of the domain
    for col in ("x", "y"):
        kept_z = st._prune(zfiles, col, lo, hi)
        assert len(kept_z) < 16, f"z-order failed to skip any file on {col}"
    # the single-column sort only skips on its sort key
    assert len(st._prune(xfiles, "x", lo, hi)) <= 2
    assert len(st._prune(xfiles, "y", lo, hi)) == 16

    # pruned reads still return exactly the right rows
    got = (
        st.read(spark, ztbl, prune=("y", lo, hi))
        .filter(F.col("y").between(lo, hi))
        .count()
    )
    want = df.filter(F.col("y").between(lo, hi)).count()
    assert got == want
