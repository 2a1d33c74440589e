"""Mergeable sketches: pre-aggregated distinct counts over arbitrary
ranges (Apache DataSketches HLL, built into Spark).

The 100 TB pattern this enables: a plain `approx_count_distinct` answers
ONE question per scan; storing a compact HLL sketch per (bucket, group)
row instead lets any later query union sketches over any bucket range —
distinct users last week / last quarter / per campaign — WITHOUT
re-reading the fact table.  Sketch union is associative and
order-independent, so rollups compose exactly like sums: daily → weekly →
monthly materializations each merge the previous level's sketches, never
the raw events.

Estimates are deterministic for a given input set (the sketch hash is
seeded), so tests can pin error bounds tightly.  Not SQL-oracle-able
(DuckDB has no DataSketches) — catalog entry is rows-only with an
exact-vs-estimate error-bound test instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_sketches(
    df: DataFrame,
    bucket_col,
    key_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch of key_col per bucket: (bucket, sketch, estimate).

    lg_k=12 → ~2 KB per sketch, ~1.6% standard error — the storage cost
    is per BUCKET, independent of cardinality.  This is the
    materialization step; keep the binary `sketch` column for later
    merging and the `estimate` for direct display.
    """
    return (
        df.groupBy(bucket_col)
        .agg(F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sketch"))
        .withColumn("estimate", F.hll_sketch_estimate("sketch"))
    )


def merge_sketches(sketches: DataFrame, group_cols=None) -> DataFrame:
    """Union sketches across buckets (optionally per group): the
    arbitrary-range distinct count, computed from materialized sketches
    only.  A year of daily sketches is 365 rows × ~2 KB — the merge is
    driver-trivial at any fact-table size."""
    g = sketches.groupBy(*group_cols) if group_cols else sketches.groupBy()
    return g.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("merged_estimate")
    )
