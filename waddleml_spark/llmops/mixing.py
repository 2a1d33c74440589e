"""Data-mixing math shared by the mixture reports.

ONE definition of the temperature/alpha-smoothed sampling shares used by
both `similarity.domain_mix_report` (semantic domains, alpha=0.5) and
the catalog's `temperature_mix_report` (source shares, tau=0.7) — the
public multilingual-rebalance recipe of XLM-R / mT5: given natural
shares p_i = w_i / Σw, sample with q_i ∝ p_i^alpha (equivalently
w_i^alpha — the normalization cancels), so alpha<1 upsamples the tail.

Rows-only territory BY DESIGN: pow is transcendental and the engines
differ in the last ulp, so none of this ever enters an exact oracle
pairing (see CLAUDE.md's transcendental rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _round(c: Column, digits: int) -> Column:
    """House floor-formula rounding — delegates to the ONE definition
    (llmops.round_floor, shared with catalog._r) so copies can't drift.
    Inputs here are shares/ratios of finite weights — NULL (from
    try_divide) passes through as NULL."""
    from . import round_floor

    return round_floor(c, digits)


def smoothed_shares(
    agg: DataFrame,
    weight_col: str,
    alpha: float,
    share_names: tuple[str, str, str] = (
        "natural_share",
        "smoothed_share",
        "sample_rate",
    ),
    digits: tuple[int, int, int] = (6, 6, 6),
) -> DataFrame:
    """Append (natural share, alpha-smoothed share, upsample rate)
    columns to a pre-aggregated (key..., weight) frame.

    The caller guarantees ``agg`` is aggregate-grain (domains, sources —
    tens of rows), so the unpartitioned window totals are a one-task
    pass over a tiny frame and the input keeps a SINGLE plan reference
    (no scalar-agg + cross-join re-execution of the upstream pipeline).

    Zero weights are kept, not crashed on: the rate q/p is 0/0 for a
    zero-weight key, which under ANSI mode (on by default in this
    repo's Spark) would throw DIVIDE_BY_ZERO and with ANSI off would
    leak NaN into the floor rounding (NaN→0, a silent lie).
    ``try_divide`` reports it as NULL instead — visible and honest.
    All three outputs are computed from UNROUNDED intermediates and
    floor-rounded only at the end (rows-only determinism).
    """
    w = Window.partitionBy()
    wv = F.col(weight_col).cast("double")
    qv = F.pow(wv, F.lit(alpha))
    p = F.try_divide(wv, F.sum(wv).over(w))
    q = F.try_divide(qv, F.sum(qv).over(w))
    n0, n1, n2 = share_names
    d0, d1, d2 = digits
    return (
        agg.withColumn(n0, _round(p, d0))
        .withColumn(n1, _round(q, d1))
        .withColumn(n2, _round(F.try_divide(q, p), d2))
    )
