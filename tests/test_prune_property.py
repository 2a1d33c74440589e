"""Property test for the manifest pruner's ONE invariant: pruning may
keep too much, but must NEVER skip a file that contains a matching row.

Round-4 history earns this test: two boundary regressions in one day
(tz-aware vs naive ISO strings, then date-only vs datetime inflation).
The model: random files of datetime rows — stats stored the way
_footer_stats would (canonical naive-UTC ISO), the way a LEGACY manifest
did (tz-aware ISO), or date-only — probed with random date / naive /
tz-aware bounds.  Ground truth compares real datetime objects under
UTC normalization with dates cast to midnight (SQL CAST semantics).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st_

from waddleml_spark.sources import snaptable as st

_BASE = dt.datetime(2024, 1, 1)


def _utc_naive(v: dt.datetime) -> dt.datetime:
    if v.tzinfo is not None:
        return v.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return v


def _as_instant(v) -> dt.datetime:
    """Ground-truth comparison domain: naive-UTC datetime; dates cast to
    midnight (CAST(date AS timestamp))."""
    if isinstance(v, dt.datetime):
        return _utc_naive(v)
    return dt.datetime(v.year, v.month, v.day)


_dt_values = st_.integers(min_value=0, max_value=90 * 24 * 3600).map(
    lambda s: _BASE + dt.timedelta(seconds=s)
)
_tz_offsets = st_.sampled_from(
    [dt.timezone.utc, dt.timezone(dt.timedelta(hours=-5)),
     dt.timezone(dt.timedelta(hours=9))]
)


@st_.composite
def _file(draw):
    rows = draw(st_.lists(_dt_values, min_size=1, max_size=6))
    style = draw(st_.sampled_from(["canonical", "legacy_tz", "date_only"]))
    mn, mx = min(rows), max(rows)
    if style == "canonical":
        stats = (mn.isoformat(), mx.isoformat())
    elif style == "legacy_tz":
        tz = draw(_tz_offsets)
        # legacy manifests stored the SAME instants, rendered tz-aware
        stats = (
            mn.replace(tzinfo=dt.timezone.utc).astimezone(tz).isoformat(),
            mx.replace(tzinfo=dt.timezone.utc).astimezone(tz).isoformat(),
        )
    else:  # a date column: rows collapse to their dates
        rows = [dt.datetime(r.year, r.month, r.day) for r in rows]
        stats = (min(rows).date().isoformat(), max(rows).date().isoformat())
    return {"path": "p", "rows": rows, "stats": {"c": stats}}


def _bound(draw, allow_none=True):
    kind = draw(st_.sampled_from(
        (["none"] if allow_none else []) + ["date", "naive", "aware"]))
    if kind == "none":
        return None
    v = draw(_dt_values)
    if kind == "date":
        return v.date()
    if kind == "aware":
        return v.replace(tzinfo=dt.timezone.utc).astimezone(draw(_tz_offsets))
    return v


@st_.composite
def _case(draw):
    files = draw(st_.lists(_file(), min_size=1, max_size=5))
    lo, hi = _bound(draw), _bound(draw)
    if lo is None and hi is None:
        lo = draw(_dt_values)
    return files, lo, hi


@settings(max_examples=300, deadline=None)
@given(_case())
def test_prune_never_drops_a_matching_file(case):
    files, lo, hi = case
    kept = {id(f) for f in st._prune(files, "c", lo, hi)}
    lo_i = None if lo is None else _as_instant(lo)
    hi_i = None if hi is None else _as_instant(hi)
    for f in files:
        has_match = any(
            (lo_i is None or r >= lo_i) and (hi_i is None or r <= hi_i)
            for r in f["rows"]
        )
        if has_match:
            assert id(f) in kept, (
                f"pruner dropped a file with matching rows: "
                f"stats={f['stats']['c']} rows={f['rows']} lo={lo!r} hi={hi!r}"
            )
