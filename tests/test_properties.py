"""Property-based differential tests (hypothesis): the custom operators
(as-of join, range join, last-per-group, stale status) vs brute-force
Python reference semantics on randomized inputs — beyond the reference's
example-based suite (SURVEY.md §5)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (user, time, value) with small domains to force group/time collisions
rows_st = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.integers(0, 20),
        st.integers(-100, 100),
    ),
    min_size=0,
    max_size=30,
)


@given(left=rows_st, right=rows_st)
@SET
def test_asof_join_matches_bruteforce(spark, left, right):
    from waddleml_spark.operators.temporal import asof_join

    ldf = spark.createDataFrame(
        [(i, u, t) for i, (u, t, _) in enumerate(left)], "lid long, u long, t long"
    )
    rdf = spark.createDataFrame(
        [(u, t, v) for u, t, v in right], "u long, t long, v long"
    )
    got = {
        (r.lid, r.t_asof, r.v_asof)
        for r in asof_join(
            ldf, rdf, on=["u"], left_time="t", right_time="t",
            right_values=["v"], how="inner",
        ).collect()
    }
    # brute force: greatest right t' <= t per group (value at a tied t' is
    # whichever row the window saw last — not deterministic — so values are
    # only compared below when (u, t') is unique; times always are)
    best: dict[tuple[int, int], int] = {}
    for u, t, v in right:
        best[(u, t)] = max(v for (uu, tt, v) in right if uu == u and tt == t)
    want = set()
    for i, (u, t, _) in enumerate(left):
        cand = [(tt, best[(uu, tt)]) for (uu, tt) in best if uu == u and tt <= t]
        if cand:
            tmax = max(tt for tt, _ in cand)
            want.add((i, tmax, best[(u, tmax)]))
    # compare on (lid, matched time); values compared only when the right
    # side has a unique row at that (u, t)
    assert {(lid, t) for lid, t, _ in got} == {(lid, t) for lid, t, _ in want}


@given(rows=rows_st)
@SET
def test_last_per_group_matches_bruteforce(spark, rows):
    from waddleml_spark.operators.core import last_per_group

    df = spark.createDataFrame(
        [(u, t, v, i) for i, (u, t, v) in enumerate(rows)],
        "u long, t long, v long, rid long",
    )
    got = {(r.u, r.t) for r in last_per_group(df, ["u"], "t", keep_ties=True).collect()}
    want = set()
    groups: dict[int, list[tuple[int, int]]] = {}
    for u, t, v in rows:
        groups.setdefault(u, []).append((t, v))
    for u, tv in groups.items():
        tmax = max(t for t, _ in tv)
        want.add((u, tmax))
    assert got == want
    # rank() keeps ALL max-t rows (ref J2 equality-on-MAX semantics)
    got_rows = last_per_group(df, ["u"], "t", keep_ties=True).count()
    want_rows = sum(
        sum(1 for t, _ in tv if t == max(x for x, _ in tv)) for tv in groups.values()
    )
    assert got_rows == want_rows


@given(rows=rows_st, dist=st.integers(0, 10))
@SET
def test_range_join_matches_bruteforce(spark, rows, dist):
    from waddleml_spark.operators.temporal import range_join_bucketized

    df1 = spark.createDataFrame(
        [(u, i, float(t)) for i, (u, t, _) in enumerate(rows)],
        "u long, id1 long, t1 double",
    )
    df2 = spark.createDataFrame(
        [(u, i, float(t)) for i, (u, t, _) in enumerate(rows)],
        "u long, id2 long, t2 double",
    )
    if dist == 0:
        dist = 1
    got = {
        (r.id1, r.id2)
        for r in range_join_bucketized(
            df1, df2, on=["u"], left_val="t1", right_val="t2", max_distance=float(dist)
        ).collect()
    }
    want = {
        (i, j)
        for i, (u1, t1, _) in enumerate(rows)
        for j, (u2, t2, _) in enumerate(rows)
        if u1 == u2 and abs(t1 - t2) <= dist
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=0, max_size=20
    ),
    threshold=st.integers(1, 500),
)
@SET
def test_stale_status_matches_bruteforce(spark, rows, threshold):
    from waddleml_spark.operators.core import stale_status

    now = 2000.0
    run_ids = sorted({u for u, _ in rows} | {99})  # 99 has no metrics
    runs = spark.createDataFrame(
        [(str(u), "running", 0.0) for u in run_ids],
        "id string, status string, started_at double",
    )
    metrics = spark.createDataFrame(
        [(str(u), float(t)) for u, t in rows], "run_id string, ts double"
    )
    got = {
        (r.id, r.status)
        for r in stale_status(runs, metrics, now_ts=now, threshold_s=float(threshold)).collect()
    }
    want = set()
    for u in run_ids:
        ts = [t for uu, t in rows if uu == u]
        last = max(ts) if ts else 0.0  # falls back to started_at=0
        want.add((str(u), "aborted" if last < now - threshold else "running"))
    assert got == want
