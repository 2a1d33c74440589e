"""Plan-hygiene gate over the whole catalog.

Catalyst does NOT dedupe common subtrees: every extra plan reference to
an expensive stage re-EXECUTES it (round 4 found the perceptual-hash
near-dup query running its Arrow-batch Python decode FOUR times via a
self-join + guard-join).  This test plans every registered query and
fails if any physical plan contains more than one Python stage — the
canonical symptom of that class of bug.

Repeated SCANS are allowed (several queries re-read a pruned column set
for intrinsic reasons: set ops, train-then-score LMs, MAD's two passes)
— but a repeated Python stage is never intentional in this codebase.
"""

from __future__ import annotations

import pytest

from waddleml_spark import catalog
from tests.conftest import SF_SMOKE

_PY_MARKERS = ("MapInPandas", "ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas")


@pytest.mark.parametrize("name", sorted(catalog.QUERIES))
def test_no_duplicated_python_stage(spark, name):
    df = catalog.QUERIES[name](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    counts = {m: plan.count(m) for m in _PY_MARKERS if plan.count(m)}
    total = sum(counts.values())
    assert total <= 1, (
        f"{name}: {total} Python stages in one plan ({counts}) — a plan "
        "subtree containing Python is referenced more than once and will "
        "re-execute per reference; restructure to a single evaluation "
        "(bucket-group / window flags / localCheckpoint)"
    )
