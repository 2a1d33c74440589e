"""Physical-plan inspection utilities (SURVEY.md §4.2 verification).

The engine's scale posture is only real if the plans show it: filters
pushed into the parquet scan, projections pruned, small dims broadcast,
top-N as TakeOrderedAndProject, aggregates partial+final.  These helpers
make those properties assertable in tests instead of eyeballed.
"""

from waddleml_spark.plans.inspect import (  # noqa: F401
    assert_plan,
    explain_str,
    pushed_filters,
    read_schema_columns,
)
