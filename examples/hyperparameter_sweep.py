"""Hyperparameter sweep + comparison (mirrors the reference's
examples/hyperparameter_sweep.py shape: several runs, then compare)."""

import math
import os

import waddleml_spark as w
from waddleml_spark.operators.dashboard import SparkDashboard
from waddleml_spark.store import WaddleStore

run_ids = []
for lr in (0.1, 0.01, 0.001):
    with w.init(
        project="sweep",
        name=f"lr-{lr}",
        config={"lr": lr, "layers": 3},
        system_metrics=False,
    ) as run:
        for step in range(20):
            loss = math.exp(-step * lr * 5) + lr
            run.log({"loss": loss})
        run_ids.append(run.id)

store = WaddleStore(os.path.join(os.getcwd(), ".waddle"))
dash = SparkDashboard(store)

cmp = dash.compare_runs(run_ids)
print("param diff:")
for rid, params in cmp["params"].items():
    print(f"  {rid[:8]}: {params}")

board = dash.metric_summary("loss")
print("leaderboard (final loss per run):")
for row in board:
    print(f"  {row['name']:<10} {row['value']:.4f}")
