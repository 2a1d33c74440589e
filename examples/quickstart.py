"""Quickstart: the wandb-style flow (mirrors the reference's
examples/quickstart.py usage — init → log → finish)."""

import math
import random

import waddleml_spark as w

run = w.init(
    project="quickstart",
    name="demo-run",
    config={"lr": 0.01, "epochs": 30},
    tags={"example": "quickstart"},
    system_metrics=False,
)

random.seed(0)
for epoch in range(30):
    loss = math.exp(-epoch / 10) + random.random() * 0.02
    acc = 1 - loss / 2
    w.log({"train/loss": loss, "train/acc": acc})

w.log_artifact("notes.txt")
w.finish()

print(f"run {run.id[:8]} finished; inspect with: python -m waddleml_spark.cli ls")
