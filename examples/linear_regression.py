"""Linear regression with gradient descent, tracked end-to-end (mirrors the
reference's examples/linear_regression.py usage: train/ and eval/ metric
namespaces, params, final artifact)."""

import math
import random

import waddleml_spark as w

random.seed(7)
N, true_w, true_b = 200, 3.5, -1.2
xs = [random.uniform(-2, 2) for _ in range(N)]
ys = [true_w * x + true_b + random.gauss(0, 0.3) for x in xs]
split = int(N * 0.8)

run = w.init(
    project="linreg",
    config={"lr": 0.05, "epochs": 40, "n_train": split},
    tags={"algo": "gd"},
    system_metrics=False,
)

wt, b = 0.0, 0.0
lr = 0.05
for epoch in range(40):
    gw = gb = 0.0
    for x, y in zip(xs[:split], ys[:split]):
        err = wt * x + b - y
        gw += 2 * err * x / split
        gb += 2 * err / split
    wt -= lr * gw
    b -= lr * gb
    train_mse = sum((wt * x + b - y) ** 2 for x, y in zip(xs[:split], ys[:split])) / split
    eval_mse = sum((wt * x + b - y) ** 2 for x, y in zip(xs[split:], ys[split:])) / (N - split)
    w.log({"train/mse": train_mse, "eval/mse": eval_mse, "params/w": wt, "params/b": b})

w.log_param("final_w", wt)
w.log_param("final_b", b)
w.finish()
print(f"fit w={wt:.3f} (true {true_w}), b={b:.3f} (true {true_b})")
assert math.isclose(wt, true_w, rel_tol=0.15)
