"""WebSocket wire-protocol parity with the reference dashboard.

The reference server broadcasts one frame per metric insert to every
WS client — `{"type": "metric", run_id, key, step, ts, value}`
(waddle/_server.py:115-124, built at waddle/_run.py:133-135) — and its
bundled client consumes exactly that shape (waddle/static/index.html:448).

starlette is optional in this container (as in the reference CLI), so
these tests gate on it: green wherever starlette+httpx are installed,
skipped otherwise.  The always-on SSE `/events` twin carries the same
JSON and is covered unconditionally in test_server_cli.py.
"""

from __future__ import annotations

import json

import pytest

pytest.importorskip("starlette")
pytest.importorskip("httpx")  # TestClient transport

from waddleml_spark import state  # noqa: E402
from waddleml_spark.server import create_app  # noqa: E402
from waddleml_spark.streaming.live import LiveBus  # noqa: E402


@pytest.fixture()
def app_and_bus(spark, tmp_path):
    import waddleml_spark as w

    state.set_active_run(None)
    run = w.init(
        project="wsp", name="r1", store_path=str(tmp_path / ".waddle"),
        system_metrics=False, spark=spark,
    )
    run.finish()
    bus = LiveBus()
    yield create_app(run._store, bus=bus), bus
    state.set_active_run(None)


def test_ws_pushes_reference_metric_frames(app_and_bus):
    from starlette.testclient import TestClient

    app, bus = app_and_bus
    with TestClient(app) as client:
        with client.websocket_connect("/ws") as ws:
            row = {"run_id": "r1", "key": "loss", "step": 3,
                   "ts": 1700000000.25, "value": 0.125}
            bus.publish([row, {**row, "step": 4, "value": 0.0625}])
            first = json.loads(ws.receive_text())
            second = json.loads(ws.receive_text())
    # exact reference frame: type tag + the five metric fields, nothing else
    assert first == {"type": "metric", **row}
    assert second["step"] == 4 and second["type"] == "metric"
    assert set(first) == {"type", "run_id", "key", "step", "ts", "value"}


def test_ws_dead_client_pruned_without_killing_bus(app_and_bus):
    from starlette.testclient import TestClient

    app, bus = app_and_bus
    row = {"run_id": "r1", "key": "m", "step": 1, "ts": 1.0, "value": 2.0}
    with TestClient(app) as client:
        with client.websocket_connect("/ws") as ws:
            bus.publish([row])
            assert json.loads(ws.receive_text())["type"] == "metric"
        # socket closed: the next publish must not raise (prune path, T5)
        bus.publish([row])
