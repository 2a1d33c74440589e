"""Thread-safe global active-run state (ref: waddle/_state.py:1-38).

Same contract: one active run per process, lock-guarded; the step counter
lives on the Run object itself (the reference's module-level counter is
reset on set_active_run and unused by Run — we keep only the used part).
"""

from __future__ import annotations

import threading
from typing import TYPE_CHECKING, Optional

if TYPE_CHECKING:
    from waddleml_spark.run import Run

_lock = threading.Lock()
_active_run: Optional["Run"] = None


def set_active_run(run: Optional["Run"]) -> None:
    global _active_run
    with _lock:
        _active_run = run


def get_active_run() -> Optional["Run"]:
    with _lock:
        return _active_run
