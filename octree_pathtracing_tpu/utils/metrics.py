"""Structured observability: JSON-line metrics + phase timers.

Replaces the reference's scattered ``Instant::now`` prints (SURVEY.md §5
"Tracing / profiling"): every emission is one JSON object on a line, so logs
are machine-parseable; phase timers produce per-stage wall times (octree
build phases, compile, render passes) — the counters the reference prints
ad hoc (``new_octree.rs:319-431``, ``tile_renderer.rs:627-632``).
"""

from __future__ import annotations

import contextlib
import json
import sys
import time


class Metrics:
    def __init__(self, stream=None, enabled: bool = True):
        self.stream = stream or sys.stderr
        self.enabled = enabled

    def emit(self, event: str, **fields):
        if not self.enabled:
            return
        rec = {"event": event, "t": round(time.time(), 3), **fields}
        print(json.dumps(rec), file=self.stream, flush=True)

    @contextlib.contextmanager
    def phase(self, name: str, **fields):
        t0 = time.time()
        try:
            yield
        finally:
            self.emit("phase", name=name, wall_s=round(time.time() - t0, 4), **fields)

    def render_pass(self, spp_added: int, total_spp: int, lanes: int, wall_s: float):
        self.emit(
            "render_pass",
            spp_added=spp_added,
            total_spp=total_spp,
            lanes=lanes,
            wall_s=round(wall_s, 4),
            samples_per_s=round(lanes * spp_added / max(wall_s, 1e-9)),
        )


METRICS = Metrics()
