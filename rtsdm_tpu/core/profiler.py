"""Hierarchical profiler (reference Utils/Timing/Profiler.h:49; FALCOR_PROFILE
RAII events Profiler.h:276-298).

TPU twist: JAX dispatch is async, so scope timings call block_until_ready on
tagged arrays when `sync=True` (the GpuTimer equivalent). Events keep the
reference's named-scope tree and export to JSON like Profiler::Capture
(Profiler.h:138-191).
"""
from __future__ import annotations

import contextlib
import json
import time

import jax


class _Event:
    __slots__ = ("name", "count", "total", "children")

    def __init__(self, name):
        self.name = name
        self.count = 0
        self.total = 0.0
        self.children: dict[str, _Event] = {}

    def to_dict(self):
        return {
            "name": self.name,
            "count": self.count,
            "total_ms": self.total * 1e3,
            "avg_ms": (self.total / self.count * 1e3) if self.count else 0.0,
            "children": [c.to_dict() for c in self.children.values()],
        }


class Profiler:
    def __init__(self, enabled: bool = True, sync: bool = True):
        self.enabled = enabled
        self.sync = sync
        self.root = _Event("/")
        self._stack = [self.root]

    @contextlib.contextmanager
    def event(self, name: str, outputs=None):
        if not self.enabled:
            yield
            return
        parent = self._stack[-1]
        ev = parent.children.get(name)
        if ev is None:
            ev = parent.children[name] = _Event(name)
        self._stack.append(ev)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync and outputs is not None:
                jax.block_until_ready(outputs)
            ev.total += time.perf_counter() - t0
            ev.count += 1
            self._stack.pop()

    def reset(self):
        self.root = _Event("/")
        self._stack = [self.root]

    def capture(self) -> dict:
        return self.root.to_dict()

    def capture_json(self) -> str:
        return json.dumps(self.capture(), indent=2)

    def flat_averages(self) -> dict[str, float]:
        """name -> avg ms, flattened (PathBenchmark-style CSV source,
        reference PathBenchmark.cpp:59-90)."""
        out = {}

        def walk(ev, prefix):
            for c in ev.children.values():
                key = f"{prefix}/{c.name}" if prefix else c.name
                out[key] = (c.total / c.count * 1e3) if c.count else 0.0
                walk(c, key)

        walk(self.root, "")
        return out


_GLOBAL = Profiler(enabled=False)


def global_profiler() -> Profiler:
    return _GLOBAL


def profile_scope(name, outputs=None):
    return _GLOBAL.event(name, outputs)
