"""Observability: phase timers, progress reporting and profiler hooks.

The reference's observability is stdout progress prints every 1000 points
(examples/example1/src/roadrunner.cpp:396-397) and BAD-input dumps.  Here:
structured phase timers around prep/compile/scan/output, a progress callback
for chunked runs, JAX profiler trace capture, and failure summaries (the
batched analogue of the per-point warning prints).
"""
from __future__ import annotations

import contextlib
import json
import sys
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np


@dataclass
class RunMetrics:
    """Collected phase timings + counters for one simulation run.

    ``announce=True`` prints (flushed) phase start/end lines to stderr so
    long device-bound phases (first device op waiting on a free chip, large
    host->device transfers, kernel compiles) are visible while in flight --
    piped/verbose runs would otherwise sit silent for minutes."""
    phases: Dict[str, float] = field(default_factory=dict)
    counters: Dict[str, float] = field(default_factory=dict)
    announce: bool = False

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        if self.announce:
            print(f"[phase] {name} ...", file=sys.stderr, flush=True)
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            if self.announce:
                print(f"[phase] {name} done in {dt:.1f}s", file=sys.stderr,
                      flush=True)

    def count(self, name: str, value: float):
        self.counters[name] = value

    def note(self, msg: str):
        """One-line engine decision note (fast-path fallbacks etc.); printed
        only in announce (verbose) mode so slow paths are never silent."""
        if self.announce:
            print(f"[engine] {msg}", file=sys.stderr, flush=True)

    def report(self, stream=sys.stderr):
        doc = {"phases_s": {k: round(v, 4) for k, v in self.phases.items()},
               "counters": self.counters}
        print(json.dumps(doc), file=stream, flush=True)

    def point_steps_per_s(self, npoints: int, nsteps: int,
                          phase: str = "scan") -> Optional[float]:
        t = self.phases.get(phase)
        return npoints * nsteps / t if t else None


def failure_summary(failed, lats=None, lons=None, limit: int = 10,
                    stream=sys.stderr):
    """Batched analogue of the reference's per-point BAD-input prints
    (src/InputOutput.f90:63-80): one summary + the first few failing points."""
    failed = np.asarray(failed)
    n = int(failed.sum())
    if n == 0:
        return 0
    idx = np.where(failed)[0]
    msg = f"{n}/{failed.size} points failed"
    if lats is not None and lons is not None:
        locs = ", ".join(f"({lats[i]:.3f},{lons[i]:.3f})"
                         for i in idx[:limit])
        msg += f"; first: {locs}"
    print(msg, file=stream)
    return n


def detect_nan_points(state):
    """NaN-poisoning detection (SURVEY.md section 5: per-point validity mask +
    NaN detection replaces the reference's sanitizer builds): returns an
    updated state with NaN/Inf-carrying points marked failed, plus the mask.

    The physics cannot produce NaN from valid inputs (all guards are selects),
    so a NaN means corrupted input or hardware fault -- contained per point,
    like every other failure."""
    import jax.numpy as jnp
    bad = ~jnp.isfinite(state.tmp).all(axis=-1)
    for name in ("tsurf_ave", "wat", "snow", "ice", "ice2", "dep",
                 "q2melt", "blcond", "albedo"):
        bad = bad | ~jnp.isfinite(getattr(state, name))
    return state._replace(failed=state.failed | bad), bad


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """JAX profiler trace capture (view with TensorBoard / xprof)."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Progress:
    """Chunk-level progress reporting (reference: every-1000-points prints;
    here the batch is one device call, so progress is over time chunks)."""

    def __init__(self, total_steps: int, every_s: float = 5.0,
                 stream=sys.stderr):
        self.total = total_steps
        self.done = 0
        self.every = every_s
        self.stream = stream
        self._last = 0.0
        self._t0 = time.perf_counter()

    def update(self, steps: int):
        # chunk updates may overshoot on the padded tail; clamp to total
        self.done = min(self.done + steps, self.total)
        now = time.perf_counter()
        if now - self._last >= self.every or self.done >= self.total:
            rate = self.done / max(now - self._t0, 1e-9)
            eta = (self.total - self.done) / max(rate, 1e-9)
            print(f"\t{self.done} / {self.total} steps "
                  f"({100.0 * self.done / self.total:.0f}%, eta {eta:.0f}s)",
                  file=self.stream, flush=True)
            self._last = now
