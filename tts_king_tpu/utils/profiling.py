"""Tracing / profiling hooks (the subsystem the reference lacks entirely —
SURVEY.md §5.1: tqdm bars were its only progress signal).

* `trace(log_dir)`: jax.profiler trace context (TensorBoard-viewable),
  no-op when the profiler is unsupported on the current backend.
* `timed(fn)`: wall-clock timer forcing completion via a device-side
  checksum fetch (block_until_ready is unreliable through remote TPU
  relays).
* `stage_timer`: cumulative per-stage wall-clock breakdowns for pipelines.
"""

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler.trace wrapper that degrades to a no-op."""
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def force(x):
    """Force execution of a pytree by fetching a scalar checksum."""
    leaves = [l for l in jax.tree.leaves(x)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.number)]
    if not leaves:
        return 0.0
    return float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves))


def timed(fn: Callable, *args, iters: int = 5, warmup: int = 1):
    """Median-free simple timing: mean seconds per call, completion forced."""
    for _ in range(warmup):
        force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        force(fn(*args))
    return (time.perf_counter() - t0) / iters


class StageTimer:
    """Accumulate named wall-clock stages: `with st.stage("encode"): ...`."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, float]:
        return {name: self.totals[name] / self.counts[name]
                for name in self.totals}
