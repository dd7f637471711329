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


# Peak specs per chip for roofline estimates: dense bf16 matmul FLOP/s and
# HBM bandwidth (B/s). Sources: public TPU spec sheets.
PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12, "TPU v5e": 197e12,
    "TPU v5p": 459e12, "TPU v5": 459e12,
    "TPU v6 lite": 918e12, "TPU v6e": 918e12,
}
PEAK_HBM_BYTES = {
    "TPU v4": 1228e9,
    "TPU v5 lite": 819e9, "TPU v5e": 819e9,
    "TPU v5p": 2765e9, "TPU v5": 2765e9,
    "TPU v6 lite": 1640e9, "TPU v6e": 1640e9,
}


def roofline(fn, *args, measured_s=None):
    """Roofline analysis of one jittable call from XLA's compiled cost
    analysis: FLOPs, HBM bytes, arithmetic intensity, the compute- and
    bandwidth-bound time floors at this chip's peaks, and which one binds.

    The relay denies device-side traces (ROADMAP #1), so this is the
    TPU-native substitute: analytic floors from the compiled HLO, compared
    against sustained wall time measured by the caller (scan differencing
    or checksum-fetch deltas). Returns a dict; values are None where the
    backend exposes no cost model (e.g. some CPU builds).
    """
    compiled = jax.jit(fn).lower(*args).compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
        bytes_ = float(ca.get("bytes accessed", 0.0)) or None
    except Exception:
        flops = bytes_ = None

    kind = jax.devices()[0].device_kind
    peak_f = PEAK_BF16_FLOPS.get(kind)
    peak_b = PEAK_HBM_BYTES.get(kind)
    t_mxu = flops / peak_f if (flops and peak_f) else None
    t_hbm = bytes_ / peak_b if (bytes_ and peak_b) else None
    out = {
        "device": kind,
        "gflops": round(flops / 1e9, 2) if flops else None,
        "hbm_gbytes": round(bytes_ / 1e9, 3) if bytes_ else None,
        "arith_intensity": round(flops / bytes_, 1) if (flops and bytes_)
        else None,
        "t_mxu_ms": round(t_mxu * 1e3, 3) if t_mxu else None,
        "t_hbm_ms": round(t_hbm * 1e3, 3) if t_hbm else None,
        "bound": ("mxu" if t_mxu >= t_hbm else "hbm")
        if (t_mxu and t_hbm) else None,
    }
    if measured_s is not None:
        out["measured_ms"] = round(measured_s * 1e3, 3)
        if t_mxu or t_hbm:
            floor = max(t_mxu or 0.0, t_hbm or 0.0)
            out["roofline_fraction"] = round(floor / measured_s, 3)
    return out
