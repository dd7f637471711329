"""First-dispatch lockstep for multi-process CPU (Gloo) runs.

Why this exists (measured, scripts/multihost_train_smoke.py): when
jax.distributed is initialized on the CPU backend, EVERY collective —
including ones between devices of the same process — rides Gloo, and a
Gloo clique's context init performs a KV-store rendezvous with a
HARDCODED ~30 s timeout that no XLA flag reaches
(`make_gloo_tcp_collectives` takes no timeout; the
`--xla_cpu_collective_timeout_seconds` flag governs collective *calls*
on established cliques, not context init). Meanwhile the persistent
compilation cache is process-asymmetric in practice (worker 0 gets AOT
cache hits, worker 1 recompiles cold — observed repeatedly in the
2-process smoke), so the first dispatch of every new program can put the
two processes 20-30 s apart. A new program's first execution creates new
Gloo cliques; if the peer is still compiling when the clique init starts,
the 30 s window expires and the whole job dies with
"Gloo context initialization failed: DEADLINE_EXCEEDED: GetKeyValue()".

The fix is structural, not a timeout bump: for the FIRST call of each
distinct program (per argument-shape signature),

  1. AOT-compile without dispatching (`jitted.lower(*args).compile()`),
  2. rendezvous on the JAX coordination-service barrier (gRPC — takes an
     arbitrary timeout, unlike Gloo context init),
  3. dispatch within barrier skew (~ms) of the peer, and
  4. block until the outputs are ready, so the program's cliques are
     fully established before any later work queues behind them.

Subsequent calls reuse the compiled executable directly. Established
cliques are governed by `--xla_cpu_collective_timeout_seconds`, so
steady-state skew (compiles of OTHER programs, host-side work) is safe.

Real TPU pods don't need any of this (no Gloo); `active()` gates on the
CPU backend so production multi-host TPU paths are untouched.
"""

from typing import Any, Dict, Tuple

import jax

__all__ = ["active", "coordination_barrier", "LockstepFn"]


def active() -> bool:
    """Lockstep first-dispatch is needed: multi-process on the CPU
    (Gloo-collectives) backend."""
    return jax.process_count() > 1 and jax.default_backend() == "cpu"


def coordination_barrier(name: str, timeout_ms: int = 900_000) -> None:
    """Block until every process reaches this barrier. Rides the
    coordination service (gRPC), NOT data-plane collectives — usable
    before any Gloo clique exists, with an arbitrary timeout. Uses the
    private distributed client handle because jax exposes no public
    non-collective barrier (multihost_utils.sync_global_devices is
    itself a collective — exactly what can't be trusted yet). No-op
    single-process."""
    from jax._src import distributed as _dist

    client = getattr(_dist.global_state, "client", None)
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def _shape_key(args) -> Tuple:
    """Aval signature of an argument pytree. Python scalars key by their
    jit aval (shape () + weak dtype), NOT by value — a value-keyed entry
    would re-compile-and-barrier on every distinct scalar, turning the
    steady state back into first-dispatch."""
    import numpy as np

    def leaf_key(leaf):
        if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
            return (tuple(leaf.shape), str(leaf.dtype))
        if isinstance(leaf, (bool, int, float, complex)):
            return ((), type(leaf).__name__)
        try:
            a = np.asarray(leaf)
            return (tuple(a.shape), str(a.dtype))
        except Exception:
            return repr(leaf)

    return tuple(leaf_key(leaf) for leaf in jax.tree.leaves(args))


class LockstepFn:
    """Wrap a jitted function so each new program shape is compiled,
    rendezvoused, dispatched, and warmed in lockstep across processes.

    The barrier id embeds a per-wrapper counter, so correctness requires
    every process to see the same SEQUENCE of new shapes — true for the
    training loop (batch plans are metadata-identical across processes)
    and the eval loop (same val split, same order).
    """

    def __init__(self, jitted, name: str):
        self._jitted = jitted
        self._name = name
        self._compiled: Dict[Tuple, Any] = {}
        self._n_new = 0

    def __call__(self, *args):
        key = _shape_key(args)
        exe = self._compiled.get(key)
        if exe is None:
            exe = self._jitted.lower(*args).compile()
            coordination_barrier(f"ttk_lockstep:{self._name}:{self._n_new}")
            self._n_new += 1
            out = exe(*args)
            jax.block_until_ready(out)
            self._compiled[key] = exe
            return out
        return exe(*args)


def maybe_lockstep(jitted, name: str):
    """Return a LockstepFn wrapper when lockstep is needed, else the
    jitted function unchanged (single-process, or any non-CPU backend)."""
    return LockstepFn(jitted, name) if active() else jitted
