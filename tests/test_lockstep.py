"""parallel/lockstep.py unit tests (single-process: barriers no-op, the
compile-cache/shape-key mechanics are what's testable here — the real
cross-process behavior is exercised by the multihost smokes)."""

import numpy as np


def test_lockstep_fn_caches_per_shape_and_matches_jit():
    import jax
    import jax.numpy as jnp

    from tts_king_tpu.parallel.lockstep import LockstepFn

    calls = []

    def f(x, scale):
        calls.append(None)  # traced once per shape
        return jnp.sum(x * scale)

    jitted = jax.jit(f)
    wrapped = LockstepFn(jitted, "t")

    a = np.arange(6, dtype=np.float32).reshape(2, 3)
    out1 = wrapped(a, 2.0)
    assert float(out1) == float(jitted(a, 2.0))
    assert wrapped._n_new == 1 and len(wrapped._compiled) == 1

    # same shapes, different VALUES (incl. the python scalar): cached —
    # no new compile, no new barrier
    out2 = wrapped(a + 1, 3.0)
    assert wrapped._n_new == 1 and len(wrapped._compiled) == 1
    assert float(out2) == float(jitted(a + 1, 3.0))

    # new array shape: one new entry
    b = np.ones((4, 3), np.float32)
    wrapped(b, 1.5)
    assert wrapped._n_new == 2 and len(wrapped._compiled) == 2


def test_lockstep_inactive_single_process():
    import jax

    from tts_king_tpu.parallel.lockstep import active, maybe_lockstep

    assert active() is False  # single process in the suite
    jitted = jax.jit(lambda x: x + 1)
    assert maybe_lockstep(jitted, "x") is jitted


def test_shape_key_scalar_values_collapse():
    from tts_king_tpu.parallel.lockstep import _shape_key

    k1 = _shape_key((np.zeros((2, 3), np.float32), 2.0, 7))
    k2 = _shape_key((np.ones((2, 3), np.float32), 9.5, -1))
    assert k1 == k2
    k3 = _shape_key((np.zeros((2, 4), np.float32), 2.0, 7))
    assert k1 != k3
