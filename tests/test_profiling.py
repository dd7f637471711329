"""Roofline analyzer (utils/profiling.roofline): structure and the
flops/bytes plumbing, on whatever backend the suite runs."""

import numpy as np


def test_roofline_fields():
    import jax.numpy as jnp

    from tts_king_tpu.utils.profiling import roofline

    a = jnp.asarray(np.random.RandomState(0).randn(256, 256), jnp.float32)

    out = roofline(lambda x: x @ x, a, measured_s=1e-3)
    assert out["device"]
    # on backends with a cost model these are populated and consistent
    if out["gflops"] is not None:
        assert out["gflops"] >= 0.03  # 2*256^3 = 0.034 GF
        assert out["arith_intensity"] is None or out["arith_intensity"] > 0
        assert out["measured_ms"] == 1.0
