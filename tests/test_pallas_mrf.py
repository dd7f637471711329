"""Fused MRF Pallas kernel (experimental backend): exact numerics vs the
unfused ResBlock stack, including sequence edges and tile boundaries."""

import numpy as np
import pytest


@pytest.mark.parametrize("C,M,tile", [(32, 300, 128), (16, 120, 64)])
def test_fused_mrf_matches_resblocks(C, M, tile):
    import jax
    import jax.numpy as jnp

    from tts_king_tpu.models.hifigan import ResBlock1
    from tts_king_tpu.ops.pallas.mrf import (fused_mrf,
                                             resblock_params_to_stacks)

    rng = np.random.RandomState(0)
    B = 2
    x = jnp.asarray(rng.randn(B, M, C), jnp.float32)
    ks = (3, 7, 11)

    branch_params = []
    ref = None
    for k in ks:
        rb = ResBlock1(C, k, (1, 3, 5))
        v = rb.init(jax.random.PRNGKey(k), x)
        out = rb.apply(v, x)
        ref = out if ref is None else ref + out
        branch_params.append(v["params"])
    ref = np.array(ref / len(ks))

    kernels, biases = resblock_params_to_stacks(branch_params, jnp.float32)
    got = np.array(fused_mrf(x, kernels, biases, ks, (1, 3, 5), tile=tile,
                             interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
