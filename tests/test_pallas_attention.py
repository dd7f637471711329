"""Pallas fused attention: interpret-mode numerics vs the XLA formulation
(the compiled path is exercised on real TPU by bench.py)."""

import numpy as np
import pytest


@pytest.mark.parametrize("B,H,T,D", [(2, 2, 50, 32), (1, 2, 64, 128),
                                     (3, 1, 17, 16)])
def test_fused_attention_matches_xla(B, H, T, D):
    import jax.numpy as jnp

    from tts_king_tpu.ops.pallas.attention import (attention_reference,
                                                   fused_attention)

    rng = np.random.RandomState(B * 100 + T)
    q = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    lens = rng.randint(max(T // 2, 1), T + 1, size=(B,))
    mask = jnp.asarray(np.arange(T)[None] >= lens[:, None])

    ref = np.array(attention_reference(q, k, v, mask))
    got = np.array(fused_attention(q, k, v, mask, interpret=True))
    # compare valid query rows only (padded rows are zeroed downstream)
    valid = np.arange(T)[None, None, :, None] < lens[:, None, None, None]
    np.testing.assert_allclose(got * valid, ref * valid, rtol=1e-4, atol=1e-5)


def test_model_with_pallas_attention_matches():
    """End-to-end FS2 forward with the fused kernel equals the XLA path."""
    import dataclasses

    import jax

    from tests.test_train import _tiny_setup
    from tts_king_tpu.models.fs2 import FastSpeech2

    model, opt, state, mc = _tiny_setup()
    rng = np.random.RandomState(0)
    B, L = 2, 8
    speakers = rng.randint(0, 3, (B,))
    texts = rng.randint(1, 200, (B, L))
    src_lens = np.array([8, 5])

    out_ref = model.apply(state.variables(), speakers, texts, src_lens,
                          max_mel_len=32, train=False)

    mc2 = dataclasses.replace(mc, use_pallas_attention=True)
    model2 = FastSpeech2(model_config=mc2, n_speakers=3, pitch_min=-2,
                         pitch_max=2, energy_min=-2, energy_max=2)
    # interpret mode on CPU: patch the kernel entry point
    import tts_king_tpu.ops.pallas.attention as pa

    orig = pa.fused_attention
    pa.fused_attention = lambda q, k, v, m: orig(q, k, v, m, interpret=True)
    try:
        out_pl = model2.apply(state.variables(), speakers, texts, src_lens,
                              max_mel_len=32, train=False)
    finally:
        pa.fused_attention = orig

    np.testing.assert_allclose(
        np.array(out_pl["postnet_mel"]), np.array(out_ref["postnet_mel"]),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.array(out_pl["mel_lens"]),
                                  np.array(out_ref["mel_lens"]))
