"""Flash attention (training path): interpret-mode numerics vs the XLA
formulation, forward AND gradients. Perf status: measured SLOWER than the
XLA path in the full train step at shipped sizes — opt-in only (see
ops/pallas/attention.py flash_attention_padmask and DESIGN.md §3.2)."""

import numpy as np
import pytest


@pytest.mark.parametrize("B,H,T,D", [(2, 2, 100, 32), (1, 2, 256, 128),
                                     (3, 1, 50, 16)])
def test_flash_attention_matches_xla_fwd_and_grad(B, H, T, D):
    import jax
    import jax.experimental.pallas.tpu as pltpu
    import jax.numpy as jnp

    from tts_king_tpu.ops.pallas.attention import (attention_reference,
                                                   flash_attention_padmask)

    rng = np.random.RandomState(B * 100 + T)
    q = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    lens = rng.randint(max(T // 2, 1), T + 1, size=(B,))
    mask = jnp.asarray(np.arange(T)[None] >= lens[:, None])
    # padded query rows are garbage by contract (FFTBlock zeroes them);
    # compare + differentiate through valid rows only
    valid = jnp.asarray(
        np.arange(T)[None, None, :, None] < lens[:, None, None, None])

    def loss(fn):
        return lambda q, k, v: jnp.sum((fn(q, k, v, mask) * valid) ** 2)

    ref = np.array(attention_reference(q, k, v, mask))
    ref_g = jax.grad(loss(attention_reference), argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = np.array(flash_attention_padmask(q, k, v, mask))
        got_g = jax.grad(loss(flash_attention_padmask),
                         argnums=(0, 1, 2))(q, k, v)

    np.testing.assert_allclose(np.where(valid, got, 0),
                               np.where(valid, ref, 0),
                               rtol=1e-4, atol=1e-5)
    for g, r in zip(got_g, ref_g):
        np.testing.assert_allclose(np.array(g), np.array(r),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_train_step_with_flash_attention_matches():
    """One full tiny train step, flash vs XLA attention: same loss to f32
    reassociation tolerance (the two formulations differ only in softmax
    accumulation order)."""
    import dataclasses

    import jax
    import jax.experimental.pallas.tpu as pltpu
    import jax.numpy as jnp

    import __graft_entry__
    from tts_king_tpu.config import OptimizerConfig
    from tts_king_tpu.models.fs2 import FastSpeech2
    from tts_king_tpu.train.state import create_train_state, make_optimizer
    from tts_king_tpu.train.step import make_train_step

    mc = __graft_entry__._tiny_model_config()
    opt = make_optimizer(OptimizerConfig(grad_acc_step=1), 32)

    acc, B, L, T = 1, 2, 8, 16
    rng = np.random.RandomState(0)
    d = rng.randint(1, 3, (acc, B, L))
    superbatch = dict(
        speakers=rng.randint(0, 4, (acc, B)).astype(np.int32),
        texts=rng.randint(1, 200, (acc, B, L)).astype(np.int32),
        src_lens=np.full((acc, B), L, np.int32),
        mels=rng.randn(acc, B, T, 80).astype(np.float32),
        mel_lens=d.sum(-1).astype(np.int32),
        energies=rng.randn(acc, B, L).astype(np.float32),
        durations=d.astype(np.int32),
        pitches_raw=rng.randn(acc, B, L).astype(np.float32),
        pitches_cwt=rng.randn(acc, B, L, 11).astype(np.float32),
        pitches_mean=rng.randn(acc, B).astype(np.float32),
        pitches_std=rng.rand(acc, B).astype(np.float32),
    )
    sample = (superbatch["speakers"][0], superbatch["texts"][0],
              superbatch["src_lens"][0])

    losses = {}
    for name, m in (
            ("xla", mc),
            ("flash", dataclasses.replace(mc, use_flash_attention=True))):
        model = FastSpeech2(
            model_config=m, n_speakers=4, pitch_min=-2.0, pitch_max=2.0,
            energy_min=-2.0, energy_max=2.0)
        if name == "flash":
            # init traces the model too — everything inside the context
            with pltpu.force_tpu_interpret_mode():
                state = create_train_state(model, opt, jax.random.PRNGKey(0),
                                           sample)
                _, out = make_train_step(model, opt)(
                    state, superbatch, jax.random.PRNGKey(1))
                losses[name] = float(out.total)
        else:
            state = create_train_state(model, opt, jax.random.PRNGKey(0),
                                       sample)
            _, out = make_train_step(model, opt)(
                state, superbatch, jax.random.PRNGKey(1))
            losses[name] = float(out.total)

    assert abs(losses["flash"] - losses["xla"]) < 1e-4, losses


def test_train_step_with_bf16_probs_close():
    """attention_probs_bf16 changes only the stored/matmul'd probability
    precision: one tiny train step's loss must stay within bf16 rounding
    of the f32 path (TPU matmuls already consume bf16 inputs at default
    precision, so on-device the forward change is even smaller)."""
    import dataclasses

    import jax
    import numpy as np

    import __graft_entry__
    from tts_king_tpu.config import OptimizerConfig
    from tts_king_tpu.models.fs2 import FastSpeech2
    from tts_king_tpu.train.state import create_train_state, make_optimizer
    from tts_king_tpu.train.step import make_train_step

    mc = __graft_entry__._tiny_model_config()
    opt = make_optimizer(OptimizerConfig(grad_acc_step=1), 32)

    acc, B, L, T = 1, 2, 8, 16
    rng = np.random.RandomState(0)
    d = rng.randint(1, 3, (acc, B, L))
    superbatch = dict(
        speakers=rng.randint(0, 4, (acc, B)).astype(np.int32),
        texts=rng.randint(1, 200, (acc, B, L)).astype(np.int32),
        src_lens=np.full((acc, B), L, np.int32),
        mels=rng.randn(acc, B, T, 80).astype(np.float32),
        mel_lens=d.sum(-1).astype(np.int32),
        energies=rng.randn(acc, B, L).astype(np.float32),
        durations=d.astype(np.int32),
        pitches_raw=rng.randn(acc, B, L).astype(np.float32),
        pitches_cwt=rng.randn(acc, B, L, 11).astype(np.float32),
        pitches_mean=rng.randn(acc, B).astype(np.float32),
        pitches_std=rng.rand(acc, B).astype(np.float32),
    )
    sample = (superbatch["speakers"][0], superbatch["texts"][0],
              superbatch["src_lens"][0])

    losses = {}
    for name, m in (
            ("f32", mc),
            ("bf16", dataclasses.replace(mc, attention_probs_bf16=True))):
        model = FastSpeech2(
            model_config=m, n_speakers=4, pitch_min=-2.0, pitch_max=2.0,
            energy_min=-2.0, energy_max=2.0)
        state = create_train_state(model, opt, jax.random.PRNGKey(0), sample)
        _, out = make_train_step(model, opt)(
            state, superbatch, jax.random.PRNGKey(1))
        losses[name] = float(out.total)

    assert np.isfinite(losses["bf16"])
    assert abs(losses["bf16"] - losses["f32"]) < 2e-2 * abs(losses["f32"]), (
        losses)
