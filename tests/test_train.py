"""Training subsystem tests: Noam schedule, loss parity, sharded train step."""

import numpy as np
import pytest

import tests.conftest as cf
from tests.oracle_util import run_oracle


def reference_noam_lr(step, d_model=256, warmup=4000,
                      anneal_steps=(300000, 400000, 500000), rate=0.7):
    """The ScheduledOptim formula (fs_two/model/optimizer.py:35-45), numpy."""
    lr = min(step ** -0.5, step * warmup ** -1.5)
    for s in anneal_steps:
        if step > s:
            lr *= rate
    return d_model ** -0.5 * lr


def test_noam_schedule_matches_reference():
    from tts_king_tpu.train.schedule import noam_schedule

    lr = noam_schedule(256, 4000, [300000, 400000, 500000], 0.7)
    for step in [1, 10, 1000, 4000, 5000, 299999, 300001, 450000, 600000]:
        got = float(lr(step - 1))  # schedule takes 0-based counts
        want = reference_noam_lr(step)
        np.testing.assert_allclose(got, want, rtol=1e-5,
                                   err_msg=f"step {step}")


@pytest.mark.skipif(not cf.oracle_available(),
                    reason="no reference and no oracle recordings")
def test_loss_parity():
    from tts_king_tpu.train.loss import fastspeech2_loss

    rng = np.random.RandomState(0)
    B, L, T = 3, 10, 24
    src_lens = np.array([10, 7, 4])
    mel_lens = np.array([24, 15, 8])
    src_masks = (np.arange(L)[None] >= src_lens[:, None])
    mel_masks = (np.arange(T)[None] >= mel_lens[:, None])

    data = dict(
        speakers=rng.randint(0, 3, B).astype(np.int64),
        mel_targets=rng.randn(B, T + 3, 80).astype(np.float32),  # longer: trim
        energy_targets=rng.randn(B, L).astype(np.float32),
        duration_targets=rng.randint(0, 5, (B, L)).astype(np.int64),
        pitch_raw_targets=rng.randn(B, L).astype(np.float32),
        pitch_cwt_targets=rng.randn(B, L, 11).astype(np.float32),
        pitch_mean=rng.randn(B).astype(np.float32),
        pitch_std=rng.rand(B).astype(np.float32),
        mel_pred=rng.randn(B, T, 80).astype(np.float32),
        pitch_pred=rng.randn(B, L).astype(np.float32),
        energy_pred=rng.randn(B, L).astype(np.float32),
        logd_pred=rng.randn(B, L).astype(np.float32),
        postnet_pred=rng.randn(B, T, 80).astype(np.float32),
        pitch_mean_pred=rng.randn(B, 1).astype(np.float32),
        pitch_std_pred=rng.rand(B, 1).astype(np.float32),
        src_masks=src_masks.astype(np.int8),
        mel_masks=mel_masks.astype(np.int8),
        use_cwt=False,
    )
    want = run_oracle("fs2_loss", data)

    batch = dict(
        mels=data["mel_targets"],
        energies=data["energy_targets"],
        durations=data["duration_targets"],
        pitches_raw=data["pitch_raw_targets"],
        pitches_cwt=data["pitch_cwt_targets"],
        pitches_mean=data["pitch_mean"],
        pitches_std=data["pitch_std"],
    )
    outputs = dict(
        mel=data["mel_pred"],
        pitch_prediction=data["pitch_pred"],
        energy_prediction=data["energy_pred"],
        log_duration_prediction=data["logd_pred"],
        postnet_mel=data["postnet_pred"],
        pitch_mean=data["pitch_mean_pred"],
        pitch_std=data["pitch_std_pred"],
        src_masks=src_masks,
        mel_masks=mel_masks,
    )
    got = fastspeech2_loss(batch, outputs, use_cwt=False)
    np.testing.assert_allclose(float(got.total), want["total"], rtol=1e-5)
    np.testing.assert_allclose(float(got.mel), want["mel"], rtol=1e-5)
    np.testing.assert_allclose(float(got.pitch), want["pitch"], rtol=1e-5)
    np.testing.assert_allclose(float(got.energy), want["energy"], rtol=1e-5)
    np.testing.assert_allclose(float(got.duration), want["duration"], rtol=1e-5)


def _tiny_setup():
    import jax

    from tts_king_tpu.config import (ModelConfig, TransformerConfig,
                                     VariancePredictorConfig)
    from tts_king_tpu.models.fs2 import FastSpeech2
    from tts_king_tpu.train.state import create_train_state, make_optimizer
    from tts_king_tpu.config import OptimizerConfig

    mc = ModelConfig(
        transformer=TransformerConfig(
            encoder_layer=1, encoder_head=2, encoder_hidden=16,
            variance_hidden=16, decoder_layer=1, decoder_head=2,
            decoder_hidden=16, conv_filter_size=32, conv_kernel_size=(9, 1)),
        variance_predictor=VariancePredictorConfig(filter_size=16),
        max_seq_len=32)
    model = FastSpeech2(model_config=mc, n_speakers=3,
                        pitch_min=-2, pitch_max=2, energy_min=-2, energy_max=2)
    opt = make_optimizer(OptimizerConfig(grad_acc_step=2), 16)

    B, L = 8, 6
    rng = np.random.RandomState(0)
    texts = rng.randint(1, 200, (B, L))
    src_lens = np.full((B,), L)
    speakers = rng.randint(0, 3, (B,))
    state = create_train_state(
        model, opt, jax.random.PRNGKey(0),
        (speakers, texts, src_lens))
    return model, opt, state, mc


def _synthetic_superbatch(acc, B, L, T):
    rng = np.random.RandomState(1)
    d = rng.randint(1, 4, (acc, B, L))
    return dict(
        speakers=rng.randint(0, 3, (acc, B)),
        texts=rng.randint(1, 200, (acc, B, L)),
        src_lens=np.full((acc, B), L),
        mels=rng.randn(acc, B, T, 80).astype(np.float32),
        mel_lens=d.sum(-1),
        energies=rng.randn(acc, B, L).astype(np.float32),
        durations=d,
        pitches_raw=rng.randn(acc, B, L).astype(np.float32),
        pitches_cwt=rng.randn(acc, B, L, 11).astype(np.float32),
        pitches_mean=rng.randn(acc, B).astype(np.float32),
        pitches_std=rng.rand(acc, B).astype(np.float32),
    )


def test_train_step_runs_and_learns():
    import jax

    from tts_king_tpu.train.step import make_train_step

    model, opt, state, mc = _tiny_setup()
    train_step = jax.jit(make_train_step(model, opt))
    superbatch = _synthetic_superbatch(2, 8, 6, 12)

    losses0 = None
    for i in range(8):
        state, losses = train_step(state, superbatch, jax.random.PRNGKey(i))
        assert np.isfinite(float(losses.total)), f"non-finite loss at {i}"
        if losses0 is None:
            losses0 = float(losses.total)
    assert int(state.step) == 8
    # Overfitting a fixed tiny batch must reduce the loss.
    assert float(losses.total) < losses0


@pytest.mark.slow
def test_train_step_sharded_dp_tp():
    import jax

    from tts_king_tpu.parallel.mesh import (batch_specs, build_mesh,
                                            fs2_param_specs, make_shardings,
                                            shard_train_state)
    from tts_king_tpu.train.step import make_train_step

    model, opt, state, mc = _tiny_setup()
    mesh = build_mesh(dp=4, tp=2)
    state = shard_train_state(state, mesh, opt)
    superbatch = _synthetic_superbatch(2, 8, 6, 12)
    superbatch = jax.device_put(
        superbatch, make_shardings(mesh, batch_specs(superbatch, True)))

    train_step = jax.jit(make_train_step(model, opt))
    state2, losses = train_step(state, superbatch, jax.random.PRNGKey(0))
    assert np.isfinite(float(losses.total))

    # Sharded result must match the unsharded one.
    model2, opt2, state_ref, _ = _tiny_setup()
    train_ref = jax.jit(make_train_step(model2, opt2))
    _, losses_ref = train_ref(state_ref, jax.device_get(superbatch),
                              jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(losses.total), float(losses_ref.total),
                               rtol=1e-4)


def test_eval_step():
    import jax

    from tts_king_tpu.train.step import make_eval_step

    model, opt, state, mc = _tiny_setup()
    eval_step = jax.jit(make_eval_step(model))
    sb = _synthetic_superbatch(1, 8, 6, 12)
    batch = jax.tree.map(lambda x: x[0], sb)
    losses = eval_step(state, batch)
    assert np.isfinite(float(losses.total))
