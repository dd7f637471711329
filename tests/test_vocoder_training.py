"""HiFi-GAN GAN-training tests: the step runs, losses are finite and the
generator actually improves its mel-L1 on a fixed batch; weight-norm export
matches the inference Generator."""

import numpy as np
import pytest


def _tiny_cfg():
    from tts_king_tpu.config import VocoderModelConfig

    # self-consistent tiny config: upsample product 4*4 == hop_size 16
    return VocoderModelConfig(
        upsample_rates=[4, 4], upsample_kernel_sizes=[8, 8],
        upsample_initial_channel=8, resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3]], segment_size=512,
        n_fft=64, hop_size=16, win_size=64, num_mels=16,
        mel_fmax=8000.0)


@pytest.fixture(scope="module")
def trainer_and_state():
    import jax

    from tts_king_tpu.train.vocoder import VocoderTrainer

    cfg = _tiny_cfg()
    tr = VocoderTrainer(cfg, disc_p_channels=(4, 8, 8, 8, 8), msd_width=32)
    state = tr.init_state(jax.random.PRNGKey(0),
                          cfg.segment_size // cfg.hop_size)
    return cfg, tr, state


@pytest.mark.slow
def test_gan_step_runs_and_learns(trainer_and_state):
    import jax

    cfg, tr, state = trainer_and_state
    frames = cfg.segment_size // cfg.hop_size
    t = np.arange(cfg.segment_size) / cfg.sampling_rate
    wav = np.stack([0.5 * np.sin(2 * np.pi * 220 * t),
                    0.5 * np.sin(2 * np.pi * 330 * t)]).astype(np.float32)
    from tts_king_tpu.ops.stft import hifigan_mel

    mel = np.asarray(hifigan_mel(wav, cfg.n_fft, cfg.num_mels,
                                 cfg.sampling_rate, cfg.hop_size,
                                 cfg.win_size, 0.0, 8000.0))[:, :frames]
    batch = {"mel": mel, "wav": wav, "mel_loss": mel}

    step = jax.jit(tr.make_train_step())
    mel_l1_first = None
    for i in range(4):
        state, losses = step(state, batch)
        for name, v in losses._asdict().items():
            assert np.isfinite(float(v)), f"{name} not finite at step {i}"
        if mel_l1_first is None:
            mel_l1_first = float(losses.mel_l1)
    assert int(state.step) == 4
    assert float(losses.mel_l1) < mel_l1_first, "generator did not improve"


@pytest.mark.slow
def test_weight_norm_export_matches_inference(trainer_and_state):
    import jax
    import jax.numpy as jnp

    from tts_king_tpu.models.hifigan import Generator

    cfg, tr, state = trainer_and_state
    mel = jnp.asarray(
        np.random.RandomState(1).randn(1, 8, cfg.num_mels), jnp.float32)
    wn_out = tr.gen.apply({"params": state.gen_params}, mel)
    folded = tr.export_inference_params(state.gen_params)
    plain = Generator(cfg, weight_norm=False)
    plain_out = plain.apply({"params": folded}, mel)
    np.testing.assert_allclose(np.array(wn_out), np.array(plain_out),
                               rtol=1e-5, atol=1e-6)


def test_mel_dataset_segments(tmp_path):
    from scipy.io import wavfile

    from tts_king_tpu.data.mel_dataset import MelDataset

    cfg = _tiny_cfg()
    paths = []
    for i in range(3):
        t = np.arange(6000 + 1000 * i) / cfg.sampling_rate
        wav = (0.4 * np.sin(2 * np.pi * (200 + 50 * i) * t) * 32000)
        p = tmp_path / f"w{i}.wav"
        wavfile.write(str(p), cfg.sampling_rate, wav.astype(np.int16))
        paths.append(str(p))

    ds = MelDataset(paths, cfg, split=True)
    batches = list(ds.batches(batch_size=2, seed=0))
    assert batches
    b = batches[0]
    assert b["wav"].shape == (2, cfg.segment_size)
    frames = cfg.segment_size // cfg.hop_size
    assert b["mel"].shape == (2, frames, cfg.num_mels)
    assert b["mel_loss"].shape == (2, frames, cfg.num_mels)


@pytest.mark.slow
def test_gan_step_sharded_equals_unsharded(trainer_and_state):
    """DP over the virtual 8-device mesh changes nothing numerically: one
    GAN step on a dp-sharded batch with replicated params bit-matches the
    single-device step (same contract the FS2 step has)."""
    import jax

    from tts_king_tpu.parallel.mesh import (build_mesh, globalize_batch,
                                            replicated)

    cfg, tr, state0 = trainer_and_state
    frames = cfg.segment_size // cfg.hop_size
    rng = np.random.RandomState(7)
    B = 8
    t = np.arange(cfg.segment_size) / cfg.sampling_rate
    wav = np.stack([0.4 * np.sin(2 * np.pi * (150 + 30 * i) * t)
                    for i in range(B)]).astype(np.float32)
    from tts_king_tpu.ops.stft import hifigan_mel

    mel = np.asarray(hifigan_mel(wav, cfg.n_fft, cfg.num_mels,
                                 cfg.sampling_rate, cfg.hop_size,
                                 cfg.win_size, 0.0, 8000.0))[:, :frames]
    batch = {"mel": mel, "wav": wav, "mel_loss": mel}

    step = jax.jit(tr.make_train_step())
    ref_state, ref_losses = step(state0, batch)

    mesh = build_mesh(dp=-1, tp=1)
    sh_state = jax.device_put(state0, replicated(mesh))
    sh_batch = globalize_batch(mesh, batch)
    new_state, losses = step(sh_state, sh_batch)

    np.testing.assert_allclose(float(losses.disc), float(ref_losses.disc),
                               rtol=1e-5)
    np.testing.assert_allclose(float(losses.gen), float(ref_losses.gen),
                               rtol=1e-5)
    a = jax.device_get(new_state.gen_params)
    b = jax.device_get(ref_state.gen_params)
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(x, y, rtol=2e-5, atol=2e-6)


def test_mel_dataset_sharded_batches_bit_match(tmp_path):
    """Per-process sharded loading (shard=(rank, n)) concatenates to the
    EXACT unsharded batch: per-item crop RNG is keyed on epoch position,
    not on a sequential stream (the multi-host determinism contract)."""
    import numpy as np
    from scipy.io import wavfile

    from tts_king_tpu.data.mel_dataset import MelDataset

    cfg = _tiny_cfg()
    rng = np.random.RandomState(7)
    paths = []
    for i in range(8):
        n = 900 + int(rng.randint(0, 600))
        w = (0.4 * np.sin(2 * np.pi * (100 + 20 * i)
                          * np.arange(n) / 22050.0) * 30000)
        p = tmp_path / f"m{i}.wav"
        wavfile.write(str(p), 22050, w.astype(np.int16))
        paths.append(str(p))

    full = list(MelDataset(paths, cfg, seed=5).batches(4, seed=9))
    sh0 = list(MelDataset(paths, cfg, seed=5).batches(4, seed=9,
                                                      shard=(0, 2)))
    sh1 = list(MelDataset(paths, cfg, seed=5).batches(4, seed=9,
                                                      shard=(1, 2)))
    assert len(full) == len(sh0) == len(sh1) == 2
    for f, a, b in zip(full, sh0, sh1):
        for k in ("mel", "wav", "mel_loss"):
            assert a[k].shape[0] == 2 and b[k].shape[0] == 2
            assert np.array_equal(np.concatenate([a[k], b[k]]), f[k])

    with pytest.raises(ValueError, match="not divisible"):
        next(MelDataset(paths, cfg, seed=5).batches(4, seed=9, shard=(0, 3)))


def test_msd_blockdiag_lowering_matches_native():
    """grouped_lowering="auto" (block-diag dense convs on the layers where
    the dense form measured faster) computes the same function as the
    native grouped lowering: the off-block weights are exact zeros, so the
    only difference is the dense conv's reduction order (float rounding,
    ~1e-7 relative)."""
    import jax
    import jax.numpy as jnp

    from tts_king_tpu.models.hifigan import DiscriminatorS

    x = jnp.asarray(np.random.RandomState(3).randn(2, 1024), jnp.float32)
    d_auto = DiscriminatorS(width=8, grouped_lowering="auto")
    d_native = DiscriminatorS(width=8, grouped_lowering="native")
    variables = d_auto.init(jax.random.PRNGKey(0), x)
    out_a, fm_a = d_auto.apply(variables, x)
    out_n, fm_n = d_native.apply(variables, x)
    np.testing.assert_allclose(out_a, out_n, rtol=2e-5, atol=1e-6)
    for a, n in zip(fm_a, fm_n):
        np.testing.assert_allclose(a, n, rtol=2e-5, atol=1e-6)


@pytest.mark.slow
def test_gan_step_bf16_compute_matches_f32():
    """bf16 compute-dtype GAN step (the TPU training fast path): same
    params, same batch — losses must be finite and track the f32 step
    within bf16 tolerance, and the updated params must stay f32."""
    import jax
    import jax.numpy as jnp

    from tts_king_tpu.train.vocoder import VocoderTrainer

    cfg = _tiny_cfg()
    tr32 = VocoderTrainer(cfg, disc_p_channels=(4, 8, 8, 8, 8),
                          msd_width=32)
    tr16 = VocoderTrainer(cfg, disc_p_channels=(4, 8, 8, 8, 8),
                          msd_width=32, compute_dtype=jnp.bfloat16)
    state32 = tr32.init_state(jax.random.PRNGKey(0),
                              cfg.segment_size // cfg.hop_size)
    # identical parameters for both dtypes (init graphs match: params f32)
    state16 = state32

    frames = cfg.segment_size // cfg.hop_size
    t = np.arange(cfg.segment_size) / cfg.sampling_rate
    wav = np.stack([0.5 * np.sin(2 * np.pi * 220 * t),
                    0.5 * np.sin(2 * np.pi * 330 * t)]).astype(np.float32)
    from tts_king_tpu.ops.stft import hifigan_mel

    mel = np.asarray(hifigan_mel(wav, cfg.n_fft, cfg.num_mels,
                                 cfg.sampling_rate, cfg.hop_size,
                                 cfg.win_size, 0.0, 8000.0))[:, :frames]
    batch = {"mel": mel, "wav": wav, "mel_loss": mel}

    s32, l32 = jax.jit(tr32.make_train_step())(state32, batch)
    s16, l16 = jax.jit(tr16.make_train_step())(state16, batch)

    for name in l32._fields:
        a, b = float(getattr(l32, name)), float(getattr(l16, name))
        assert np.isfinite(b), f"{name} not finite in bf16"
        assert abs(a - b) <= 0.05 * max(abs(a), 1.0), \
            f"{name}: f32 {a} vs bf16 {b}"
    leaves16 = jax.tree_util.tree_leaves(s16.gen_params)
    assert all(x.dtype == jnp.float32 for x in leaves16), \
        "bf16 compute must keep f32 master params"
