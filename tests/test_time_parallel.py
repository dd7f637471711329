"""Sequence-parallel vocoding (ops/time_parallel.py): one long mel sharded
over the 8-device mesh with ppermute halo exchange must reproduce the
full-pass waveform — exactly in every device slice's interior, and within
the edge-padding contract at the global sequence boundaries (same contract
as streaming, tests/test_streaming.py)."""

import numpy as np
import pytest


def _small_voc_config():
    from tts_king_tpu.config import VocoderModelConfig

    # small but real: two upsample stages, both resblock kernel sets
    return VocoderModelConfig(upsample_rates=[4, 4],
                              upsample_kernel_sizes=[8, 8],
                              upsample_initial_channel=32,
                              resblock_kernel_sizes=[3, 7],
                              resblock_dilation_sizes=[[1, 3], [1, 3]])


@pytest.mark.slow  # ~18 min on the 1-core CPU box (full-size halo config);
# the melgan variant below keeps ppermute-halo equality in the fast tier
def test_time_sharded_matches_full_pass():
    import jax
    import jax.numpy as jnp

    from tts_king_tpu.models.hifigan import Generator
    from tts_king_tpu.ops.streaming import generator_receptive_field
    from tts_king_tpu.ops.time_parallel import vocoder_time_sharded
    from tts_king_tpu.parallel.mesh import build_mesh

    cfg = _small_voc_config()
    up = int(np.prod(cfg.upsample_rates))
    voc = Generator(cfg)
    T = 400  # not divisible by 8 -> exercises the pad/trim path
    mel = jnp.asarray(np.random.RandomState(0).randn(1, T, 80), jnp.float32)
    variables = voc.init(jax.random.PRNGKey(0), mel[:, :16])

    full = np.asarray(voc.apply(variables, mel))[0]

    mesh = build_mesh(dp=8, tp=1)
    halo = generator_receptive_field(cfg)
    wav = vocoder_time_sharded(
        lambda v, m: voc.apply(v, m), variables, mel, mesh,
        halo_frames=halo, upsample=up)
    wav = np.asarray(wav)[0]

    assert wav.shape == full.shape == (T * up,)
    # Interior: exact (each device's halo covers the receptive field).
    edge = halo * up
    np.testing.assert_allclose(wav[edge:-edge], full[edge:-edge],
                               rtol=1e-5, atol=1e-5)
    # Global edges: mel-space zero halo vs conv-level zero padding — close
    # but not bit-equal; bound it.
    assert float(np.max(np.abs(wav[:edge] - full[:edge]))) < 0.2
    assert float(np.max(np.abs(wav[-edge:] - full[-edge:]))) < 0.2


def test_time_sharded_too_short_raises():
    import jax
    import jax.numpy as jnp

    from tts_king_tpu.models.hifigan import Generator
    from tts_king_tpu.ops.time_parallel import vocoder_time_sharded
    from tts_king_tpu.parallel.mesh import build_mesh

    cfg = _small_voc_config()
    voc = Generator(cfg)
    mel = jnp.zeros((1, 40, 80), jnp.float32)
    variables = voc.init(jax.random.PRNGKey(0), mel[:, :16])
    mesh = build_mesh(dp=8, tp=1)
    with pytest.raises(ValueError, match="too short"):
        vocoder_time_sharded(lambda v, m: voc.apply(v, m), variables, mel,
                             mesh, halo_frames=24, upsample=16)


def test_pipeline_generate_long():
    """Vocoder.generate_long end to end on the mesh: int16, right length,
    matches Vocoder.generate in the interior."""
    import dataclasses

    import jax

    from tts_king_tpu.config import TTSConfig
    from tts_king_tpu.ops.streaming import generator_receptive_field
    from tts_king_tpu.parallel.mesh import build_mesh
    from tts_king_tpu.pipeline import Vocoder

    cfg = TTSConfig()
    cfg = dataclasses.replace(cfg, vocoder=_small_voc_config())
    voc = Vocoder(cfg)  # seed-deterministic init
    up = int(np.prod(cfg.vocoder.upsample_rates))

    T = 320
    mel = np.random.RandomState(1).randn(1, T, 80).astype(np.float32)
    full = voc.generate(mel)[0]

    mesh = build_mesh(dp=8, tp=1)
    wav = voc.generate_long(mel, mesh)
    assert wav.dtype == np.int16 and wav.shape == (T * up,)
    edge = generator_receptive_field(cfg.vocoder) * up
    # int16 after identical f32 math: allow +-1 LSB
    assert np.max(np.abs(wav[edge:-edge].astype(np.int32)
                         - full[edge:-edge].astype(np.int32))) <= 1


@pytest.mark.slow
def test_time_sharded_melgan_matches_full_pass():
    """The MelGAN generator (reflect-padded resnet stacks, dilations 3^j)
    has a ~10-mel-frame one-sided receptive field — smaller than the
    HiFi-GAN-derived halo generate_long uses, so the same halo is
    conservative-safe. Pin that: interior samples bit-match the full pass."""
    import jax
    import jax.numpy as jnp

    from tts_king_tpu.models.melgan import MelGANGenerator
    from tts_king_tpu.ops.time_parallel import vocoder_time_sharded
    from tts_king_tpu.parallel.mesh import build_mesh

    voc = MelGANGenerator(ngf=8, n_residual_layers=2, ratios=(4, 4))
    up = 16
    T = 328  # not divisible by 8
    mel = jnp.asarray(np.random.RandomState(2).randn(1, T, 80), jnp.float32)
    variables = voc.init(jax.random.PRNGKey(0), mel[:, :16])

    full = np.asarray(voc.apply(variables, mel))[0]

    mesh = build_mesh(dp=8, tp=1)
    halo = 16
    wav = np.asarray(vocoder_time_sharded(
        lambda v, m: voc.apply(v, m), variables, mel, mesh,
        halo_frames=halo, upsample=up))[0]

    assert wav.shape == full.shape == (T * up,)
    edge = halo * up
    np.testing.assert_allclose(wav[edge:-edge], full[edge:-edge],
                               rtol=1e-5, atol=1e-5)
