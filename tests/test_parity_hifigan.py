"""HiFi-GAN generator parity vs the reference torch implementation
(hifi/models.py:146-210), including weight-norm folding in the converter."""

import numpy as np
import pytest

import tests.conftest as cf
from tests.oracle_util import run_oracle

pytestmark = pytest.mark.skipif(
    not cf.oracle_available(),
    reason="reference tree not mounted and no oracle recordings")


def _small_cfg():
    from tts_king_tpu.config import VocoderModelConfig

    return VocoderModelConfig(
        resblock="1",
        upsample_rates=[4, 4],
        upsample_kernel_sizes=[8, 8],
        upsample_initial_channel=32,
        resblock_kernel_sizes=[3, 7],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
        num_mels=80,
    )


def test_generator_parity():
    from tts_king_tpu.checkpoint import convert_hifigan_generator
    from tts_king_tpu.models.hifigan import Generator

    cfg = _small_cfg()
    rng = np.random.RandomState(0)
    B, T = 2, 23
    mel = rng.randn(B, 80, T).astype(np.float32) * 2.0 - 4.0

    out = run_oracle("reference_hifigan", dict(
        seed=21, resblock=cfg.resblock,
        upsample_rates=np.array(cfg.upsample_rates),
        upsample_kernel_sizes=np.array(cfg.upsample_kernel_sizes),
        upsample_initial_channel=cfg.upsample_initial_channel,
        resblock_kernel_sizes=np.array(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=np.array(cfg.resblock_dilation_sizes),
        mel=mel,
    ))
    state = {k[len("state__"):]: v for k, v in out.items()
             if k.startswith("state__")}
    variables = convert_hifigan_generator(
        state, n_ups=len(cfg.upsample_rates),
        n_kernels=len(cfg.resblock_kernel_sizes))

    model = Generator(cfg)
    wav = np.array(model.apply(variables, mel.transpose(0, 2, 1)))

    ref_wav = out["wav"][:, 0, :]  # torch (B, 1, T_wav)
    assert wav.shape == ref_wav.shape  # T * prod(upsample_rates)
    assert wav.shape[1] == T * 16
    np.testing.assert_allclose(wav, ref_wav, rtol=1e-4, atol=1e-5)


def test_resblock2_generator_parity():
    from tts_king_tpu.checkpoint import convert_hifigan_generator
    from tts_king_tpu.models.hifigan import Generator
    from tts_king_tpu.config import VocoderModelConfig

    cfg = VocoderModelConfig(
        resblock="2",
        upsample_rates=[4, 2],
        upsample_kernel_sizes=[8, 4],
        upsample_initial_channel=16,
        resblock_kernel_sizes=[3, 5],
        resblock_dilation_sizes=[[1, 3], [1, 3]],
    )
    rng = np.random.RandomState(1)
    mel = rng.randn(1, 80, 11).astype(np.float32)

    out = run_oracle("reference_hifigan", dict(
        seed=5, resblock=cfg.resblock,
        upsample_rates=np.array(cfg.upsample_rates),
        upsample_kernel_sizes=np.array(cfg.upsample_kernel_sizes),
        upsample_initial_channel=cfg.upsample_initial_channel,
        resblock_kernel_sizes=np.array(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=np.array(cfg.resblock_dilation_sizes),
        mel=mel,
    ))
    state = {k[len("state__"):]: v for k, v in out.items()
             if k.startswith("state__")}
    variables = convert_hifigan_generator(state, n_ups=2, n_kernels=2,
                                          n_res_convs=2)
    model = Generator(cfg)
    wav = np.array(model.apply(variables, mel.transpose(0, 2, 1)))
    np.testing.assert_allclose(wav, out["wav"][:, 0, :], rtol=1e-4, atol=1e-5)
