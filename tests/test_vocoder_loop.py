"""Vocoder training driver: run a few GAN steps over real wav files, save a
checkpoint holding both the folded inference params and the full GAN state."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from scipy.io import wavfile

from tests.test_vocoder_training import _tiny_cfg


def test_vocoder_loop_and_checkpoint(tmp_path):
    import jax.numpy as jnp

    from tts_king_tpu.config import TTSConfig, TrainConfig
    from tts_king_tpu.checkpoint import restore_train_state
    from tts_king_tpu.models.hifigan import Generator
    from tts_king_tpu.train.vocoder_loop import train_vocoder

    vc = _tiny_cfg()
    cfg = TTSConfig(vocoder=vc,
                    train=TrainConfig(ckpt_path=str(tmp_path / "ckpt"),
                                      result_path=str(tmp_path / "res")))
    wavs = []
    for i in range(4):
        t = np.arange(2000 + 500 * i) / vc.sampling_rate
        w = (0.5 * np.sin(2 * np.pi * (180 + 40 * i) * t) * 30000)
        p = tmp_path / f"w{i}.wav"
        wavfile.write(str(p), vc.sampling_rate, w.astype(np.int16))
        wavs.append(str(p))

    vc.batch_size = 2
    # batch 2 cannot shard over the 8 virtual devices: the driver must fail
    # loudly (same contract as the FS2 loop), not silently go single-device
    with pytest.raises(ValueError, match="does not shard evenly"):
        train_vocoder(cfg, wavs, max_steps=2,
                      disc_p_channels=(4, 8, 8, 8, 8), msd_width=32)
    # fewer training wavs than a batch: fail loudly, don't busy-spin on an
    # empty epoch forever
    with pytest.raises(ValueError, match="training wavs"):
        train_vocoder(cfg, wavs[:1], max_steps=2, use_mesh=False,
                      disc_p_channels=(4, 8, 8, 8, 8), msd_width=32)
    state = train_vocoder(cfg, wavs[1:], val_paths=wavs[:1],
                          max_steps=2, log_every=1, save_every=2,
                          disc_p_channels=(4, 8, 8, 8, 8), msd_width=32,
                          use_mesh=False)
    assert int(state.step) == 2

    ckpt_dir = os.path.join(cfg.train.ckpt_path, "vocoder")
    payload = restore_train_state(ckpt_dir)
    assert int(payload["step"]) == 2
    # the saved inference params drive a plain (weight-norm-free) Generator
    gen = Generator(vc, weight_norm=False)
    mel = jnp.zeros((1, 8, vc.num_mels))
    wav = gen.apply({"params": payload["params"]}, mel)
    assert wav.shape == (1, 8 * 16)
    # metrics logged
    metrics = os.path.join(cfg.train.result_path, "multi_vocoder.metrics.jsonl")
    assert os.path.exists(metrics)
    content = open(metrics).read()
    assert '"phase": "vocoder"' in content
    # validation mel-L1 runs at save cadence on the val split (cycled up
    # to one full batch when smaller than batch_size)
    assert '"phase": "vocoder_val"' in content
    assert '"val_mel_l1"' in content
