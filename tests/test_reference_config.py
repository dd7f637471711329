"""The reference's own config.yaml must drive this framework end to end:
load, build models at the exact shipped sizes, synthesize (random weights;
the weight files are external downloads upstream too)."""

import os

import numpy as np
import pytest

import tests.conftest as cf

pytestmark = pytest.mark.skipif(
    not cf.reference_available(), reason="reference tree not mounted")


def test_reference_config_drives_pipeline():
    import dataclasses

    from tts_king_tpu.config import load_config
    from tts_king_tpu.pipeline import AcousticModel, Vocoder

    cfg = load_config(os.path.join(cf.REFERENCE_ROOT, "config.yaml"))
    assert cfg.model.transformer.encoder_layer == 4
    assert cfg.model.transformer.decoder_layer == 6
    assert cfg.model.max_seq_len == 1000
    assert cfg.vocoder.upsample_rates == [8, 8, 2, 2]
    assert cfg.train.optimizer.grad_acc_step == 4
    assert cfg.train.optimizer.anneal_steps == [300000, 400000, 500000]

    # shrink nothing: build at full shipped size, weights random (the
    # .pth.tar files are Google-Drive downloads upstream, not in-tree)
    cfg = dataclasses.replace(
        cfg, acoustic=dataclasses.replace(cfg.acoustic, weights_path=None),
        vocoder=dataclasses.replace(cfg.vocoder, weights_path=None))

    # speakers.json/stats.json from the reference's pretrained dir
    stats_dir = os.path.join(cf.REFERENCE_ROOT, "pretrained")
    import json

    with open(os.path.join(stats_dir, "stats.json")) as f:
        stats = json.load(f)
    with open(os.path.join(stats_dir, "speakers.json")) as f:
        n_speakers = len(json.load(f))
    assert n_speakers == 66

    am = AcousticModel(cfg, n_speakers=n_speakers, stats=stats)
    phonemes = np.array([[70, 80, 90, 100, 64, 148]])
    out = am.generate(phonemes, speaker_name=3)
    mel = np.asarray(out["postnet_mel"])
    assert mel.shape[-1] == 80
    assert np.isfinite(mel).all()

    voc = Vocoder(cfg)
    wav = voc.generate(mel[:, :8])
    assert wav.shape == (1, 8 * 256)
