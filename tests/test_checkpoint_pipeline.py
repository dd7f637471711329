"""End-to-end checkpoint ingestion: reference-layout .pth.tar files on disk
-> pipeline.TTSKing loads, converts and synthesizes. This is the exact
switch-over path a reference user takes (config.yaml weights_path pointing at
290000.pth.tar / hifi.pth), plus a CWT-mode training smoke test."""

import json
import os
import shutil

import numpy as np
import pytest

import tests.conftest as cf
from tests.oracle_util import run_oracle

pytestmark = pytest.mark.skipif(
    not cf.reference_available(), reason="reference tree not mounted")

HID, FILT, ENC, DEC, NSPK, SEQ = 32, 64, 2, 2, 4, 96


def test_ttsking_from_reference_checkpoints(tmp_path):
    from tts_king_tpu.config import (
        ModelConfig, TransformerConfig, TTSConfig, VariancePredictorConfig,
        VocoderModelConfig, AcousticCheckpointConfig)
    from tts_king_tpu.pipeline import TTSKing

    model_dir = tmp_path / "pretrained"
    model_dir.mkdir()
    fs2_path = str(model_dir / "290000.pth.tar")
    hifi_path = str(model_dir / "hifi.pth")
    # speakers.json + stats.json live next to the weights (fsapi.py:13-17)
    shutil.copy(os.path.join(cf.REFERENCE_ROOT, "pretrained", "stats.json"),
                model_dir / "stats.json")
    with open(model_dir / "speakers.json", "w") as f:
        json.dump({f"spk{i}": i for i in range(NSPK)}, f)

    run_oracle("save_reference_checkpoints", cache=False, inputs=dict(
        seed=99, stats_dir=os.path.join(cf.REFERENCE_ROOT, "pretrained"),
        encoder_layer=ENC, decoder_layer=DEC, hidden=HID, filter=FILT,
        max_seq_len=SEQ, n_speakers=NSPK,
        fs2_out=fs2_path, hifi_out=hifi_path,
        upsample_rates=np.array([4, 4]),
        upsample_kernel_sizes=np.array([8, 8]),
        upsample_initial_channel=16,
        resblock_kernel_sizes=np.array([3]),
        resblock_dilation_sizes=np.array([[1, 3, 5]])))

    cfg = TTSConfig(
        acoustic=AcousticCheckpointConfig(weights_path=fs2_path),
        vocoder=VocoderModelConfig(
            weights_path=hifi_path, upsample_rates=[4, 4],
            upsample_kernel_sizes=[8, 8], upsample_initial_channel=16,
            resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3, 5]]),
        model=ModelConfig(
            transformer=TransformerConfig(
                encoder_layer=ENC, encoder_head=2, encoder_hidden=HID,
                variance_hidden=HID, decoder_layer=DEC, decoder_head=2,
                decoder_hidden=HID, conv_filter_size=FILT),
            variance_predictor=VariancePredictorConfig(filter_size=HID),
            max_seq_len=SEQ))

    king = TTSKing(cfg)
    # speaker map picked up from the checkpoint directory
    assert king.speakers == [f"spk{i}" for i in range(NSPK)]
    # converted speaker embedding present (split-embedding re-injection)
    assert "speaker_emb" in king.tts.variables["params"]

    phonemes = np.array([[70, 80, 90, 100, 64]])
    out = king.tts.generate(phonemes, speaker_name="spk2")
    mel = np.asarray(out["postnet_mel"])
    assert mel.shape[-1] == 80
    assert np.isfinite(mel).all()
    wavs = king.vocoder.generate(out["postnet_mel"][:, :16])
    assert wavs.shape == (1, 16 * 16)
    assert wavs.dtype == np.int16


@pytest.mark.slow
def test_cwt_mode_training_step():
    """Gradients flow through the CWT pitch path (11-ch predictor, scalar
    heads, in-graph inverse CWT) without NaNs."""
    import dataclasses

    import jax

    from tests.test_train import _synthetic_superbatch, _tiny_setup
    from tts_king_tpu.models.fs2 import FastSpeech2
    from tts_king_tpu.train.state import create_train_state
    from tts_king_tpu.train.step import make_train_step

    model, opt, state, mc = _tiny_setup()
    mc_cwt = dataclasses.replace(mc, use_cwt=True)
    model = FastSpeech2(model_config=mc_cwt, n_speakers=3, pitch_min=-2,
                        pitch_max=2, energy_min=-2, energy_max=2)
    sb = _synthetic_superbatch(2, 4, 6, 12)
    state = create_train_state(model, opt, jax.random.PRNGKey(0),
                               (sb["speakers"][0], sb["texts"][0],
                                sb["src_lens"][0]))
    step = jax.jit(make_train_step(model, opt, use_cwt=True))
    for i in range(2):
        state, losses = step(state, sb, jax.random.PRNGKey(i))
        assert np.isfinite(float(losses.total))
        assert np.isfinite(float(losses.pitch_mean))
        assert np.isfinite(float(losses.pitch_std))
    assert int(state.step) == 2
