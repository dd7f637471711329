"""Synthesis pipeline smoke tests: acoustic driver bucketing, vocoder int16
output, TTSKing end-to-end with the lexicon G2P fallback."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_cfg(tmp_path_factory):
    from tts_king_tpu.config import (
        ModelConfig, TransformerConfig, TTSConfig, VariancePredictorConfig,
        VocoderModelConfig)

    cfg = TTSConfig(
        model=ModelConfig(
            transformer=TransformerConfig(
                encoder_layer=1, encoder_head=2, encoder_hidden=16,
                variance_hidden=16, decoder_layer=1, decoder_head=2,
                decoder_hidden=16, conv_filter_size=32),
            variance_predictor=VariancePredictorConfig(filter_size=16),
            max_seq_len=256),
        vocoder=VocoderModelConfig(
            upsample_rates=[8, 8, 2, 2],
            upsample_kernel_sizes=[16, 16, 4, 4],
            upsample_initial_channel=16,
            resblock_kernel_sizes=[3],
            resblock_dilation_sizes=[[1, 3, 5]]),
    )
    return cfg


def test_acoustic_generate_buckets(small_cfg):
    from tts_king_tpu.pipeline import AcousticModel

    am = AcousticModel(small_cfg, n_speakers=4)
    phonemes = np.array([[5, 8, 100, 120, 64, 64, 9]])
    out = am.generate(phonemes, speaker_name=1)
    mel = np.asarray(out["postnet_mel"])
    assert mel.shape[-1] == 80
    assert mel.shape[1] in (128, 256)  # a mel bucket
    assert int(np.asarray(out["mel_lens"])[0]) >= 0

    # duration control scales predicted length
    out_fast = am.generate(phonemes, duration_control=0.5, speaker_name=1)
    assert (int(np.asarray(out_fast["mel_lens"])[0])
            <= int(np.asarray(out["mel_lens"])[0]))


def test_vocoder_generate(small_cfg):
    from tts_king_tpu.pipeline import Vocoder

    voc = Vocoder(small_cfg)
    mel = np.random.RandomState(0).randn(2, 32, 80).astype(np.float32)
    wavs = voc.generate(mel)
    assert wavs.dtype == np.int16
    assert wavs.shape == (2, 32 * 256)
    trimmed = voc.generate(mel, lengths=[1000, 2000])
    assert len(trimmed[0]) == 1000 and len(trimmed[1]) == 2000


def test_vocoder_int16_cast_matches_numpy_semantics(small_cfg):
    """The device-side scale+cast (Vocoder.vocode_int16 / _cast_i16) must
    reproduce the reference's host conversion `(w * 32768).astype(np.int16)`
    (hifiapi.py:49-51) BIT-EXACTLY — including the wrap at exactly full
    scale, where XLA's direct f32->s16 would saturate instead. Guarded by
    the f32->s32->s16 hop; this pins that behavior."""
    from tts_king_tpu.pipeline import Vocoder

    voc = Vocoder(small_cfg)
    scale = small_cfg.vocoder.max_wav_value
    w = np.concatenate([
        np.array([1.0, -1.0, 0.999969, -1.000031, 0.0, 0.5, -0.5],
                 np.float32),
        np.random.RandomState(3).uniform(-1, 1, 4096).astype(np.float32)])
    host = (w * scale).astype(np.int16)
    dev = np.asarray(voc._cast_i16(w))
    np.testing.assert_array_equal(dev, host)

    # the fused apply+cast path agrees with apply-then-cast
    mel = np.random.RandomState(4).randn(1, 24, 80).astype(np.float32)
    fused = np.asarray(voc.vocode_int16(mel))
    two_step = (np.asarray(voc(mel), np.float32) * scale).astype(np.int16)
    assert np.mean(np.abs(fused.astype(np.int32)
                          - two_step.astype(np.int32)) > 1) < 1e-3


def test_ttsking_speak_with_lexicon(small_cfg, tmp_path):
    from tts_king_tpu.pipeline import TTSKing

    lex = tmp_path / "mini.dict"
    lex.write_text(
        "привет P R I0 V E0 T\nмир M I0 R\n", encoding="utf-8")
    small_cfg.preprocess.lexicon_path = str(lex)

    king = TTSKing(small_cfg)
    assert king.speakers  # fallback speaker list

    seq = king.text_preprocess("привет мир")
    assert seq.shape[0] == 1 and seq.shape[1] > 5

    # Untrained weights predict ~zero durations; bias the duration head so
    # the length regulator expands to a few frames per phoneme.
    import jax.numpy as jnp

    params = king.tts.variables["params"]
    dp = params["variance_adaptor"]["duration_predictor"]["linear_layer"]
    dp["bias"] = jnp.full_like(dp["bias"], 1.5)  # exp(1.5)-1 ~ 3.5 frames

    wavs = king.speak("привет мир")  # list of per-item trimmed int16 arrays
    assert len(wavs) == 1
    assert wavs[0].dtype == np.int16
    assert wavs[0].ndim == 1 and len(wavs[0]) > 0


def test_vocoder_melgan_choice(small_cfg):
    import dataclasses

    from tts_king_tpu.pipeline import Vocoder

    cfg = dataclasses.replace(
        small_cfg, model=dataclasses.replace(small_cfg.model,
                                             vocoder_model="MelGAN"))
    cfg.vocoder.upsample_rates = [4, 2]
    voc = Vocoder(cfg)
    mel = np.random.RandomState(0).randn(1, 24, 80).astype(np.float32)
    wavs = voc.generate(mel)
    assert wavs.shape == (1, 24 * 8)
    assert wavs.dtype == np.int16


def test_ttsking_unknown_words_become_pauses(small_cfg, tmp_path):
    from tts_king_tpu.text.g2p import preprocess_with_lexicon, read_lexicon
    from tts_king_tpu.text.symbols import symbols

    lex = tmp_path / "mini2.dict"
    lex.write_text("привет P R I0 V E0 T\n", encoding="utf-8")
    lexicon = read_lexicon(str(lex))
    seq = preprocess_with_lexicon("привет xyzzy", lexicon)
    names = [symbols[i] for i in seq]
    assert "@sp" in names  # unknown word -> pause


def test_bucket_escalation_no_truncation(small_cfg, monkeypatch):
    """Regression: escalation must key off the RAW predicted length —
    mel_lens is clamped to the bucket in-model, so checking it could never
    trigger and under-guessed utterances were silently truncated (the
    reference never truncates at inference, modules.py:220-252)."""
    import jax.numpy as jnp

    import tts_king_tpu.pipeline as pipeline
    from tts_king_tpu.pipeline import TTSKing

    king = TTSKing(small_cfg)
    dp = king.tts.variables["params"]["variance_adaptor"][
        "duration_predictor"]["linear_layer"]
    dp["bias"] = jnp.full_like(dp["bias"], 1.5)  # ~4.5 frames/phoneme

    phonemes = np.random.RandomState(3).randint(10, 100, size=(1, 40))
    ref = king.tts.generate(phonemes)         # good first guess (8 f/ph)
    ref_len = int(np.asarray(ref["mel_lens"])[0])
    assert ref_len > 128

    # Force a first guess that overflows bucket 128: must escalate, not
    # truncate.
    monkeypatch.setattr(pipeline, "_FRAMES_PER_PHONE_GUESS", 1.0)
    out = king.tts.generate(phonemes)
    assert int(np.asarray(out["mel_lens"])[0]) == ref_len
    assert out["postnet_mel"].shape[1] >= ref_len
