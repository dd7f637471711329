"""Config system: native + reference YAML layouts, validation errors,
unknown-key detection (the drift-bug class the reference suffered from)."""

import dataclasses

import pytest

from tts_king_tpu.config import TTSConfig, load_config


def test_native_layout_roundtrip(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("""
exp_name: t
model:
  transformer:
    encoder_layer: 2
    conv_kernel_size: [9, 1]
  max_seq_len: 500
train:
  optimizer:
    batch_size: 4
    betas: [0.9, 0.98]
""")
    cfg = load_config(str(p))
    assert cfg.model.transformer.encoder_layer == 2
    assert cfg.model.transformer.conv_kernel_size == (9, 1)
    assert cfg.model.max_seq_len == 500
    assert cfg.train.optimizer.betas == (0.9, 0.98)
    # untouched sections keep defaults
    assert cfg.vocoder.upsample_rates == [8, 8, 2, 2]


def test_reference_layout(tmp_path):
    p = tmp_path / "ref.yaml"
    p.write_text("""
exp_name: multi
tts:
  weights_path: ./w.pth.tar
  restore_step: 5
hifi:
  weights_path: ./h.pth
  MAX_WAV_VALUE: 32768
  resblock: "1"
  upsample_rates: [8,8,2,2]
train_config:
  optimizer:
    batch_size: 16
    grad_acc_step: 4
  step:
    total_step: 1000
  max_masks_per_sentence: 0.15
preprocess_config:
  dataset: "MAIN"
  path:
    preprocessed_path: ./proc
  preprocessing:
    val_size: 64
    audio: {sampling_rate: 22050}
    stft: {hop_length: 256}
    mel: {n_mel_channels: 80}
    pitch: {feature: phoneme_level}
    energy: {feature: phoneme_level}
model_config:
  transformer: {encoder_layer: 4, conv_kernel_size: [9, 1]}
  use_cwt: False
  max_seq_len: 1000
  vocoder: {model: "HiFi-GAN", use_cpu: true}
""")
    cfg = load_config(str(p))
    assert cfg.acoustic.weights_path == "./w.pth.tar"
    assert cfg.acoustic.restore_step == 5
    assert cfg.vocoder.weights_path == "./h.pth"
    assert cfg.preprocess.val_size == 64
    assert cfg.model.vocoder_use_cpu is True


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("model:\n  transformer:\n    encoder_layres: 4\n")
    with pytest.raises(KeyError, match="encoder_layres"):
        load_config(str(p))


def test_validation_errors():
    cfg = TTSConfig()
    cfg.model.transformer.encoder_hidden = 15  # not divisible by 2 heads
    with pytest.raises(ValueError, match="encoder_hidden"):
        cfg.validate()

    cfg2 = TTSConfig()
    cfg2.preprocess.pitch.feature = "word_level"
    with pytest.raises(ValueError, match="variance feature"):
        cfg2.validate()

    cfg3 = TTSConfig()
    cfg3.train.optimizer.grad_acc_step = 0
    with pytest.raises(ValueError, match="grad_acc_step"):
        cfg3.validate()
