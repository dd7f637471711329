"""End-to-end data pipeline test: synthetic corpus -> Preprocessor ->
FS2Dataset -> one training step. Exercises the TextGrid parser, wav loading,
batched mel/F0 extraction, normalization passes, metadata, batching and the
compiled train step on real (synthetic) features."""

import json
import os

import numpy as np
import pytest


def _write_textgrid(path, intervals):
    lines = [
        'File type = "ooTextFile"',
        'Object class = "TextGrid"',
        "",
        "xmin = 0",
        f"xmax = {intervals[-1][1]}",
        "tiers? <exists>",
        "size = 1",
        "item []:",
        "    item [1]:",
        '        class = "IntervalTier"',
        '        name = "phones"',
        "        xmin = 0",
        f"        xmax = {intervals[-1][1]}",
        f"        intervals: size = {len(intervals)}",
    ]
    for i, (a, b, t) in enumerate(intervals, 1):
        lines += [
            f"        intervals [{i}]:",
            f"            xmin = {a}",
            f"            xmax = {b}",
            f'            text = "{t}"',
        ]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def _make_corpus(root, sr=22050):
    """2 speakers x 2 utterances of voiced sawtooth-ish audio with fabricated
    alignments."""
    from scipy.io import wavfile

    phones = [("sil", 0.00, 0.05), ("P", 0.05, 0.15), ("A0", 0.15, 0.35),
              ("sp", 0.35, 0.40), ("T", 0.40, 0.50), ("A", 0.50, 0.64),
              ("sil", 0.64, 0.70)]
    for spk, f0 in [("spk_a", 150.0), ("spk_b", 220.0)]:
        d = os.path.join(root, spk)
        os.makedirs(d, exist_ok=True)
        for k in range(2):
            t = np.arange(int(0.70 * sr)) / sr
            freq = f0 * (1.0 + 0.05 * k)
            wav = 0.6 * np.sin(2 * np.pi * freq * t)
            wav += 0.2 * np.sin(2 * np.pi * 2 * freq * t)
            wav += 0.01 * np.random.RandomState(k).randn(len(t))
            wavfile.write(os.path.join(d, f"utt{k}.wav"), sr,
                          (wav * 20000).astype(np.int16))
            _write_textgrid(os.path.join(d, f"utt{k}.TextGrid"),
                            [(a, b, p) for p, a, b in phones])
            with open(os.path.join(d, f"utt{k}.lab"), "w") as f:
                f.write("пат\n")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from tts_king_tpu.config import PreprocessConfig
    from tts_king_tpu.data.features import Preprocessor

    root = tmp_path_factory.mktemp("corpus")
    raw = str(root / "raw")
    processed = str(root / "processed")
    os.makedirs(raw)
    _make_corpus(raw)

    cfg = PreprocessConfig(raw_path=raw, preprocessed_path=processed,
                           val_size=1)
    pre = Preprocessor(cfg, batch_size=4)
    out = pre.build_from_path()
    return cfg, out


def test_preprocessor_outputs(corpus):
    cfg, out = corpus
    root = cfg.preprocessed_path
    assert len(out) == 4
    with open(os.path.join(root, "speakers.json")) as f:
        speakers = json.load(f)
    assert speakers == {"spk_a": 0, "spk_b": 1}
    with open(os.path.join(root, "stats.json")) as f:
        stats = json.load(f)
    # normalized pitch/energy: min < 0 < max, std ~ 1 pre-normalization
    assert stats["pitch"][0] < 0 < stats["pitch"][1]
    assert stats["energy"][0] < 0 < stats["energy"][1]

    files = os.listdir(os.path.join(root, "mel"))
    assert len(files) == 4
    mel = np.load(os.path.join(root, "mel", sorted(files)[0]))
    # phones after silence trimming: P A0 sp T A -> duration sum = mel frames
    name = sorted(files)[0].replace("spk_a-mel-", "").replace(".npy", "")
    dur = np.load(os.path.join(root, "duration", f"spk_a-duration-{name}.npy"))
    assert len(dur) == 5
    assert mel.shape == (dur.sum(), 80)
    pitch = np.load(os.path.join(root, "pitch", f"spk_a-pitch-{name}.npy"))
    assert pitch.shape == (5,)
    cwt = np.load(os.path.join(root, "pitch", f"spk_a-cwt-pitch-{name}.npy"))
    assert cwt.shape == (5, 11)

    # metadata split
    train_lines = open(os.path.join(root, "train.txt")).read().strip().split("\n")
    val_lines = open(os.path.join(root, "val.txt")).read().strip().split("\n")
    assert len(train_lines) == 3 and len(val_lines) == 1
    assert train_lines[0].count("|") == 3
    assert "{" in train_lines[0]


def test_f0_sanity(corpus):
    """YIN must recover the synthetic fundamental (150 Hz for spk_a)."""
    cfg, _ = corpus
    from tts_king_tpu.data.features import load_wav
    from tts_king_tpu.ops.f0 import yin_f0

    wav = load_wav(os.path.join(cfg.raw_path, "spk_a", "utt0.wav"), 22050)
    f0 = np.asarray(yin_f0(wav[None, :], 22050, 256))[0]
    voiced = f0[f0 > 0]
    assert len(voiced) > 10
    med = np.median(voiced)
    assert 140 < med < 160, f"median f0 {med}"


def test_dataset_and_train_step(corpus):
    import jax

    from tts_king_tpu.config import (OptimizerConfig, StepConfig, TrainConfig)
    from tts_king_tpu.data.dataset import FS2Dataset
    from tts_king_tpu.train.state import create_train_state, make_optimizer
    from tts_king_tpu.train.step import make_train_step
    from tests.test_train import _tiny_setup

    cfg, _ = corpus
    tc = TrainConfig(optimizer=OptimizerConfig(batch_size=1, grad_acc_step=2))
    ds = FS2Dataset("train.txt", cfg, tc, max_mel_len=64)
    # use val too (1 item) via batches API
    ds_val = FS2Dataset("val.txt", cfg, tc, drop_last=False, apply_masking=False)

    superbatches = list(ds.epoch_superbatches(seed=0))
    assert len(superbatches) == 1  # 3 train utts -> one full group of 2
    sb = superbatches[0]
    assert sb["texts"].shape[0] == 2  # acc axis
    assert sb["texts"].shape[1] == 1  # batch axis
    assert sb["mels"].shape[-1] == 80

    model, opt, state, mc = _tiny_setup()
    step = jax.jit(make_train_step(model, opt))
    state, losses = step(state, sb, jax.random.PRNGKey(0))
    assert np.isfinite(float(losses.total))

    val_batches = list(ds_val.batches(seed=0))
    assert val_batches


def test_grapheme_masking():
    from tts_king_tpu.data.dataset import random_mask
    from tts_king_tpu.text.symbols import MASK

    rng = np.random.RandomState(0)
    phones = ["P", "A0", "T", "A", "sp", "V", "E0", "T", "K", "O"] * 3
    masked = random_mask(phones, 0.15, rng)
    assert len(masked) == len(phones)
    n_masked = sum(1 for p in masked if p == MASK)
    assert 1 <= n_masked <= int(0.15 * len(phones))
    assert "sp" in masked  # silences never masked


def test_superbatch_fast_forward_and_count(corpus):
    """superbatches_per_epoch() matches the generator, and start_batch=k
    yields exactly the batches the full epoch yields after position k
    (metadata-only fast-forward for mid-epoch resume)."""
    from tts_king_tpu.config import OptimizerConfig, TrainConfig
    from tts_king_tpu.data.dataset import FS2Dataset

    cfg, _ = corpus
    tc = TrainConfig(optimizer=OptimizerConfig(batch_size=1, grad_acc_step=1))
    ds = FS2Dataset("train.txt", cfg, tc, max_mel_len=64)
    full = list(ds.epoch_superbatches(seed=7))
    assert ds.superbatches_per_epoch() == len(full) == 3
    tail = list(ds.epoch_superbatches(seed=7, start_batch=2))
    assert len(tail) == 1
    for key in full[2]:
        np.testing.assert_array_equal(full[2][key], tail[0][key],
                                      err_msg=key)
