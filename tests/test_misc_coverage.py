"""Coverage for remaining small components: English number normalization,
cleaners, English lexicon G2P, batch synthesis outputs, MelDataset
fine-tuning mode."""

import os

import numpy as np


def test_normalize_numbers():
    from tts_king_tpu.text.numbers import normalize_numbers

    assert normalize_numbers("I have 2 cats") == "I have two cats"
    assert normalize_numbers("in 1999") == "in nineteen ninety nine"
    assert normalize_numbers("in 2005") == "in two thousand five"
    assert normalize_numbers("$5.50 please") == (
        "five dollars, fifty cents please")
    assert normalize_numbers("the 3rd time") == "the third time"
    assert normalize_numbers("1,000 miles") == "one thousand miles"
    assert normalize_numbers("3.14 pie") == "three point one four pie"
    assert normalize_numbers("21st") == "twenty first"


def test_cleaners():
    from tts_king_tpu.text.cleaners import (basic_cleaners, english_cleaners,
                                            transliteration_cleaners)

    assert basic_cleaners("Hello   WORLD") == "hello world"
    assert english_cleaners("Dr. Smith has 2 cats") == (
        "doctor smith has two cats")
    out = transliteration_cleaners("Café")
    assert out in ("cafe", "caf")  # unidecode vs NFKD fallback


def test_preprocess_eng_lexicon(tmp_path):
    from tts_king_tpu.text.g2p import preprocess_eng, read_lexicon
    from tts_king_tpu.text.symbols import symbols

    lex = tmp_path / "eng.dict"
    lex.write_text("hello HH AH0 L OW1\nworld W ER1 L D\n")
    seq = preprocess_eng("hello world", read_lexicon(str(lex)))
    names = [symbols[i] for i in seq]
    assert names[0] == "@HH"
    assert "@W" in names and "@D" in names


def test_synth_samples_writes_outputs(tmp_path):
    import jax

    from tests.test_train import _tiny_setup
    from tts_king_tpu.config import TTSConfig
    from tts_king_tpu.utils.synthesis import synth_samples

    model, opt, state, mc = _tiny_setup()
    rng = np.random.RandomState(0)
    B, L = 2, 6
    out = model.apply(state.variables(), rng.randint(0, 3, (B,)),
                      rng.randint(1, 200, (B, L)), np.full((B,), L),
                      max_mel_len=32, train=False)
    cfg = TTSConfig()
    cfg.preprocess.preprocessed_path = str(tmp_path)  # no stats.json -> defaults
    synth_samples(out, ["utt_a", "utt_b"], None, cfg, str(tmp_path / "out"))
    assert os.path.exists(tmp_path / "out" / "utt_a.png")
    assert os.path.exists(tmp_path / "out" / "utt_b.png")


def test_mel_dataset_fine_tuning(tmp_path):
    from scipy.io import wavfile

    from tests.test_vocoder_training import _tiny_cfg
    from tts_king_tpu.data.mel_dataset import MelDataset
    from tts_king_tpu.ops.stft import hifigan_mel

    cfg = _tiny_cfg()
    rng = np.random.RandomState(0)
    mels_dir = tmp_path / "mels"
    mels_dir.mkdir()
    paths = []
    for i in range(2):
        n = cfg.segment_size * 2
        wav = (0.4 * np.sin(2 * np.pi * 200 * np.arange(n) / cfg.sampling_rate))
        p = tmp_path / f"w{i}.wav"
        wavfile.write(str(p), cfg.sampling_rate,
                      (wav * 30000).astype(np.int16))
        paths.append(str(p))
        # precomputed acoustic-model mel for the fine-tune path
        mel = np.asarray(hifigan_mel(
            wav[None].astype(np.float32), cfg.n_fft, cfg.num_mels,
            cfg.sampling_rate, cfg.hop_size, cfg.win_size,
            cfg.mel_fmin, cfg.mel_fmax))[0]
        np.save(mels_dir / f"w{i}.npy", mel)

    ds = MelDataset(paths, cfg, split=True, fine_tuning=True,
                    base_mels_path=str(mels_dir))
    batch = next(iter(ds.batches(batch_size=2, seed=0)))
    frames = cfg.segment_size // cfg.hop_size
    assert batch["mel"].shape == (2, frames, cfg.num_mels)
    assert batch["wav"].shape == (2, cfg.segment_size)


def test_mel_dataset_load_item_short_wav_alignment(tmp_path):
    """Fine-tuning per-item path: a wav SHORTER than mel_frames*hop (e.g.
    trailing partial frame trimmed upstream) still yields an aligned
    (frames_per_seg mel, segment_size wav, frames_per_seg mel_loss) —
    load_item shares _load_segment's pad/clamp instead of a drifted copy."""
    import random

    from scipy.io import wavfile

    from tests.test_vocoder_training import _tiny_cfg
    from tts_king_tpu.data.mel_dataset import MelDataset
    from tts_king_tpu.ops.stft import hifigan_mel

    cfg = _tiny_cfg()
    mels_dir = tmp_path / "mels"
    mels_dir.mkdir()
    n = cfg.segment_size * 2
    wav = 0.4 * np.sin(2 * np.pi * 200 * np.arange(n) / cfg.sampling_rate)
    mel = np.asarray(hifigan_mel(
        wav[None].astype(np.float32), cfg.n_fft, cfg.num_mels,
        cfg.sampling_rate, cfg.hop_size, cfg.win_size,
        cfg.mel_fmin, cfg.mel_fmax))[0]
    np.save(mels_dir / "w0.npy", mel)
    # truncate the wav so len(wav) < mel_frames*hop: any crop near the end
    # comes back short without the pad/clamp
    p = tmp_path / "w0.wav"
    wavfile.write(str(p), cfg.sampling_rate,
                  (wav[: n - cfg.hop_size * 2 - 7] * 30000).astype(np.int16))

    ds = MelDataset([str(p)], cfg, split=True, fine_tuning=True,
                    base_mels_path=str(mels_dir))
    frames = cfg.segment_size // cfg.hop_size
    for seed in range(8):   # several crops incl. end-of-file ones
        m, w, ml = ds.load_item(0, random.Random(seed))
        assert m.shape == (frames, cfg.num_mels)
        assert w.shape == (cfg.segment_size,)
        assert ml.shape == (frames, cfg.num_mels)
