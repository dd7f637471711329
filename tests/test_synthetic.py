"""Synthetic speech-like corpus generator: the full raw tree must flow
through the offline feature pipeline with sane acoustics (voiced vowels at
the speaker's F0, phone-aligned durations)."""

import os

import numpy as np


def test_generate_corpus_pipeline(tmp_path):
    from tts_king_tpu.config import PreprocessConfig
    from tts_king_tpu.data.features import Preprocessor
    from tts_king_tpu.data.synthetic import generate_corpus

    raw = str(tmp_path / "raw")
    os.makedirs(raw)
    sec = generate_corpus(raw, n_speakers=2, utts_per_speaker=2, seed=3)
    assert sec > 1.0
    pp = PreprocessConfig(raw_path=raw, preprocessed_path=str(tmp_path / "p"),
                          val_size=1)
    meta = Preprocessor(pp, batch_size=4).build_from_path()
    # every utterance must survive (voiced pitch found, alignment valid)
    assert len(meta) == 4
    with open(tmp_path / "p" / "train.txt") as f:
        assert len(f.read().strip().splitlines()) == 3


def test_speaker_f0_identity():
    from tts_king_tpu import native
    from tts_king_tpu.data.synthetic import (Speaker, random_phrase,
                                             synth_utterance)

    if not native.available():
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = np.random.RandomState(0)
    for base in (110.0, 200.0):
        spk = Speaker("s", base, 1.0)
        phones, durs = random_phrase(rng)
        wav, intervals = synth_utterance(phones, durs, spk, seed=5)
        f0 = native.dio_f0(wav, 22050, 256)
        v = f0[f0 > 0]
        assert len(v) >= 0.3 * len(f0), "vowels must be voiced"
        med = float(np.median(v))
        # declination spans ~0.9x..1.1x of base
        assert 0.8 * base < med < 1.25 * base, (base, med)
