#!/usr/bin/env python
"""Generate the golden end-to-end fixture (tests/fixtures/golden_e2e/).

Trains the micro FS2 of tests/test_golden_e2e.micro_config for 500 steps on
a 2-speaker formant corpus, commits the orbax checkpoint + speakers/stats
next to it, then freezes TTSKing outputs (phonemes, mel, wav) for the test's
sentences. Run on CPU f32 — the frozen numerics must match the test env:

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/make_golden_e2e.py
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from tests.test_golden_e2e import FIXTURE_DIR, SENTENCES, micro_config

    cfg = micro_config()
    raw = cfg.preprocess.raw_path
    processed = cfg.preprocess.preprocessed_path

    from tts_king_tpu.data.features import Preprocessor
    from tts_king_tpu.data.synthetic import generate_corpus

    if not os.path.isdir(processed):
        os.makedirs(raw, exist_ok=True)
        sec = generate_corpus(raw, n_speakers=2, utts_per_speaker=12, seed=7)
        print(f"corpus: 2 speakers x 12 utts, {sec:.0f}s audio")
        Preprocessor(cfg.preprocess, batch_size=8).build_from_path()

    if os.path.isdir(os.path.join(FIXTURE_DIR, "ckpt")):
        shutil.rmtree(os.path.join(FIXTURE_DIR, "ckpt"))
    os.makedirs(FIXTURE_DIR, exist_ok=True)

    from tts_king_tpu.train.loop import train

    train(cfg, use_mesh=False)

    # The pipeline resolves speakers.json/stats.json next to weights_path.
    for name in ("speakers.json", "stats.json"):
        shutil.copy(os.path.join(processed, name),
                    os.path.join(FIXTURE_DIR, name))

    # Micro pronunciation lexicon for the frozen sentences, spelled in the
    # formant-corpus phone inventory the checkpoint was trained on.
    with open(os.path.join(FIXTURE_DIR, "lexicon.dict"), "w",
              encoding="utf-8") as f:
        f.write("привет P R I V E T\n")
        f.write("мир M I R\n")

    from tts_king_tpu.pipeline import TTSKing

    king = TTSKing(micro_config())
    frozen = {}
    for i, (text, dctl) in enumerate(SENTENCES):
        frozen[f"phonemes_{i}"] = king.text_preprocess(text)
        mel, mel_lens = king.generate_mel(text, duration_control=dctl,
                                          speaker=0)
        n = int(np.asarray(mel_lens)[0])
        mel = np.asarray(mel, np.float32)[0, :n]
        wav = king.mel_to_wav(np.asarray(mel)[None],
                              mel_lens=np.asarray([n]))[0]
        frozen[f"mel_{i}"] = mel
        frozen[f"mel_len_{i}"] = np.int32(n)
        frozen[f"wav_{i}"] = wav
        print(f"sentence {i}: {n} frames, {len(wav)} samples, "
              f"mel range [{mel.min():.2f}, {mel.max():.2f}]")

    np.savez_compressed(os.path.join(FIXTURE_DIR, "expected.npz"), **frozen)
    total = sum(os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(FIXTURE_DIR) for f in fs)
    print(json.dumps({"fixture_dir": FIXTURE_DIR,
                      "size_kb": round(total / 1024)}))


if __name__ == "__main__":
    main()
