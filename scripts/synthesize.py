#!/usr/bin/env python
"""Batch text-to-speech CLI (working replacement for the reference's stale
fs_two/synthesize.py).

Usage:
  python scripts/synthesize.py --config config.yaml --text "Привет мир" \
      --speaker 0 --out out/ [--duration 1.0 --pitch 1.0 --energy 1.0]
"""

import argparse
import os
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--text", required=True, action="append",
                    help="may be given multiple times")
    ap.add_argument("--speaker", default=0)
    ap.add_argument("--out", default="./output/synth")
    ap.add_argument("--duration", type=float, default=1.0)
    ap.add_argument("--pitch", type=float, default=1.0)
    ap.add_argument("--energy", type=float, default=1.0)
    args = ap.parse_args()

    from scipy.io import wavfile

    from tts_king_tpu.config import TTSConfig, load_config
    from tts_king_tpu.pipeline import TTSKing

    cfg = load_config(args.config) if args.config else TTSConfig()
    king = TTSKing(cfg)
    os.makedirs(args.out, exist_ok=True)
    speaker = args.speaker
    if isinstance(speaker, str) and speaker.isdigit():
        speaker = int(speaker)
    for i, text in enumerate(args.text):
        wavs = king.speak(text, args.duration, args.pitch, args.energy,
                          speaker=speaker)
        path = os.path.join(args.out, f"utt_{i}.wav")
        wavfile.write(path, cfg.preprocess.audio.sampling_rate, wavs[0])
        print(f"wrote {path} ({len(wavs[0]) / 22050:.2f}s)")


if __name__ == "__main__":
    main()
