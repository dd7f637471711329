#!/usr/bin/env python
"""Voice-over generation (the voice_over.ipynb equivalent): synthesize a
multi-sentence script into one audio track with inter-sentence pauses,
optionally mixing speakers per line.

    python examples/voice_over.py --out voiceover.wav \
        --line "0|Первое предложение." --line "1|Второе предложение."

Lines are "speaker|text"; with no checkpoint weights the audio is noise but
the pipeline (G2P -> FS2 -> HiFi-GAN -> concat) runs end to end.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--line", action="append", required=True,
                    help='"speaker_id|text", repeatable')
    ap.add_argument("--out", default="voiceover.wav")
    ap.add_argument("--pause-ms", type=float, default=300.0)
    ap.add_argument("--duration", type=float, default=1.0)
    args = ap.parse_args()

    from scipy.io import wavfile

    from tts_king_tpu.config import TTSConfig, load_config
    from tts_king_tpu.pipeline import TTSKing

    cfg = load_config(args.config) if args.config else TTSConfig()
    king = TTSKing(cfg)
    sr = cfg.preprocess.audio.sampling_rate
    pause = np.zeros(int(sr * args.pause_ms / 1000), np.int16)

    pieces = []
    for line in args.line:
        speaker, text = line.split("|", 1)
        wavs = king.speak(text, duration_control=args.duration,
                          speaker=int(speaker) if speaker.isdigit() else speaker)
        pieces += [wavs[0], pause]
    track = np.concatenate(pieces[:-1]) if pieces else np.zeros(0, np.int16)
    wavfile.write(args.out, sr, track)
    print(f"wrote {args.out}: {len(track) / sr:.2f}s, {len(args.line)} lines")


if __name__ == "__main__":
    main()
