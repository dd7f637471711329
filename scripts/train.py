#!/usr/bin/env python
"""FastSpeech2 training CLI (train.py equivalent).

Usage: python scripts/train.py [config.yaml] [--steps N] [--no-vocoder]
"""

import argparse
import sys

sys.path.insert(0, ".")

from tts_king_tpu.config import TTSConfig, load_config
from tts_king_tpu.train.loop import train


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=None)
    ap.add_argument("--steps", type=int, default=None,
                    help="override total_step")
    ap.add_argument("--no-vocoder", action="store_true",
                    help="skip synthesis previews through the vocoder")
    args = ap.parse_args()

    cfg = load_config(args.config) if args.config else TTSConfig()
    vocoder = None
    if not args.no_vocoder and cfg.vocoder.weights_path:
        import os

        if os.path.exists(cfg.vocoder.weights_path):
            from tts_king_tpu.pipeline import Vocoder

            vocoder = Vocoder(cfg)
    train(cfg, max_steps=args.steps, vocoder=vocoder)


if __name__ == "__main__":
    main()
