#!/usr/bin/env python
"""HiFi-GAN vocoder training CLI (the training entry point the reference
never shipped — HIFIapi.train raises NotImplemented).

Usage:
  python scripts/train_vocoder.py config.yaml --wavs-dir corpus/ [--steps N]
  python scripts/train_vocoder.py config.yaml --wavs-dir corpus/ \
      --fine-tuning --mels-dir processed/mel    # acoustic-model mels
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=None)
    ap.add_argument("--wavs-dir", required=True)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--val-frac", type=float, default=0.02)
    ap.add_argument("--fine-tuning", action="store_true")
    ap.add_argument("--mels-dir", default=None)
    ap.add_argument("--restore-step", type=int, default=None)
    args = ap.parse_args()

    from tts_king_tpu.config import TTSConfig, load_config
    from tts_king_tpu.train.vocoder_loop import train_vocoder

    cfg = load_config(args.config) if args.config else TTSConfig()
    wavs = sorted(glob.glob(os.path.join(args.wavs_dir, "**", "*.wav"),
                            recursive=True))
    if not wavs:
        raise SystemExit(f"no wavs under {args.wavs_dir}")
    n_val = max(int(len(wavs) * args.val_frac), 1)
    train_vocoder(cfg, wavs[n_val:], val_paths=wavs[:n_val],
                  max_steps=args.steps, fine_tuning=args.fine_tuning,
                  base_mels_path=args.mels_dir,
                  restore_step=args.restore_step)


if __name__ == "__main__":
    main()
