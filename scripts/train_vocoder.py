#!/usr/bin/env python
"""HiFi-GAN vocoder training CLI (the training entry point the reference
never shipped — HIFIapi.train raises NotImplemented).

Usage:
  python scripts/train_vocoder.py config.yaml --wavs-dir corpus/ [--steps N]
  python scripts/train_vocoder.py config.yaml --wavs-dir corpus/ \
      --fine-tuning --mels-dir processed/mel    # acoustic-model mels

Multi-host (one command per host/process, same contract as
scripts/train.py --distributed):
  python scripts/train_vocoder.py cfg.yaml --wavs-dir corpus/ --distributed \
      [--coordinator HOST:PORT --num-processes N --process-id I]
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
    ap.add_argument("--distributed", action="store_true",
                    help="join a multi-process run via jax.distributed")
    ap.add_argument("--coordinator",
                    default=os.environ.get("JAX_COORDINATOR_ADDRESS"),
                    help="coordinator host:port (TPU pods: auto-discovered)")
    ap.add_argument("--num-processes", type=int,
                    default=(int(os.environ["JAX_NUM_PROCESSES"])
                             if "JAX_NUM_PROCESSES" in os.environ else None))
    ap.add_argument("--process-id", type=int,
                    default=(int(os.environ["JAX_PROCESS_ID"])
                             if "JAX_PROCESS_ID" in os.environ else None))
    args = ap.parse_args()

    if args.distributed:
        import jax

        kw = {}
        if args.coordinator:
            kw["coordinator_address"] = args.coordinator
        if args.num_processes is not None:
            kw["num_processes"] = args.num_processes
        if args.process_id is not None:
            kw["process_id"] = args.process_id
        jax.distributed.initialize(**kw)
        if jax.process_index() == 0:
            print(f"jax.distributed: {jax.process_count()} processes, "
                  f"{len(jax.devices())} global / "
                  f"{len(jax.local_devices())} local devices")

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
                  restore_step=args.restore_step,
                  distributed=args.distributed)


if __name__ == "__main__":
    main()
