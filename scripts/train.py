#!/usr/bin/env python
"""FastSpeech2 training CLI (train.py equivalent).

Usage:
  python scripts/train.py [config.yaml] [--steps N] [--no-vocoder]

Multi-host (one command per host/process; replaces the reference's absent
distributed path, SURVEY.md §2.y):
  python scripts/train.py cfg.yaml --distributed \
      [--coordinator HOST:PORT --num-processes N --process-id I]
On real TPU pods the three values are discovered from the TPU metadata, so
`--distributed` alone suffices; on CPU/GPU clusters pass them explicitly or
via env (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
"""

import argparse
import os
import sys

sys.path.insert(0, ".")


def _maybe_init_distributed(args):
    if not args.distributed:
        return
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
              f"{len(jax.devices())} global / {len(jax.local_devices())} "
              f"local devices")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=None)
    ap.add_argument("--steps", type=int, default=None,
                    help="override total_step")
    ap.add_argument("--no-vocoder", action="store_true",
                    help="skip synthesis previews through the vocoder")
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

    _maybe_init_distributed(args)

    from tts_king_tpu.config import TTSConfig, load_config
    from tts_king_tpu.train.loop import train

    cfg = load_config(args.config) if args.config else TTSConfig()
    vocoder = None
    if not args.no_vocoder and not args.distributed and cfg.vocoder.weights_path:
        if os.path.exists(cfg.vocoder.weights_path):
            from tts_king_tpu.pipeline import Vocoder

            vocoder = Vocoder(cfg)
    train(cfg, max_steps=args.steps, vocoder=vocoder)


if __name__ == "__main__":
    main()
