#!/usr/bin/env python
"""Standalone validation evaluation (fs_two/evaluate.py __main__ equivalent,
minus its stale imports) — teacher-forced losses plus, with --objective,
free-running objective metrics (MCD, duration MAE, and F0-RMSE / V-UV F1
when a vocoder checkpoint is configured) that the reference never reports.

Usage: python scripts/evaluate.py config.yaml [--restore-step N]
       [--split val.txt] [--objective] [--objective-utts 16]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=None)
    ap.add_argument("--restore-step", type=int, default=None)
    ap.add_argument("--split", default="val.txt")
    ap.add_argument("--objective", action="store_true",
                    help="also compute free-running MCD / duration MAE / "
                         "F0 metrics (train/metrics.py)")
    ap.add_argument("--objective-utts", type=int, default=16)
    args = ap.parse_args()

    import jax

    from tts_king_tpu.config import TTSConfig, load_config
    from tts_king_tpu.checkpoint import restore_train_state
    from tts_king_tpu.data.dataset import FS2Dataset
    from tts_king_tpu.models.fs2 import build_fastspeech2
    from tts_king_tpu.train.evaluate import evaluate
    from tts_king_tpu.train.state import TrainState, make_optimizer
    from tts_king_tpu.train.step import make_eval_step
    from tts_king_tpu.utils.logging import LOSS_NAMES

    cfg = load_config(args.config) if args.config else TTSConfig()
    root = cfg.preprocess.preprocessed_path
    with open(os.path.join(root, "stats.json")) as f:
        stats = json.load(f)
    with open(os.path.join(root, "speakers.json")) as f:
        n_speakers = len(json.load(f))

    model = build_fastspeech2(cfg.model, stats, n_speakers)
    payload = restore_train_state(cfg.train.ckpt_path, args.restore_step)
    state = TrainState(step=payload["step"], params=payload["params"],
                       batch_stats=payload["batch_stats"], opt_state=None)

    ds = FS2Dataset(args.split, cfg.preprocess, cfg.train, drop_last=False,
                    apply_masking=False, max_mel_len=cfg.model.max_seq_len)
    eval_step = jax.jit(make_eval_step(model, cfg.model.use_cwt))
    losses = evaluate(eval_step, state, ds)
    report = {name: round(float(v), 5)
              for name, v in zip(LOSS_NAMES, tuple(losses))}
    report["step"] = int(payload["step"])
    report["num_utterances"] = len(ds)

    if args.objective:
        from tts_king_tpu.train.metrics import evaluate_objective

        vocode_fn = f0_fn = None
        if cfg.vocoder.weights_path and os.path.exists(
                cfg.vocoder.weights_path):
            from tts_king_tpu.ops.f0 import yin_f0
            from tts_king_tpu.pipeline import Vocoder

            voc = Vocoder(cfg)
            sr = cfg.preprocess.audio.sampling_rate
            hop = cfg.preprocess.stft.hop_length
            # float path directly (Vocoder.__call__ returns [-1, 1]);
            # generate() would round-trip through int16 for nothing
            vocode_fn = lambda mel: np.asarray(
                voc(mel[None].astype(np.float32)), np.float32)[0]
            f0_fn = lambda wav: np.asarray(yin_f0(wav[None], sr, hop))[0]
        variables = {"params": payload["params"],
                     "batch_stats": payload["batch_stats"]}
        obj = evaluate_objective(model, variables, ds,
                                 max_utts=args.objective_utts,
                                 vocode_fn=vocode_fn, f0_fn=f0_fn,
                                 max_mel_len=cfg.model.max_seq_len)
        report.update({k: (round(v, 4) if np.isfinite(v) else None)
                       for k, v in obj.items()})
    print(json.dumps(report))


if __name__ == "__main__":
    main()
