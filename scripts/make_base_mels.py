#!/usr/bin/env python
"""Generate teacher-forced FS2 mels for HiFi-GAN fine-tuning.

The canonical FS2 -> HiFi-GAN adaptation recipe (the reference's dormant
fine_tuning mode, hifi/meldataset.py:88-175) trains the vocoder on
(GT audio, acoustic-model-predicted mel) pairs so it learns to vocode the
acoustic model's actual output distribution. The reference ships the data
path but nothing that PRODUCES the mels; this script closes the loop:

  for every utterance in the prepared corpus (train.txt + val.txt):
    * run FS2 TEACHER-FORCED (GT duration/pitch/energy targets), so the
      predicted mel is frame-aligned with the ground-truth audio;
    * write   <out>/mels/<spk>-<name>.npy   (T, n_mels) predicted mel
    * write   <out>/wavs/<spk>-<name>.wav   the matching silence-trimmed,
      resampled GT audio slice (first T*hop samples from the TextGrid
      start mark — exactly the frames the features pipeline used)

Then fine-tune with:
  python scripts/train_vocoder.py --wavs-dir <out>/wavs \
      --fine-tuning --mels-dir <out>/mels ...

Usage:
  python scripts/make_base_mels.py [config.yaml] --ckpt-step N
      [--out DIR] [--batch-size 16]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def make_base_mels(cfg, ckpt_step=None, out=None, batch_size=16):
    """Write teacher-forced mels + aligned GT wavs; returns the out dir."""
    import jax

    from tts_king_tpu.checkpoint import restore_train_state
    from tts_king_tpu.data.dataset import FS2Dataset, L_STEP, T_STEP, _quantize
    from tts_king_tpu.data.features import get_alignment, load_wav
    from tts_king_tpu.data.textgrid import read_textgrid
    from tts_king_tpu.models.fs2 import build_fastspeech2

    pp = cfg.preprocess
    root = pp.preprocessed_path
    out_dir = out or os.path.join(root, "base_mels")
    os.makedirs(os.path.join(out_dir, "mels"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "wavs"), exist_ok=True)

    with open(os.path.join(root, "stats.json")) as f:
        stats = json.load(f)
    with open(os.path.join(root, "speakers.json")) as f:
        n_speakers = len(json.load(f))
    model = build_fastspeech2(cfg.model, stats, n_speakers,
                              pp.mel.n_mel_channels)

    payload = restore_train_state(cfg.train.ckpt_path, ckpt_step)
    variables = {"params": payload["params"],
                 "batch_stats": payload["batch_stats"]}
    print(f"restored FS2 step {payload['step']}", flush=True)

    # variables as an ARGUMENT, not a closure: each (L, T) shape bucket
    # recompiles, and a closed-over tree would be constant-folded into
    # every one of those programs (compile time + device memory)
    @jax.jit
    def forward(variables, batch):
        return model.apply(
            variables, batch["speakers"], batch["texts"], batch["src_lens"],
            max_mel_len=batch["mels"].shape[1],
            mel_lens=batch["mel_lens"],
            energy_targets=batch["energies"],
            duration_targets=batch["durations"],
            pitch_raw_targets=(None if cfg.model.use_cwt
                               else batch["pitches_raw"]),
            pitch_cwt_targets=(batch["pitches_cwt"] if cfg.model.use_cwt
                               else None),
            train=False)["postnet_mel"]

    sr = pp.audio.sampling_rate
    hop = pp.stft.hop_length
    n_done = 0
    for metadata in ("train.txt", "val.txt"):
        ds = FS2Dataset(metadata, pp, cfg.train, sort=True, drop_last=False,
                        apply_masking=False, max_mel_len=cfg.model.max_seq_len)
        order = np.arange(len(ds.meta))
        B = batch_size
        for start in range(0, len(order), B):
            idxs = order[start : start + B]
            entries = [ds._entry(int(i)) for i in idxs]
            # sorted by length desc: keeps padded compute tight per batch
            entries.sort(key=lambda e: -len(e[3]))
            items = [ds._item_from_entry(e) for e in entries]
            L = _quantize(max(len(e[3]) for e in entries), L_STEP)
            T = _quantize(max(it["mel"].shape[0] for it in items), T_STEP,
                          cfg.model.max_seq_len)
            batch = ds._collate(items, L, T)
            mels = np.asarray(forward(variables, batch), np.float32)
            for i, (name, spk, _sid, _seq) in enumerate(entries):
                n = int(batch["mel_lens"][i])
                base = f"{spk}-{name}"
                np.save(os.path.join(out_dir, "mels", base + ".npy"),
                        mels[i, :n])
                # matching GT audio slice: trim start from the TextGrid,
                # length = n frames (the features pipeline's exact window)
                tg = read_textgrid(
                    os.path.join(pp.raw_path, spk, name + ".TextGrid"))
                _, _, t_start, _ = get_alignment(
                    tg.get_tier_by_name("phones"), sr, hop)
                wav = load_wav(os.path.join(pp.raw_path, spk, name + ".wav"),
                               sr)
                seg = wav[int(t_start * sr): int(t_start * sr) + n * hop]
                if len(seg) < n * hop:
                    seg = np.pad(seg, (0, n * hop - len(seg)))
                from scipy.io import wavfile

                wavfile.write(os.path.join(out_dir, "wavs", base + ".wav"),
                              sr, (seg * 32767.0).astype(np.int16))
                n_done += 1
        print(f"{metadata}: done ({n_done} total)", flush=True)
    print(json.dumps({"out": out_dir, "utterances": n_done}))
    return out_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=None)
    ap.add_argument("--ckpt-step", type=int, default=None,
                    help="native checkpoint step under train.ckpt_path "
                         "(default: latest)")
    ap.add_argument("--out", default=None,
                    help="output dir (default <preprocessed>/base_mels)")
    ap.add_argument("--batch-size", type=int, default=16)
    args = ap.parse_args()

    from tts_king_tpu.config import TTSConfig, load_config

    cfg = load_config(args.config) if args.config else TTSConfig()
    make_base_mels(cfg, ckpt_step=args.ckpt_step, out=args.out,
                   batch_size=args.batch_size)


if __name__ == "__main__":
    main()
