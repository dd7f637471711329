#!/usr/bin/env python
"""Real-speech micro corpus for end-to-end FS2 training (VERDICT r4 item 6).

Builds a trainable FS2 corpus from the REAL Russian recordings the
reference tree ships (/root/reference/examples/*.wav, 69 speakers x ~9.5 s)
— no transcripts exist for them, so phone labels come from an in-tree
energy/voicing/spectral segmenter producing PSEUDO phone alignments:

  frame features (RMS energy, zero-crossing rate, spectral centroid at the
  mel hop) -> {silence | voiced | unvoiced} runs -> runs split to <=24
  frames -> each segment labelled with a coarse phone from the real symbol
  inventory (voiced: U0/O0/A0/I0 by centroid quartile; unvoiced: T/S/SH by
  energy+centroid; silence: sp) -> .TextGrid on exact frame boundaries +
  .lab, in the raw_path/<speaker>/ layout scripts/prepare_data.py consumes.

What this validates (and what it can't): the full offline pipeline
(TextGrid alignment -> mel/F0/energy/CWT -> two-pass normalize) and FS2
training/synthesis run on REAL acoustic data — real pitch contours, real
spectral statistics, real silence structure. It cannot validate linguistic
G2P quality (that needs transcripts; the reference's actual training corpus
is not shipped). The duration/pitch targets are real; only the phone
identities are coarse.

Usage: python scripts/prepare_real_micro.py [--root /tmp/tts_real_micro]
Then:  python scripts/validate_training.py --root /tmp/tts_real_micro \
           --corpus prepared --steps 2000 --out results/training_validation_real.json
"""

import argparse
import glob
import os
import shutil
import sys
import wave

sys.path.insert(0, ".")

import numpy as np

REFERENCE_WAVS = "/root/reference/examples"
HOP = 256
WIN = 1024
SR = 22050

# classification -> real symbols from the 206-entry table (text/symbols.py)
VOICED_SYMBOLS = ["U0", "O0", "A0", "I0"]     # by spectral-centroid quartile
UNVOICED_SYMBOLS = ["T", "S", "SH"]
SILENCE = "sp"
MAX_SEG_FRAMES = 24
MIN_SEG_FRAMES = 2


def read_wav(path):
    with wave.open(path) as w:
        assert w.getframerate() == SR and w.getnchannels() == 1
        data = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    return data.astype(np.float32) / 32768.0


def frame_features(wav):
    """(energy, zcr, centroid) per hop frame."""
    n = (len(wav) - WIN) // HOP + 1
    frames = np.lib.stride_tricks.as_strided(
        wav, (n, WIN), (wav.strides[0] * HOP, wav.strides[0]))
    window = np.hanning(WIN).astype(np.float32)
    energy = np.sqrt((frames ** 2).mean(axis=1))
    zcr = (np.abs(np.diff(np.signbit(frames), axis=1)).sum(axis=1)
           / WIN).astype(np.float32)
    spec = np.abs(np.fft.rfft(frames * window, axis=1))
    freqs = np.fft.rfftfreq(WIN, 1.0 / SR)
    centroid = (spec * freqs).sum(axis=1) / np.maximum(spec.sum(axis=1), 1e-9)
    return energy, zcr, centroid


def classify_frames(energy, zcr):
    """0=sil, 1=voiced, 2=unvoiced per frame."""
    floor = np.percentile(energy, 10)
    thresh = max(floor * 3.0, energy.max() * 0.02)
    cls = np.zeros(len(energy), np.int8)
    speech = energy > thresh
    voiced = speech & (zcr < 0.12)
    cls[speech] = 2
    cls[voiced] = 1
    # close 1-frame holes (median-of-3)
    for i in range(1, len(cls) - 1):
        if cls[i] != cls[i - 1] and cls[i] != cls[i + 1] \
                and cls[i - 1] == cls[i + 1]:
            cls[i] = cls[i - 1]
    return cls


def segment(cls):
    """Frame classes -> (start, end, class) runs, split to MAX_SEG_FRAMES,
    short runs merged into the previous segment."""
    runs = []
    s = 0
    for i in range(1, len(cls) + 1):
        if i == len(cls) or cls[i] != cls[s]:
            runs.append((s, i, int(cls[s])))
            s = i
    merged = []
    for s, e, c in runs:
        if e - s < MIN_SEG_FRAMES and merged:
            ps, pe, pc = merged[-1]
            merged[-1] = (ps, e, pc)
        else:
            merged.append((s, e, c))
    out = []
    for s, e, c in merged:
        while e - s > MAX_SEG_FRAMES:
            out.append((s, s + MAX_SEG_FRAMES, c))
            s += MAX_SEG_FRAMES
        out.append((s, e, c))
    return out


def label_segments(segs, energy, centroid):
    """Coarse phone per segment using corpus-free per-utterance quartiles."""
    v_cent = [centroid[s:e].mean() for s, e, c in segs if c == 1]
    qs = np.percentile(v_cent, [25, 50, 75]) if v_cent else [0, 0, 0]
    labels = []
    for s, e, c in segs:
        if c == 0:
            labels.append(SILENCE)
        elif c == 1:
            m = centroid[s:e].mean()
            labels.append(VOICED_SYMBOLS[int(np.searchsorted(qs, m))])
        else:
            m = centroid[s:e].mean()
            en = energy[s:e].mean()
            if en < np.percentile(energy, 40):
                labels.append("T")
            else:
                labels.append("S" if m < 4500 else "SH")
    return labels


def write_textgrid(path, segs, labels, total_frames):
    """Praat long-format TextGrid, intervals on exact frame boundaries."""
    t = lambda f: f * HOP / SR
    xmax = t(total_frames)
    lines = [
        'File type = "ooTextFile"', 'Object class = "TextGrid"', "",
        "xmin = 0", f"xmax = {xmax:.6f}", "tiers? <exists>", "size = 1",
        "item []:", "    item [1]:", '        class = "IntervalTier"',
        '        name = "phones"', "        xmin = 0",
        f"        xmax = {xmax:.6f}",
        f"        intervals: size = {len(segs)}",
    ]
    for i, ((s, e, _), lab) in enumerate(zip(segs, labels), 1):
        lines += [f"        intervals [{i}]:",
                  f"            xmin = {t(s):.6f}",
                  f"            xmax = {t(e):.6f}",
                  f'            text = "{lab}"']
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/tts_real_micro")
    ap.add_argument("--src", default=REFERENCE_WAVS)
    args = ap.parse_args()

    wavs = sorted(glob.glob(os.path.join(args.src, "*.wav")))
    if not wavs:
        raise SystemExit(f"no wavs under {args.src}")
    raw = os.path.join(args.root, "raw")
    n_done = 0
    for path in wavs:
        wav = read_wav(path)
        energy, zcr, centroid = frame_features(wav)
        cls = classify_frames(energy, zcr)
        segs = segment(cls)
        labels = label_segments(segs, energy, centroid)
        n_speech = sum(1 for l in labels if l != SILENCE)
        if n_speech < 8:
            print(f"skip (too little speech): {path}")
            continue
        speaker = os.path.splitext(os.path.basename(path))[0]
        sdir = os.path.join(raw, speaker)
        os.makedirs(sdir, exist_ok=True)
        utt = f"{speaker}_000"
        shutil.copy(path, os.path.join(sdir, utt + ".wav"))
        write_textgrid(os.path.join(sdir, utt + ".TextGrid"),
                       segs, labels, len(cls))
        with open(os.path.join(sdir, utt + ".lab"), "w") as f:
            f.write(" ".join(l for l in labels if l != SILENCE))
        n_done += 1
    print(f"prepared {n_done} speakers under {raw}")


if __name__ == "__main__":
    main()
