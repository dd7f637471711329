#!/usr/bin/env python
"""Forced-alignment helper: corpus -> MFA TextGrids -> coverage report.

The reference assumes MFA was already run out-of-band ("MFA .TextGrid" inputs,
reference fs_two/preprocessor/preprocessor.py:190; its prepare_align.py only
reshuffles corpus layouts). This wrapper closes that gap in the data story:

  1. `align`    — run Montreal Forced Aligner over the `raw_path/<speaker>/`
                  wav+lab layout, writing <utt>.TextGrid next to each wav
                  (gated on the `mfa` binary; prints install hint otherwise).
  2. `check`    — report utterances lacking a TextGrid (MFA alignment
                  failures) and optionally delete them, replacing the
                  reference's data_utils/remove_bad_grid.py workflow
                  (corpus_tools.remove_unaligned does the list-based form).

Usage:
  python scripts/align.py align --corpus data/raw --dictionary rus.dict \
      --acoustic-model russian_mfa [--jobs 4]
  python scripts/align.py check --corpus data/raw [--delete]
"""

import argparse
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _speaker_dirs(corpus):
    for name in sorted(os.listdir(corpus)):
        p = os.path.join(corpus, name)
        if os.path.isdir(p):
            yield name, p


def cmd_align(args):
    mfa = shutil.which("mfa")
    if mfa is None:
        print("error: `mfa` binary not found on PATH.\n"
              "Install Montreal Forced Aligner, e.g.:\n"
              "  conda install -c conda-forge montreal-forced-aligner\n"
              "then download models:\n"
              f"  mfa model download acoustic {args.acoustic_model}",
              file=sys.stderr)
        return 2

    # MFA's corpus layout matches ours (speaker dirs of wav+lab). Align into
    # a temp dir, then move TextGrids next to their wavs (where the feature
    # pipeline looks for them, data/features.py:295).
    with tempfile.TemporaryDirectory(prefix="mfa_out_") as out_dir:
        cmd = [mfa, "align", args.corpus, args.dictionary,
               args.acoustic_model, out_dir,
               "--num_jobs", str(args.jobs), "--clean"]
        if args.beam:
            cmd += ["--beam", str(args.beam)]
        print("+ " + " ".join(cmd))
        rc = subprocess.call(cmd)
        if rc != 0:
            print(f"mfa align failed (rc={rc})", file=sys.stderr)
            return rc
        moved = 0
        for speaker, _ in _speaker_dirs(out_dir):
            src = os.path.join(out_dir, speaker)
            dst = os.path.join(args.corpus, speaker)
            for f in os.listdir(src):
                if f.endswith(".TextGrid"):
                    shutil.move(os.path.join(src, f), os.path.join(dst, f))
                    moved += 1
        print(f"aligned: {moved} TextGrids placed under {args.corpus}")
    return 0


def cmd_check(args):
    missing = []
    total = 0
    for speaker, sdir in _speaker_dirs(args.corpus):
        for f in sorted(os.listdir(sdir)):
            if not f.endswith(".wav"):
                continue
            total += 1
            base = f[:-4]
            if not os.path.exists(os.path.join(sdir, base + ".TextGrid")):
                missing.append((speaker, base))
    print(f"{total} utterances, {len(missing)} without TextGrid "
          f"({100.0 * len(missing) / max(total, 1):.1f}%)")
    for speaker, base in missing[:20]:
        print(f"  {speaker}/{base}")
    if len(missing) > 20:
        print(f"  ... and {len(missing) - 20} more")
    if args.delete and missing:
        for speaker, base in missing:
            for ext in (".wav", ".lab"):
                p = os.path.join(args.corpus, speaker, base + ext)
                if os.path.exists(p):
                    os.remove(p)
        print(f"deleted {len(missing)} unalignable utterances "
              f"(wav+lab), as remove_bad_grid.py did upstream")
    return 0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("align", help="run MFA over the corpus")
    a.add_argument("--corpus", required=True,
                   help="raw_path with <speaker>/{*.wav,*.lab}")
    a.add_argument("--dictionary", required=True,
                   help="pronunciation dictionary (e.g. rus_all.dict)")
    a.add_argument("--acoustic-model", default="russian_mfa")
    a.add_argument("--jobs", type=int, default=os.cpu_count() or 4)
    a.add_argument("--beam", type=int, default=None)
    a.set_defaults(fn=cmd_align)

    c = sub.add_parser("check", help="report/remove unaligned utterances")
    c.add_argument("--corpus", required=True)
    c.add_argument("--delete", action="store_true",
                   help="delete wav+lab of utterances without a TextGrid")
    c.set_defaults(fn=cmd_check)

    args = ap.parse_args()
    sys.exit(args.fn(args))


if __name__ == "__main__":
    main()
