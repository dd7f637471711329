#!/usr/bin/env python
"""Speaker-level dataset analysis + filtering (the dataset_review notebooks
as a CLI: per-speaker utterance counts, mean phone lengths, keep-list).

Usage:
  python scripts/speaker_stats.py processed/train.txt [--min-utterances 20]
      [--remove-list removals.txt] [--out keep_speakers.txt]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

from tts_king_tpu.data.corpus_tools import filter_speakers, speaker_stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("metadata")
    ap.add_argument("--min-utterances", type=int, default=20)
    ap.add_argument("--remove-list", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    stats = speaker_stats(args.metadata)
    remove = []
    if args.remove_list:
        with open(args.remove_list, encoding="utf-8") as f:
            remove = [l.strip() for l in f if l.strip()]
    keep = filter_speakers(stats, args.min_utterances, remove)

    for spk in sorted(stats, key=lambda s: -stats[s]["utterances"]):
        s = stats[spk]
        flag = "" if spk in keep else "  [FILTERED]"
        print(f"{spk:40s} {s['utterances']:6d} utts  "
              f"{s['mean_phones']:6.1f} phones/utt{flag}")
    print(json.dumps({"speakers": len(stats), "kept": len(keep)}))
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            f.write("\n".join(keep) + "\n")


if __name__ == "__main__":
    main()
