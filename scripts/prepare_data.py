#!/usr/bin/env python
"""Offline feature extraction CLI (prepare_data.py equivalent).

Usage: python scripts/prepare_data.py [config.yaml]
"""

import sys

sys.path.insert(0, ".")

from tts_king_tpu.config import TTSConfig, load_config
from tts_king_tpu.data.features import Preprocessor


def main():
    cfg = load_config(sys.argv[1]) if len(sys.argv) > 1 else TTSConfig()
    Preprocessor(cfg.preprocess).build_from_path(seed=cfg.train.seed)


if __name__ == "__main__":
    main()
