#!/usr/bin/env python
"""End-to-end usage walkthrough (the examples.ipynb equivalent).

Covers: loading a config (+optionally reference checkpoints), listing
speakers, text -> mel with prosody controls, mel -> wav, and batch synthesis
through the dynamic-batching server.

Runs standalone with random weights when no checkpoints are present, so it
doubles as a smoke test:  python examples/basic_usage.py
Pass --micro for toy model sizes (seconds on CPU; identical flow).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import argparse

    from tts_king_tpu.config import TTSConfig, load_config, micro_config
    from tts_king_tpu.pipeline import TTSKing

    ap = argparse.ArgumentParser()
    ap.add_argument("--micro", action="store_true",
                    help="toy model sizes (fast on CPU; identical flow)")
    args = ap.parse_args()

    if args.micro:
        cfg = micro_config()
    else:
        cfg_path = os.path.join(os.path.dirname(__file__), "..",
                                "config.yaml")
        cfg = load_config(cfg_path) if os.path.exists(cfg_path) else TTSConfig()

    king = TTSKing(cfg)
    if args.micro:
        # bias the duration head so untrained weights emit nonzero durations
        import jax.numpy as jnp
        dp = king.tts.variables["params"]["variance_adaptor"][
            "duration_predictor"]["linear_layer"]
        dp["bias"] = jnp.full_like(dp["bias"], 1.5)
    print(f"speakers ({len(king.speakers)}):", king.speakers[:5], "...")

    # --- phoneme-level input (no external G2P needed) -----------------
    from tts_king_tpu.text import text_to_sequence

    phonemes = np.array([text_to_sequence("{P R I0 V E0 T sp M I0 R}", [])])
    out = king.tts.generate(phonemes, duration_control=1.0,
                            pitch_control=1.0, energy_control=1.0,
                            speaker_name=0)
    mel = np.asarray(out["postnet_mel"])
    n = int(np.asarray(out["mel_lens"])[0])
    print(f"mel: {mel.shape} ({n} valid frames)")

    # --- prosody control knobs ----------------------------------------
    slow = king.tts.generate(phonemes, duration_control=1.3, speaker_name=0)
    print("slow speech frames:", int(np.asarray(slow["mel_lens"])[0]))

    # --- mel -> waveform ----------------------------------------------
    wavs = king.mel_to_wav(out["postnet_mel"], out["mel_lens"])
    print(f"wav: {len(wavs[0])} samples "
          f"({len(wavs[0]) / 22050:.2f}s, int16)")

    # --- batched serving ------------------------------------------------
    from tts_king_tpu.serve import SynthesisServer

    server = SynthesisServer(king, max_batch=4, max_wait_ms=20)
    try:
        futures = [server.submit(phonemes=phonemes[0], speaker=i % 2)
                   for i in range(3)]
        results = [f.result(timeout=300) for f in futures]
        print("served", len(results), "requests in batches")
    finally:
        server.close()


if __name__ == "__main__":
    main()
