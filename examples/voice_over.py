#!/usr/bin/env python
"""Voice-over generation (the voice_over.ipynb equivalent): synthesize a
multi-sentence script into one audio track with inter-sentence pauses,
optionally mixing speakers per line.

    python examples/voice_over.py --out voiceover.wav \
        --line "0|Первое предложение." --line "1|Второе предложение."

Lines are "speaker|text"; with no checkpoint weights the audio is noise but
the pipeline (G2P -> FS2 -> HiFi-GAN -> concat) runs end to end.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# Naive Cyrillic->phone transliteration for standalone demo runs (no
# russian_g2p, no lexicon): every letter maps onto a symbol that exists in
# the 206-symbol inventory, so the pipeline runs end to end. Real
# deployments use the lexicon / russian_g2p path (text/g2p.py).
_TRANSLIT = {
    "а": "A", "б": "B", "в": "V", "г": "G", "д": "D", "е": "E", "ё": "O",
    "ж": "Z", "з": "Z", "и": "I", "й": "J", "к": "K", "л": "L", "м": "M",
    "н": "N", "о": "O", "п": "P", "р": "R", "с": "S", "т": "T", "у": "U",
    "ф": "F", "х": "H", "ц": "C", "ч": "C", "ш": "S", "щ": "S", "ъ": "",
    "ы": "Y", "ь": "", "э": "E", "ю": "U", "я": "A", " ": "sp",
}


def _line_to_mel(king, text, speaker, duration):
    """text -> (mel (1,T,80), n_frames), falling back to transliterated
    phonemes when no G2P backend is available."""
    try:
        mel, lens = king.generate_mel(text, duration_control=duration,
                                      speaker=speaker)
    except ImportError:
        from tts_king_tpu.text import text_to_sequence

        phones = [p for ch in text.lower() for p in [_TRANSLIT.get(ch, "")]
                  if p]
        seq = text_to_sequence("{" + " ".join(phones) + "}", [])
        out = king.tts.generate(np.array([seq], np.int32),
                                duration_control=duration,
                                speaker_name=speaker)
        mel, lens = out["postnet_mel"], out["mel_lens"]
    return np.asarray(mel, np.float32), int(np.asarray(lens)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--line", action="append", required=True,
                    help='"speaker_id|text", repeatable')
    ap.add_argument("--out", default="voiceover.wav")
    ap.add_argument("--pause-ms", type=float, default=300.0)
    ap.add_argument("--duration", type=float, default=1.0)
    ap.add_argument("--time-shard", action="store_true",
                    help="vocode the whole track as ONE long utterance "
                         "time-sharded across all devices (ICI halo "
                         "exchange, ops/time_parallel.py)")
    ap.add_argument("--micro", action="store_true",
                    help="toy model sizes (fast on CPU; identical flow)")
    args = ap.parse_args()

    from scipy.io import wavfile

    from tts_king_tpu.config import (TTSConfig, load_config, micro_config)
    from tts_king_tpu.pipeline import TTSKing

    if args.micro:
        cfg = micro_config()
    else:
        cfg = load_config(args.config) if args.config else TTSConfig()
    king = TTSKing(cfg)
    if not (cfg.acoustic.weights_path
            and os.path.exists(cfg.acoustic.weights_path)):
        # random weights predict ~zero durations; bias the duration head to
        # ~4.5 frames/phoneme so the demo produces realistic-length audio
        import jax.numpy as jnp

        dp = king.tts.variables["params"]["variance_adaptor"][
            "duration_predictor"]["linear_layer"]
        dp["bias"] = jnp.full_like(dp["bias"], 1.5)
    sr = cfg.preprocess.audio.sampling_rate
    pause = np.zeros(int(sr * args.pause_ms / 1000), np.int16)

    if args.time_shard:
        # Long-form path: build ONE mel track (line mels + silence-mel
        # pauses) and vocode it time-sharded across every device.
        import jax

        from tts_king_tpu.parallel.mesh import build_mesh

        hop = cfg.preprocess.stft.hop_length
        silence = np.full((max(int(sr * args.pause_ms / 1000) // hop, 1), 80),
                          np.log(1e-5), np.float32)  # compressed-log silence
        mels = []
        for line in args.line:
            speaker, text = line.split("|", 1)
            mel, n = _line_to_mel(
                king, text, int(speaker) if speaker.isdigit() else speaker,
                args.duration)
            mels += [mel[0, :n], silence]
        long_mel = np.concatenate(mels[:-1])[None]
        mesh = build_mesh(dp=len(jax.devices()), tp=1)
        try:
            track = king.vocoder.generate_long(long_mel, mesh)
            how = f"time-sharded over {mesh.shape['dp']} devices"
        except ValueError:  # track too short to shard this many ways
            track = king.vocoder.generate(long_mel)[0]
            how = "single-device (track too short to shard)"
        wavfile.write(args.out, sr, track)
        print(f"wrote {args.out}: {len(track) / sr:.2f}s, "
              f"{len(args.line)} lines, {how}")
        return

    pieces = []
    for line in args.line:
        speaker, text = line.split("|", 1)
        mel, n = _line_to_mel(
            king, text, int(speaker) if speaker.isdigit() else speaker,
            args.duration)
        wavs = king.mel_to_wav(mel[:, :n], np.asarray([n]))
        pieces += [wavs[0], pause]
    track = np.concatenate(pieces[:-1]) if pieces else np.zeros(0, np.int16)
    wavfile.write(args.out, sr, track)
    print(f"wrote {args.out}: {len(track) / sr:.2f}s, {len(args.line)} lines")


if __name__ == "__main__":
    main()
