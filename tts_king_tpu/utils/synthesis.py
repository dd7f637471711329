"""Batch synthesis output helpers (tools.synth_samples equivalent,
fs_two/utils/tools.py:209-274): write per-utterance mel plots and vocoded
wav files for a batch of model outputs."""

import json
import os
from typing import Sequence

import numpy as np


def synth_samples(outputs, basenames: Sequence[str], vocoder, cfg, path: str,
                  pitch_stats=None):
    """outputs: FastSpeech2 output dict; vocoder: pipeline.Vocoder or None."""
    os.makedirs(path, exist_ok=True)
    hop = cfg.preprocess.stft.hop_length
    sr = cfg.preprocess.audio.sampling_rate

    mel_lens = np.asarray(outputs["mel_lens"])
    src_lens = np.asarray(outputs["src_lens"])
    postnet = np.asarray(outputs["postnet_mel"])
    pitch = np.asarray(outputs["pitch_prediction"])
    energy = np.asarray(outputs["energy_prediction"])
    durations = np.asarray(outputs["duration_rounded"]).astype(np.int64)

    if pitch_stats is None:
        stats_path = os.path.join(cfg.preprocess.preprocessed_path,
                                  "stats.json")
        if os.path.exists(stats_path):
            with open(stats_path) as f:
                st = json.load(f)
            pitch_stats = st["pitch"] + st["energy"][:2]
        else:
            pitch_stats = [-3, 9, 0, 1, -2, 6]

    from tts_king_tpu.ops.length_regulator import expand_values
    from tts_king_tpu.utils.plotting import plot_mel

    import matplotlib.pyplot as plt

    for i, base in enumerate(basenames):
        n = int(mel_lens[i])
        sl = int(src_lens[i])
        mel = postnet[i, :n].T
        p = np.asarray(expand_values(pitch[i : i + 1, :sl],
                                     durations[i : i + 1, :sl], max(n, 1)))[0, :n]
        e = np.asarray(expand_values(energy[i : i + 1, :sl],
                                     durations[i : i + 1, :sl], max(n, 1)))[0, :n]
        fig = plot_mel([(mel, p, e)], pitch_stats, ["Synthesized"])
        fig.savefig(os.path.join(path, f"{base}.png"))
        plt.close(fig)

    if vocoder is not None:
        from scipy.io import wavfile

        wavs = vocoder.generate(postnet, lengths=mel_lens * hop)
        for wav, base in zip(wavs, basenames):
            wavfile.write(os.path.join(path, f"{base}.wav"), sr, wav)
