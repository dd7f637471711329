"""Streaming (chunked) vocoder synthesis.

The HiFi-GAN generator is fully convolutional, so a waveform chunk depends
only on a bounded mel neighborhood (receptive field ~24 mel frames for the
shipped config). Vocoding fixed-size halo'd mel windows therefore yields the
same audio as the full pass everywhere except the sequence edges of each
window — which the halo absorbs — enabling low-latency playback: the first
chunk of audio is ready after one small vocoder call instead of waiting for
the whole utterance.

Every chunk reuses ONE compiled program (fixed window shape), so steady-state
streaming never retraces.
"""

from typing import Iterator

import numpy as np


def generator_receptive_field(config) -> int:
    """Conservative one-sided receptive field of the generator in MEL frames:
    conv_pre + per stage (transposed-conv + MRF halos, divided back to mel
    rate by the accumulated upsampling) + conv_post."""
    rf = 3.0  # conv_pre k=7
    prev_up = 1.0
    up = 1.0
    for u, k in zip(config.upsample_rates, config.upsample_kernel_sizes):
        prev_up, up = up, up * u
        rf += (k / u) / prev_up  # transposed conv halo, at the input rate
        mrf_halo = max(
            sum((kk - 1) // 2 * d + (kk - 1) // 2 for d in dil)
            for kk, dil in zip(config.resblock_kernel_sizes,
                               config.resblock_dilation_sizes))
        rf += mrf_halo / up
    rf += 3.0 / up  # conv_post k=7 at sample rate
    return int(np.ceil(rf)) + 2


def stream_vocoder(vocoder_apply, variables, mel, chunk_frames: int = 64,
                   halo_frames: int = 32, hop: int = 256,
                   start_frame: int = 0) -> Iterator[np.ndarray]:
    """Yield waveform chunks for a (1, T, n_mels) mel.

    vocoder_apply: jitted `model.apply`; halo_frames must cover the
    generator's receptive field (generator_receptive_field()).
    Chunks concatenate to ~the full-pass waveform (exact in the interior).
    start_frame skips already-produced leading chunks (the serving layer's
    speculative first-window dispatch, serve.SynthesisServer.stream).
    """
    mel = np.asarray(mel)
    assert mel.ndim == 3 and mel.shape[0] == 1
    T = mel.shape[1]
    for start in range(start_frame, T, chunk_frames):
        lo = start - halo_frames
        hi = start + chunk_frames + halo_frames
        pad_l = max(0, -lo)
        pad_r = max(0, hi - T)
        piece = mel[:, max(lo, 0) : min(hi, T)]
        if pad_l or pad_r:
            piece = np.pad(piece, [(0, 0), (pad_l, pad_r), (0, 0)],
                           mode="edge")
        wav = np.asarray(vocoder_apply(variables, piece))
        n_valid = min(chunk_frames, T - start)
        yield wav[0, halo_frames * hop : (halo_frames + n_valid) * hop]
