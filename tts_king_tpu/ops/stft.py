"""Batched STFT / mel-spectrogram / energy extraction in XLA.

Numerical parity targets:
  * TacotronSTFT path (fs_two/audio/stft.py:57-90,145-193): reflect-pad by
    n_fft//2 on both sides, periodic Hann window, |rfft| magnitudes, Slaney
    mel projection, log dynamic-range compression (clip 1e-5), per-frame L2
    energy. The reference computes this with a conv1d against a DFT basis
    (plus a hard-coded `.cuda(3)`); an rfft over strided frames is the same
    linear map and batches cleanly on TPU.
  * HiFi-GAN path (hifi/meldataset.py:45-74): reflect-pad by (n_fft-hop)//2,
    torch.stft(center=False), sqrt(|.|^2 + 1e-9) magnitudes, same mel + log.

Everything is shape-static and vmap/jit-friendly; frames are gathered with a
static index matrix.
"""

import functools

import jax.numpy as jnp
import numpy as np

from tts_king_tpu.ops.mel import mel_filterbank


@functools.lru_cache(maxsize=None)
def _hann_window(win_length, n_fft):
    """Periodic Hann, zero-padded centrally to n_fft (scipy get_window +
    librosa pad_center semantics)."""
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win_length) / win_length)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        w = np.pad(w, (pad, n_fft - win_length - pad))
    return w.astype(np.float32)


def frame_signal(y, n_fft, hop_length):
    """(..., T) -> (..., n_frames, n_fft) via a static gather."""
    T = y.shape[-1]
    n_frames = 1 + (T - n_fft) // hop_length
    idx = (np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :])
    return y[..., idx]


def stft_magnitude(y, n_fft=1024, hop_length=256, win_length=1024,
                   center_pad="tacotron", mag_eps=0.0):
    """Batched magnitude spectrogram.

    y: (B, T) waveform in [-1, 1].
    center_pad: 'tacotron' (reflect n_fft//2, reference STFT.transform) or
      'hifigan' (reflect (n_fft-hop)//2, meldataset.mel_spectrogram).
    Returns (B, n_frames, 1 + n_fft//2).
    """
    if center_pad == "tacotron":
        pad = n_fft // 2
    elif center_pad == "hifigan":
        pad = (n_fft - hop_length) // 2
    else:
        raise ValueError(center_pad)
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(y, n_fft, hop_length)
    window = jnp.asarray(_hann_window(win_length, n_fft))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return jnp.sqrt(power + mag_eps)


def dynamic_range_compression(x, C=1.0, clip_val=1e-5):
    """log(clamp(x, 1e-5) * C) — fs_two/audio/audio_processing.py:85-91."""
    return jnp.log(jnp.clip(x, clip_val, None) * C)


def dynamic_range_decompression(x, C=1.0):
    return jnp.exp(x) / C


class MelExtractor:
    """Precomputed-basis mel+energy extractor (TacotronSTFT equivalent)."""

    def __init__(self, filter_length=1024, hop_length=256, win_length=1024,
                 n_mel_channels=80, sampling_rate=22050, mel_fmin=0.0,
                 mel_fmax=8000.0):
        self.filter_length = filter_length
        self.hop_length = hop_length
        self.win_length = win_length
        self.mel_basis = jnp.asarray(
            mel_filterbank(sampling_rate, filter_length, n_mel_channels,
                           mel_fmin, mel_fmax))

    def mel_and_energy(self, y):
        """(B, T) wav -> ((B, n_frames, n_mels) log-mel, (B, n_frames) energy).

        Mel is log-compressed; energy is the per-frame L2 norm of the linear
        magnitudes (fs_two/audio/stft.py:174-193).
        """
        mag = stft_magnitude(y, self.filter_length, self.hop_length,
                             self.win_length, center_pad="tacotron")
        mel = jnp.einsum("btf,mf->btm", mag, self.mel_basis)
        mel = dynamic_range_compression(mel)
        energy = jnp.linalg.norm(mag, axis=-1)
        return mel, energy


def hifigan_mel(y, n_fft=1024, num_mels=80, sampling_rate=22050, hop_size=256,
                win_size=1024, fmin=0.0, fmax=8000.0):
    """HiFi-GAN training mel (hifi/meldataset.py:45-74): (B, T) -> (B, frames, mels)."""
    mag = stft_magnitude(y, n_fft, hop_size, win_size, center_pad="hifigan",
                         mag_eps=1e-9)
    basis = jnp.asarray(mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax))
    mel = jnp.einsum("btf,mf->btm", mag, basis)
    return dynamic_range_compression(mel)


def griffin_lim(magnitudes, n_iters=30, n_fft=1024, hop_length=256,
                win_length=1024, key=None):
    """Griffin-Lim phase reconstruction fallback
    (fs_two/audio/audio_processing.py:66-82), batched in XLA.

    magnitudes: (B, n_frames, 1+n_fft//2) linear magnitudes -> (B, T) wav.
    """
    import jax

    if key is None:
        key = jax.random.PRNGKey(0)
    angles = jax.random.uniform(key, magnitudes.shape, minval=-np.pi, maxval=np.pi)
    spec = magnitudes * jnp.exp(1j * angles)
    signal = istft(spec, n_fft, hop_length, win_length)
    window = jnp.asarray(_hann_window(win_length, n_fft))
    for _ in range(n_iters):
        padded = jnp.pad(signal, [(0, 0), (n_fft // 2, n_fft // 2)], mode="reflect")
        full = jnp.fft.rfft(frame_signal(padded, n_fft, hop_length) * window, axis=-1)
        phase = full / jnp.maximum(jnp.abs(full), 1e-8)
        spec = magnitudes[:, : phase.shape[1]] * phase
        signal = istft(spec, n_fft, hop_length, win_length)
    return signal


def istft(spec, n_fft=1024, hop_length=256, win_length=1024):
    """Inverse STFT with window-sum-square normalization (overlap-add)."""
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # (B, n_frames, n_fft)
    window = jnp.asarray(_hann_window(win_length, n_fft))
    frames = frames * window
    B, n_frames, _ = frames.shape
    T = n_fft + hop_length * (n_frames - 1)
    # Overlap-add via scatter-add on a static index map.
    idx = (np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :])
    out = jnp.zeros((B, T), frames.dtype)
    out = out.at[:, idx.reshape(-1)].add(frames.reshape(B, -1))
    # Window sum-square envelope.
    wss = np.zeros(T, dtype=np.float32)
    w2 = np.asarray(_hann_window(win_length, n_fft)) ** 2
    for i in range(n_frames):
        wss[i * hop_length : i * hop_length + n_fft] += w2
    out = out / jnp.maximum(jnp.asarray(wss), 1e-10)
    return out[:, n_fft // 2 : -(n_fft // 2)]
