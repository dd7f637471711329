"""Batched fundamental-frequency (F0) estimation in XLA.

TPU-native replacement for the reference's per-utterance pyworld
dio+stonemask calls (fs_two/preprocessor/preprocessor.py:206-215): a
vectorized YIN estimator (cumulative-mean-normalized difference function with
parabolic interpolation, de Cheveigne & Kawahara 2002) producing one F0 value
per mel frame (hop-aligned, same frame count T//hop + 1 as pyworld at the
reference's frame period). Unvoiced frames are 0, matching pyworld's
convention so the downstream interpolation/averaging logic is unchanged.

All ops are static-shape and batch over (B, T) waveforms; the FFT-based
difference function keeps it O(B * frames * W log W).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tts_king_tpu.ops.stft import frame_signal

DEFAULT_F0_FLOOR = 71.0   # pyworld default
DEFAULT_F0_CEIL = 800.0   # pyworld default


@functools.partial(
    jax.jit, static_argnames=("sampling_rate", "hop_length", "frame_length",
                              "f0_floor", "f0_ceil", "threshold"))
def yin_f0(y, sampling_rate=22050, hop_length=256, frame_length=2048,
           f0_floor=DEFAULT_F0_FLOOR, f0_ceil=DEFAULT_F0_CEIL, threshold=0.15):
    """Estimate F0 contours for a batch of waveforms.

    Args:
      y: (B, T) float waveforms in [-1, 1].
    Returns:
      (B, n_frames) F0 in Hz, 0 where unvoiced; n_frames = T//hop + 1.
    """
    y = jnp.asarray(y, jnp.float32)
    tau_min = max(2, int(sampling_rate / f0_ceil))
    tau_max = min(frame_length // 2, int(sampling_rate / f0_floor) + 1)
    W = frame_length
    N = W - tau_max  # correlation support, static

    pad = W // 2
    ypad = jnp.pad(y, [(0, 0), (pad, pad - (1 if W % 2 else 0))], mode="reflect")
    frames = frame_signal(ypad, W, hop_length)  # (B, F, W)

    # Difference function d[tau] = sum_{j<N} (x[j] - x[j+tau])^2 via FFT autocorr.
    head = frames[..., :N]
    fft_len = int(2 ** np.ceil(np.log2(W + N)))
    f_full = jnp.fft.rfft(frames, n=fft_len, axis=-1)
    f_head = jnp.fft.rfft(head, n=fft_len, axis=-1)
    corr = jnp.fft.irfft(f_full * jnp.conj(f_head), n=fft_len, axis=-1)[..., :tau_max + 1]

    sq = frames ** 2
    csum = jnp.cumsum(sq, axis=-1)
    e_head = csum[..., N - 1 : N]                      # sum x[0:N]^2
    # e_tail[tau] = sum_{j=tau}^{tau+N-1} x[j]^2
    zeros = jnp.zeros_like(csum[..., :1])
    csum0 = jnp.concatenate([zeros, csum], axis=-1)    # csum0[k] = sum x[0:k]^2
    tau_idx = jnp.arange(tau_max + 1)
    e_tail = csum0[..., tau_idx + N] - csum0[..., tau_idx]

    d = e_head + e_tail - 2.0 * corr                   # (B, F, tau_max+1)
    d = jnp.maximum(d, 0.0)

    # Cumulative-mean normalization: d'[tau] = d[tau] * tau / sum_{1..tau} d.
    dsum = jnp.cumsum(d[..., 1:], axis=-1)
    cmndf = d[..., 1:] * tau_idx[1:] / jnp.maximum(dsum, 1e-12)
    cmndf = jnp.concatenate([jnp.ones_like(d[..., :1]), cmndf], axis=-1)

    # Candidate selection in [tau_min, tau_max]: first dip below threshold,
    # else global minimum.
    search = cmndf[..., tau_min:]
    below = search < threshold
    first_below = jnp.argmax(below, axis=-1)
    any_below = jnp.any(below, axis=-1)
    # Walk the dip to its local minimum: among taus in a small window after
    # the first crossing, take the argmin (approximates YIN step 4).
    best_min = jnp.argmin(search, axis=-1)
    tau_rel = jnp.where(any_below, first_below, best_min)

    # Refine the below-threshold pick: local minimum within the dip.
    def local_min(c, start):
        win = 32
        offs = jnp.arange(win)
        idx = jnp.clip(start + offs, 0, c.shape[-1] - 1)
        vals = c[idx]
        # stop at the first rise after the minimum inside the window
        return start + jnp.argmin(vals)

    tau_rel = jnp.where(
        any_below,
        jax.vmap(jax.vmap(local_min))(search, tau_rel),
        tau_rel,
    )
    tau = tau_rel + tau_min

    # Parabolic interpolation around tau on the CMNDF.
    tm = jnp.clip(tau - 1, 0, tau_max)
    tp = jnp.clip(tau + 1, 0, tau_max)
    y0 = jnp.take_along_axis(cmndf, tm[..., None], axis=-1)[..., 0]
    y1 = jnp.take_along_axis(cmndf, tau[..., None], axis=-1)[..., 0]
    y2 = jnp.take_along_axis(cmndf, tp[..., None], axis=-1)[..., 0]
    denom = y0 - 2.0 * y1 + y2
    delta = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (y0 - y2) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    period = tau.astype(jnp.float32) + delta

    f0 = sampling_rate / jnp.maximum(period, 1.0)
    voiced = jnp.take_along_axis(cmndf, tau[..., None], axis=-1)[..., 0] < jnp.asarray(
        0.3, jnp.float32)
    f0 = jnp.where(voiced & (f0 >= f0_floor) & (f0 <= f0_ceil), f0, 0.0)
    return f0


def interpolate_unvoiced(f0):
    """Linearly interpolate F0 across unvoiced (zero) frames, numpy, one utt.

    Mirrors the reference's interp1d step (preprocessor.py:224-233): constant
    extrapolation with the first/last voiced values.
    """
    f0 = np.asarray(f0, dtype=np.float64)
    nonzero = np.nonzero(f0)[0]
    if len(nonzero) == 0:
        return f0
    out = np.interp(np.arange(len(f0)), nonzero, f0[nonzero])
    return out
