"""Continuous wavelet transform of log-F0 contours.

Forward transform: FFT-domain Mexican-hat (DOG m=2) CWT with the reference's
fixed parameters (dt=0.005, dj=1, s0=0.01, J=10 -> 11 scales; see
fs_two/cwt/cwt_utils.py:14-24, which delegates to pycwt). The CWT is just
ifft(fft(x) * conj(psi_hat(s*omega))) per scale, so it runs as batched XLA FFTs
instead of a per-utterance CPU call.

Inverse (in-graph) recomposition matches inverse_batch_cwt
(fs_two/cwt/cwt_utils.py:54-66): f0 = sum_i coef_i * (i + 3.5)^-2.5 over the
first 10 scales, then standardized over the *batch* dimension (the reference's
TorchStandardScaler quirk, kept for parity).
"""

import math

import jax.numpy as jnp
import numpy as np

CWT_DT = 0.005
CWT_DJ = 1.0
CWT_S0 = 2 * CWT_DT  # 0.01
CWT_J = 10  # J+1 = 11 scales


def cwt_scales(s0=CWT_S0, dj=CWT_DJ, J=CWT_J):
    return s0 * 2.0 ** (np.arange(0, J + 1) * dj)


def _mexican_hat_ft(f):
    """Fourier transform of the DOG(m=2) wavelet: f^2/sqrt(gamma(2.5)) e^{-f^2/2}."""
    return (f ** 2) / math.sqrt(math.gamma(2.5)) * jnp.exp(-(f ** 2) / 2.0)


def transform_cwt(lf0, dt=CWT_DT, dj=CWT_DJ, s0=CWT_S0, J=CWT_J):
    """Mexican-hat CWT of a (batched) signal.

    Args:
      lf0: (T,) or (B, T) standardized log-F0.
    Returns:
      (T, J+1) or (B, T, J+1) real wavelet coefficients (scales last), the
      layout the training features use.
    """
    x = jnp.asarray(lf0, dtype=jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    n0 = x.shape[-1]
    # Pad to the next power of two, like pycwt's fft_kwargs.
    N = int(2 ** math.ceil(math.log2(max(n0, 2))))
    scales = jnp.asarray(cwt_scales(s0, dj, J), dtype=jnp.float32)  # (S,)
    x_ft = jnp.fft.fft(x, n=N, axis=-1)  # (B, N) complex
    ftfreqs = 2.0 * jnp.pi * jnp.fft.fftfreq(N, dt).astype(jnp.float32)  # (N,)
    # Energy-normalized wavelet at each scale: sqrt(s * domega * N) * psi_hat(s*w)
    norm = jnp.sqrt(scales * ftfreqs[1] * N)  # (S,)
    psi_bar = norm[:, None] * _mexican_hat_ft(scales[:, None] * ftfreqs[None, :])
    W = jnp.fft.ifft(x_ft[:, None, :] * psi_bar[None, :, :], axis=-1)[:, :, :n0]
    out = jnp.real(W).transpose(0, 2, 1)  # (B, T, S)
    return out[0] if squeeze else out


def inverse_cwt(coefs, num_scales=10):
    """Single-utterance recomposition + per-utterance standardization.

    Parity with inverse_cwt (fs_two/cwt/cwt_utils.py:27-33).
    coefs: (T, >=num_scales) -> (T,).
    """
    weights = (jnp.arange(num_scales, dtype=jnp.float32) + 1 + 2.5) ** (-2.5)
    rec = jnp.sum(coefs[:, :num_scales] * weights[None, :], axis=-1)
    mean = jnp.mean(rec)
    std = jnp.std(rec)
    return (rec - mean) / jnp.maximum(std, 1e-12)


def inverse_batch_cwt(coefs, num_scales=10):
    """In-graph batched recomposition, standardized over the batch axis.

    Parity with inverse_batch_cwt (fs_two/cwt/cwt_utils.py:54-66) including
    its quirk of standardizing across the batch (dim 0), not time, with
    std(unbiased=False) + 1e-12.
    coefs: (B, T, >=num_scales) -> (B, T).
    """
    weights = (jnp.arange(num_scales, dtype=jnp.float32) + 1 + 2.5) ** (-2.5)
    rec = jnp.sum(coefs[:, :, :num_scales] * weights[None, None, :], axis=-1)
    mean = jnp.mean(rec, axis=0, keepdims=True)
    std = jnp.std(rec, axis=0, keepdims=True)
    return (rec - mean) / (std + 1e-12)
