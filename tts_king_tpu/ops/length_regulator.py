"""Static-shape length regulator.

The reference expands each phoneme's hidden state `duration[i]` times with a
per-item Python loop over dynamic shapes (fs_two/model/modules.py:220-252) —
untraceable under XLA. Here the same mapping is a fixed-size gather:

    ends[b]   = cumsum(durations[b])
    idx[b, t] = #{i : ends[b, i] <= t}         (searchsorted right)
    out[b, t] = x[b, idx[b, t]]  if t < mel_len[b] else 0

which is exactly "repeat phoneme i duration[i] times, then zero-pad", with a
static output length. O(B*T*log L), fully vmappable/differentiable (gradients
flow to x via the gather; durations are integers, no gradient as in torch).
"""

import jax
import jax.numpy as jnp


def length_regulate(x, durations, max_mel_len):
    """Expand phoneme-level features to frame level.

    Args:
      x: (B, L, H) phoneme hidden states.
      durations: (B, L) non-negative integer frame counts (rounded).
      max_mel_len: static output length T.

    Returns:
      out: (B, T, H) frame-level features, zero past mel_len.
      mel_len: (B,) total frames per item (may exceed T; caller clamps).
    """
    durations = durations.astype(jnp.int32)
    ends = jnp.cumsum(durations, axis=1)  # (B, L)
    mel_len = ends[:, -1]
    t = jnp.arange(max_mel_len, dtype=jnp.int32)
    idx = jax.vmap(lambda e: jnp.searchsorted(e, t, side="right"))(ends)
    idx = jnp.minimum(idx, x.shape[1] - 1)
    out = jnp.take_along_axis(x, idx[:, :, None], axis=1)
    valid = t[None, :] < jnp.minimum(mel_len, max_mel_len)[:, None]
    out = jnp.where(valid[:, :, None], out, 0.0)
    return out, mel_len


def expand_values(values, durations, max_mel_len):
    """Frame-expand per-phoneme scalars (pitch/energy) the same way.

    values: (B, L) -> (B, T). Mirrors tools.expand (fs_two/utils/tools.py:134).
    """
    out, _ = length_regulate(values[:, :, None], durations, max_mel_len)
    return out[:, :, 0]


def round_durations(log_duration_pred, d_control):
    """Inference duration rounding, bit-matching the reference:
    clamp(round((exp(logd) - 1)) * d_control, min=0)
    (fs_two/model/modules.py:199-204). Returned as float — like the
    reference's duration_rounded output — with int truncation happening
    inside length_regulate (mirroring the int() in modules.py:244-245)."""
    d = jnp.round(jnp.exp(log_duration_pred) - 1.0) * d_control
    return jnp.maximum(d, 0.0)
