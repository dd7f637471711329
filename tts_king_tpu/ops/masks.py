"""Padding-mask helpers (True = padded position).

Same convention as the reference (fs_two/utils/tools.py:121-131): a boolean
mask over the time axis where True marks positions at or beyond the sequence
length. All shapes static; lengths are traced values.
"""

import jax.numpy as jnp


def mask_from_lengths(lengths, max_len):
    """(B,) lengths -> (B, max_len) bool mask, True = pad."""
    ids = jnp.arange(max_len, dtype=lengths.dtype)
    return ids[None, :] >= lengths[:, None]


def lengths_from_mask(mask):
    """(B, T) bool pad-mask -> (B,) lengths."""
    return jnp.sum(~mask, axis=1)
