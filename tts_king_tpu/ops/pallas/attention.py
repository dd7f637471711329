"""Fused masked self-attention Pallas kernel for the FFT blocks.

The acoustic model's attention is small-d (d_k=128 = one MXU lane tile),
moderate-T (<=1024 after bucketing): the whole (T, T) score matrix for one
(batch, head) fits comfortably in VMEM, so one kernel instance computes
  softmax(q @ k^T * scale + key_mask) @ v
with no HBM round-trips for the intermediate scores — the XLA fallback
materializes the (B, H, T, T) probabilities in HBM between two dots.

Grid: (B, H). Block constraints: T multiple of 8 (f32 sublane), D multiple
of 128 (lane). The wrapper pads T/D and un-pads the result; padded keys are
masked, padded queries produce garbage rows that the caller zeroes anyway
(FFTBlock multiplies by the pad mask, models/layers.py).

Inference path only for now (no custom VJP); training uses the XLA
formulation.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
    q = q_ref[0, 0]       # (T, D)
    k = k_ref[0, 0]       # (T, D)
    v = v_ref[0, 0]       # (T, D)
    mask = mask_ref[0]    # (1, T) int8: 1 = padded key

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (T, T)
    s = jnp.where(mask.astype(jnp.bool_), NEG_INF, s)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q, k, v, key_pad_mask, interpret=False):
    """softmax((q k^T)/sqrt(D) masked) v, fused per (batch, head).

    q, k, v: (B, H, T, D); key_pad_mask: (B, T) bool, True = padded key.
    Returns (B, H, T, D) in q.dtype. Scale 1/sqrt(D) applied to q up front.
    """
    B, H, T, D = q.shape
    scale = 1.0 / (D ** 0.5)
    q = q * jnp.asarray(scale, q.dtype)

    Tp = _round_up(max(T, 8), 8)
    Dp = _round_up(max(D, 128), 128)
    pad4 = [(0, 0), (0, 0), (0, Tp - T), (0, Dp - D)]
    qp = jnp.pad(q, pad4)
    kp = jnp.pad(k, pad4)
    vp = jnp.pad(v, pad4)
    maskp = jnp.pad(key_pad_mask, [(0, 0), (0, Tp - T)],
                    constant_values=True).astype(jnp.int8)[:, None, :]

    bh_spec = pl.BlockSpec((1, 1, Tp, Dp), lambda b, h: (b, h, 0, 0))
    # (B, 1, Tp) with a (1, 1, Tp) block satisfies the TPU tiling rule (the
    # trailing dims equal the full array dims).
    mask_spec = pl.BlockSpec((1, 1, Tp), lambda b, h: (b, 0, 0))

    out = pl.pallas_call(
        _attn_kernel,
        grid=(B, H),
        in_specs=[bh_spec, bh_spec, bh_spec, mask_spec],
        out_specs=bh_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, Dp), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * Tp * Tp * Dp,
            bytes_accessed=B * H * Tp * Dp * 4 * 4,
            transcendentals=B * H * Tp * Tp,
        ),
    )(qp, kp, vp, maskp)
    return out[:, :, :T, :D]


def attention_reference(q, k, v, key_pad_mask):
    """XLA reference formulation (for tests and the training path)."""
    D = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (D ** 0.5)
    s = jnp.where(key_pad_mask[:, None, None, :], NEG_INF, s)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def flash_attention_padmask(q, k, v, key_pad_mask):
    """TRAINING-capable flash attention (full custom VJP) with key-padding
    semantics, wrapping jax's stock Pallas TPU kernel.

    Why it exists: the XLA training path materializes the (B, H, T, T) f32
    probabilities in HBM on the forward pass and re-reads them on the
    backward — at shipped sizes (~52 MB x 6 decoder layers per microbatch)
    the largest single byte stream of the HBM-roofline-bound train step
    (DESIGN.md §3.1). The flash kernel streams K/V blocks through VMEM and
    recomputes probabilities in the backward, so the score matrix never
    touches HBM in either pass.

    STATUS — measured, opt-in (DESIGN.md §3.2): at shipped sizes (H=2,
    d_k=128, T<=640) the full train step is SLOWER with this path (107 ms
    vs 72 ms sustained at bs16x4): each pallas call is an opaque fusion
    barrier, and the wrapper's pad/transpose materializations add more
    traffic than the ~10% probability stream it removes. Numerics are
    verified (tests/test_flash_attention.py); enable via
    ModelConfig.use_flash_attention for larger-T/more-head configs where
    the O(T^2) stream dominates.

    q, k, v: (B, H, T, D); key_pad_mask: (B, T) bool, True = padded key.
    Returns (B, H, T, D). Padding contract matches fused_attention: padded
    KEYS are excluded exactly (segment ids); padded QUERY rows attend the
    valid keys and produce finite garbage the caller zeroes (FFTBlock
    multiplies by the pad mask) — deliberately not a query-side mask, since
    a fully-masked softmax row would be NaN.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    B, H, T, D = q.shape
    scale = 1.0 / (D ** 0.5)

    # The stock kernel blocks T in >=128 chunks and keeps D on MXU lanes:
    # pad T to a 128 multiple (padded keys land in segment 0 = masked) and
    # D to 128 (zero feature channels are exact for q.k dots; the padded v
    # channels are sliced off).
    Tp = _round_up(max(T, 128), 128)
    Dp = _round_up(max(D, 128), 128)
    pad4 = [(0, 0), (0, 0), (0, Tp - T), (0, Dp - D)]
    qp = jnp.pad(q, pad4)
    kp = jnp.pad(k, pad4)
    vp = jnp.pad(v, pad4)
    valid = ~jnp.pad(key_pad_mask, [(0, 0), (0, Tp - T)],
                     constant_values=True)
    seg = SegmentIds(q=jnp.ones((B, Tp), jnp.int32),
                     kv=valid.astype(jnp.int32))
    # 128-blocks everywhere: always divide Tp, satisfy the kernel's
    # 128-lane kv rule, and measured fastest at shipped sizes (T=640:
    # 128-blocks beat both the kernel defaults and full-T blocks).
    bq = 128
    bs = BlockSizes(block_q=bq, block_k_major=bq, block_k=bq, block_b=1,
                    block_q_major_dkv=bq, block_k_major_dkv=bq,
                    block_k_dkv=bq, block_q_dkv=bq,
                    block_k_major_dq=bq, block_k_dq=bq, block_q_dq=bq)
    out = flash_attention(qp, kp, vp, segment_ids=seg, sm_scale=scale,
                          block_sizes=bs)
    return out[:, :, :T, :D]
