"""Shared neural building blocks for the FastSpeech2 acoustic model.

Behavioral parity targets (verified by tests/test_parity_fs2.py against the
reference torch implementation run as an oracle):
  * FFTBlock = masked multi-head self-attention + conv1d feed-forward,
    post-LayerNorm, with padded positions zeroed after each sub-layer
    (fs_two/transformer/Layers.py:11-34, SubLayers.py).
  * PostNet = 5x [conv1d(k=5) + BatchNorm], tanh on all but the last,
    dropout 0.5 (fs_two/transformer/Layers.py:71-143).
  * VariancePredictor = 2x [conv1d(k=3) + ReLU + LayerNorm + dropout] +
    linear head, masked to 0 at padded positions
    (fs_two/model/modules.py:255-309).

Layout is feature-last (B, T, C) throughout — channels ride the TPU lane
axis, so every contraction lands on the MXU and XLA fuses the elementwise
tails into the matmuls.
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LN_EPS = 1e-5  # torch LayerNorm/BatchNorm default
NEG_INF = -1e9  # finite mask value: avoids NaNs on fully-padded rows


def sinusoid_position_table(n_position: int, d_hid: int) -> np.ndarray:
    """Fixed sinusoid table, same angle layout as the reference
    (fs_two/transformer/Models.py:10-30): angle = pos / 10000^(2*(i//2)/d),
    sin on even channels, cos on odd."""
    pos = np.arange(n_position)[:, None]
    idx = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (idx // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table.astype(np.float32)


class MultiHeadAttention(nn.Module):
    """Post-LN multi-head self-attention (fs_two/transformer/SubLayers.py:8-65)."""

    n_head: int
    d_model: int
    d_k: int
    d_v: int
    dropout: float = 0.1
    dtype: Any = jnp.float32
    use_pallas: bool = False  # fused VMEM-resident attention (inference)
    use_flash: bool = False   # flash kernel w/ custom VJP (training too)
    probs_bf16: bool = False  # store softmax probs in bf16 (see config)

    @nn.compact
    def __call__(self, x, key_pad_mask, deterministic: bool = True):
        B, T, _ = x.shape
        residual = x
        q = nn.Dense(self.n_head * self.d_k, dtype=self.dtype, name="w_qs")(x)
        k = nn.Dense(self.n_head * self.d_k, dtype=self.dtype, name="w_ks")(x)
        v = nn.Dense(self.n_head * self.d_v, dtype=self.dtype, name="w_vs")(x)
        q = q.reshape(B, T, self.n_head, self.d_k)
        k = k.reshape(B, T, self.n_head, self.d_k)
        v = v.reshape(B, T, self.n_head, self.d_v)

        if self.use_flash and self.d_k == self.d_v:
            from tts_king_tpu.ops.pallas.attention import (
                flash_attention_padmask)

            out = flash_attention_padmask(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), key_pad_mask)
            out = out.transpose(0, 2, 1, 3)
        elif self.use_pallas and deterministic and self.d_k == self.d_v:
            from tts_king_tpu.ops.pallas.attention import fused_attention

            out = fused_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), key_pad_mask)
            out = out.transpose(0, 2, 1, 3)
        else:
            scale = 1.0 / np.power(self.d_k, 0.5)
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            # Key-side padding mask, broadcast over heads and queries — the
            # reference masks the same way (Models.py:85, Modules.py:18-19).
            attn = jnp.where(key_pad_mask[:, None, None, :], NEG_INF, attn)
            # Softmax in f32 for stability under bf16 compute.
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
            # Optionally store the probabilities in bf16: they are the
            # train step's largest autodiff residual ((B,H,T,T) per layer,
            # saved fwd + re-read bwd in the HBM-bound step, DESIGN.md
            # 3.1/3.3); the TPU matmul consumes bf16 inputs at default
            # precision anyway, so only the SAVED bytes change.
            attn = attn.astype(jnp.bfloat16 if self.probs_bf16 else v.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(B, T, self.n_head * self.d_v)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="fc")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                            name="layer_norm")(out + residual)


class PositionwiseFeedForward(nn.Module):
    """Conv1d FFN: k=9 expand, k=1 project, post-LN
    (fs_two/transformer/SubLayers.py:68-100)."""

    d_in: int
    d_hid: int
    kernel_size: Tuple[int, int] = (9, 1)
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        residual = x
        k1, k2 = self.kernel_size
        h = nn.Conv(self.d_hid, (k1,), padding=[((k1 - 1) // 2,) * 2],
                    dtype=self.dtype, name="w_1")(x)
        h = jax.nn.relu(h)
        h = nn.Conv(self.d_in, (k2,), padding=[((k2 - 1) // 2,) * 2],
                    dtype=self.dtype, name="w_2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                            name="layer_norm")(h + residual)


class FFTBlock(nn.Module):
    """Feed-forward transformer block (fs_two/transformer/Layers.py:11-34)."""

    d_model: int
    n_head: int
    d_k: int
    d_v: int
    d_inner: int
    kernel_size: Tuple[int, int]
    dropout: float = 0.1
    dtype: Any = jnp.float32
    use_pallas: bool = False
    use_flash: bool = False
    probs_bf16: bool = False

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool = True):
        not_pad = (~pad_mask)[:, :, None].astype(x.dtype)
        x = MultiHeadAttention(
            self.n_head, self.d_model, self.d_k, self.d_v, self.dropout,
            dtype=self.dtype, use_pallas=self.use_pallas,
            use_flash=self.use_flash, probs_bf16=self.probs_bf16,
            name="slf_attn",
        )(x, pad_mask, deterministic)
        x = x * not_pad
        x = PositionwiseFeedForward(
            self.d_model, self.d_inner, self.kernel_size, self.dropout,
            dtype=self.dtype, name="pos_ffn",
        )(x, deterministic)
        return x * not_pad


class PostNet(nn.Module):
    """Residual mel refiner (fs_two/transformer/Layers.py:71-143)."""

    n_mel_channels: int = 80
    embedding_dim: int = 512
    kernel_size: int = 5
    n_convolutions: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, pad_mask=None):
        """pad_mask (B, T) True=pad: zeroing activations after every stage
        makes each conv see zeros past mel_len — bit-identical to running
        the stack at that item's true length (what the reference does with
        its dynamic batch max length), independent of batch composition."""
        pad = [((self.kernel_size - 1) // 2,) * 2]
        not_pad = None
        if pad_mask is not None:
            not_pad = (~pad_mask)[:, :, None].astype(x.dtype)
            x = x * not_pad
        for i in range(self.n_convolutions):
            is_last = i == self.n_convolutions - 1
            feats = self.n_mel_channels if is_last else self.embedding_dim
            x = nn.Conv(feats, (self.kernel_size,), padding=pad,
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=LN_EPS, dtype=self.dtype,
                             name=f"bn_{i}")(x)
            if not is_last:
                x = jnp.tanh(x)
            x = nn.Dropout(0.5)(x, deterministic=not train)
            if not_pad is not None:
                x = x * not_pad
        return x


class VariancePredictor(nn.Module):
    """Duration/pitch/energy predictor (fs_two/model/modules.py:255-309)."""

    filter_size: int = 256
    kernel_size: int = 3
    dropout: float = 0.5
    output_size: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool = True):
        k = self.kernel_size
        h = nn.Conv(self.filter_size, (k,), padding=[((k - 1) // 2,) * 2],
                    dtype=self.dtype, name="conv1d_1")(x)
        h = jax.nn.relu(h)
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                         name="layer_norm_1")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        # conv2 padding is hard-coded to 1 in the reference (modules.py:291);
        # identical to (k-1)//2 at the shipped k=3.
        h = nn.Conv(self.filter_size, (k,), padding=[(1, 1)],
                    dtype=self.dtype, name="conv1d_2")(h)
        h = jax.nn.relu(h)
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                         name="layer_norm_2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        out = nn.Dense(self.output_size, dtype=self.dtype,
                       name="linear_layer")(h)
        if self.output_size == 1:
            out = out[..., 0]
            out = jnp.where(pad_mask, 0.0, out)
        else:
            out = jnp.where(pad_mask[:, :, None], 0.0, out)
        return out


class CNNFlat(nn.Module):
    """Conv1d(size->1, k=1) + AdaptiveAvgPool1d(reduce) + LayerNorm + ReLU
    (fs_two/model/modules.py:358-370). (B, T, C) -> (B, reduce)."""

    reduce: int = 30
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from tts_king_tpu.ops.convs import adaptive_avg_pool1d

        h = nn.Conv(1, (1,), dtype=self.dtype, name="conv")(x)  # (B, T, 1)
        h = adaptive_avg_pool1d(h, self.reduce)[..., 0]          # (B, reduce)
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(h)
        return jax.nn.relu(h)


class CNNScalar(nn.Module):
    """Two CNNFlat branches + linear head -> (B, 1) non-negative scalar
    (fs_two/model/modules.py:373-385). Predicts pitch mean/std in CWT mode."""

    reduce: int = 30
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_one, x_two):
        a = CNNFlat(self.reduce, dtype=self.dtype, name="flat_one")(x_one)
        b = CNNFlat(self.reduce, dtype=self.dtype, name="flat_two")(x_two)
        out = nn.Dense(1, dtype=self.dtype, name="linear")(a + b)
        return jax.nn.relu(out)
