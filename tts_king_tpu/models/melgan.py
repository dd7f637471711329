"""MelGAN vocoder generator (the reference's alternative vocoder choice,
`model_config.vocoder.model: "MelGAN"`, loaded upstream from the public
descriptinc/melgan-neurips torch.hub module — fs_two/utils/model.py:52-61).

Architecture (descript MelGAN): reflect-pad conv7 (80 -> ngf*2^n_ups) ->
per upsample rate r: leaky_relu(0.2) -> ConvTranspose1d(k=2r, stride r,
pad ceil(r/2), output_padding r%2) -> n_residual dilated ResnetBlocks
(dilation 3^j; leaky_relu 0.2 -> reflect-pad dilated conv3 -> leaky_relu ->
conv1, plus a conv1 shortcut) -> leaky_relu -> reflect-pad conv7 -> 1 ch ->
tanh. Weight norm on every conv (folded by the converter at load).

Inference contract matches vocoder_infer (fs_two/utils/model.py:87-89): the
model consumes log10 mels, so callers divide natural-log mels by ln(10).
"""

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tts_king_tpu.ops.convs import conv1d, conv_transpose1d

LRELU_SLOPE = 0.2


def _reflect_pad_t(x, pad):
    return jnp.pad(x, [(0, 0), (pad, pad), (0, 0)], mode="reflect")


class MelGANGenerator(nn.Module):
    """(B, T, 80) log10-mel -> (B, T*prod(ratios)) waveform in [-1, 1]."""

    mel_channels: int = 80
    ngf: int = 32
    n_residual_layers: int = 3
    ratios: Sequence[int] = (8, 8, 2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel):
        mult = int(2 ** len(self.ratios))
        x = mel.astype(self.dtype)
        x = _reflect_pad_t(x, 3)
        x = _MGConv(self.ngf * mult, 7, name="conv_in")(x)

        for i, r in enumerate(self.ratios):
            out_ch = self.ngf * mult // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            x = _MGConvTranspose(out_ch, 2 * r, stride=r,
                                 padding=r // 2 + r % 2,
                                 output_padding=r % 2,
                                 name=f"up_{i}")(x)
            for j in range(self.n_residual_layers):
                x = _ResnetBlock(out_ch, dilation=3 ** j,
                                 name=f"res_{i}_{j}")(x)

        x = nn.leaky_relu(x, LRELU_SLOPE)
        x = _reflect_pad_t(x, 3)
        x = _MGConv(1, 7, name="conv_out")(x)
        return jnp.tanh(x.astype(jnp.float32))[..., 0]


class _MGConv(nn.Module):
    features: int
    kernel_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.normal(0.02),
            (self.kernel_size, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return conv1d(x, kernel.astype(x.dtype), bias.astype(x.dtype),
                      dilation=self.dilation)


class _MGConvTranspose(nn.Module):
    features: int
    kernel_size: int
    stride: int
    padding: int
    output_padding: int = 0

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.normal(0.02),
            (self.kernel_size, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        out = conv_transpose1d(x, kernel.astype(x.dtype),
                               bias.astype(x.dtype), self.stride,
                               self.padding)
        if self.output_padding:
            out = jnp.pad(out, [(0, 0), (0, self.output_padding), (0, 0)])
        return out


class _ResnetBlock(nn.Module):
    dim: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.leaky_relu(x, LRELU_SLOPE)
        h = _reflect_pad_t(h, self.dilation)
        h = _MGConv(self.dim, 3, dilation=self.dilation, name="block_conv")(h)
        h = nn.leaky_relu(h, LRELU_SLOPE)
        h = _MGConv(self.dim, 1, name="block_out")(h)
        shortcut = _MGConv(self.dim, 1, name="shortcut")(x)
        return shortcut + h


def convert_melgan_state(state, ratios=(8, 8, 2, 2), n_residual_layers=3):
    """torch state dict of the descript MelGAN generator (an nn.Sequential
    named `model`, weight-normed) -> flax params for MelGANGenerator.

    Sequential layout: [pad, conv7] + per-stage [lrelu, convT, res*n] +
    [lrelu, pad, conv7, tanh]; indices derived below.
    """
    import numpy as onp

    def fold(prefix):
        if prefix + ".weight" in state:
            w = _np(state[prefix + ".weight"])
        else:
            g = _np(state[prefix + ".weight_g"])
            v = _np(state[prefix + ".weight_v"])
            axes = tuple(range(1, v.ndim))
            w = g * v / onp.sqrt((v * v).sum(axis=axes, keepdims=True))
        return w, _np(state[prefix + ".bias"])

    def conv(prefix):
        w, b = fold(prefix)  # (out, in, k)
        return {"kernel": onp.ascontiguousarray(w.transpose(2, 1, 0)),
                "bias": b}

    def conv_t(prefix):
        w, b = fold(prefix)  # (in, out, k)
        return {"kernel": onp.ascontiguousarray(w.transpose(2, 0, 1)),
                "bias": b}

    params = {}
    idx = 1  # model.0 = ReflectionPad1d
    params["conv_in"] = conv(f"model.{idx}")
    idx += 1
    for i, _r in enumerate(ratios):
        idx += 1  # LeakyReLU
        params[f"up_{i}"] = conv_t(f"model.{idx}")
        idx += 1
        for j in range(n_residual_layers):
            base = f"model.{idx}"
            params[f"res_{i}_{j}"] = {
                # ResnetBlock.block = [lrelu, pad, conv3, lrelu, conv1]
                "block_conv": conv(base + ".block.2"),
                "block_out": conv(base + ".block.4"),
                "shortcut": conv(base + ".shortcut"),
            }
            idx += 1
    idx += 2  # LeakyReLU, ReflectionPad1d
    params["conv_out"] = conv(f"model.{idx}")
    return {"params": params}


def _np(t):
    import numpy as onp

    return t if isinstance(t, onp.ndarray) else t.detach().cpu().numpy()
