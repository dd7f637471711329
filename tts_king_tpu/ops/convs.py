"""1-D convolution primitives with exact torch semantics, NTC layout.

Feature-last (batch, time, channels) layout keeps the channel dim on the TPU
lane axis so XLA tiles the contraction onto the MXU. Kernels are stored as
(k, Cin, Cout); the checkpoint converter transposes torch's (Cout, Cin, k).
Semantics (padding/stride/dilation/transposed output length) match
torch.nn.Conv1d / ConvTranspose1d, which the reference models rely on
(fs_two/transformer/SubLayers.py:76-88, hifi/models.py:146-201).
"""

import jax.numpy as jnp
from jax import lax

_DN = ("NHC", "HIO", "NHC")


def conv1d(x, kernel, bias=None, stride=1, padding=0, dilation=1, groups=1):
    """x: (B, T, Cin); kernel: (k, Cin//groups, Cout) -> (B, T', Cout)."""
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias
    return out


def conv_transpose1d(x, kernel, bias=None, stride=1, padding=0):
    """Exact torch ConvTranspose1d: y[t] = sum_j x[u] K[j], t = u*stride + j - padding.

    x: (B, T, Cin); kernel: (k, Cin, Cout) in torch orientation (i.e. K[j]
    maps input channels to output channels for tap j, matching torch's
    weight[cin, cout, j]). Output length: (T-1)*stride - 2*padding + k.

    Implemented as a dilated convolution with a spatially flipped kernel —
    the standard transposed-convolution identity — so XLA lowers it to a
    regular MXU convolution.
    """
    k = kernel.shape[0]
    out = lax.conv_general_dilated(
        x,
        jnp.flip(kernel, axis=0),
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=_DN,
    )
    if bias is not None:
        out = out + bias
    return out


def adaptive_avg_pool1d(x, output_size):
    """torch.nn.AdaptiveAvgPool1d over the time axis of (B, T, C).

    Segment i averages x[floor(i*T/out) : ceil((i+1)*T/out)]. T is static, so
    the segment map is built at trace time.
    """
    T = x.shape[1]
    pieces = []
    for i in range(output_size):
        lo = (i * T) // output_size
        hi = -(-((i + 1) * T) // output_size)  # ceil
        pieces.append(jnp.mean(x[:, lo:hi, :], axis=1, keepdims=True))
    return jnp.concatenate(pieces, axis=1)
