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

    Implemented as a base-dilated convolution with a spatially flipped
    kernel — the standard transposed-convolution identity. On TPU this is
    also the FAST form: XLA executes lhs_dilation at ~full MXU rate
    (measured 178-194 TF/s useful on the HiFi-GAN k=16/s=8 upsample
    shapes, i.e. the inserted zeros cost nothing), while the "zero-free"
    polyphase form below loses 2.5-4x to its phase-interleave relayout —
    see DESIGN.md 3.8.
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


def conv_transpose1d_poly(x, kernel, bias=None, stride=1, padding=0):
    """torch ConvTranspose1d via polyphase decomposition (zero-free FLOPs).

    Output phase t mod stride only ever reads kernel taps j with
    j = (t + padding) mod stride, so the transposed conv factors into
    `stride` independent dense sub-convolutions of ceil(k/s) taps each —
    computed here as ONE conv producing phase-major channels (n_taps, Cin)
    x (s*Cout), then interleaved back into time by reshape. Identical math
    to conv_transpose1d (summation order aside) with none of the
    inserted-zero FLOPs lhs_dilation *nominally* pays.

    Measured SLOWER than the base-dilated form on TPU v5e-lite (0.41x /
    0.25x on the HiFi-GAN x8 upsample shapes): the TPU executes base
    dilation at ~full MXU rate already, and the phase-interleave reshape
    here is a physical lane relayout. Kept as a verified reference
    formulation for parts where that trade-off may differ — DESIGN.md 3.8.
    """
    if stride == 1:
        return conv_transpose1d(x, kernel, bias, stride, padding)
    k, cin, cout = kernel.shape
    s = stride
    T = x.shape[1]
    L = (T - 1) * s - 2 * padding + k
    n = -(-k // s)  # taps per phase
    if k < n * s:
        kernel = jnp.concatenate(
            [kernel, jnp.zeros((n * s - k, cin, cout), kernel.dtype)])
    # Wb[i, :, phi*Cout + c] = Kp[phi + (n-1-i)*s, :, c]: reversed so a
    # plain padded conv computes z[m] = sum_i x[m-i] * Kp[phi + i*s].
    wb = kernel.reshape(n, s, cin, cout)[::-1]          # (n, s, Cin, Cout)
    wb = wb.transpose(0, 2, 1, 3).reshape(n, cin, s * cout)
    z = lax.conv_general_dilated(
        x, wb, window_strides=(1,), padding=[(n - 1, n - 1)],
        dimension_numbers=_DN)                          # (B, T+n-1, s*Cout)
    w = z.reshape(z.shape[0], -1, cout)                 # interleave phases
    out = lax.slice_in_dim(w, padding, padding + L, axis=1)
    if bias is not None:
        out = out + bias
    return out


def pack_kernel_1d(kernel, r, dilation=1):
    """Space-to-depth transform of a same-padded conv1d kernel.

    Narrow-channel convs (C << 128) waste the MXU: a C=32 contraction uses
    1/16 of the lanes. Packing r consecutive time steps into channels turns
    the conv over (T, C) into an *exactly equivalent* conv over (T/r, r*C)
    with a block-structured kernel — full-width contractions at the cost of
    structurally-zero FLOPs (w/k * r ratio). Net win when C*r <= ~128.

    kernel: (k, Cin, Cout), odd k, same padding, stride 1.
    Returns (packed_kernel (w, r*Cin, r*Cout), (pad_left, pad_right)) for the
    packed conv such that
      packed_conv(x.reshape(B, T/r, r*Cin)).reshape(B, T, Cout)
      == conv1d(x, kernel, padding=(k-1)//2*dilation, dilation=dilation).
    """
    k, cin, cout = kernel.shape
    c = (k - 1) // 2
    cd = c * dilation
    q0 = -((cd + r - 1) // r)          # floor(-cd / r)
    q1 = (r - 1 + cd) // r
    w = q1 - q0 + 1
    packed = jnp.zeros((w, r * cin, r * cout), kernel.dtype)
    for b in range(r):
        for j in range(k):
            off = b + (j - c) * dilation
            q, a = divmod(off, r)
            packed = packed.at[
                q - q0, a * cin : (a + 1) * cin,
                b * cout : (b + 1) * cout].set(kernel[j])
    return packed, (-q0, q1)


def packed_conv1d(xp, kernel, bias=None, dilation=1, r=4):
    """Same-padded conv1d on an already space-to-depth-packed input.

    xp: (B, T/r, r*Cin); kernel: logical (k, Cin, Cout).
    Returns (B, T/r, r*Cout) packed output.
    """
    kp, (pl, pr) = pack_kernel_1d(kernel, r, dilation)
    out = lax.conv_general_dilated(
        xp, kp, window_strides=(1,), padding=[(pl, pr)],
        dimension_numbers=_DN)
    if bias is not None:
        out = out + jnp.tile(bias, r)
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
