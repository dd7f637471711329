"""Fused HiFi-GAN MRF stack as a Pallas TPU kernel (EXPERIMENTAL).

One multi-receptive-field stage (hifi/models.py:185-196) is, per upsample
stage, 3 ResBlock1 branches x 6 convolutions = 18 convs with leaky-ReLU and
residual adds between them. This kernel keeps a halo'd time tile in VMEM and
runs every branch's full conv chain there:

  * each conv = k shifted (L, C) @ (C, C) matmuls (Mosaic cannot lower an
    im2col lane-concat of narrow offset vectors);
  * "valid"-region chaining: every conv shrinks the tile by its receptive
    halo; tiles are DMA'd from HBM with the max branch halo so the center
    Tt frames are exact;
  * sequence-edge parity with XLA's per-conv zero padding is maintained by
    masking intermediate activations outside the true sequence range;
  * channels are lane-padded to 128 for the DMA, with zero-extended
    first-conv kernels and a constant channel selector for the residual.

Numerics match the unfused ResBlock stack exactly (tests, interpret mode +
compiled on TPU).

STATUS: correct but NOT the production path. Measured on v5e-lite, the
(C, C)-shifted matmuls at C=32 run ~5x slower than XLA's conv over the
space-to-depth packed layout (ops/convs.pack_kernel_1d): the packed form
feeds the MXU 128-wide contractions while this kernel's 32x32 products use
~6% of the array, and the XLA stack is not HBM-bound at these sizes (so
fusing away the inter-conv round trips buys nothing). Kept as the reference
point and scaffolding for a packed-layout fused kernel (round-2 plan in
DESIGN.md).
"""

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


def _branch_halo(k: int, dilations: Sequence[int]) -> int:
    c = (k - 1) // 2
    return sum(c * d + c for d in dilations)


def fused_mrf(x, branch_kernels, branch_biases, kernel_sizes=(3, 7, 11),
              dilations=(1, 3, 5), tile=512, interpret=False):
    """Mean over ResBlock1 branches, fused.

    x: (B, M, C).
    branch_kernels[i]: (2*len(dilations), k_i, C, C) — alternating
      [conv1(d=dilations[0]), conv2(d=1), conv1(d=dilations[1]), ...] in the
      feature-last (k, Cin, Cout) orientation.
    branch_biases[i]: (2*len(dilations), C).
    Returns (B, M, C) = mean_i ResBlock1_i(x).
    """
    B, M, C = x.shape
    n_branches = len(kernel_sizes)
    halos = [_branch_halo(k, dilations) for k in kernel_sizes]
    H = max(halos)
    Tt = min(tile, max(8, ((M + 7) // 8) * 8))
    Mpad = ((M + Tt - 1) // Tt) * Tt
    # Channels pad to the 128-lane tile so the halo'd DMA slices are legal;
    # the zero channels feed zero kernel rows (first conv) and are never
    # read again.
    Cp = max(C, 128) if C < 128 else C
    xp = jnp.pad(x, [(0, 0), (H, H + (Mpad - M)), (0, Cp - C)])

    dtype = x.dtype

    def kernel(x_hbm, *refs):
        # refs layout: [w0, b0, w1, b1, w2, b2, wf0, wf1, wf2, sel,
        #               o_ref, xbuf, sem]
        o_ref = refs[3 * n_branches + 1]
        xbuf = refs[3 * n_branches + 2]
        sem = refs[3 * n_branches + 3]
        b = pl.program_id(0)
        t = pl.program_id(1)

        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(t * Tt, Tt + 2 * H), :], xbuf, sem)
        cp.start()
        cp.wait()
        x_full = xbuf[...]

        def lrelu(v):
            # max/min form: avoids bf16 comparisons Mosaic may not lower.
            return jnp.maximum(v, 0) + jnp.minimum(v, 0) * jnp.asarray(
                LRELU_SLOPE, v.dtype)

        def conv(h, W, bias, d, k):
            # k shifted matmuls (Mosaic cannot concat narrow offset-layout
            # vectors on the lane axis, so no im2col here).
            c = (k - 1) // 2
            cd = c * d
            L_out = h.shape[0] - 2 * cd
            y = None
            for j in range(k):
                part = jax.lax.dot_general(
                    h[j * d : j * d + L_out, :], W[j],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                y = part if y is None else y + part
            return (y + bias).astype(dtype)

        def mask(h, gstart):
            # zero phantom positions outside [0, M): emulates XLA's per-conv
            # zero padding at the true sequence edges. Full-width iota +
            # float select (int compares on skinny vectors don't lower).
            gpos = (gstart + jax.lax.broadcasted_iota(
                jnp.int32, h.shape, 0)).astype(jnp.float32)
            ok = (gpos >= 0.0) & (gpos < float(M))
            return jnp.where(ok, h, jnp.zeros_like(h))

        acc = None
        for bi, k in enumerate(kernel_sizes):
            W_all = refs[2 * bi][...]          # (6, k, C, C)
            W_first = refs[2 * n_branches + bi][...]  # (k, Cp, C)
            b_all = refs[2 * bi + 1][...]
            Hb = halos[bi]
            c = (k - 1) // 2
            h = x_full[H - Hb : H - Hb + Tt + 2 * Hb]   # (L, Cp)
            gstart = t * Tt - Hb
            for ci, d in enumerate(dilations):
                cd = c * d
                W1 = W_first if ci == 0 else W_all[2 * ci]
                xt = conv(lrelu(h), W1, b_all[2 * ci], d, k)
                xt = mask(xt, gstart + cd)
                xt2 = conv(lrelu(xt), W_all[2 * ci + 1], b_all[2 * ci + 1],
                           1, k)
                if ci == 0:
                    # residual from the Cp-wide input: select the real C
                    # channels with a constant projector (lane slicing of
                    # narrow widths is not Mosaic-friendly).
                    sel = refs[3 * n_branches][...]  # (Cp, C)
                    res_src = h[cd + c : cd + c + xt2.shape[0]]
                    res = jax.lax.dot_general(
                        res_src, sel, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(dtype)
                else:
                    res = h[cd + c : cd + c + xt2.shape[0]]
                h = mask(xt2 + res, gstart + cd + c)
                gstart += cd + c
            acc = h if acc is None else acc + h

        o_ref[0] = (acc / n_branches).astype(o_ref.dtype)

    wb_inputs = []
    for W, bvec in zip(branch_kernels, branch_biases):
        wb_inputs += [jnp.asarray(W, dtype), jnp.asarray(bvec, jnp.float32)]
    # First-conv kernels padded to Cp input channels (zero rows for the pad
    # lanes), plus the channel-selector for the first residual.
    w_firsts = [
        jnp.pad(jnp.asarray(W[0], dtype), [(0, 0), (0, Cp - C), (0, 0)])
        for W in branch_kernels
    ]
    sel = jnp.zeros((Cp, C), dtype).at[jnp.arange(C), jnp.arange(C)].set(1)

    # x stays in HBM (untiled, so halo'd time slices are legal DMA sources;
    # channels are lane-padded to Cp); weights/biases ride in VMEM blocks.
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)] + [
        pl.BlockSpec() for _ in range(2 * n_branches + n_branches + 1)]

    out = pl.pallas_call(
        kernel,
        grid=(B, Mpad // Tt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Tt, C), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Mpad, C), dtype),
        scratch_shapes=[
            pltpu.VMEM((Tt + 2 * H, Cp), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, *wb_inputs, *w_firsts, sel)
    return out[:, :M]


def resblock_params_to_stacks(resblock_params: Sequence[dict], dtype,
                              n_dilations=3):
    """Per-branch flax param dicts ({'convs1_i': {...}, 'convs2_i': {...}})
    -> (kernels (2*n, k, Cin, Cout), biases (2*n, Cout)) arrays, alternating
    conv1/conv2 like the fused kernel expects."""
    stacks = []
    for params in resblock_params:
        ks, bs = [], []
        for i in range(n_dilations):
            for group in ("convs1", "convs2"):
                p = params[f"{group}_{i}"]
                # flax kernel (k, Cin, Cout) -> keep; transpose to
                # (k, Cin, Cout) already.
                ks.append(p["kernel"])
                bs.append(p["bias"])
        stacks.append((jnp.stack(ks).astype(dtype),
                       jnp.stack(bs).astype(jnp.float32)))
    return [s[0] for s in stacks], [s[1] for s in stacks]
