#!/usr/bin/env python
"""Grouped-conv lowering shootout for the MSD discriminator stack (TPU).

The GAN train step is discriminator-bound and the MSD's k=41 grouped convs
run far below the chip's dense-conv rate (results/gan_step_profile.jsonl:
MFU 0.117 overall). Hypothesis: XLA's grouped-conv lowering pads each
group's tiny per-group contraction (Cin/G = 16..64) and output block
(Cout/G = 16..64) up to the 128-lane MXU tile, wasting up to
(128/(Cin/G))x(128/(Cout/G)) of the array, while an equivalent
BLOCK-DIAGONAL DENSE kernel (off-block zeros) costs only Gx more
*nominal* FLOPs but runs at full MXU efficiency — a net win whenever the
padding waste exceeds G. The dense form is mathematically identical
(adding structural zeros is exact in f32 and bf16).

Measures, per MSD layer shape at the production pair-batched size (B=32,
scale-0 T), fwd and fwd+bwd(x, w), f32 and bf16:
  grouped    — native feature_group_count=G conv
  blockdiag  — dense conv with the kernel scattered into block-diag form
Scan-differenced (ka vs kb iterations of the same jitted body; slope =
sustained cost) with the carry arithmetic REALLY depending on every
output (the older probe_grouped_conv.py multiplied by zero, which XLA
dead-code-eliminated — its near-zero/negative rows are artifacts).

Writes results/groupconv_lowering.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def scan_diff(body, *args, ka=2, kb=10, reps=4):
    import jax
    import jax.numpy as jnp

    def steps(k):
        @jax.jit
        def run(*a):
            def b(c, _):
                return body(c, *a), None
            c, _ = jax.lax.scan(b, jnp.float32(0), None, length=k)
            return c
        return run

    fa, fb = steps(ka), steps(kb)
    float(fa(*args)); float(fb(*args))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter(); float(fa(*args)); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); float(fb(*args)); tb = time.perf_counter() - t0
        per = (tb - ta) / (kb - ka)
        best = per if best is None else min(best, per)
    return best


def block_diag_kernel(w, groups, target_groups=1):
    """(K, Cin/G, Cout) grouped kernel -> block-diag kernel for a conv with
    target_groups groups (target_groups divides groups; 1 = fully dense).

    Each target group packs groups/target_groups original groups as a
    block-diagonal (K, Cin/target, Cout/target) tile: nominal FLOPs grow by
    groups/target_groups instead of the full G of dense lowering, while the
    per-group contraction width grows by the same factor."""
    import jax.numpy as jnp

    k, cig, cout = w.shape
    pack = groups // target_groups          # original groups per new group
    cog = cout // groups
    # (k, cig, target, pack, cog): split out channels by new-group then pack
    wr = w.reshape(k, cig, target_groups, pack, cog)
    eye = jnp.eye(pack, dtype=w.dtype)
    # input rows inside a new group: (pack, cig); block-diag over pack
    dense = jnp.einsum("kctpo,qp->ktqcpo", wr, eye)
    # -> (k, target, pack*cig, pack*cog) -> (k, pack*cig, target*pack*cog)
    dense = dense.reshape(k, target_groups, pack * cig, pack * cog)
    return dense.transpose(0, 2, 1, 3).reshape(k, pack * cig, cout)


def main():
    import jax
    import jax.numpy as jnp

    B = 32  # y ++ y_hat pair-batched
    # (in_ch, out_ch, kernel, stride, groups, T_in): DiscriminatorS scale 0
    layers = [
        (1, 128, 15, 1, 1, 8192),
        (128, 128, 41, 2, 4, 8192),
        (128, 256, 41, 2, 16, 4096),
        (256, 512, 41, 4, 16, 2048),
        (512, 1024, 41, 4, 16, 512),
        (1024, 1024, 41, 1, 16, 128),
        (1024, 1024, 5, 1, 1, 128),
    ]
    rows = []
    for ci, co, k, s, g, t in layers:
        x0 = jnp.asarray(np.random.RandomState(0).randn(B, t, ci),
                         jnp.float32)
        w0 = jnp.asarray(np.random.RandomState(1).randn(k, ci // g, co)
                         * 0.02, jnp.float32)

        def conv(x_, w_, dt, lowering):
            xd = x_.astype(dt)
            if lowering == "grouped":
                wd, fg = w_.astype(dt), g
            else:
                fg = int(lowering.split("_g")[1])  # blockdiag_g<T>
                wd = block_diag_kernel(w_.astype(dt), g, fg)
            dn = jax.lax.conv_dimension_numbers(
                xd.shape, wd.shape, ("NHC", "HIO", "NHC"))
            out = jax.lax.conv_general_dilated(
                xd, wd, (s,), [(k // 2, k // 2)], dimension_numbers=dn,
                feature_group_count=fg)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        row = {"shape": f"{ci}->{co} k{k} s{s} g{g} T{t}"}
        flops = 2 * B * (t // s) * co * (ci // g) * k
        row["gflop_fwd_useful"] = round(flops / 1e9, 1)
        # partial densification: pack G original groups into tg conv
        # groups (tg < G) — nominal FLOPs x(G/tg), contraction x(G/tg).
        lowerings = ["grouped"] + [f"blockdiag_g{tg}"
                                   for tg in (1, 2, 4) if tg < g]
        for lowering in lowerings:
            dtypes = [("f32", jnp.float32), ("bf16", jnp.bfloat16)]
            if os.environ.get("PROBE_DTYPES") == "bf16":
                dtypes = dtypes[1:]
            for name, dt in dtypes:
                # carry feeds back at 1e-30 scale: keeps the conv
                # loop-carried (no hoisting) without perturbing values,
                # and the loss accumulates at 1e-12 so nothing is DCE'd.
                def fwd_body(c, a, b):
                    return c + conv(a + c * 1e-30, b, dt, lowering) * 1e-12

                def fb_body(c, a, b):
                    l, (ga, gb) = jax.value_and_grad(
                        lambda xx, ww: conv(xx, ww, dt, lowering),
                        argnums=(0, 1))(a + c * 1e-30, b)
                    return (c + l * 1e-12 + ga.ravel()[0] * 1e-12
                            + gb.ravel()[0] * 1e-12)

                # split backward: dgrad (wrt x: what the generator-side
                # pass needs) vs wgrad (wrt w: what the disc-side needs)
                def dgrad_body(c, a, b):
                    l, ga = jax.value_and_grad(
                        lambda xx: conv(xx, b, dt, lowering))(a + c * 1e-30)
                    return c + l * 1e-12 + ga.ravel()[0] * 1e-12

                def wgrad_body(c, a, b):
                    l, gb = jax.value_and_grad(
                        lambda ww: conv(a + c * 1e-30, ww, dt, lowering))(b)
                    return c + l * 1e-12 + gb.ravel()[0] * 1e-12

                fwd = scan_diff(fwd_body, x0, w0)
                fb = scan_diff(fb_body, x0, w0)
                fdg = scan_diff(dgrad_body, x0, w0)
                fwg = scan_diff(wgrad_body, x0, w0)
                row[f"{lowering}_{name}_fwd_ms"] = round(fwd * 1e3, 3)
                row[f"{lowering}_{name}_fwdbwd_ms"] = round(fb * 1e3, 3)
                row[f"{lowering}_{name}_fwd_dgrad_ms"] = round(fdg * 1e3, 3)
                row[f"{lowering}_{name}_fwd_wgrad_ms"] = round(fwg * 1e3, 3)
                row[f"{lowering}_{name}_fwdbwd_tfs_useful"] = round(
                    3 * flops / max(fb, 1e-9) / 1e12, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open("results/groupconv_lowering.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
