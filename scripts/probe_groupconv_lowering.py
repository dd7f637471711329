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


def block_diag_kernel(w, groups):
    """(K, Cin/G, Cout) grouped kernel -> (K, Cin, Cout) dense block-diag.

    dense[k, h*cig + c, g*cog + o] = w[k, c, g*cog + o] * (h == g): a
    broadcast-multiply with eye(G), which XLA fuses — no scatter."""
    import jax.numpy as jnp

    k, cig, cout = w.shape
    cog = cout // groups
    wr = w.reshape(k, cig, groups, cog)
    eye = jnp.eye(groups, dtype=w.dtype)
    dense = jnp.einsum("kcgo,hg->khcgo", wr, eye)
    return dense.reshape(k, cig * groups, cout)


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
                wd, fg = block_diag_kernel(w_.astype(dt), g), 1
            dn = jax.lax.conv_dimension_numbers(
                xd.shape, wd.shape, ("NHC", "HIO", "NHC"))
            out = jax.lax.conv_general_dilated(
                xd, wd, (s,), [(k // 2, k // 2)], dimension_numbers=dn,
                feature_group_count=fg)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        row = {"shape": f"{ci}->{co} k{k} s{s} g{g} T{t}"}
        flops = 2 * B * (t // s) * co * (ci // g) * k
        row["gflop_fwd_useful"] = round(flops / 1e9, 1)
        for lowering in ("grouped", "blockdiag"):
            if lowering == "blockdiag" and g == 1:
                continue
            for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
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

                fwd = scan_diff(fwd_body, x0, w0)
                fb = scan_diff(fb_body, x0, w0)
                row[f"{lowering}_{name}_fwd_ms"] = round(fwd * 1e3, 3)
                row[f"{lowering}_{name}_fwdbwd_ms"] = round(fb * 1e3, 3)
                row[f"{lowering}_{name}_fwdbwd_tfs_useful"] = round(
                    3 * flops / max(fb, 1e-9) / 1e12, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open("results/groupconv_lowering.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
