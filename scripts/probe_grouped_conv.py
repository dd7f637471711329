#!/usr/bin/env python
"""Micro-probe: MSD-shaped grouped 1D convs fwd+bwd, f32 vs bf16, on TPU.

Explains the bf16_poolfix regression in results/gan_step_profile.jsonl
(msd_d_fwd_bwd 49 -> 72 ms): scan-differenced per-layer timings (single
dispatches pipeline on the axon tunnel and under-read) so the pathological
layer/dtype combination is identifiable.
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


def main():
    import jax
    import jax.numpy as jnp

    B = 32  # y and y_hat together
    # (in_ch, out_ch, kernel, stride, groups, T_in) per DiscriminatorS layer
    # at scale 0 (T=8192); scales 1/2 halve T.
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
        x = jnp.asarray(np.random.RandomState(0).randn(B, t, ci),
                        jnp.float32)
        w = jnp.asarray(np.random.RandomState(1).randn(k, ci // g, co)
                        * 0.02, jnp.float32)
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHC", "HIO", "NHC"))

        def loss(x_, w_, dt):
            out = jax.lax.conv_general_dilated(
                x_.astype(dt), w_.astype(dt), (s,), [(k // 2, k // 2)],
                dimension_numbers=dn, feature_group_count=g)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        row = {"shape": f"{ci}->{co} k{k} s{s} g{g} T{t}"}
        for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            fwd = scan_diff(
                lambda c, a, b: c + loss(a + c * 0, b, dt) * 0, x, w)
            def fb_body(c, a, b):
                l, (ga, gb) = jax.value_and_grad(
                    lambda xx, ww: loss(xx, ww, dt), argnums=(0, 1))(
                        a + c * 0, b)
                return c + l * 0 + ga.ravel()[0] * 0 + gb.ravel()[0] * 0
            fb = scan_diff(fb_body, x, w)
            row[f"{name}_fwd_ms"] = round(fwd * 1e3, 3)
            row[f"{name}_fwdbwd_ms"] = round(fb * 1e3, 3)
        flops = 2 * B * (t // s) * co * (ci // g) * k
        row["gflop_fwd"] = round(flops / 1e9, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open("results/grouped_conv_probe.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
