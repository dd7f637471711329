#!/usr/bin/env python
"""Probe 2: where do the 49 ms of msd_d_fwd_bwd live?

Times each MultiScaleDiscriminator component on TPU (scan-differenced):
per-scale DiscriminatorS fwd+bwd wrt params, with y/y_hat as two calls
(trainer semantics) vs one batched 2B call, f32 vs bf16, plus the SN power
iteration and the pooling pyramid in isolation.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def scan_diff(body, *args, ka=2, kb=12, reps=4):
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

    from tts_king_tpu.models.hifigan import (DiscriminatorS, _avg_pool1d,
                                             discriminator_loss)

    B, T = 16, 8192
    rng = np.random.RandomState(0)
    rows = []

    def dep(tree):
        return sum(x.ravel()[0].astype(jnp.float32) * 0
                   for x in jax.tree_util.tree_leaves(tree))

    for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        for scale, t_in in ((0, T), (1, T // 2), (2, T // 4)):
            use_sn = scale == 0
            d = DiscriminatorS(use_spectral_norm=use_sn, dtype=dt)
            y = jnp.asarray(rng.randn(B, t_in) * 0.1, jnp.float32)
            yh = jnp.asarray(rng.randn(B, t_in) * 0.1, jnp.float32)
            v0 = d.init(jax.random.PRNGKey(0), y[:1])
            params, spec = v0["params"], v0.get("spectral", {})

            # trainer semantics: two calls, SN updated sequentially
            def two_call_loss(p, sp, a, b):
                if use_sn:
                    (r, fr), sp1 = d.apply({"params": p, "spectral": sp},
                                           a, update_sn=True,
                                           mutable=["spectral"])
                    (g, fg), sp2 = d.apply(
                        {"params": p, "spectral": sp1["spectral"]},
                        b, update_sn=True, mutable=["spectral"])
                    extra = dep(sp2)
                else:
                    r, fr = d.apply({"params": p}, a)
                    g, fg = d.apply({"params": p}, b)
                    extra = 0.0
                return discriminator_loss([r], [g])[0] + extra

            def fb2(c, p, sp, a, b):
                l, g = jax.value_and_grad(two_call_loss)(p, sp,
                                                         a + c * 0, b)
                return c + l * 0 + dep(g)
            ms2 = scan_diff(fb2, params, spec, y, yh) * 1e3

            # batched: one 2B call (SN: single power-iteration update)
            def bat_loss(p, sp, a, b):
                ab = jnp.concatenate([a, b], 0)
                if use_sn:
                    (o, f), sp1 = d.apply({"params": p, "spectral": sp},
                                          ab, update_sn=True,
                                          mutable=["spectral"])
                    extra = dep(sp1)
                else:
                    o, f = d.apply({"params": p}, ab)
                    extra = 0.0
                r, g = o[:B], o[B:]
                return discriminator_loss([r], [g])[0] + extra

            def fbb(c, p, sp, a, b):
                l, g = jax.value_and_grad(bat_loss)(p, sp, a + c * 0, b)
                return c + l * 0 + dep(g)
            msb = scan_diff(fbb, params, spec, y, yh) * 1e3

            row = {"dtype": dt_name, "scale": scale, "T": t_in,
                   "grouped_lowering": d.grouped_lowering,
                   "two_call_fwdbwd_ms": round(ms2, 2),
                   "batched_fwdbwd_ms": round(msb, 2)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    # pooling pyramid alone (fwd+bwd)
    y = jnp.asarray(rng.randn(B, T) * 0.1, jnp.float32)
    def pool_loss(a):
        p1 = _avg_pool1d(a, 4, 2, 2)
        p2 = _avg_pool1d(p1, 4, 2, 2)
        return jnp.sum(p1 ** 2) + jnp.sum(p2 ** 2)
    def poolfb(c, a):
        l, g = jax.value_and_grad(pool_loss)(a + c * 0)
        return c + l * 0 + g.ravel()[0] * 0
    row = {"component": "pool_pyramid_fwdbwd_ms",
           "ms": round(scan_diff(poolfb, y) * 1e3, 3)}
    rows.append(row)
    print(json.dumps(row), flush=True)

    with open("results/msd_probe.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
