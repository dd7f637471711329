#!/usr/bin/env python
"""Per-stage roofline profile of the synthesis and training paths.

The remote-TPU relay denies device-side traces, so this is the TPU-native
profiling story (utils/profiling.roofline): for each pipeline stage it
reports FLOPs, HBM traffic, arithmetic intensity, the compute/bandwidth
roofline floors for this chip, which one binds, and the measured time as a
fraction of that floor. One JSON line per stage.

NOTE on measured_ms: per-call wall time through the relay includes a fixed
~30 ms dispatch round trip, so roofline_fraction here understates steady
-state efficiency — cross-check against bench.py's scan-differenced
SUSTAINED numbers (e.g. the train microbatch HBM floor printed here x4
accumulation reproduces the 72 ms sustained optimizer step of DESIGN.md
§3.1 almost exactly).

Usage: python scripts/profile.py            # on the TPU
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from tts_king_tpu.utils.profiling import roofline, timed

    cfg, fs2, fs2_vars, voc, voc_vars = bench._build_models()
    rng = np.random.RandomState(0)

    stages = {}

    # FS2 forward, serving batch
    B, L, T = 8, 96, 640
    texts = jnp.asarray(rng.randint(1, 206, (B, L)), jnp.int32)
    spk = jnp.zeros((B,), jnp.int32)
    lens = jnp.full((B,), L, jnp.int32)

    def fs2_fwd(v, s, t, ln):
        return fs2.apply(v, s, t, ln, max_mel_len=T, train=False)[
            "postnet_mel"]

    stages["fs2_forward_b8"] = (fs2_fwd, (fs2_vars, spk, texts, lens))

    # Vocoder, serving batch
    mel = jnp.asarray(rng.randn(B, T, 80), jnp.bfloat16)

    def voc_fwd(v, m):
        return voc.apply(v, m)

    stages["hifigan_b8_t640"] = (voc_fwd, (voc_vars, mel))

    # Training microbatch fwd+bwd (single microbatch of the bs16x4 step)
    from tts_king_tpu.models.fs2 import FastSpeech2
    from tts_king_tpu.train.step import make_loss_fn

    model = FastSpeech2(model_config=cfg.model, n_speakers=66,
                        pitch_min=-7.0, pitch_max=9.5, energy_min=-1.4,
                        energy_max=6.1)
    Bt, Lt, Tt = 16, 96, 640
    d = rng.randint(4, 9, (Bt, Lt))
    batch = dict(
        speakers=jnp.asarray(rng.randint(0, 66, (Bt,)), jnp.int32),
        texts=jnp.asarray(rng.randint(1, 206, (Bt, Lt)), jnp.int32),
        src_lens=jnp.full((Bt,), Lt, jnp.int32),
        mels=jnp.asarray(rng.randn(Bt, Tt, 80), jnp.float32),
        mel_lens=jnp.asarray(np.minimum(d.sum(-1), Tt), jnp.int32),
        energies=jnp.asarray(rng.randn(Bt, Lt), jnp.float32),
        durations=jnp.asarray(d, jnp.int32),
        pitches_raw=jnp.asarray(rng.randn(Bt, Lt), jnp.float32),
        pitches_cwt=jnp.asarray(rng.randn(Bt, Lt, 11), jnp.float32),
        pitches_mean=jnp.asarray(rng.randn(Bt), jnp.float32),
        pitches_std=jnp.asarray(rng.rand(Bt), jnp.float32),
    )
    params = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, fs2_vars["params"])
    variables = {"params": params,
                 "batch_stats": fs2_vars.get("batch_stats", {})}

    loss_fn = make_loss_fn(model, use_cwt=False)

    def micro_fwd_bwd(variables, batch, key):
        grads, _ = jax.grad(loss_fn, has_aux=True)(
            variables["params"], variables["batch_stats"], batch, key)
        return grads

    stages["train_microbatch_fwd_bwd_b16"] = (
        micro_fwd_bwd, (variables, batch, jax.random.PRNGKey(0)))

    for name, (fn, args) in stages.items():
        jfn = jax.jit(fn)
        sec = timed(jfn, *args, iters=3, warmup=1)
        rep = {"stage": name}
        rep.update(roofline(fn, *args, measured_s=sec))
        print(json.dumps(rep))


if __name__ == "__main__":
    main()
