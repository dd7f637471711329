#!/usr/bin/env python
"""Decompose the HiFi-GAN GAN training step cost on TPU (VERDICT r3 weak-#5).

Scan-differenced timings (the DESIGN §3.9 methodology: time K=1 vs K=5
scans of the same jitted body, slope = sustained per-iteration cost) for
each stage of the GAN step: generator fwd, generator fwd+bwd through the
mel loss, the mel-loss STFT alone, MPD/MSD discriminator-side fwd+bwd, the
generator-side pass THROUGH both discriminators, and both optimizer
updates. Every body's carry depends on one element of EVERY output leaf so
XLA cannot dead-code-eliminate backward passes or optimizer states.

Prints a JSON report and appends to results/gan_step_profile.jsonl.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def scan_diff(fn, *args, ka=1, kb=5, reps=3):
    """Sustained per-iteration seconds of fn (a (carry, *args)->carry body).

    args MUST carry all big operands (params, batches) so they stay jit
    ARGUMENTS — a closure would embed them as constants in the HLO, which
    the axon remote-compile endpoint rejects (HTTP 413) at 100M params."""
    import jax
    import jax.numpy as jnp

    def steps(k):
        @jax.jit
        def run(*a):
            def body(c, _):
                return fn(c, *a), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/gan_step_profile.jsonl")
    ap.add_argument("--tag", default="baseline")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="training compute dtype (params stay f32)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from tts_king_tpu.config import TTSConfig
    from tts_king_tpu.models.hifigan import (discriminator_loss,
                                             feature_loss, generator_loss)
    from tts_king_tpu.ops.stft import hifigan_mel
    from tts_king_tpu.train.vocoder import MEL_LOSS_WEIGHT, VocoderTrainer

    cfg = TTSConfig()
    vcfg = cfg.vocoder
    B = 16
    seg_frames = vcfg.segment_size // vcfg.hop_size
    trainer = VocoderTrainer(
        vcfg, compute_dtype=getattr(jnp, args.dtype))
    state = trainer.init_state(jax.random.PRNGKey(0), seg_frames)
    gen, mpd, msd = trainer.gen, trainer.mpd, trainer.msd

    rng = np.random.RandomState(6)
    mel = jnp.asarray(rng.randn(B, seg_frames, vcfg.num_mels), jnp.float32)
    wav = jnp.asarray(rng.randn(B, vcfg.segment_size) * 0.1, jnp.float32)
    y_hat = jnp.asarray(rng.randn(B, vcfg.segment_size) * 0.1, jnp.float32)

    fmax = vcfg.mel_fmax_loss or vcfg.mel_fmax
    mel_args = (vcfg.n_fft, vcfg.num_mels, vcfg.sampling_rate,
                vcfg.hop_size, vcfg.win_size, vcfg.mel_fmin, fmax)

    def dep(tree):
        """Scalar depending on one element of every leaf (anti-DCE)."""
        return sum(x.ravel()[0].astype(jnp.float32) * 1e-12
                   for x in jax.tree_util.tree_leaves(tree))

    report = {"tag": args.tag, "batch": B, "segment": vcfg.segment_size,
              "channels": vcfg.upsample_initial_channel}
    t = report.setdefault("ms", {})

    # full step (depend on every piece of the new state + losses)
    ts = trainer.make_train_step()
    batch = {"mel": mel, "wav": wav, "mel_loss": mel}
    def full_body(c, st, b):
        st2, losses = ts(st, {"mel": b["mel"] + c * 1e-30, "wav": b["wav"],
                              "mel_loss": b["mel_loss"]})
        return c + dep(st2) + dep(tuple(losses))
    t["full_step"] = scan_diff(full_body, state, batch) * 1e3

    # generator forward
    t["gen_fwd"] = scan_diff(
        lambda c, p, m: c + jnp.sum(gen.apply({"params": p},
                                              m + c * 1e-30)) * 1e-12,
        state.gen_params, mel) * 1e3

    # generator fwd+bwd through the mel loss only
    def gen_mel_loss(p, m, c):
        y = gen.apply({"params": p}, m + c * 1e-30)
        out = hifigan_mel(y, *mel_args)
        return jnp.mean(jnp.abs(out - m)) * MEL_LOSS_WEIGHT
    def gen_fb(c, p, m):
        l, g = jax.value_and_grad(gen_mel_loss)(p, m, c)
        return c + l * 1e-12 + dep(g)
    t["gen_fwd_bwd_melloss"] = scan_diff(gen_fb, state.gen_params,
                                         mel) * 1e3

    # mel-loss STFT alone (fwd + bwd wrt wav)
    def mel_only(w, m):
        return jnp.mean(jnp.abs(hifigan_mel(w, *mel_args) - m))
    def mel_fb(c, yh, m):
        l, g = jax.value_and_grad(mel_only)(yh + c * 1e-30, m)
        return c + l * 1e-12 + g.ravel()[0] * 1e-12
    t["melloss_fwd_bwd"] = scan_diff(mel_fb, y_hat, mel) * 1e3

    # discriminator D-side fwd+bwd (loss wrt disc params)
    def mpd_d(p, w, yh, c):
        r, g, _, _ = mpd.apply({"params": p}, w, yh + c * 1e-30)
        return discriminator_loss(r, g)[0]
    def mpd_fb(c, p, w, yh):
        l, g = jax.value_and_grad(mpd_d)(p, w, yh, c)
        return c + l * 1e-12 + dep(g)
    t["mpd_d_fwd_bwd"] = scan_diff(mpd_fb, state.mpd_params, wav,
                                   y_hat) * 1e3

    def msd_d(p, sp0, w, yh, c):
        (r, g, _, _), sp = msd.apply(
            {"params": p, "spectral": sp0}, w,
            yh + c * 1e-30, update_sn=True, mutable=["spectral"])
        return discriminator_loss(r, g)[0] + dep(sp)
    def msd_fb(c, p, sp0, w, yh):
        l, g = jax.value_and_grad(msd_d)(p, sp0, w, yh, c)
        return c + l * 1e-12 + dep(g)
    t["msd_d_fwd_bwd"] = scan_diff(msd_fb, state.msd_params,
                                   state.msd_spectral, wav, y_hat) * 1e3

    # G-side: adversarial + feature-matching THROUGH the discs wrt the
    # generated wav (the expensive tail of the generator update)
    def g_side(yh, pp, ps, sp0, w):
        _, gp, frp, fgp = mpd.apply({"params": pp}, w, yh)
        (_, gs, frs, fgs), sp = msd.apply(
            {"params": ps, "spectral": sp0},
            w, yh, update_sn=True, mutable=["spectral"])
        return (generator_loss(gp)[0] + generator_loss(gs)[0] +
                feature_loss(frp, fgp) + feature_loss(frs, fgs) + dep(sp))
    def g_side_fb(c, pp, ps, sp0, w, yh):
        l, g = jax.value_and_grad(g_side)(yh + c * 1e-30, pp, ps, sp0, w)
        return c + l * 1e-12 + g.ravel()[0] * 1e-12
    t["disc_g_side_fwd_bwd"] = scan_diff(
        g_side_fb, state.mpd_params, state.msd_params, state.msd_spectral,
        wav, y_hat) * 1e3

    # G-side, SPLIT variant: two calls per discriminator — d(y) is
    # forward-only (real side needs no grad on the generator update), so
    # the input-gradient conv runs on batch B instead of the pair-batched
    # 2B. Candidate replacement for the pair-batched gen-side pass.
    import dataclasses as _dc

    mpd_s = _dc.replace(mpd, pair_batched=False)
    msd_s = _dc.replace(msd, pair_batched=False)

    def g_side_split(yh, pp, ps, sp0, w):
        _, gp, frp, fgp = mpd_s.apply({"params": pp}, w, yh)
        (_, gs, frs, fgs), sp = msd_s.apply(
            {"params": ps, "spectral": sp0},
            w, yh, update_sn=True, mutable=["spectral"])
        return (generator_loss(gp)[0] + generator_loss(gs)[0] +
                feature_loss(frp, fgp) + feature_loss(frs, fgs) + dep(sp))
    def g_side_split_fb(c, pp, ps, sp0, w, yh):
        l, g = jax.value_and_grad(g_side_split)(yh + c * 1e-30, pp, ps,
                                                sp0, w)
        return c + l * 1e-12 + g.ravel()[0] * 1e-12
    t["disc_g_side_split_fwd_bwd"] = scan_diff(
        g_side_split_fb, state.mpd_params, state.msd_params,
        state.msd_spectral, wav, y_hat) * 1e3

    # optimizer updates alone
    ones_g = jax.tree.map(lambda x: jnp.full_like(x, 1e-6),
                          state.gen_params)
    def gen_opt(c, gr, o0, p0):
        u, o = trainer.gen_tx.update(jax.tree.map(lambda x: x + c * 1e-30, gr),
                                     o0, p0)
        p = optax.apply_updates(p0, u)
        return c + dep(p) + dep(o)
    t["gen_opt_update"] = scan_diff(gen_opt, ones_g, state.gen_opt,
                                    state.gen_params) * 1e3

    dparams = {"mpd": state.mpd_params, "msd": state.msd_params}
    ones_d = jax.tree.map(lambda x: jnp.full_like(x, 1e-6), dparams)
    def disc_opt(c, gr, o0, p0):
        u, o = trainer.disc_tx.update(jax.tree.map(lambda x: x + c * 1e-30, gr),
                                      o0, p0)
        p = optax.apply_updates(p0, u)
        return c + dep(p) + dep(o)
    t["disc_opt_update"] = scan_diff(disc_opt, ones_d, state.disc_opt,
                                     dparams) * 1e3

    n_gen = sum(x.size for x in jax.tree_util.tree_leaves(state.gen_params))
    n_disc = sum(x.size for x in jax.tree_util.tree_leaves(dparams))
    report["params_gen_M"] = round(n_gen / 1e6, 2)
    report["params_disc_M"] = round(n_disc / 1e6, 2)
    for k, v in t.items():
        t[k] = round(v, 2)
    accounted = (t["gen_fwd_bwd_melloss"] + t["mpd_d_fwd_bwd"]
                 + t["msd_d_fwd_bwd"] + t["disc_g_side_fwd_bwd"]
                 + t["gen_fwd"] + t["gen_opt_update"] + t["disc_opt_update"])
    report["accounted_ms"] = round(accounted, 2)

    print(json.dumps(report, indent=1))
    with open(args.out, "a") as f:
        f.write(json.dumps(report) + "\n")


if __name__ == "__main__":
    main()
