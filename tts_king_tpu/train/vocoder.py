"""HiFi-GAN adversarial training (the capability the reference stubs out:
hifiapi.py:32-33 `train()` raises NotImplemented; only models + losses ship).

Standard HiFi-GAN V1 recipe over this framework's modules:
  * generator with weight-norm parametrization (matching torch's training
    geometry), MPD + MSD discriminators;
  * LSGAN losses (hifi/models.py:377-407), feature matching (x2), mel L1
    weighted 45;
  * AdamW(b1=0.8, b2=0.99) with exponential LR decay (config.yaml:20-23);
  * one jit-compiled step updating discriminators then generator.
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tts_king_tpu.config import VocoderModelConfig
from tts_king_tpu.models.hifigan import (
    Generator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)
from tts_king_tpu.ops.stft import hifigan_mel

MEL_LOSS_WEIGHT = 45.0


class VocoderTrainState(struct.PyTreeNode):
    step: jax.Array
    gen_params: Any
    mpd_params: Any
    msd_params: Any
    # spectral-norm power-iteration buffers (u, v per conv of MSD scale 1);
    # updated in-forward like torch buffers, not by the optimizer.
    msd_spectral: Any
    gen_opt: Any
    disc_opt: Any


class VocoderLosses(NamedTuple):
    disc: jnp.ndarray
    gen: jnp.ndarray
    mel_l1: jnp.ndarray
    fm: jnp.ndarray
    adv: jnp.ndarray


class VocoderTrainer:
    def __init__(self, cfg: VocoderModelConfig, disc_p_channels=None,
                 msd_width: int = 1, steps_per_epoch: int = 1000,
                 compute_dtype=None, pair_batched: bool = True):
        """compute_dtype: activations/conv dtype for generator AND
        discriminators during training (params, losses, the mel-loss STFT
        and the spectral-norm power iteration stay f32). bf16 doubles MXU
        throughput; a bf16 step tracks the f32 step within tolerance
        (tests/test_vocoder_training.py::test_gan_step_bf16_compute_matches_f32)
        and full training dynamics are validated by
        scripts/validate_vocoder_training.py --dtype bf16.

        pair_batched: run each discriminator once on concat([y, y_hat])
        instead of two sequential calls — bit-exact except one (vs two)
        spectral-norm power iterations per step on MSD scale 1 (see
        MultiScaleDiscriminator). ~45% faster MSD D-side on TPU
        (results/msd_probe.jsonl)."""
        import jax.numpy as _jnp

        self.compute_dtype = compute_dtype or _jnp.float32
        self.cfg = cfg
        self.gen = Generator(cfg, weight_norm=True, dtype=self.compute_dtype)
        self.mpd = MultiPeriodDiscriminator(
            channels=(tuple(disc_p_channels) if disc_p_channels
                      else MultiPeriodDiscriminator.channels),
            dtype=self.compute_dtype, pair_batched=pair_batched)
        self.msd = MultiScaleDiscriminator(width=msd_width,
                                           dtype=self.compute_dtype,
                                           pair_batched=pair_batched)
        # lr_decay applies per epoch (torch ExponentialLR semantics).
        lr = optax.exponential_decay(
            cfg.learning_rate, transition_steps=steps_per_epoch,
            decay_rate=cfg.lr_decay, staircase=True)
        # weight_decay 0.01: torch.optim.AdamW's default, which the
        # upstream hifi-gan train.py implicitly relies on (it passes only
        # lr/betas) — optax.adamw matches torch's decoupled semantics
        self.gen_tx = optax.adamw(lr, b1=cfg.adam_b1, b2=cfg.adam_b2,
                                  weight_decay=0.01)
        self.disc_tx = optax.adamw(lr, b1=cfg.adam_b1, b2=cfg.adam_b2,
                                   weight_decay=0.01)

    def init_state(self, rng, segment_frames: int) -> VocoderTrainState:
        cfg = self.cfg
        r1, r2, r3 = jax.random.split(rng, 3)
        mel = jnp.zeros((1, segment_frames, cfg.num_mels))
        wav = jnp.zeros((1, segment_frames * cfg.hop_size))
        gen_params = self.gen.init(r1, mel)["params"]
        mpd_params = self.mpd.init(r2, wav, wav)["params"]
        msd_vars = self.msd.init(r3, wav, wav)
        msd_params = msd_vars["params"]
        disc_params = {"mpd": mpd_params, "msd": msd_params}
        return VocoderTrainState(
            step=jnp.asarray(0, jnp.int32),
            gen_params=gen_params, mpd_params=mpd_params,
            msd_params=msd_params, msd_spectral=msd_vars["spectral"],
            gen_opt=self.gen_tx.init(gen_params),
            disc_opt=self.disc_tx.init(disc_params))

    def make_train_step(self):
        import dataclasses

        cfg = self.cfg
        gen, mpd, msd = self.gen, self.mpd, self.msd
        gen_tx, disc_tx = self.gen_tx, self.disc_tx
        # Generator side runs the discriminators as TWO calls even when the
        # disc side is pair-batched: the real branch d(y) needs no input
        # gradient (only fmaps for the feature loss), so splitting halves
        # the backward's dgrad batch — measured 20.7 -> 14.5 ms on TPU
        # (results/gan_step_profile.jsonl disc_g_side_split). Also matches
        # torch's spectral-norm buffer semantics exactly on the gen pass
        # (one power iteration per forward call: d(y) then d(y_hat)).
        mpd_g = dataclasses.replace(mpd, pair_batched=False)
        msd_g = dataclasses.replace(msd, pair_batched=False)

        def train_step(state: VocoderTrainState, batch):
            mel, wav, mel_loss_target = (batch["mel"], batch["wav"],
                                         batch["mel_loss"])

            y_hat = gen.apply({"params": state.gen_params}, mel)
            y_hat_sg = jax.lax.stop_gradient(y_hat)

            # --- discriminator update ---
            def disc_loss_fn(dparams):
                r_p, g_p, _, _ = mpd.apply({"params": dparams["mpd"]}, wav,
                                           y_hat_sg)
                loss_p, _, _ = discriminator_loss(r_p, g_p)
                # spectral-norm power iteration runs in-forward (torch
                # buffer semantics); the updated u,v thread to the gen pass
                (r_s, g_s, _, _), sp = msd.apply(
                    {"params": dparams["msd"],
                     "spectral": state.msd_spectral}, wav, y_hat_sg,
                    update_sn=True, mutable=["spectral"])
                loss_s, _, _ = discriminator_loss(r_s, g_s)
                return loss_p + loss_s, sp["spectral"]

            disc_params = {"mpd": state.mpd_params, "msd": state.msd_params}
            (d_loss, spectral), d_grads = jax.value_and_grad(
                disc_loss_fn, has_aux=True)(disc_params)
            d_updates, disc_opt = disc_tx.update(d_grads, state.disc_opt,
                                                 disc_params)
            disc_params = optax.apply_updates(disc_params, d_updates)

            # --- generator update ---
            def gen_loss_fn(gparams):
                y_g = gen.apply({"params": gparams}, mel)
                mel_g = hifigan_mel(y_g, cfg.n_fft, cfg.num_mels,
                                    cfg.sampling_rate, cfg.hop_size,
                                    cfg.win_size, cfg.mel_fmin,
                                    cfg.mel_fmax_loss or cfg.mel_fmax)
                l_mel = jnp.mean(jnp.abs(mel_g - mel_loss_target)) * MEL_LOSS_WEIGHT
                _, g_p, f_rp, f_gp = mpd_g.apply(
                    {"params": disc_params["mpd"]}, wav, y_g)
                (_, g_s, f_rs, f_gs), sp = msd_g.apply(
                    {"params": disc_params["msd"], "spectral": spectral},
                    wav, y_g, update_sn=True, mutable=["spectral"])
                l_fm = feature_loss(f_rp, f_gp) + feature_loss(f_rs, f_gs)
                adv_p, _ = generator_loss(g_p)
                adv_s, _ = generator_loss(g_s)
                total = adv_p + adv_s + l_fm + l_mel
                return total, (l_mel, l_fm, adv_p + adv_s, sp["spectral"])

            (g_loss, (l_mel, l_fm, l_adv, spectral2)), g_grads = \
                jax.value_and_grad(gen_loss_fn, has_aux=True)(
                    state.gen_params)
            g_updates, gen_opt = gen_tx.update(g_grads, state.gen_opt,
                                               state.gen_params)
            gen_params = optax.apply_updates(state.gen_params, g_updates)

            new_state = state.replace(
                step=state.step + 1, gen_params=gen_params,
                mpd_params=disc_params["mpd"], msd_params=disc_params["msd"],
                msd_spectral=spectral2, gen_opt=gen_opt, disc_opt=disc_opt)
            return new_state, VocoderLosses(d_loss, g_loss, l_mel, l_fm, l_adv)

        return train_step

    def make_eval_step(self):
        """Validation mel-L1 (upstream hifi-gan's val metric): generator
        forward on a (mel, wav, mel_loss) segment batch, L1 against the
        fmax_loss mel. Same batch shapes as training — no extra compiles."""
        cfg = self.cfg
        gen = self.gen

        def eval_step(state: VocoderTrainState, batch):
            y = gen.apply({"params": state.gen_params}, batch["mel"])
            mel_g = hifigan_mel(y, cfg.n_fft, cfg.num_mels,
                                cfg.sampling_rate, cfg.hop_size,
                                cfg.win_size, cfg.mel_fmin,
                                cfg.mel_fmax_loss or cfg.mel_fmax)
            return jnp.mean(jnp.abs(mel_g - batch["mel_loss"]))

        return eval_step

    def export_inference_params(self, gen_params):
        """Fold weight-norm (g, v) pairs into plain kernels for the inference
        Generator (the remove_weight_norm step, hifi/models.py:203-210)."""
        def fold(tree):
            if isinstance(tree, dict):
                if "v" in tree and "g" in tree:
                    v, g = tree["v"], tree["g"]
                    if v.ndim == 3 and g.shape[0] == v.shape[2]:  # conv
                        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1),
                                                keepdims=True) + 1e-12)
                        kernel = g[None, None, :] * v / norm
                    else:  # conv transpose: g per input channel
                        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 2),
                                                keepdims=True) + 1e-12)
                        kernel = g[None, :, None] * v / norm
                    out = {"kernel": kernel}
                    if "bias" in tree:
                        out["bias"] = tree["bias"]
                    return out
                return {k: fold(v) for k, v in tree.items()}
            return tree

        return fold(jax.device_get(gen_params))
