"""pjit-compiled FastSpeech2 training / eval steps.

The reference loop (train.py:24-56) does per-microbatch backward with
gradient accumulation 4, global-norm clip 1.0, then a Noam-scheduled Adam
step. Here the whole thing is ONE compiled function: a lax.scan over the
(acc, B, ...) super-batch accumulates grads, then clip+Adam apply — no
Python in the hot loop, DP+TP sharded over the mesh by the caller's
in_shardings (parallel/mesh.py). Gradients reduce over 'dp' automatically
via XLA's partitioner (the psum lives inside the compiled step).
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp

from tts_king_tpu.train.loss import FS2Losses, fastspeech2_loss


def make_loss_fn(model, use_cwt: bool):
    def loss_fn(params, batch_stats, batch: Dict[str, Any], dropout_rng):
        T = int(batch["mels"].shape[1])
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["speakers"], batch["texts"], batch["src_lens"],
            max_mel_len=T,
            mel_lens=batch["mel_lens"],
            energy_targets=batch["energies"],
            duration_targets=batch["durations"],
            pitch_raw_targets=None if use_cwt else batch["pitches_raw"],
            pitch_cwt_targets=batch["pitches_cwt"] if use_cwt else None,
            train=True,
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats"],
        )
        losses = fastspeech2_loss(batch, outputs, use_cwt)
        return losses.total, (losses, mutated["batch_stats"])

    return loss_fn


def make_train_step(model, optimizer, use_cwt: bool = False):
    """Returns train_step(state, superbatch, rng) -> (state, FS2Losses).

    superbatch arrays have a leading grad-accumulation axis: (acc, B, ...).
    """
    loss_fn = make_loss_fn(model, use_cwt)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state, superbatch, rng):
        acc = jax.tree.leaves(superbatch)[0].shape[0]
        rngs = jax.random.split(rng, acc)

        def micro(carry, inp):
            grads_acc, batch_stats = carry
            batch, r = inp
            (_, (losses, new_stats)), grads = grad_fn(
                state.params, batch_stats, batch, r)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, new_stats), losses

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        (grads, new_batch_stats), losses = jax.lax.scan(
            micro, (zero_grads, state.batch_stats), (superbatch, rngs))
        # Mean over microbatches == the reference's loss/grad_acc_step
        # scaling before each backward (train.py:43).
        grads = jax.tree.map(lambda g: g / acc, grads)

        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = jax.tree.map(jnp.add, state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_batch_stats, opt_state=new_opt_state)
        mean_losses = jax.tree.map(jnp.mean, losses)
        return new_state, mean_losses

    return train_step


def make_eval_step(model, use_cwt: bool = False):
    """Teacher-forced loss evaluation (fs_two/evaluate.py:44-54)."""
    loss_fn = make_loss_fn(model, use_cwt)

    def eval_step(state, batch):
        T = int(batch["mels"].shape[1])
        outputs = model.apply(
            state.variables(),
            batch["speakers"], batch["texts"], batch["src_lens"],
            max_mel_len=T,
            mel_lens=batch["mel_lens"],
            energy_targets=batch["energies"],
            duration_targets=batch["durations"],
            pitch_raw_targets=None if use_cwt else batch["pitches_raw"],
            pitch_cwt_targets=batch["pitches_cwt"] if use_cwt else None,
            train=False,
        )
        return fastspeech2_loss(batch, outputs, use_cwt)

    return eval_step
