"""Noam learning-rate schedule with step anneals.

Parity with the reference ScheduledOptim (fs_two/model/optimizer.py:35-53):
lr(step) = d_model^-0.5 * min(step^-0.5, step * warmup^-1.5)
           * anneal_rate^|{s in anneal_steps : step > s}|
with `step` counted from 1 (the reference increments before use).
"""

import jax.numpy as jnp


def noam_schedule(d_model: int, warm_up_step: int, anneal_steps,
                  anneal_rate: float):
    init_lr = float(d_model) ** -0.5
    anneal = jnp.asarray(sorted(anneal_steps), jnp.float32)
    rate = float(anneal_rate)
    warm = float(warm_up_step)

    def lr(count):
        # optax passes 0-based update counts; the reference's step is 1-based.
        step = jnp.asarray(count, jnp.float32) + 1.0
        scale = jnp.minimum(step ** -0.5, step * warm ** -1.5)
        n_anneals = jnp.sum(step > anneal)
        return init_lr * scale * rate ** n_anneals

    return lr
