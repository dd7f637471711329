"""Training state pytree + optimizer construction."""

from typing import Any

import jax
import optax
from flax import struct

from tts_king_tpu.config import OptimizerConfig, TrainConfig
from tts_king_tpu.train.schedule import noam_schedule


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_optimizer(opt_cfg: OptimizerConfig, d_model: int):
    """Adam + global-norm clip + Noam/anneal LR, the reference's recipe
    (fs_two/model/optimizer.py:10-15, train.py:47-54: clip runs on the
    accumulated grads before the Adam step)."""
    lr = noam_schedule(d_model, opt_cfg.warm_up_step, opt_cfg.anneal_steps,
                       opt_cfg.anneal_rate)
    steps = [
        optax.clip_by_global_norm(opt_cfg.grad_clip_thresh),
        optax.scale_by_adam(b1=opt_cfg.betas[0], b2=opt_cfg.betas[1],
                            eps=opt_cfg.eps),
    ]
    if opt_cfg.weight_decay:
        steps.append(optax.add_decayed_weights(opt_cfg.weight_decay))
    steps.append(optax.scale_by_schedule(lambda c: -lr(c)))
    return optax.chain(*steps)


def create_train_state(model, optimizer, rng, sample_batch_args,
                       start_step: int = 0) -> TrainState:
    """Initialize model variables + optimizer state."""
    import jax.numpy as jnp

    variables = model.init(rng, *sample_batch_args, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    return TrainState(step=jnp.asarray(start_step, jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state)
