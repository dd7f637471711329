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


def train_state_specs(shape_tree: TrainState, optimizer, param_specs):
    """PartitionSpec tree matching a TrainState: params (and the optimizer's
    param-shaped Adam slots) follow param_specs; everything else replicated."""
    from jax.sharding import PartitionSpec as P

    opt_specs = optax.tree_map_params(
        optimizer, lambda _, spec: spec, shape_tree.opt_state, param_specs,
        transform_non_params=lambda _: P())
    return shape_tree.replace(
        step=P(), params=param_specs,
        batch_stats=jax.tree.map(lambda _: P(), shape_tree.batch_stats),
        opt_state=opt_specs)


def create_sharded_train_state(model, optimizer, rng, sample_batch_args,
                               mesh, param_specs=None, start_step: int = 0):
    """Initialize a TrainState directly ON a (possibly multi-host) mesh.

    The state is created inside jit with global out_shardings — the
    multi-host-safe alternative to device_put-ing host arrays, which would
    require every shard to be process-addressable. Returns (state, specs).
    """
    from jax.sharding import NamedSharding

    from tts_king_tpu.parallel.mesh import fs2_param_specs, make_shardings

    def init():
        return create_train_state(model, optimizer, rng, sample_batch_args,
                                  start_step)

    shape = jax.eval_shape(init)
    if param_specs is None:
        param_specs = fs2_param_specs(shape.params)
    specs = train_state_specs(shape, optimizer, param_specs)
    out_sh = make_shardings(mesh, specs)
    from tts_king_tpu.parallel.lockstep import maybe_lockstep

    # The init program is the FIRST parallel program of a distributed
    # run — its Gloo cliques must not init while a peer still compiles
    # (parallel/lockstep.py). Identity outside multi-process CPU.
    return maybe_lockstep(jax.jit(init, out_shardings=out_sh), "init")(), specs
