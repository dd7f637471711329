"""Device mesh + sharding rules (dp x tp).

The reference has no working multi-device path (nn.DataParallel commented
out, train.py:104; no torch.distributed anywhere — SURVEY.md §2.y). Here
scaling is first-class: a 2-D (data, tensor) mesh over ICI, pjit-partitioned
via parameter PartitionSpecs, with XLA inserting the psum/all-gather
collectives.

Tensor-parallel layout for the FFT blocks (Megatron-style column->row):
  * attention q/k/v projections column-sharded over heads ('tp' on the
    output dim), output projection row-sharded ('tp' on the input dim);
  * conv-FFN w_1 column-sharded on its 1024 filters, w_2 row-sharded;
  * everything else (LayerNorms, embeddings, predictors) replicated.
Activations follow from the parameter shardings; batch is sharded on 'dp'.
"""

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"


def build_mesh(dp: int = -1, tp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh. dp=-1 uses all remaining devices.

    dp*tp may be smaller than the device count (an explicit sub-mesh is
    announced on stderr so nobody silently trains on a fraction of the
    machine); asking for more devices than exist fails with a clear
    error instead of numpy's reshape message."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp == -1:
        if n % tp:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp * tp > n:
        raise ValueError(
            f"mesh dp={dp} x tp={tp} needs {dp * tp} devices but only "
            f"{n} are available")
    if dp * tp != n:
        import sys

        sys.stderr.write(
            f"[mesh] note: dp={dp} x tp={tp} uses {dp * tp} of {n} "
            f"available devices\n")
        devices = devices[: dp * tp]
    grid = np.asarray(devices).reshape(dp, tp)
    return Mesh(grid, (DP_AXIS, TP_AXIS))


# (regex on the flattened param path, PartitionSpec) — first match wins.
_FS2_TP_RULES = [
    # attention projections: kernel (d_model, n_head*d_k)
    (r"slf_attn/w_[qkv]s/kernel$", P(None, TP_AXIS)),
    (r"slf_attn/w_[qkv]s/bias$", P(TP_AXIS)),
    (r"slf_attn/fc/kernel$", P(TP_AXIS, None)),
    # conv FFN: kernel (k, in, out)
    (r"pos_ffn/w_1/kernel$", P(None, None, TP_AXIS)),
    (r"pos_ffn/w_1/bias$", P(TP_AXIS)),
    (r"pos_ffn/w_2/kernel$", P(None, TP_AXIS, None)),
]

# HiFi-GAN generator: channel-shard the wide conv stacks.
_HIFIGAN_TP_RULES = [
    (r"conv_pre/(kernel|v)$", P(None, None, TP_AXIS)),
    (r"conv_pre/(bias|g)$", P(TP_AXIS)),
    (r"ups_\d+/(kernel|v)$", P(None, TP_AXIS, None)),
    (r"resblocks_\d+/convs\d?_\d+/(kernel|v)$", P(None, None, TP_AXIS)),
    (r"resblocks_\d+/convs\d?_\d+/bias$", P(TP_AXIS)),
]


def _spec_for(path: str, rules) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path):
            return spec
    return P()


def _key_name(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    return str(k)


def _tree_specs(tree: Any, rules) -> Any:
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    specs = [
        _spec_for("/".join(_key_name(k) for k in keypath), rules)
        for keypath, _ in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, specs)


def fs2_param_specs(params: Any) -> Any:
    """PartitionSpec tree for FastSpeech2 parameters."""
    return _tree_specs(params, _FS2_TP_RULES)


def hifigan_param_specs(params: Any) -> Any:
    """PartitionSpec tree for HiFi-GAN generator parameters."""
    return _tree_specs(params, _HIFIGAN_TP_RULES)


def make_shardings(mesh: Mesh, spec_tree: Any) -> Any:
    return jax.tree.map(lambda s: NamedSharding(mesh, s), spec_tree,
                        is_leaf=lambda s: isinstance(s, P))


def batch_specs(batch: Any, extra_leading_axis: bool = False) -> Any:
    """Shard every batch array on its batch dimension over 'dp'.

    extra_leading_axis=True for grad-accumulation super-batches shaped
    (acc, B, ...): the accumulation axis stays replicated.
    """
    def spec(x):
        nd = x.ndim if hasattr(x, "ndim") else 0
        if extra_leading_axis:
            return P(*((None, DP_AXIS) + (None,) * max(nd - 2, 0)))
        return P(*((DP_AXIS,) + (None,) * max(nd - 1, 0)))

    return jax.tree.map(spec, batch)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def globalize_batch(mesh: Mesh, batch: Any, extra_leading_axis: bool = False):
    """Process-local batch shards -> global jax.Arrays sharded over 'dp'.

    Each process passes its own contiguous row block (the rows its
    addressable dp sub-mesh owns — FS2Dataset(shard=...) yields exactly
    that); jax.make_array_from_process_local_data assembles them into one
    global array without any cross-host data movement. On a single process
    this degenerates to a plain sharded device_put of the full batch.
    """
    specs = batch_specs(batch, extra_leading_axis)

    def put(x, spec):
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x))

    return jax.tree.map(put, batch, specs)


def globalize_like(template: Any, host_tree: Any):
    """Host (numpy, globally-shaped) pytree -> global jax.Arrays with the
    template's shardings. Multi-host-safe: each process contributes only the
    shards its devices own via the callback."""
    def put(tmpl, host):
        host = np.asarray(host)
        return jax.make_array_from_callback(
            tmpl.shape, tmpl.sharding, lambda idx: host[idx])

    return jax.tree.map(put, template, host_tree)


def shard_for_inference(mesh: Mesh, variables, batch_arrays, tp_specs=None):
    """Place model variables (replicated, or TP-sharded via tp_specs) and a
    batch (sharded over 'dp' on dim 0) for data-parallel inference."""
    if tp_specs is not None:
        var_sh = make_shardings(mesh, tp_specs)
        variables = jax.device_put(variables, var_sh)
    else:
        variables = jax.device_put(variables, replicated(mesh))
    batch_arrays = jax.device_put(
        batch_arrays, make_shardings(mesh, batch_specs(batch_arrays)))
    return variables, batch_arrays


def shard_train_state(state, mesh: Mesh, optimizer, param_specs=None):
    """Place a TrainState on the mesh: params (and the optimizer's
    param-shaped slots, e.g. Adam mu/nu) follow the TP rules; everything
    else is replicated."""
    import optax

    if param_specs is None:
        param_specs = fs2_param_specs(state.params)
    param_sh = make_shardings(mesh, param_specs)
    rep = replicated(mesh)

    params = jax.device_put(state.params, param_sh)
    batch_stats = jax.device_put(state.batch_stats, rep)
    step = jax.device_put(state.step, rep)

    opt_state = optax.tree_map_params(
        optimizer,
        lambda leaf, sh: jax.device_put(leaf, sh),
        state.opt_state,
        param_sh,
        transform_non_params=lambda x: jax.device_put(x, rep),
    )
    return state.replace(step=step, params=params, batch_stats=batch_stats,
                         opt_state=opt_state)
