"""Checkpointing: orbax-backed native checkpoints + PyTorch converters.

Native format keeps the reference's split-speaker-embedding convention
(train.py:212-227: checkpoints store the model without `speaker_emb` plus the
embedding separately, so weights can be reused across speaker sets), and
fixes its resume bug by restoring optimizer state too (the reference saves it
but never loads it — fs_two/model/optimizer.py:32-33 has no call site).

PyTorch converters ingest the reference layouts:
  * FS2 `.pth.tar`: {"model": state_dict minus speaker_emb, "embedding":
    speaker_emb.weight, "optimizer": ...} (fsapi.py:26-30);
  * HiFi-GAN: {"generator": state_dict with weight_norm g/v pairs}
    (hifiapi.py:21-22), folded to plain kernels (g * v / ||v||, torch dim=0)
    at conversion time.
"""

import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# PyTorch -> flax conversion
# ---------------------------------------------------------------------------

def _np(t):
    """torch tensor -> numpy array (torch imported lazily; CPU-only use)."""
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a torch ``.pth.tar``/``.pth`` checkpoint as numpy trees.

    Prefers the in-tree torch-free zip+pickle reader (pth_reader.py) — TPU
    hosts rarely have torch, and importing torch into a jax process is
    hazardous in this environment (OpenMP runtime conflict). Falls back to
    ``torch.load`` only for layouts the restricted reader refuses
    (pre-1.6 legacy format, pickled custom classes)."""
    from tts_king_tpu.pth_reader import load_pth

    try:
        return load_pth(path)
    except Exception:
        import torch

        return torch.load(path, map_location="cpu", weights_only=False)


def _linear(state, key):
    """torch nn.Linear -> flax Dense {kernel, bias}."""
    out = {"kernel": _np(state[key + ".weight"]).T}
    if key + ".bias" in state:
        out["bias"] = _np(state[key + ".bias"])
    return out


def _conv1d(state, key):
    """torch nn.Conv1d (out,in,k) -> flax Conv kernel (k,in,out)."""
    out = {"kernel": _np(state[key + ".weight"]).transpose(2, 1, 0)}
    if key + ".bias" in state:
        out["bias"] = _np(state[key + ".bias"])
    return out


def _layer_norm(state, key):
    return {"scale": _np(state[key + ".weight"]), "bias": _np(state[key + ".bias"])}


def _fft_block(state, prefix):
    """One FFTBlock from the reference layer_stack layout."""
    return {
        "slf_attn": {
            "w_qs": _linear(state, prefix + ".slf_attn.w_qs"),
            "w_ks": _linear(state, prefix + ".slf_attn.w_ks"),
            "w_vs": _linear(state, prefix + ".slf_attn.w_vs"),
            "fc": _linear(state, prefix + ".slf_attn.fc"),
            "layer_norm": _layer_norm(state, prefix + ".slf_attn.layer_norm"),
        },
        "pos_ffn": {
            "w_1": _conv1d(state, prefix + ".pos_ffn.w_1"),
            "w_2": _conv1d(state, prefix + ".pos_ffn.w_2"),
            "layer_norm": _layer_norm(state, prefix + ".pos_ffn.layer_norm"),
        },
    }


def _variance_predictor(state, prefix):
    return {
        "conv1d_1": _conv1d(state, prefix + ".conv_layer.conv1d_1.conv"),
        "layer_norm_1": _layer_norm(state, prefix + ".conv_layer.layer_norm_1"),
        "conv1d_2": _conv1d(state, prefix + ".conv_layer.conv1d_2.conv"),
        "layer_norm_2": _layer_norm(state, prefix + ".conv_layer.layer_norm_2"),
        "linear_layer": _linear(state, prefix + ".linear_layer"),
    }


def _cnn_scalar(state, prefix):
    def flat(p):
        return {
            "conv": _conv1d(state, p + ".net.0"),
            "norm": {"scale": _np(state[p + ".net.2.weight"]),
                     "bias": _np(state[p + ".net.2.bias"])},
        }

    return {
        "flat_one": flat(prefix + ".flat_one"),
        "flat_two": flat(prefix + ".flat_two"),
        "linear": _linear(state, prefix + ".linear"),
    }


def convert_fs2_state(state: Dict[str, Any], n_encoder_layers=4,
                      n_decoder_layers=6, use_cwt=False):
    """Flat torch state dict (with speaker_emb.weight present) -> flax trees.

    Returns {"params": ..., "batch_stats": ...} matching models.fs2.FastSpeech2.
    """
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    enc = {"src_word_emb": {"embedding": _np(state["encoder.src_word_emb.weight"])}}
    for i in range(n_encoder_layers):
        enc[f"layer_{i}"] = _fft_block(state, f"encoder.layer_stack.{i}")
    params["encoder"] = enc

    dec = {}
    for i in range(n_decoder_layers):
        dec[f"layer_{i}"] = _fft_block(state, f"decoder.layer_stack.{i}")
    params["decoder"] = dec

    va = {
        "duration_predictor": _variance_predictor(
            state, "variance_adaptor.duration_predictor"),
        "pitch_predictor": _variance_predictor(
            state, "variance_adaptor.pitch_predictor"),
        "energy_predictor": _variance_predictor(
            state, "variance_adaptor.energy_predictor"),
        "pitch_embedding": {
            "embedding": _np(state["variance_adaptor.pitch_embedding.weight"])},
        "energy_embedding": {
            "embedding": _np(state["variance_adaptor.energy_embedding.weight"])},
    }
    if use_cwt:
        va["pitch_mean"] = _cnn_scalar(state, "variance_adaptor.pitch_mean")
        va["pitch_std"] = _cnn_scalar(state, "variance_adaptor.pitch_std")
    params["variance_adaptor"] = va

    if "speaker_emb.weight" in state:
        params["speaker_emb"] = {"embedding": _np(state["speaker_emb.weight"])}

    params["mel_linear"] = _linear(state, "mel_linear")

    postnet_p, postnet_bs = {}, {}
    for i in range(5):
        postnet_p[f"conv_{i}"] = _conv1d(state, f"postnet.convolutions.{i}.0.conv")
        bn = f"postnet.convolutions.{i}.1"
        postnet_p[f"bn_{i}"] = {"scale": _np(state[bn + ".weight"]),
                                "bias": _np(state[bn + ".bias"])}
        postnet_bs[f"bn_{i}"] = {"mean": _np(state[bn + ".running_mean"]),
                                 "var": _np(state[bn + ".running_var"])}
    params["postnet"] = postnet_p
    batch_stats["postnet"] = postnet_bs

    as_jnp = lambda tree: jax.tree.map(jnp.asarray, tree)
    return {"params": as_jnp(params), "batch_stats": as_jnp(batch_stats)}


def convert_fs2_checkpoint(path: str, n_encoder_layers=4, n_decoder_layers=6,
                           use_cwt=False):
    """Reference FS2 .pth.tar -> flax variables (re-injecting the split
    speaker embedding, fsapi.py:27-30)."""
    ckpt = load_torch_checkpoint(path)
    state = dict(ckpt["model"])
    if "embedding" in ckpt and ckpt["embedding"] is not None:
        state["speaker_emb.weight"] = ckpt["embedding"]
    return convert_fs2_state(state, n_encoder_layers, n_decoder_layers, use_cwt)


def _fold_weight_norm(state, key):
    """Fold torch weight_norm (g, v) into a plain weight, dim=0 semantics
    (the only dim upstream hifi-gan uses)."""
    if key + ".weight" in state:
        return _np(state[key + ".weight"])
    g = _np(state[key + ".weight_g"])
    v = _np(state[key + ".weight_v"])
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
    return g * v / norm


def convert_hifigan_generator(state: Dict[str, Any], n_ups=4, n_kernels=3,
                              n_res_convs=3):
    """torch Generator state dict -> flax params for models.hifigan.Generator
    (weight-norm folded, plain kernels)."""
    params: Dict[str, Any] = {}

    def conv(key):
        w = _fold_weight_norm(state, key)  # (out, in, k)
        return {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0)),
                "bias": _np(state[key + ".bias"])}

    def conv_t(key):
        w = _fold_weight_norm(state, key)  # (in, out, k)
        return {"kernel": np.ascontiguousarray(w.transpose(2, 0, 1)),
                "bias": _np(state[key + ".bias"])}

    params["conv_pre"] = conv("conv_pre")
    params["conv_post"] = conv("conv_post")
    for i in range(n_ups):
        params[f"ups_{i}"] = conv_t(f"ups.{i}")
    for n in range(n_ups * n_kernels):
        block = {}
        for j in range(n_res_convs):
            if f"resblocks.{n}.convs1.{j}.weight_v" in state or \
               f"resblocks.{n}.convs1.{j}.weight" in state:
                block[f"convs1_{j}"] = conv(f"resblocks.{n}.convs1.{j}")
                block[f"convs2_{j}"] = conv(f"resblocks.{n}.convs2.{j}")
            elif f"resblocks.{n}.convs.{j}.weight_v" in state or \
                 f"resblocks.{n}.convs.{j}.weight" in state:
                block[f"convs_{j}"] = conv(f"resblocks.{n}.convs.{j}")
        params[f"resblocks_{n}"] = block
    return {"params": jax.tree.map(jnp.asarray, params)}


def _wn_conv(state, key):
    """torch weight_norm conv -> WNConv params {v, g, bias}.

    torch v (out, in, *k), g (out, 1, ...) -> flax v (*k, in, out), g (out,).
    """
    v = _np(state[key + ".weight_v"])
    g = _np(state[key + ".weight_g"]).reshape(-1)
    perm = (2, 1, 0) if v.ndim == 3 else (2, 3, 1, 0)
    return {"v": np.ascontiguousarray(v.transpose(perm)), "g": g,
            "bias": _np(state[key + ".bias"])}


def _sn_conv(state, key):
    """torch spectral_norm conv -> (SNConv params, spectral buffers)."""
    w = _np(state[key + ".weight_orig"])
    perm = (2, 1, 0) if w.ndim == 3 else (2, 3, 1, 0)
    params = {"weight_orig": np.ascontiguousarray(w.transpose(perm)),
              "bias": _np(state[key + ".bias"])}
    spectral = {"u": _np(state[key + ".weight_u"]),
                "v": _np(state[key + ".weight_v"])}
    return params, spectral


def convert_hifigan_discriminators(ckpt: Dict[str, Any],
                                   periods=(2, 3, 5, 7, 11)):
    """Upstream HiFi-GAN ``do_*`` discriminator checkpoint -> flax trees.

    ``ckpt`` holds {"mpd": state_dict, "msd": state_dict} (upstream
    hifi-gan train.py saves both next to the generator). Returns
    (mpd_params, msd_params, msd_spectral) matching
    models.hifigan.MultiPeriodDiscriminator / MultiScaleDiscriminator —
    including the spectral-norm parametrization of MSD scale 1
    (weight_orig + power-iteration u/v buffers, hifi/models.py:317,349).
    """
    mpd_state, msd_state = ckpt["mpd"], ckpt["msd"]

    mpd_params: Dict[str, Any] = {}
    for i, p in enumerate(periods):
        d: Dict[str, Any] = {}
        for j in range(5):
            d[f"convs_{j}"] = _wn_conv(mpd_state, f"discriminators.{i}.convs.{j}")
        d["conv_post"] = _wn_conv(mpd_state, f"discriminators.{i}.conv_post")
        mpd_params[f"disc_p{p}"] = d

    msd_params: Dict[str, Any] = {}
    msd_spectral: Dict[str, Any] = {}
    for i in range(3):
        d, sp = {}, {}
        for name in [f"convs.{j}" for j in range(7)] + ["conv_post"]:
            flax_name = name.replace("convs.", "convs_")
            key = f"discriminators.{i}.{name}"
            if i == 0:
                d[flax_name], sp[flax_name] = _sn_conv(msd_state, key)
            else:
                d[flax_name] = _wn_conv(msd_state, key)
        msd_params[f"disc_s{i}"] = d
        if sp:
            msd_spectral[f"disc_s{i}"] = sp

    as_jnp = lambda tree: jax.tree.map(jnp.asarray, tree)
    return as_jnp(mpd_params), as_jnp(msd_params), as_jnp(msd_spectral)


def convert_hifigan_checkpoint(path: str, **kw):
    """Reference HiFi-GAN checkpoint ({"generator": ...}) -> flax params."""
    ckpt = load_torch_checkpoint(path)
    state = ckpt["generator"] if "generator" in ckpt else ckpt
    return convert_hifigan_generator(state, **kw)


# ---------------------------------------------------------------------------
# Native orbax checkpoints
# ---------------------------------------------------------------------------

def _ckpt_dir(path, step):
    return os.path.join(os.path.abspath(path), f"step_{step:08d}")


def _use_coordination_barriers():
    """Multi-process runs: switch orbax's process synchronization from
    collectives-based barriers (which on CPU ride Gloo, whose context
    init has a hardcoded 30 s rendezvous timeout) to the JAX
    coordination-service barrier (gRPC, 300 s timeout). Checkpoint-layer
    sync should not ride data-plane collectives: a new Gloo clique built
    mid-save races against whatever host-side skew the processes have
    accumulated, and a lost race kills the whole job. No-op
    single-process and on failure (older orbax without the flag)."""
    import jax

    if jax.process_count() <= 1:
        return
    try:
        from absl import flags

        if not flags.FLAGS.is_parsed():
            flags.FLAGS.mark_as_parsed()
        flags.FLAGS.experimental_orbax_use_distributed_barrier = True
    except Exception:
        pass


def save_train_state(path: str, step: int, variables: Dict[str, Any],
                     opt_state=None, extra: Optional[Dict[str, Any]] = None):
    """Save full train state. The speaker embedding is stored under its own
    key so checkpoints can be transplanted across speaker sets (the
    reference's convention, train.py:212-227). The optimizer state is saved
    as a flax state-dict (pure nested dicts) so restore can rebuild the
    optax pytree structure with from_state_dict."""
    import orbax.checkpoint as ocp
    from flax.serialization import to_state_dict

    params = dict(variables["params"])
    speaker_emb = params.pop("speaker_emb", None)
    payload = {
        "params": params,
        "speaker_emb": speaker_emb if speaker_emb is not None else {},
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": to_state_dict(opt_state) if opt_state is not None else {},
        "extra": extra or {},
        "step": step,
    }
    _use_coordination_barriers()
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(_ckpt_dir(path, step), payload, force=True)


def restore_train_state(path: str, step: Optional[int] = None):
    """Restore a native checkpoint; returns the payload dict.

    If step is None, picks the latest step_* directory.
    """
    import orbax.checkpoint as ocp

    if step is None:
        steps = sorted(
            int(m.group(1))
            for m in (re.match(r"step_(\d+)$", d) for d in os.listdir(path))
            if m)
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {path}")
        step = steps[-1]
    _use_coordination_barriers()
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(_ckpt_dir(path, step))
    params = dict(payload["params"])
    if payload.get("speaker_emb"):
        params["speaker_emb"] = payload["speaker_emb"]
    payload["params"] = params
    return payload
