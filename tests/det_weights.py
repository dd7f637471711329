"""Deterministic name-keyed weight generation for full-size parity fixtures.

Full-size (shipped-dims) parity needs the torch oracle and the jax side to
agree on ~35M parameters; committing them as fixture arrays would be >100MB
of incompressible noise. Instead both sides regenerate every value from the
torch state-dict KEY NAME + SHAPE via this module (pure numpy, importable by
the torch oracle subprocess and the jax tests alike), and the fixture only
records names, shapes and model outputs.

The value scheme keeps activations O(1) at any width (fan-in scaling),
layer-norm/batch-norm scales near 1, and biases the duration predictor's
final layer so rounded durations land in the realistic 1-3 frames/phoneme
range (exp(logd)-1 with logd ~ 0.9).
"""

import hashlib

import numpy as np


def _rng(name, seed):
    h = hashlib.sha256(f"{seed}:{name}".encode()).digest()
    return np.random.RandomState(np.frombuffer(h[:16], np.uint32))


def det_array(name, shape, seed=0):
    """Deterministic float32 array for a torch state-dict entry."""
    shape = tuple(int(s) for s in shape)
    n = _rng(name, seed).standard_normal(shape)

    if name.endswith("num_batches_tracked"):
        return np.zeros(shape, np.int64)
    if "running_mean" in name:
        return (0.1 * n).astype(np.float32)
    if "running_var" in name:
        return np.exp(0.3 * n).astype(np.float32)
    if name.endswith((".weight_g", ".g")):  # weight-norm magnitude
        return np.exp(0.1 * n).astype(np.float32)
    if name.endswith(("weight_u", "weight_v")) and len(shape) == 1:
        # spectral-norm power-iteration vectors: unit-normalized like torch
        v = n / np.linalg.norm(n)
        return v.astype(np.float32)

    if name.endswith(".bias") or (len(shape) == 1 and not
                                  name.endswith(".weight")):
        out = 0.02 * n
        if "duration_predictor.linear_layer" in name:
            out = out + 1.0  # exp(~1.0)-1 ~ 1.7 frames/phoneme
        return out.astype(np.float32)
    if len(shape) == 1:  # 1-d .weight: LayerNorm / BatchNorm scale
        return (1.0 + 0.1 * n).astype(np.float32)

    # linear / conv / embedding / weight_v matrices: unit-variance
    # activations via fan-in scaling (fan_in = prod of all dims but dim 0;
    # matches torch's (out, in, *k) layout closely enough for conditioning)
    fan_in = int(np.prod(shape[1:]))
    out = (n / np.sqrt(max(fan_in, 1))).astype(np.float32)
    if "src_word_emb" in name:
        out[0] = 0.0  # padding_idx=0 row stays zero (Models.py:40)
    if "duration_predictor.linear_layer" in name:
        # keep log-duration spread tight around the bias so rounded
        # durations land at the realistic 1-3 frames/phoneme
        out = 0.2 * out
    return out


def apply_det_weights_torch(model, seed=0, skip=("position_enc",)):
    """Overwrite a torch module's state dict in place (params AND batch-norm
    stats) with det_array values. Buffers the jax converter never consumes
    and that must keep their computed values (sinusoid tables) are skipped.
    Returns the list of (name, shape) pairs that were generated."""
    import torch

    spec = []
    state = model.state_dict()
    for name, t in state.items():
        if any(s in name for s in skip):
            continue
        arr = det_array(name, tuple(t.shape), seed)
        t.copy_(torch.from_numpy(arr).to(t.dtype))
        spec.append((name, tuple(t.shape)))
    return spec


def det_state_dict(names_shapes, seed=0):
    """Regenerate the full torch-layout state dict on the jax side."""
    return {name: det_array(name, shape, seed)
            for name, shape in names_shapes}
