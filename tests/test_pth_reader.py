"""Torch-free .pth.tar reader vs torch.save ground truth.

First run (torch importable): a subprocess torch.saves a checkpoint with
every dtype/layout a state dict can contain, plus its expected arrays; both
are committed under tests/fixtures/pth_reader so the test replays on
torch-less machines (the production TPU-host scenario the reader exists
for). The reader must reproduce torch.load byte-identically.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

_FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "fixtures", "pth_reader")
_PTH = os.path.join(_FIX, "mixed.pth.tar")
_NPZ = os.path.join(_FIX, "mixed_expected.npz")

_GEN = r"""
import sys
import numpy as np
import torch

pth, npz = sys.argv[1], sys.argv[2]
torch.manual_seed(0)
ck = {
    "model": {
        "enc.weight": torch.randn(7, 5),
        "enc.weight_t": torch.randn(5, 7).t(),          # non-contiguous
        "emb.weight": torch.nn.Parameter(torch.randn(11, 3)),
        "bn.running_mean": torch.randn(4, dtype=torch.float64),
        "bn.num_batches_tracked": torch.tensor(42, dtype=torch.int64),
        "half.w": torch.randn(3, 3).half(),
        "bf16.w": torch.randn(2, 6).bfloat16(),
        "mask": torch.tensor([True, False, True]),
        "bytes": torch.arange(6, dtype=torch.uint8).reshape(2, 3),
        "scalar": torch.tensor(3.5),
        "shared_a": None,  # filled below: two views of one storage
    },
    "embedding": torch.randn(4, 3),
    "optimizer": {"state": {}, "param_groups": [{"lr": 1e-4}]},
    "step": 290000,
}
base = torch.randn(12)
ck["model"]["shared_a"] = base[:6].reshape(2, 3)
ck["model"]["shared_b"] = base[6:]
torch.save(ck, pth)

out = {}
def walk(prefix, obj):
    if isinstance(obj, dict):
        for k, v in obj.items():
            walk(f"{prefix}|{k}" if prefix else str(k), v)
    elif isinstance(obj, torch.Tensor):
        a = obj.detach()
        if a.dtype == torch.bfloat16:
            out[prefix] = a.view(torch.uint16).numpy()  # raw bits
        else:
            out[prefix] = a.numpy()
np = __import__("numpy")
walk("", ck)
np.savez(npz, **out)
"""


def _ensure_fixture():
    if os.path.exists(_PTH) and os.path.exists(_NPZ):
        return True
    try:
        import importlib.util

        if importlib.util.find_spec("torch") is None:
            return False
    except Exception:
        return False
    os.makedirs(_FIX, exist_ok=True)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_", "PALLAS_AXON", "AXON_",
                                "TPU_"))}
    subprocess.run([sys.executable, "-c", _GEN, _PTH, _NPZ], env=env,
                   check=True, capture_output=True, text=True, timeout=300)
    return True


def test_load_pth_matches_torch():
    if not _ensure_fixture():
        pytest.skip("no recorded pth fixture and torch unavailable")
    from tts_king_tpu.pth_reader import load_pth

    ck = load_pth(_PTH)
    assert ck["step"] == 290000
    assert ck["optimizer"]["param_groups"][0]["lr"] == 1e-4

    expected = np.load(_NPZ)

    def get(path):
        node = ck
        for part in path.split("|"):
            node = node[part]
        return node

    for key in expected.files:
        got = get(key)
        want = expected[key]
        if key.endswith("bf16.w"):  # recorded as raw uint16 bits
            got = np.asarray(got).view(np.uint16)
        assert np.asarray(got).shape == want.shape, key
        np.testing.assert_array_equal(np.asarray(got), want, err_msg=key)


def test_load_torch_checkpoint_uses_pure_reader():
    """The production load path must work with torch absent entirely."""
    if not _ensure_fixture():
        pytest.skip("no recorded pth fixture and torch unavailable")
    import builtins

    from tts_king_tpu.checkpoint import load_torch_checkpoint

    real_import = builtins.__import__

    def no_torch(name, *a, **k):
        if name == "torch" or name.startswith("torch."):
            raise ImportError("torch forbidden in this test")
        return real_import(name, *a, **k)

    builtins.__import__ = no_torch
    try:
        ck = load_torch_checkpoint(_PTH)
    finally:
        builtins.__import__ = real_import
    assert ck["model"]["enc.weight"].shape == (7, 5)
    # the transposed save round-trips with its logical layout
    assert ck["model"]["enc.weight_t"].shape == (7, 5)
    assert ck["model"]["enc.weight_t"].flags["C_CONTIGUOUS"]


def test_refuses_arbitrary_classes(tmp_path):
    """The restricted unpickler must not execute arbitrary callables."""
    import pickle
    import zipfile

    evil = tmp_path / "evil.pth"
    payload = pickle.dumps({"x": os.system})  # pickles as (posix, system)
    with zipfile.ZipFile(evil, "w") as zf:
        zf.writestr("evil/data.pkl", payload)
    from tts_king_tpu.pth_reader import load_pth

    with pytest.raises(Exception):
        load_pth(str(evil))
