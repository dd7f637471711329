"""Conv primitives must match torch semantics exactly (the models depend on
torch padding/stride/transposed-conv conventions for checkpoint parity).

Golden values come from a torch subprocess (torch and jax cannot share a
process in this environment — see torch_oracle.py).
"""

import numpy as np
import pytest

from tests.oracle_util import run_oracle
from tts_king_tpu.ops.convs import adaptive_avg_pool1d, conv1d, conv_transpose1d

CONV_CASES = [
    # (k, stride, pad, dilation, groups)
    (1, 1, 0, 1, 1), (3, 1, 1, 1, 1), (9, 1, 4, 1, 1), (5, 1, 2, 1, 1),
    (3, 1, 2, 2, 1), (7, 1, 15, 5, 1), (41, 2, 20, 1, 1), (41, 4, 20, 1, 1),
    (5, 1, 2, 1, 4), (41, 2, 20, 1, 16),
]

TRANSPOSE_CASES = [(16, 8), (4, 2), (16, 16), (3, 1)]
POOL_CASES = [(100, 30), (29, 30), (30, 30), (301, 30)]


@pytest.fixture(scope="module")
def golden():
    """One oracle round-trip computing every torch golden value."""
    rng = np.random.RandomState(0)
    inputs = {}
    cases = {}

    for i, (k, stride, pad, dil, groups) in enumerate(CONV_CASES):
        B, T, Cin, Cout = 2, 50, 16, 16
        x = rng.randn(B, Cin, T).astype(np.float32)
        w = rng.randn(Cout, Cin // groups, k).astype(np.float32)
        b = rng.randn(Cout).astype(np.float32)
        key = f"case_{i}"
        inputs.update({f"{key}_x": x, f"{key}_w": w, f"{key}_b": b,
                       f"{key}_stride": stride, f"{key}_pad": pad,
                       f"{key}_dil": dil, f"{key}_groups": groups})
        cases[key] = (x, w, b, stride, pad, dil, groups)
    conv_out = run_oracle("conv1d", inputs)

    inputs_t = {}
    cases_t = {}
    for i, (k, stride) in enumerate(TRANSPOSE_CASES):
        B, T, Cin, Cout = 2, 30, 6, 4
        pad = (k - stride) // 2
        x = rng.randn(B, Cin, T).astype(np.float32)
        w = rng.randn(Cin, Cout, k).astype(np.float32)
        b = rng.randn(Cout).astype(np.float32)
        key = f"case_{i}"
        inputs_t.update({f"{key}_x": x, f"{key}_w": w, f"{key}_b": b,
                         f"{key}_stride": stride, f"{key}_pad": pad})
        cases_t[key] = (x, w, b, stride, pad)
    tconv_out = run_oracle("conv_transpose1d", inputs_t)

    inputs_p = {}
    cases_p = {}
    for i, (T, size) in enumerate(POOL_CASES):
        x = rng.randn(2, 3, T).astype(np.float32)
        key = f"case_{i}"
        inputs_p.update({f"{key}_x": x, f"{key}_size": size})
        cases_p[key] = (x, size)
    pool_out = run_oracle("adaptive_pool", inputs_p)

    return dict(conv=(cases, conv_out), tconv=(cases_t, tconv_out),
                pool=(cases_p, pool_out))


def test_conv1d_matches_torch(golden):
    cases, want = golden["conv"]
    for key, (x, w, b, stride, pad, dil, groups) in cases.items():
        got = np.array(conv1d(x.transpose(0, 2, 1), w.transpose(2, 1, 0), b,
                              stride, pad, dil, groups))
        np.testing.assert_allclose(
            got, want[key].transpose(0, 2, 1), rtol=1e-4, atol=1e-4,
            err_msg=f"conv1d case {key}")


def test_conv_transpose1d_matches_torch(golden):
    cases, want = golden["tconv"]
    for key, (x, w, b, stride, pad) in cases.items():
        got = np.array(conv_transpose1d(
            x.transpose(0, 2, 1), w.transpose(2, 0, 1), b, stride, pad))
        ref = want[key].transpose(0, 2, 1)
        assert got.shape == ref.shape, f"{key}: {got.shape} vs {ref.shape}"
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4,
                                   err_msg=f"conv_transpose1d case {key}")


def test_conv_transpose1d_polyphase_matches_dilated():
    """The zero-free polyphase formulation must equal the base-dilated
    identity for every (k, stride, pad) shape class, including k not a
    multiple of stride and stride > k (no torch oracle needed:
    conv_transpose1d is itself oracle-verified above)."""
    from tts_king_tpu.ops.convs import conv_transpose1d_poly

    rng = np.random.RandomState(1)
    for k, s, p in [(16, 8, 4), (4, 2, 1), (5, 3, 2), (7, 4, 0), (3, 2, 1),
                    (2, 5, 0), (9, 3, 3), (6, 4, 2), (1, 2, 0)]:
        B, T, Cin, Cout = 2, 23, 5, 3
        x = rng.randn(B, T, Cin).astype(np.float32)
        w = rng.randn(k, Cin, Cout).astype(np.float32)
        b = rng.randn(Cout).astype(np.float32)
        want = np.array(conv_transpose1d(x, w, b, s, p))
        got = np.array(conv_transpose1d_poly(x, w, b, s, p))
        assert got.shape == want.shape, (k, s, p, got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=f"polyphase k={k} s={s} p={p}")


def test_adaptive_avg_pool_matches_torch(golden):
    cases, want = golden["pool"]
    for key, (x, size) in cases.items():
        got = np.array(adaptive_avg_pool1d(x.transpose(0, 2, 1), size))
        np.testing.assert_allclose(
            got, want[key].transpose(0, 2, 1), rtol=1e-4, atol=1e-5,
            err_msg=f"pool case {key}")
