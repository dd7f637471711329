"""Fused packed-layout MRF kernel (ops/pallas/mrf_packed.py) vs the unfused
resblock stack, and the int8-quantized Generator path.

Runs in interpreter mode on the CPU test backend; the same kernel compiles
via Mosaic on TPU (benchmarked in DESIGN.md §3). Reference semantics:
hifi/models.py:12-101 (ResBlock1), :185-196 (MRF mean over branches).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_king_tpu.config import VocoderModelConfig
from tts_king_tpu.models.hifigan import Generator, ResBlock1
from tts_king_tpu.ops.pallas.mrf_packed import mrf_stage_apply

KS = (3, 7, 11)
DIL = (1, 3, 5)


def _stage(C, T, B=2, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, T, C), jnp.float32)
    params, ref = [], None
    for i, k in enumerate(KS):
        rb = ResBlock1(C, k, DIL)
        v = rb.init(jax.random.PRNGKey(i), x)
        p = jax.tree.map(
            lambda a: jnp.asarray(rng.randn(*a.shape), jnp.float32) * 0.05,
            v["params"])
        out = rb.apply({"params": p}, x)
        ref = out if ref is None else ref + out
        params.append(p)
    return x, params, ref / len(KS)


@pytest.mark.parametrize("C,r,T,tile", [(32, 4, 512, 64), (16, 2, 128, 32),
                                        (8, 1, 128, 32)])
@pytest.mark.parametrize("layout", ["wide", "deep"])
def test_fused_stage_matches_resblocks(C, r, T, tile, layout):
    x, params, ref = _stage(C, T)
    xp = x.reshape(x.shape[0], T // r, r * C)
    got = mrf_stage_apply(xp, params, KS, DIL, r, tile=tile, layout=layout,
                          interpret=True).reshape(ref.shape)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 1e-5, rel


@pytest.mark.parametrize("layout", ["wide", "deep"])
def test_fused_stage_int8_quantization_error_bounded(layout):
    C, r, T = 32, 4, 512
    x, params, ref = _stage(C, T)
    xp = x.reshape(x.shape[0], T // r, r * C)
    got = mrf_stage_apply(xp, params, KS, DIL, r, tile=64, mode="int8",
                          layout=layout, interpret=True).reshape(ref.shape)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    # int8 weights + per-conv activation scales through a 6-conv chain
    assert rel < 0.05, rel


def _tiny_voc():
    return VocoderModelConfig(
        upsample_rates=[4, 4], upsample_kernel_sizes=[8, 8],
        upsample_initial_channel=32)


def _gen_outputs(backend, mel, params):
    cfg = _tiny_voc()
    voc = Generator(cfg, mrf_backend=backend)
    return voc.apply({"params": params}, mel)


@pytest.fixture(scope="module")
def tiny_generator():
    cfg = _tiny_voc()
    rng = np.random.RandomState(1)
    mel = jnp.asarray(rng.randn(2, 16, 80), jnp.float32)
    voc = Generator(cfg)
    params = voc.init(jax.random.PRNGKey(0), mel)["params"]
    # non-trivial weights
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.randn(*a.shape), jnp.float32) * 0.05,
        params)
    return mel, params


def test_generator_fused_backend_matches_xla(tiny_generator):
    mel, params = tiny_generator
    ref = _gen_outputs("xla", mel, params)
    got = _gen_outputs("fused", mel, params)
    assert got.shape == ref.shape
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 1e-5, rel


@pytest.mark.slow
def test_generator_int8_backend_snr(tiny_generator):
    """int8 vocoder parity: waveform SNR vs the f32 path must clear an
    audible-noise bound (VERDICT round-1 item #8)."""
    mel, params = tiny_generator
    ref = np.asarray(_gen_outputs("xla", mel, params), np.float64)
    got = np.asarray(_gen_outputs("fused_int8", mel, params), np.float64)
    noise = np.linalg.norm(got - ref)
    snr_db = 20.0 * np.log10(np.linalg.norm(ref) / max(noise, 1e-12))
    assert snr_db > 25.0, snr_db


def test_generator_fused_param_tree_identical(tiny_generator):
    """The fused backend must accept checkpoints saved for the XLA path."""
    mel, params = tiny_generator
    cfg = _tiny_voc()
    fused_params = Generator(cfg, mrf_backend="fused").init(
        jax.random.PRNGKey(0), mel)["params"]
    ref_tree = jax.tree_util.tree_structure(params)
    assert jax.tree_util.tree_structure(fused_params) == ref_tree
    shapes_a = jax.tree.map(lambda a: a.shape, params)
    shapes_b = jax.tree.map(lambda a: a.shape, fused_params)
    assert shapes_a == shapes_b
