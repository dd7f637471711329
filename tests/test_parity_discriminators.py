"""Discriminator parity vs the reference torch implementation
(hifi/models.py:213-374) at FULL channel counts, including:

  * the spectral-normed first MSD scale (norm choice hifi/models.py:317,
    instantiation :349) — both eval semantics (stored u,v) and the
    train-mode power iteration (one update per forward call, so two per
    discriminator per step: d(y) then d(y_hat));
  * the weight-normed pooled MSD scales and all five MPD periods;
  * checkpoint.convert_hifigan_discriminators on the upstream ``do_*``
    layout (state dicts with weight_orig/weight_u/weight_v and
    weight_g/weight_v).

Weights regenerate from (name, shape) via tests/det_weights.py, so the
committed fixture stays small at real scale (MSD alone is ~12M params).
"""

import numpy as np
import pytest

import tests.conftest as cf
from tests.det_weights import det_state_dict
from tests.oracle_util import run_oracle

# Slow tier (the [eval]+[train] pair costs ~2 min on a 1-core box); run
# directly with:  pytest tests/test_parity_discriminators.py -m ""
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not cf.oracle_available(),
        reason="reference tree not mounted and no oracle recordings"),
]

DET_SEED = 11
T = 2048


def _wavs():
    rng = np.random.RandomState(123)
    t = np.arange(T) / 22050.0
    y = (0.5 * np.sin(2 * np.pi * 220 * t) +
         0.1 * rng.randn(T)).astype(np.float32)[None]
    y_hat = (0.5 * np.sin(2 * np.pi * 233 * t) +
             0.1 * rng.randn(T)).astype(np.float32)[None]
    return y, y_hat


def _convert(out):
    from tts_king_tpu.checkpoint import convert_hifigan_discriminators

    mpd_state = det_state_dict(
        [(k[len("mpd_shape__"):], tuple(int(x) for x in out[k]))
         for k in out if isinstance(k, str) and k.startswith("mpd_shape__")],
        seed=DET_SEED)
    msd_state = det_state_dict(
        [(k[len("msd_shape__"):], tuple(int(x) for x in out[k]))
         for k in out if isinstance(k, str) and k.startswith("msd_shape__")],
        seed=DET_SEED)
    # full-scale sanity: spectral norm really is on scale 1 only
    assert "discriminators.0.convs.0.weight_orig" in msd_state
    assert "discriminators.0.convs.0.weight_u" in msd_state
    assert "discriminators.1.convs.0.weight_g" in msd_state
    assert msd_state["discriminators.0.convs.6.weight_orig"].shape == (
        1024, 1024, 5)
    return convert_hifigan_discriminators(
        {"mpd": mpd_state, "msd": msd_state})


@pytest.mark.parametrize("train_mode", [0, 1], ids=["eval", "train"])
def test_discriminator_parity(train_mode):
    from tts_king_tpu.models.hifigan import (MultiPeriodDiscriminator,
                                             MultiScaleDiscriminator)

    y, y_hat = _wavs()
    out = run_oracle("reference_discriminators", dict(
        seed=5, det_weights=DET_SEED, y=y, y_hat=y_hat,
        train_mode=train_mode))
    mpd_params, msd_params, msd_spectral = _convert(out)

    mpd = MultiPeriodDiscriminator()
    p_rs, p_gs, p_fr, p_fg = mpd.apply({"params": mpd_params}, y, y_hat)

    msd = MultiScaleDiscriminator()
    if train_mode:
        (s_rs, s_gs, s_fr, s_fg), upd = msd.apply(
            {"params": msd_params, "spectral": msd_spectral}, y, y_hat,
            update_sn=True, mutable=["spectral"])
        post_spectral = upd["spectral"]
    else:
        # mirror the oracle: settle u/v with one train-mode pass, then the
        # eval pass must use the stored buffers WITHOUT updating them
        _, upd = msd.apply(
            {"params": msd_params, "spectral": msd_spectral}, y, y_hat,
            update_sn=True, mutable=["spectral"])
        post_spectral = upd["spectral"]
        s_rs, s_gs, s_fr, s_fg = msd.apply(
            {"params": msd_params, "spectral": post_spectral}, y, y_hat)

    for i in range(5):
        np.testing.assert_allclose(
            np.array(p_rs[i]), out[f"mpd_r_{i}"], rtol=1e-4, atol=1e-4,
            err_msg=f"mpd real {i}")
        np.testing.assert_allclose(
            np.array(p_gs[i]), out[f"mpd_g_{i}"], rtol=1e-4, atol=1e-4,
            err_msg=f"mpd gen {i}")
    for i in range(3):
        np.testing.assert_allclose(
            np.array(s_rs[i]), out[f"msd_r_{i}"], rtol=1e-4, atol=1e-4,
            err_msg=f"msd real {i}")
        np.testing.assert_allclose(
            np.array(s_gs[i]), out[f"msd_g_{i}"], rtol=1e-4, atol=1e-4,
            err_msg=f"msd gen {i}")

    # feature maps: per-layer abs-means (full maps are tens of MB)
    for tag, fmaps in (("mpd_fr", p_fr), ("mpd_fg", p_fg),
                       ("msd_fr", s_fr), ("msd_fg", s_fg)):
        got = np.array([[float(np.mean(np.abs(np.array(f)))) for f in fm]
                        for fm in fmaps])
        np.testing.assert_allclose(got, out[tag + "_absmean"],
                                   rtol=1e-4, atol=1e-6, err_msg=tag)

    # spectral u/v buffers after the forward (power-iteration parity)
    for j in list(range(7)) + ["post"]:
        torch_name = (f"discriminators.0.convs.{j}" if j != "post"
                      else "discriminators.0.conv_post")
        flax_name = f"convs_{j}" if j != "post" else "conv_post"
        sp = post_spectral["disc_s0"][flax_name]
        np.testing.assert_allclose(
            np.array(sp["u"]), out[f"post__{torch_name}.weight_u"],
            rtol=1e-4, atol=1e-5, err_msg=f"u {flax_name}")
        np.testing.assert_allclose(
            np.array(sp["v"]), out[f"post__{torch_name}.weight_v"],
            rtol=1e-4, atol=1e-5, err_msg=f"v {flax_name}")
