"""Prosody-control semantics: the d/p/e knobs act exactly as in the
reference (modules.py:92-140,199-204): duration scales the rounded frame
counts, pitch/energy scale the *predictions* before bucketized embedding
lookup (and the scaled predictions are returned)."""

import numpy as np

from tests.test_train import _tiny_setup


def _forward(model, variables, **controls):
    rng = np.random.RandomState(0)
    B, L = 2, 8
    return model.apply(variables, rng.randint(0, 3, (B,)),
                       rng.randint(1, 200, (B, L)), np.full((B,), L),
                       max_mel_len=64, train=False, **controls)


def test_pitch_energy_controls_scale_predictions():
    model, opt, state, mc = _tiny_setup()
    v = state.variables()
    base = _forward(model, v)
    p_scaled = _forward(model, v, p_control=2.0)
    np.testing.assert_allclose(np.asarray(p_scaled["pitch_prediction"]),
                               2.0 * np.asarray(base["pitch_prediction"]),
                               rtol=1e-5, atol=1e-6)
    # e_control alone scales the energy prediction (p_control changes the
    # pitch embedding that feeds the energy predictor — reference semantics,
    # modules.py:185-193 — so it must be held at 1.0 here)
    e_scaled = _forward(model, v, e_control=0.5)
    np.testing.assert_allclose(np.asarray(e_scaled["energy_prediction"]),
                               0.5 * np.asarray(base["energy_prediction"]),
                               rtol=1e-5, atol=1e-6)
    # durations unaffected by p/e controls
    np.testing.assert_array_equal(np.asarray(p_scaled["mel_lens"]),
                                  np.asarray(base["mel_lens"]))
    np.testing.assert_array_equal(np.asarray(e_scaled["mel_lens"]),
                                  np.asarray(base["mel_lens"]))


def test_duration_control_scales_lengths():
    import jax.numpy as jnp

    model, opt, state, mc = _tiny_setup()
    v = state.variables()
    # bias the duration head so rounded durations are nonzero
    dp = v["params"]["variance_adaptor"]["duration_predictor"]["linear_layer"]
    dp["bias"] = jnp.full_like(dp["bias"], 1.2)

    base = _forward(model, v)
    double = _forward(model, v, d_control=2.0)
    n0 = np.asarray(base["mel_lens"]).astype(np.int64)
    n2 = np.asarray(double["mel_lens"]).astype(np.int64)
    assert (n0 > 0).all()
    # rounded-then-scaled-then-truncated: exactly 2x when control is integer
    np.testing.assert_array_equal(n2, 2 * n0)
