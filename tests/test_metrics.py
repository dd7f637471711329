"""Objective TTS metrics (train/metrics.py): DTW/MCD, duration MAE,
F0-RMSE + V/UV F1, and the free-running evaluate_objective driver."""

import numpy as np
import pytest

from tests.test_data_pipeline import corpus  # noqa: F401  (fixture)


def test_mcd_identity_is_zero():
    from tts_king_tpu.train.metrics import mcd_dtw

    rng = np.random.RandomState(0)
    mel = rng.randn(40, 80).astype(np.float32)
    mcd, path = mcd_dtw(mel, mel)
    assert mcd == pytest.approx(0.0, abs=1e-5)
    assert path[0] == (0, 0) and path[-1] == (39, 39)


def test_mcd_dtw_absorbs_time_stretch():
    """A 2x time-stretched copy aligns nearly perfectly under DTW; an
    unrelated mel does not."""
    from tts_king_tpu.train.metrics import mcd_dtw

    rng = np.random.RandomState(1)
    mel = rng.randn(30, 80).astype(np.float32)
    stretched = np.repeat(mel, 2, axis=0)
    other = rng.randn(60, 80).astype(np.float32)

    mcd_stretch, _ = mcd_dtw(stretched, mel)
    mcd_other, _ = mcd_dtw(other, mel)
    assert mcd_stretch == pytest.approx(0.0, abs=1e-5)
    assert mcd_other > 1.0


def test_duration_mae():
    from tts_king_tpu.train.metrics import duration_mae

    assert duration_mae(np.array([3, 5, 7]), np.array([3, 5, 7])) == 0.0
    assert duration_mae(np.array([4, 5, 9]), np.array([3, 5, 7])) == \
        pytest.approx(1.0)
    # trims to the shorter array (padded prediction rows)
    assert duration_mae(np.array([3, 5, 7, 0, 0]), np.array([3, 5, 8])) == \
        pytest.approx(1 / 3)


def test_f0_frame_metrics():
    from tts_king_tpu.train.metrics import f0_frame_metrics

    f0_gt = np.array([0.0, 100.0, 110.0, 120.0, 0.0, 0.0])
    f0_pred = np.array([0.0, 104.0, 110.0, 117.0, 130.0, 0.0])
    path = [(i, i) for i in range(6)]
    m = f0_frame_metrics(f0_pred, f0_gt, path)
    # voiced-in-both frames: 1,2,3 -> errors 4,0,3
    assert m["f0_rmse_hz"] == pytest.approx(np.sqrt((16 + 0 + 9) / 3))
    # pred voiced: 4 frames; gt voiced: 3; tp=3
    assert m["vuv_precision"] == pytest.approx(3 / 4)
    assert m["vuv_recall"] == pytest.approx(1.0)
    assert 0.8 < m["vuv_f1"] < 0.9


def test_frame_pitch_saved_by_preprocessor(corpus):  # noqa: F811
    import os

    cfg, _ = corpus
    root = cfg.preprocessed_path
    files = [f for f in os.listdir(os.path.join(root, "pitch"))
             if "frame-pitch" in f]
    assert len(files) == 4  # one per utterance
    f0 = np.load(os.path.join(root, "pitch", files[0]))
    assert f0.ndim == 1 and (f0 > 0).sum() > 5  # voiced frames, in Hz
    voiced = f0[f0 > 0]
    assert 80 < np.median(voiced) < 400


def test_evaluate_objective_end_to_end(corpus):  # noqa: F811
    from tests.test_train import _tiny_setup
    from tts_king_tpu.config import OptimizerConfig, TrainConfig
    from tts_king_tpu.data.dataset import FS2Dataset
    from tts_king_tpu.train.metrics import evaluate_objective

    import jax.numpy as jnp

    cfg, _ = corpus
    tc = TrainConfig(optimizer=OptimizerConfig(batch_size=1, grad_acc_step=2))
    ds = FS2Dataset("train.txt", cfg, tc, drop_last=False,
                    apply_masking=False, max_mel_len=64)
    model, opt, state, mc = _tiny_setup()
    # untrained duration head predicts ~0 frames; bias it so free-running
    # synthesis produces nonempty mels (same trick as the serving tests)
    dp = state.params["variance_adaptor"]["duration_predictor"]["linear_layer"]
    dp["bias"] = jnp.full_like(dp["bias"], 1.5)

    # mel-domain metrics (no vocoder)
    out = evaluate_objective(model, state.variables(), ds, max_utts=2,
                             max_mel_len=64)
    assert out["n_utts"] >= 1
    assert np.isfinite(out["mcd_db"]) and out["mcd_db"] > 0
    assert np.isfinite(out["duration_mae_frames"])

    # with dummy vocoder + f0 extractor: exercises the aligned-F0 path
    hop = cfg.stft.hop_length
    sr = cfg.audio.sampling_rate

    def vocode_fn(mel):
        t = np.arange(mel.shape[0] * hop) / sr
        return 0.5 * np.sin(2 * np.pi * 150.0 * t)

    def f0_fn(wav):
        return np.full(len(wav) // hop, 150.0, np.float32)

    out2 = evaluate_objective(model, state.variables(), ds, max_utts=2,
                              vocode_fn=vocode_fn, f0_fn=f0_fn,
                              max_mel_len=64)
    assert "f0_rmse_hz" in out2 and "vuv_f1" in out2
    assert np.isfinite(out2["f0_rmse_hz"])
    assert 0.0 <= out2["vuv_f1"] <= 1.0


def test_dtw_path_matches_reference_dp():
    """The anti-diagonal vectorized DTW is exact: the returned path's
    total cost equals the textbook O(T1*T2) DP optimum, endpoints and
    step monotonicity hold."""
    from tts_king_tpu.train.metrics import dtw_path

    rng = np.random.RandomState(0)
    for t1, t2 in [(1, 1), (1, 7), (5, 3), (17, 29), (40, 40)]:
        cost = rng.rand(t1, t2)
        acc = np.full((t1 + 1, t2 + 1), np.inf)
        acc[0, 0] = 0.0
        for i in range(1, t1 + 1):
            for j in range(1, t2 + 1):
                acc[i, j] = cost[i - 1, j - 1] + min(
                    acc[i - 1, j], acc[i, j - 1], acc[i - 1, j - 1])
        path = dtw_path(cost)
        assert path[0] == (0, 0) and path[-1] == (t1 - 1, t2 - 1)
        for (a, b), (c, d) in zip(path, path[1:]):
            assert (c - a, d - b) in ((0, 1), (1, 0), (1, 1))
        total = sum(cost[i, j] for i, j in path)
        np.testing.assert_allclose(total, acc[t1, t2], rtol=1e-12)
