"""Additional FS2 parity paths: CWT pitch mode (11-channel prediction +
scalar mean/std heads + in-graph inverse CWT) and sequences longer than
max_seq_len at eval (sinusoid-table regeneration, Models.py:88-99,163-170)."""

import json
import os

import numpy as np
import pytest

import tests.conftest as cf
from tests.oracle_util import run_oracle
from tests.test_parity_fs2 import (
    ENC_LAYERS, DEC_LAYERS, FILTER, HIDDEN, N_SPEAKERS, POSTNET_DIM,
    STATS_DIR, _model_config)

pytestmark = pytest.mark.skipif(
    not cf.oracle_available(),
    reason="reference tree not mounted and no oracle recordings")


def _build(state, use_cwt, max_seq_len):
    import dataclasses

    from tts_king_tpu.checkpoint import convert_fs2_state
    from tts_king_tpu.models.fs2 import build_fastspeech2

    with open(os.path.join(STATS_DIR, "stats.json")) as f:
        stats = json.load(f)
    mc = dataclasses.replace(_model_config(), use_cwt=use_cwt,
                             max_seq_len=max_seq_len)
    model = build_fastspeech2(mc, stats, N_SPEAKERS)
    variables = convert_fs2_state(state, ENC_LAYERS, DEC_LAYERS, use_cwt)
    return model, variables


def test_cwt_mode_parity():
    rng = np.random.RandomState(17)
    B, L = 3, 10
    texts = rng.randint(1, 206, size=(B, L)).astype(np.int64)
    src_lens = np.array([10, 7, 4], np.int64)
    for b, n in enumerate(src_lens):
        texts[b, n:] = 0
    speakers = rng.randint(0, N_SPEAKERS, size=(B,)).astype(np.int64)

    out = run_oracle("reference_fs2", dict(
        seed=23, postnet_dim=POSTNET_DIM, stats_dir=STATS_DIR, encoder_layer=ENC_LAYERS,
        decoder_layer=DEC_LAYERS, hidden=HIDDEN, filter=FILTER,
        max_seq_len=96, n_speakers=N_SPEAKERS, use_cwt=True,
        texts=texts, src_lens=src_lens, speakers=speakers,
        p_control=1.0, e_control=1.0, d_control=1.0))
    state = {k[len("state__"):]: v for k, v in out.items()
             if k.startswith("state__")}
    model, variables = _build(state, use_cwt=True, max_seq_len=96)

    got = model.apply(variables, speakers, texts, src_lens, max_mel_len=96,
                      train=False)
    # 11-channel CWT pitch prediction parity
    np.testing.assert_allclose(np.array(got["pitch_prediction"]),
                               out["pitch_prediction"], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.array(got["log_duration_prediction"]),
                               out["log_duration_prediction"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.array(got["mel_lens"]), out["mel_lens"])
    # mel parity on valid frames (pitch path feeds the adaptor)
    T_ref = out["mel"].shape[1]
    mel = np.array(got["mel"])[:, :T_ref]
    for b, n in enumerate(out["mel_lens"]):
        np.testing.assert_allclose(mel[b, : int(n)], out["mel"][b, : int(n)],
                                   rtol=1e-3, atol=3e-4)


@pytest.mark.slow
def test_longer_than_max_seq_len_parity():
    """Encoder L and decoder T beyond max_seq_len at eval: the sinusoid
    tables are regenerated on the fly; outputs must still match."""
    MAX_SEQ = 24
    rng = np.random.RandomState(29)
    B, L = 2, 30  # L > max_seq_len
    texts = rng.randint(1, 206, size=(B, L)).astype(np.int64)
    src_lens = np.array([30, 26], np.int64)
    texts[1, 26:] = 0
    speakers = rng.randint(0, N_SPEAKERS, size=(B,)).astype(np.int64)
    d_targets = rng.randint(1, 3, size=(B, L)).astype(np.int64)
    for b, n in enumerate(src_lens):
        d_targets[b, n:] = 0
    mel_lens = d_targets.sum(1)
    T = int(mel_lens.max())
    assert T > MAX_SEQ
    mels = rng.randn(B, T, 80).astype(np.float32)
    e_targets = rng.uniform(-1, 5, size=(B, L)).astype(np.float32)
    p_targets = rng.uniform(-2, 2, size=(B, L)).astype(np.float32)

    out = run_oracle("reference_fs2", dict(
        seed=31, postnet_dim=POSTNET_DIM, stats_dir=STATS_DIR, encoder_layer=ENC_LAYERS,
        decoder_layer=DEC_LAYERS, hidden=HIDDEN, filter=FILTER,
        max_seq_len=MAX_SEQ, n_speakers=N_SPEAKERS, use_cwt=False,
        texts=texts, src_lens=src_lens, speakers=speakers,
        mels=mels, mel_lens=mel_lens, e_targets=e_targets,
        d_targets=d_targets, p_targets=p_targets,
        p_cwt=rng.randn(B, L, 11).astype(np.float32),
        p_control=1.0, e_control=1.0, d_control=1.0))
    state = {k[len("state__"):]: v for k, v in out.items()
             if k.startswith("state__")}
    model, variables = _build(state, use_cwt=False, max_seq_len=MAX_SEQ)

    got = model.apply(
        variables, speakers, texts, src_lens, max_mel_len=T,
        mel_lens=mel_lens, energy_targets=e_targets,
        duration_targets=d_targets, pitch_raw_targets=p_targets, train=False)

    assert np.array(got["mel"]).shape[1] == T  # not truncated at eval
    for b in range(B):
        n = int(mel_lens[b])
        np.testing.assert_allclose(
            np.array(got["mel"])[b, :n], out["mel"][b, :n],
            rtol=1e-3, atol=3e-4, err_msg=f"item {b}")
