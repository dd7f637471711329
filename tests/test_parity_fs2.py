"""FastSpeech2 behavioral parity vs the reference torch implementation.

The oracle subprocess builds the reference model (random seeded weights),
dumps its state dict in checkpoint layout plus its outputs; here we convert
the state dict with checkpoint.convert_fs2_state and require the flax model
to reproduce the outputs (f32 CPU, tolerance 1e-4). This validates the whole
stack end-to-end: converter, FFT blocks, variance adaptor, length regulator,
decoder truncation, postnet batch-norm inference stats.
"""

import os

import numpy as np
import pytest

import tests.conftest as cf
from tests.oracle_util import run_oracle

pytestmark = pytest.mark.skipif(
    not cf.oracle_available(),
    reason="reference tree not mounted and no oracle recordings")

HIDDEN = 32
FILTER = 64
ENC_LAYERS = 2
DEC_LAYERS = 2
MAX_SEQ_LEN = 96
N_SPEAKERS = 4
POSTNET_DIM = 64
STATS_DIR = cf.pretrained_dir()


def _model_config():
    from tts_king_tpu.config import (
        ModelConfig, TransformerConfig, VarianceEmbeddingConfig,
        VariancePredictorConfig)

    return ModelConfig(
        transformer=TransformerConfig(
            encoder_layer=ENC_LAYERS, encoder_head=2, encoder_hidden=HIDDEN,
            variance_hidden=HIDDEN, decoder_layer=DEC_LAYERS, decoder_head=2,
            decoder_hidden=HIDDEN, conv_filter_size=FILTER,
            conv_kernel_size=(9, 1)),
        variance_predictor=VariancePredictorConfig(
            filter_size=HIDDEN, kernel_size=3, dropout=0.5),
        variance_embedding=VarianceEmbeddingConfig(),
        use_cwt=False, multi_speaker=True, max_seq_len=MAX_SEQ_LEN,
        postnet_dim=POSTNET_DIM)


def _build_flax(state):
    import json

    from tts_king_tpu.checkpoint import convert_fs2_state
    from tts_king_tpu.models.fs2 import build_fastspeech2

    with open(os.path.join(STATS_DIR, "stats.json")) as f:
        stats = json.load(f)
    model = build_fastspeech2(_model_config(), stats, N_SPEAKERS)
    variables = convert_fs2_state(state, ENC_LAYERS, DEC_LAYERS, use_cwt=False)
    return model, variables


def _common_inputs(rng):
    B, L = 3, 12
    texts = rng.randint(1, 206, size=(B, L)).astype(np.int64)
    src_lens = np.array([12, 9, 5], np.int64)
    for b, n in enumerate(src_lens):
        texts[b, n:] = 0
    speakers = rng.randint(0, N_SPEAKERS, size=(B,)).astype(np.int64)
    return texts, src_lens, speakers


@pytest.fixture(scope="module")
def oracle_inference():
    rng = np.random.RandomState(42)
    texts, src_lens, speakers = _common_inputs(rng)
    payload = dict(
        seed=7, postnet_dim=POSTNET_DIM, stats_dir=STATS_DIR, encoder_layer=ENC_LAYERS,
        decoder_layer=DEC_LAYERS, hidden=HIDDEN, filter=FILTER,
        max_seq_len=MAX_SEQ_LEN, n_speakers=N_SPEAKERS, use_cwt=False,
        texts=texts, src_lens=src_lens, speakers=speakers,
        p_control=1.0, e_control=1.0, d_control=1.0)
    out = run_oracle("reference_fs2", payload)
    out["_inputs"] = (texts, src_lens, speakers)
    return out


def test_inference_parity(oracle_inference):
    out = oracle_inference
    texts, src_lens, speakers = out["_inputs"]
    state = {k[len("state__"):]: v for k, v in out.items()
             if isinstance(k, str) and k.startswith("state__")}
    model, variables = _build_flax(state)

    got = model.apply(
        variables, speakers, texts, src_lens, max_mel_len=MAX_SEQ_LEN,
        train=False)

    np.testing.assert_allclose(
        np.array(got["log_duration_prediction"]),
        out["log_duration_prediction"], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.array(got["pitch_prediction"]), out["pitch_prediction"],
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.array(got["energy_prediction"]), out["energy_prediction"],
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.array(got["duration_rounded"]).astype(np.float32),
        out["duration_rounded"], rtol=0, atol=1e-5)
    np.testing.assert_array_equal(np.array(got["mel_lens"]), out["mel_lens"])

    # Mel comparison on the reference's (dynamic) frame range, valid frames only.
    ref_mel = out["mel"]
    ref_post = out["postnet_mel"]
    T_ref = ref_mel.shape[1]
    mel = np.array(got["mel"])[:, :T_ref]
    post = np.array(got["postnet_mel"])[:, :T_ref]
    for b, n in enumerate(out["mel_lens"]):
        n = int(n)
        np.testing.assert_allclose(mel[b, :n], ref_mel[b, :n],
                                   rtol=1e-3, atol=2e-4,
                                   err_msg=f"mel item {b}")
        _assert_postnet_close(post[b], ref_post[b], n, T_ref, f"item {b}")


def _assert_postnet_close(got, ref, n, T_ref, msg):
    """Postnet outputs are batch-composition-dependent in the reference (its
    convs see other items' padding); exact parity holds for the longest item
    (and for any single-utterance batch), while shorter items may differ in
    their last ~10 frames (postnet receptive field)."""
    if n == T_ref:
        np.testing.assert_allclose(got[:n], ref[:n], rtol=1e-3, atol=2e-4,
                                   err_msg=f"postnet {msg}")
    else:
        clean = max(0, n - 11)
        np.testing.assert_allclose(got[:clean], ref[:clean],
                                   rtol=1e-3, atol=2e-4,
                                   err_msg=f"postnet {msg} (clean region)")
        np.testing.assert_allclose(got[:n], ref[:n], rtol=1.0, atol=0.25,
                                   err_msg=f"postnet {msg} (boundary)")


def test_inference_parity_with_controls():
    rng = np.random.RandomState(3)
    texts, src_lens, speakers = _common_inputs(rng)
    payload = dict(
        seed=11, postnet_dim=POSTNET_DIM, stats_dir=STATS_DIR, encoder_layer=ENC_LAYERS,
        decoder_layer=DEC_LAYERS, hidden=HIDDEN, filter=FILTER,
        max_seq_len=MAX_SEQ_LEN, n_speakers=N_SPEAKERS, use_cwt=False,
        texts=texts, src_lens=src_lens, speakers=speakers,
        p_control=1.3, e_control=0.7, d_control=1.4)
    out = run_oracle("reference_fs2", payload)
    state = {k[len("state__"):]: v for k, v in out.items()
             if k.startswith("state__")}
    model, variables = _build_flax(state)
    got = model.apply(
        variables, speakers, texts, src_lens, max_mel_len=MAX_SEQ_LEN,
        p_control=1.3, e_control=0.7, d_control=1.4, train=False)
    np.testing.assert_allclose(
        np.array(got["duration_rounded"]).astype(np.float32),
        out["duration_rounded"], rtol=0, atol=1e-5)
    np.testing.assert_array_equal(np.array(got["mel_lens"]), out["mel_lens"])
    ref_post = out["postnet_mel"]
    T_ref = ref_post.shape[1]
    post = np.array(got["postnet_mel"])[:, :T_ref]
    for b, n in enumerate(out["mel_lens"]):
        _assert_postnet_close(post[b], ref_post[b], int(n), T_ref, f"item {b}")


def test_teacher_forced_parity():
    rng = np.random.RandomState(5)
    texts, src_lens, speakers = _common_inputs(rng)
    B, L = texts.shape
    d_targets = rng.randint(0, 6, size=(B, L)).astype(np.int64)
    for b, n in enumerate(src_lens):
        d_targets[b, n:] = 0
    mel_lens = d_targets.sum(1)
    T = int(mel_lens.max())
    mels = rng.randn(B, T, 80).astype(np.float32)
    e_targets = rng.uniform(-1, 5, size=(B, L)).astype(np.float32)
    p_targets = rng.uniform(-2, 2, size=(B, L)).astype(np.float32)
    p_cwt = rng.randn(B, L, 11).astype(np.float32)

    payload = dict(
        seed=13, postnet_dim=POSTNET_DIM, stats_dir=STATS_DIR, encoder_layer=ENC_LAYERS,
        decoder_layer=DEC_LAYERS, hidden=HIDDEN, filter=FILTER,
        max_seq_len=MAX_SEQ_LEN, n_speakers=N_SPEAKERS, use_cwt=False,
        texts=texts, src_lens=src_lens, speakers=speakers,
        mels=mels, mel_lens=mel_lens, e_targets=e_targets,
        d_targets=d_targets, p_targets=p_targets, p_cwt=p_cwt,
        p_control=1.0, e_control=1.0, d_control=1.0)
    out = run_oracle("reference_fs2", payload)
    state = {k[len("state__"):]: v for k, v in out.items()
             if k.startswith("state__")}
    model, variables = _build_flax(state)

    got = model.apply(
        variables, speakers, texts, src_lens, max_mel_len=T,
        mel_lens=mel_lens, energy_targets=e_targets,
        duration_targets=d_targets, pitch_raw_targets=p_targets,
        train=False)

    np.testing.assert_allclose(
        np.array(got["pitch_prediction"]), out["pitch_prediction"],
        rtol=1e-4, atol=1e-4)
    ref_post = out["postnet_mel"]
    post = np.array(got["postnet_mel"])
    for b in range(B):
        _assert_postnet_close(post[b], ref_post[b], int(mel_lens[b]), T,
                              f"item {b}")
