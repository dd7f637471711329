"""Full-size (shipped-dims) parity vs the reference torch implementation.

The micro parity suite (test_parity_fs2.py, d=32) can miss head-splitting,
bin-count and converter-layout bugs that only appear at real dimensions.
These tests run the EXACT shipped configuration — FS2 d=256, 4L/2H encoder +
6L/2H decoder, conv filter 1024, vocab 207, 512-channel PostNet, bins from
the shipped stats.json (/root/reference/config.yaml:96-122) and HiFi-GAN
512ch x (8,8,2,2), k=(16,16,4,4), MRF kernels (3,7,11)
(/root/reference/config.yaml:25-29) — through the full converter path.

Weights are regenerated on both sides from (state-dict key, shape) via
tests/det_weights.py, so the committed replay fixture holds only outputs +
shapes (<1MB) instead of ~35M parameters; the converter still consumes a
complete torch-layout state dict at real scale.

Tolerances: mel atol 2e-3 (f32 CPU, ~40 matmul-deep compositions) — two
orders of magnitude inside BASELINE.md's MAE < 1e-2 parity bar.
"""

import json
import os

import numpy as np
import pytest

import tests.conftest as cf
from tests.det_weights import det_state_dict
from tests.oracle_util import run_oracle

# Slow tier: full-size (shipped-dims) parity is the heavyweight cross-check
# of the fast tier's small-shape parity tests (test_parity_fs2.py etc.).
# Run directly with:  pytest tests/test_parity_fullsize.py -m ""
pytestmark = pytest.mark.slow

pytestmark = pytest.mark.skipif(
    not cf.oracle_available(),
    reason="reference tree not mounted and no oracle recordings")

HIDDEN = 256
FILTER = 1024
ENC_LAYERS = 4
DEC_LAYERS = 6
MAX_SEQ_LEN = 1000
N_SPEAKERS = 66  # shipped speakers.json entry count
STATS_DIR = cf.pretrained_dir()
DET_SEED = 2


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
        use_cwt=False, multi_speaker=True, max_seq_len=MAX_SEQ_LEN)


def _build_flax(out):
    from tts_king_tpu.checkpoint import convert_fs2_state
    from tts_king_tpu.models.fs2 import build_fastspeech2

    names_shapes = [(k[len("shape__"):], tuple(int(x) for x in out[k]))
                    for k in out if isinstance(k, str)
                    and k.startswith("shape__")]
    assert len(names_shapes) > 100, "full-size state spec looks truncated"
    state = det_state_dict(names_shapes, seed=DET_SEED)
    # sanity: the regenerated spec really is the full-size layout
    assert state["encoder.src_word_emb.weight"].shape == (207, HIDDEN)
    assert state["decoder.layer_stack.5.pos_ffn.w_1.weight"].shape == (
        FILTER, HIDDEN, 9)
    assert state["postnet.convolutions.1.0.conv.weight"].shape == (
        512, 512, 5)

    with open(os.path.join(STATS_DIR, "stats.json")) as f:
        stats = json.load(f)
    model = build_fastspeech2(_model_config(), stats, N_SPEAKERS)
    variables = convert_fs2_state(state, ENC_LAYERS, DEC_LAYERS,
                                  use_cwt=False)
    return model, variables


def _inputs(rng, B=2, L=40):
    texts = rng.randint(1, 206, size=(B, L)).astype(np.int64)
    src_lens = np.array([L, L - 13], np.int64)[:B]
    for b, n in enumerate(src_lens):
        texts[b, n:] = 0
    speakers = rng.randint(0, N_SPEAKERS, size=(B,)).astype(np.int64)
    return texts, src_lens, speakers


@pytest.fixture(scope="module")
def oracle_fullsize():
    rng = np.random.RandomState(420)
    texts, src_lens, speakers = _inputs(rng)
    payload = dict(
        seed=7, det_weights=DET_SEED, stats_dir=STATS_DIR,
        encoder_layer=ENC_LAYERS, decoder_layer=DEC_LAYERS, hidden=HIDDEN,
        filter=FILTER, max_seq_len=MAX_SEQ_LEN, n_speakers=N_SPEAKERS,
        use_cwt=False, texts=texts, src_lens=src_lens, speakers=speakers,
        p_control=1.0, e_control=1.0, d_control=1.0)
    out = run_oracle("reference_fs2", payload)
    out["_inputs"] = (texts, src_lens, speakers)
    return out


def test_parity_fs2_fullsize(oracle_fullsize):
    out = oracle_fullsize
    texts, src_lens, speakers = out["_inputs"]
    model, variables = _build_flax(out)

    T_ref = out["mel"].shape[1]
    assert 16 <= T_ref <= 384, f"unexpected oracle mel length {T_ref}"
    got = model.apply(
        variables, speakers, texts, src_lens, max_mel_len=384, train=False)

    np.testing.assert_allclose(
        np.array(got["log_duration_prediction"]),
        out["log_duration_prediction"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.array(got["pitch_prediction"]), out["pitch_prediction"],
        rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.array(got["energy_prediction"]), out["energy_prediction"],
        rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.array(got["duration_rounded"]).astype(np.float32),
        out["duration_rounded"], rtol=0, atol=1e-5)
    np.testing.assert_array_equal(np.array(got["mel_lens"]), out["mel_lens"])

    mel = np.array(got["mel"])[:, :T_ref]
    post = np.array(got["postnet_mel"])[:, :T_ref]
    for b, n in enumerate(out["mel_lens"]):
        n = int(n)
        np.testing.assert_allclose(mel[b, :n], out["mel"][b, :n],
                                   rtol=1e-3, atol=2e-3,
                                   err_msg=f"mel item {b}")
        _assert_postnet_fullsize(post[b], out["postnet_mel"][b], n, T_ref,
                                 f"item {b}")


def _assert_postnet_fullsize(got, ref, n, T_ref, msg):
    """Postnet outputs are batch-composition-dependent in the reference (its
    unmasked convs see other items' padding, test_parity_fs2.py has the full
    analysis): exact parity holds for the longest item; shorter items get
    full tolerance on the clean region (last ~11 frames = postnet receptive
    field excluded) plus the BASELINE MAE bar there."""
    if n == T_ref:
        clean = n
    else:
        clean = max(0, n - 11)
        np.testing.assert_allclose(got[:n], ref[:n], rtol=1.0, atol=0.5,
                                   err_msg=f"postnet {msg} (boundary)")
    np.testing.assert_allclose(got[:clean], ref[:clean],
                               rtol=1e-3, atol=2e-3,
                               err_msg=f"postnet {msg} (clean region)")
    mae = float(np.mean(np.abs(got[:clean] - ref[:clean])))
    assert mae < 1e-2, f"postnet MAE {mae} {msg} (BASELINE bar 1e-2)"


def test_parity_fs2_fullsize_teacher_forced():
    rng = np.random.RandomState(77)
    texts, src_lens, speakers = _inputs(rng)
    B, L = texts.shape
    d_targets = rng.randint(0, 5, size=(B, L)).astype(np.int64)
    for b, n in enumerate(src_lens):
        d_targets[b, n:] = 0
    mel_lens = d_targets.sum(1)
    T = int(mel_lens.max())
    mels = rng.randn(B, T, 80).astype(np.float32)
    e_targets = rng.uniform(-1, 5, size=(B, L)).astype(np.float32)
    p_targets = rng.uniform(-2, 2, size=(B, L)).astype(np.float32)
    p_cwt = rng.randn(B, L, 11).astype(np.float32)

    payload = dict(
        seed=7, det_weights=DET_SEED, stats_dir=STATS_DIR,
        encoder_layer=ENC_LAYERS, decoder_layer=DEC_LAYERS, hidden=HIDDEN,
        filter=FILTER, max_seq_len=MAX_SEQ_LEN, n_speakers=N_SPEAKERS,
        use_cwt=False, texts=texts, src_lens=src_lens, speakers=speakers,
        mels=mels, mel_lens=mel_lens, e_targets=e_targets,
        d_targets=d_targets, p_targets=p_targets, p_cwt=p_cwt,
        p_control=1.0, e_control=1.0, d_control=1.0)
    out = run_oracle("reference_fs2", payload)
    model, variables = _build_flax(out)

    got = model.apply(
        variables, speakers, texts, src_lens, max_mel_len=T,
        mel_lens=mel_lens, energy_targets=e_targets,
        duration_targets=d_targets, pitch_raw_targets=p_targets,
        train=False)

    np.testing.assert_allclose(
        np.array(got["pitch_prediction"]), out["pitch_prediction"],
        rtol=1e-3, atol=1e-4)
    post = np.array(got["postnet_mel"])
    for b in range(B):
        _assert_postnet_fullsize(post[b], out["postnet_mel"][b],
                                 int(mel_lens[b]), T, f"tf item {b}")


def test_parity_hifigan_fullsize():
    """Shipped HiFi-GAN V1: 512ch, x(8,8,2,2), k=(16,16,4,4), MRF (3,7,11)."""
    from tts_king_tpu.checkpoint import convert_hifigan_generator
    from tts_king_tpu.config import VocoderModelConfig
    from tts_king_tpu.models.hifigan import Generator

    cfg = VocoderModelConfig(
        resblock="1",
        upsample_rates=[8, 8, 2, 2],
        upsample_kernel_sizes=[16, 16, 4, 4],
        upsample_initial_channel=512,
        resblock_kernel_sizes=[3, 7, 11],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        num_mels=80)
    rng = np.random.RandomState(9)
    B, T = 1, 23
    mel = (rng.randn(B, 80, T) * 2.0 - 4.0).astype(np.float32)

    out = run_oracle("reference_hifigan", dict(
        seed=3, det_weights=DET_SEED, resblock=cfg.resblock,
        upsample_rates=np.array(cfg.upsample_rates),
        upsample_kernel_sizes=np.array(cfg.upsample_kernel_sizes),
        upsample_initial_channel=cfg.upsample_initial_channel,
        resblock_kernel_sizes=np.array(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=np.array(cfg.resblock_dilation_sizes),
        mel=mel))

    names_shapes = [(k[len("shape__"):], tuple(int(x) for x in out[k]))
                    for k in out if isinstance(k, str)
                    and k.startswith("shape__")]
    state = det_state_dict(names_shapes, seed=DET_SEED)
    assert state["conv_pre.weight_v"].shape == (512, 80, 7)
    assert state["ups.0.weight_v"].shape == (512, 256, 16)
    assert len([k for k in state if k.startswith("resblocks.")]) == \
        4 * 3 * (3 + 3) * 3  # 4 stages x 3 kernels x 6 convs x (g,v,bias)

    variables = convert_hifigan_generator(
        state, n_ups=4, n_kernels=3)
    model = Generator(cfg)
    wav = np.array(model.apply(variables, mel.transpose(0, 2, 1)))

    ref_wav = out["wav"][:, 0, :]
    assert wav.shape == ref_wav.shape
    assert wav.shape[1] == T * 256  # hop length: full upsample chain
    np.testing.assert_allclose(wav, ref_wav, rtol=1e-3, atol=2e-4)
    mae = float(np.mean(np.abs(wav - ref_wav)))
    assert mae < 1e-4, f"waveform MAE {mae}"
