"""Training convergence: a tiny FS2 trained on the synthetic corpus for a
few dozen steps must reduce both training and validation loss — the
end-to-end "does learning work" check (the reference's only regression
mechanism was watching val loss fall, SURVEY.md §4)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from tests.test_data_pipeline import _make_corpus


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    from tts_king_tpu.config import (
        ModelConfig, OptimizerConfig, PreprocessConfig, StepConfig,
        TrainConfig, TransformerConfig, TTSConfig, VariancePredictorConfig)
    from tts_king_tpu.data.features import Preprocessor

    root = tmp_path_factory.mktemp("conv")
    raw = str(root / "raw")
    os.makedirs(raw)
    _make_corpus(raw)
    pp = PreprocessConfig(raw_path=raw,
                          preprocessed_path=str(root / "processed"),
                          val_size=1)
    Preprocessor(pp, batch_size=4).build_from_path()
    return TTSConfig(
        preprocess=pp,
        model=ModelConfig(
            transformer=TransformerConfig(
                encoder_layer=1, encoder_head=2, encoder_hidden=16,
                variance_hidden=16, decoder_layer=1, decoder_head=2,
                decoder_hidden=16, conv_filter_size=32),
            variance_predictor=VariancePredictorConfig(filter_size=16),
            max_seq_len=96),
        train=TrainConfig(
            ckpt_path=str(root / "ckpt"), result_path=str(root / "result"),
            optimizer=OptimizerConfig(batch_size=1, grad_acc_step=2,
                                      warm_up_step=50),
            step=StepConfig(total_step=100000, log_step=1000,
                            synth_step=100000, val_step=100000,
                            save_step=100000),
            max_masks_per_sentence=0.0),
    )


def test_training_reduces_losses(cfg):
    import jax
    import json

    from tts_king_tpu.data.dataset import FS2Dataset
    from tts_king_tpu.models.fs2 import build_fastspeech2
    from tts_king_tpu.train.evaluate import evaluate
    from tts_king_tpu.train.state import create_train_state, make_optimizer
    from tts_king_tpu.train.step import make_eval_step, make_train_step

    root = cfg.preprocess.preprocessed_path
    with open(os.path.join(root, "stats.json")) as f:
        stats = json.load(f)
    model = build_fastspeech2(cfg.model, stats, n_speakers=2)
    opt = make_optimizer(cfg.train.optimizer, 16)

    train_ds = FS2Dataset("train.txt", cfg.preprocess, cfg.train,
                          max_mel_len=96)
    val_ds = FS2Dataset("val.txt", cfg.preprocess, cfg.train,
                        drop_last=False, apply_masking=False, max_mel_len=96)
    sb0 = next(iter(train_ds.epoch_superbatches(seed=0)))
    state = create_train_state(
        model, opt, jax.random.PRNGKey(0),
        (sb0["speakers"][0], sb0["texts"][0], sb0["src_lens"][0]))

    train_step = jax.jit(make_train_step(model, opt))
    eval_step = jax.jit(make_eval_step(model))

    val0 = evaluate(eval_step, state, val_ds)
    rng = jax.random.PRNGKey(1)
    first = None
    losses = None
    for epoch in range(40):
        for sb in train_ds.epoch_superbatches(seed=epoch):
            rng, r = jax.random.split(rng)
            state, losses = train_step(state, sb, r)
            if first is None:
                first = float(losses.total)
    assert int(state.step) >= 40
    assert float(losses.total) < first, (first, float(losses.total))
    val1 = evaluate(eval_step, state, val_ds)
    # teacher-forced validation loss must drop substantially from random init
    assert val1.total < val0.total * 0.8, (val0.total, val1.total)
    assert val1.mel < val0.mel
    assert np.isfinite(val1.total)
