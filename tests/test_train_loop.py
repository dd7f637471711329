"""Full training-loop integration: synthetic corpus -> train() for a few
steps -> checkpoint -> resume -> evaluate. Exercises the driver end to end,
including the resume path that restores optimizer state."""

import os

import numpy as np
import pytest

from tests.test_data_pipeline import _make_corpus


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from tts_king_tpu.config import (
        AcousticCheckpointConfig, MeshConfig, ModelConfig, OptimizerConfig,
        PreprocessConfig, StepConfig, TrainConfig, TransformerConfig, TTSConfig,
        VariancePredictorConfig)
    from tts_king_tpu.data.features import Preprocessor

    root = tmp_path_factory.mktemp("looptest")
    raw = str(root / "raw")
    processed = str(root / "processed")
    os.makedirs(raw)
    _make_corpus(raw)
    pp = PreprocessConfig(raw_path=raw, preprocessed_path=processed, val_size=1)
    Preprocessor(pp, batch_size=4).build_from_path()

    cfg = TTSConfig(
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
            optimizer=OptimizerConfig(batch_size=1, grad_acc_step=2),
            step=StepConfig(total_step=4, log_step=2, synth_step=100,
                            val_step=2, save_step=2)),
    )
    return cfg


def test_train_and_resume(env):
    from tts_king_tpu.train.loop import train

    cfg = env
    state = train(cfg, max_steps=3, use_mesh=False)
    assert int(state.step) == 3
    # checkpoints written at step 2 and final 3
    assert os.path.isdir(os.path.join(cfg.train.ckpt_path, "step_00000002"))
    assert os.path.isdir(os.path.join(cfg.train.ckpt_path, "step_00000003"))
    # metrics written
    metrics = os.path.join(cfg.train.result_path, "multi.metrics.jsonl")
    assert os.path.exists(metrics)
    content = open(metrics).read()
    assert '"phase": "val"' in content and '"phase": "train"' in content

    # resume from step 2 and take one more step
    cfg.acoustic.restore_step = 2
    state2 = train(cfg, max_steps=3, use_mesh=False)
    assert int(state2.step) == 3


def test_checkpoint_roundtrip(env, tmp_path):
    import jax

    from tts_king_tpu.checkpoint import restore_train_state, save_train_state
    from tests.test_train import _tiny_setup

    model, opt, state, mc = _tiny_setup()
    save_train_state(str(tmp_path), 7, jax.device_get(state.variables()),
                     jax.device_get(state.opt_state))
    payload = restore_train_state(str(tmp_path))  # picks latest
    assert int(payload["step"]) == 7
    # split-speaker-embedding convention: re-injected on restore
    assert "speaker_emb" in payload["params"]
    flat_a = jax.tree.leaves(state.params)
    flat_b = jax.tree.leaves(payload["params"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
