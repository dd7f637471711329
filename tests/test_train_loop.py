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


@pytest.mark.slow
def test_train_on_mesh_and_resume_across_mesh_change(env, tmp_path):
    """Full train() driver over the virtual 8-device mesh (not just the
    train_step), then resume the checkpoint under a different mesh shape
    (dp=2 tp=1 -> dp=2 tp=2) — exercises sharded save/restore end to end."""
    import dataclasses

    from tts_king_tpu.config import (AcousticCheckpointConfig, MeshConfig,
                                     OptimizerConfig, StepConfig)
    from tts_king_tpu.train.loop import train

    cfg = dataclasses.replace(
        env,
        train=dataclasses.replace(
            env.train,
            ckpt_path=str(tmp_path / "ckpt"),
            result_path=str(tmp_path / "result"),
            optimizer=OptimizerConfig(batch_size=2, grad_acc_step=1),
            step=StepConfig(total_step=2, log_step=1, synth_step=100,
                            val_step=2, save_step=2)),
        mesh=MeshConfig(dp=2, tp=1),
        acoustic=AcousticCheckpointConfig(restore_step=0),
    )
    state = train(cfg, max_steps=2, use_mesh=True)
    assert int(state.step) == 2
    assert os.path.isdir(os.path.join(cfg.train.ckpt_path, "step_00000002"))

    # resume on a different mesh shape
    cfg2 = dataclasses.replace(
        cfg, mesh=MeshConfig(dp=2, tp=2),
        acoustic=AcousticCheckpointConfig(restore_step=2))
    state2 = train(cfg2, max_steps=3, use_mesh=True)
    assert int(state2.step) == 3


def test_train_rejects_unshardable_batch(env):
    """batch_size % dp != 0 must raise, not silently drop the mesh."""
    import dataclasses

    import pytest as _pytest

    from tts_king_tpu.config import AcousticCheckpointConfig, MeshConfig
    from tts_king_tpu.train.loop import train

    cfg = dataclasses.replace(env, mesh=MeshConfig(dp=8, tp=1),
                              acoustic=AcousticCheckpointConfig())
    with _pytest.raises(ValueError, match="does not shard evenly"):
        train(cfg, max_steps=1, use_mesh=True)


def test_synth_preview_writes_outputs(env, tmp_path):
    """synth_step cadence renders a val sample end to end: mel plot (.png)
    + vocoded waveform (.wav) per preview step (tools.synth_one_sample
    parity, fs_two/utils/tools.py:141-206)."""
    import dataclasses

    from tts_king_tpu.config import (AcousticCheckpointConfig, StepConfig,
                                     micro_config)
    from tts_king_tpu.pipeline import Vocoder
    from tts_king_tpu.train.loop import train

    cfg = dataclasses.replace(
        env,
        train=dataclasses.replace(
            env.train,
            ckpt_path=str(tmp_path / "ckpt"),
            result_path=str(tmp_path / "result"),
            step=StepConfig(total_step=2, log_step=10, synth_step=1,
                            val_step=100, save_step=100)),
        vocoder=micro_config().vocoder,
        acoustic=AcousticCheckpointConfig(restore_step=0))
    vocoder = Vocoder(cfg)
    train(cfg, max_steps=2, use_mesh=False, vocoder=vocoder)
    for step in (1, 2):
        assert os.path.exists(
            os.path.join(cfg.train.result_path, f"step_{step}.png"))
        wav = os.path.join(cfg.train.result_path, f"step_{step}.wav")
        assert os.path.exists(wav) and os.path.getsize(wav) > 44


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
