"""Failure containment: a crash mid-training must leave a resumable
emergency checkpoint (the reference had no failure story, SURVEY.md §5.3);
and the native npy loader must produce byte-identical batches to the python
path."""

import os

import numpy as np
import pytest

from tests.test_train_loop import env  # noqa: F401  (fixture: corpus+cfg)


def test_emergency_checkpoint_on_crash(env, monkeypatch):  # noqa: F811
    import dataclasses

    import tts_king_tpu.train.loop as loop_mod
    from tts_king_tpu.checkpoint import restore_train_state

    cfg = env
    ckpt = cfg.train.ckpt_path + "_crash"
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ckpt_path=ckpt),
        acoustic=dataclasses.replace(cfg.acoustic, restore_step=0))

    def boom(*a, **k):
        raise RuntimeError("injected failure")

    monkeypatch.setattr(loop_mod, "_run_epochs", boom)
    with pytest.raises(RuntimeError, match="injected failure"):
        loop_mod.train(cfg, max_steps=5, use_mesh=False)

    payload = restore_train_state(ckpt)  # emergency checkpoint exists
    assert "params" in payload and payload["params"]
    metrics = os.path.join(cfg.train.result_path, "multi.metrics.jsonl")
    assert '"phase": "failure"' in open(metrics).read()


def test_native_loader_matches_python_path(env):  # noqa: F811
    from tts_king_tpu import native
    from tts_king_tpu.data.dataset import FS2Dataset

    if not native.available():
        pytest.skip("native toolchain unavailable")
    cfg = env
    kw = dict(sort=True, drop_last=False, max_mel_len=96, apply_masking=False)
    ds_native = FS2Dataset("train.txt", cfg.preprocess, cfg.train,
                           use_native_loader=True, **kw)
    ds_python = FS2Dataset("train.txt", cfg.preprocess, cfg.train,
                           use_native_loader=False, **kw)
    sb_n = list(ds_native.epoch_superbatches(seed=3))
    sb_p = list(ds_python.epoch_superbatches(seed=3))
    assert len(sb_n) == len(sb_p) and sb_n
    for a, b in zip(sb_n, sb_p):
        assert set(a) == set(b)
        for key in a:
            if key == "mels":
                # padding quanta may differ; compare the common frames
                T = min(a[key].shape[2], b[key].shape[2])
                np.testing.assert_allclose(a[key][:, :, :T], b[key][:, :, :T],
                                           rtol=0, atol=0, err_msg=key)
            else:
                np.testing.assert_allclose(a[key], b[key], rtol=0, atol=0,
                                           err_msg=key)


def test_emergency_checkpoint_saves_progress(env, monkeypatch):  # noqa: F811
    """A crash MID-training persists the last completed (state, step) —
    not the state captured before the loop started (which would silently
    save zero progress past try-entry)."""
    import dataclasses

    import tts_king_tpu.parallel.lockstep as ls
    import tts_king_tpu.train.loop as loop_mod
    from tts_king_tpu.checkpoint import restore_train_state

    cfg = env
    ckpt = cfg.train.ckpt_path + "_midcrash"
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ckpt_path=ckpt))

    orig = ls.maybe_lockstep

    def patched(jitted, name):
        fn = orig(jitted, name)
        if name != "train_step":
            return fn
        calls = {"n": 0}

        def wrapper(*args):
            if calls["n"] >= 3:
                raise RuntimeError("injected mid-run failure")
            calls["n"] += 1
            return fn(*args)

        return wrapper

    monkeypatch.setattr(ls, "maybe_lockstep", patched)
    with pytest.raises(RuntimeError, match="injected mid-run"):
        loop_mod.train(cfg, max_steps=10, use_mesh=False)
    payload = restore_train_state(ckpt)
    assert int(payload["step"]) == 3, "emergency save lost training progress"


def test_restore_step_without_checkpoint_fails_loudly(env):  # noqa: F811
    """restore_step pointing at a missing checkpoint dir raises instead of
    silently training from random weights with a mid-run step counter."""
    import dataclasses

    from tts_king_tpu.train.loop import train

    cfg = env
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(cfg.train,
                                  ckpt_path=cfg.train.ckpt_path + "_nodir"),
        acoustic=dataclasses.replace(cfg.acoustic, restore_step=100))
    with pytest.raises(FileNotFoundError, match="restore_step=100"):
        train(cfg, max_steps=1, use_mesh=False)
