"""FastSpeech2 training driver (train.py:78-235 equivalent, TPU-native).

One compiled train step per padded shape (grad accumulation inside the jit),
DP(+TP) over a device mesh, periodic validation / checkpoint / synthesis
preview, structured metrics. Fixes the reference's resume bug by restoring
optimizer state (SURVEY.md §5.4).
"""

import json
import os
import time
from typing import Optional

import jax
import numpy as np

from tts_king_tpu.config import TTSConfig
from tts_king_tpu.checkpoint import restore_train_state, save_train_state
from tts_king_tpu.data.dataset import FS2Dataset
from tts_king_tpu.models.fs2 import build_fastspeech2
from tts_king_tpu.parallel.mesh import (batch_specs, build_mesh,
                                        fs2_param_specs, make_shardings,
                                        shard_train_state)
from tts_king_tpu.train.evaluate import evaluate
from tts_king_tpu.train.state import create_train_state, make_optimizer
from tts_king_tpu.train.step import make_eval_step, make_train_step
from tts_king_tpu.utils.logging import MetricsLogger


def train(cfg: TTSConfig, max_steps: Optional[int] = None,
          use_mesh: bool = True, vocoder=None):
    """Run FS2 training from a preprocessed corpus. Returns final state."""
    pp = cfg.preprocess
    tc = cfg.train
    root = pp.preprocessed_path

    with open(os.path.join(root, "stats.json")) as f:
        stats = json.load(f)
    with open(os.path.join(root, "speakers.json")) as f:
        n_speakers = len(json.load(f))

    train_ds = FS2Dataset("train.txt", pp, tc, max_mel_len=cfg.model.max_seq_len)
    val_ds = FS2Dataset("val.txt", pp, tc, drop_last=False,
                        apply_masking=False,
                        max_mel_len=cfg.model.max_seq_len)

    model = build_fastspeech2(cfg.model, stats, n_speakers,
                              pp.mel.n_mel_channels)
    optimizer = make_optimizer(tc.optimizer, cfg.model.transformer.encoder_hidden)

    rng = jax.random.PRNGKey(tc.seed)
    sample = next(iter(train_ds.epoch_superbatches(seed=0)), None)
    if sample is None:
        raise RuntimeError("training set produced no batches")
    state = create_train_state(
        model, optimizer, rng,
        (sample["speakers"][0], sample["texts"][0], sample["src_lens"][0]),
        start_step=cfg.acoustic.restore_step)

    ckpt_dir = tc.ckpt_path
    if cfg.acoustic.restore_step and os.path.isdir(ckpt_dir):
        from flax.serialization import from_state_dict

        payload = restore_train_state(ckpt_dir, cfg.acoustic.restore_step)
        # Restores optimizer state too — the reference saved but never
        # re-loaded it (fs_two/model/optimizer.py:32-33 has no call site).
        state = state.replace(
            params=payload["params"], batch_stats=payload["batch_stats"],
            opt_state=from_state_dict(state.opt_state, payload["opt_state"]),
            step=jax.numpy.asarray(payload["step"], jax.numpy.int32))

    mesh = None
    if use_mesh and len(jax.devices()) > 1:
        mesh = build_mesh(dp=cfg.mesh.dp, tp=cfg.mesh.tp)
        dp = mesh.shape["dp"]
        if tc.optimizer.batch_size % dp:
            # Fail loudly: silently falling back to one device would cost
            # the user dp-times throughput without a word.
            raise ValueError(
                f"batch_size={tc.optimizer.batch_size} does not shard "
                f"evenly over the data axis (dp={dp}). Pick a batch_size "
                f"divisible by dp, set mesh.dp to a divisor of the batch "
                f"size, or pass use_mesh=False to train single-device.")
        state = shard_train_state(state, mesh, optimizer,
                                  fs2_param_specs(state.params))

    train_step = jax.jit(make_train_step(model, optimizer, cfg.model.use_cwt))
    eval_step = jax.jit(make_eval_step(model, cfg.model.use_cwt))

    logger = MetricsLogger(tc.result_path, cfg.exp_name,
                           cfg.logger.wandb_key, cfg.logger.offline)
    os.makedirs(tc.ckpt_path, exist_ok=True)

    if cfg.run_debug_eval:
        val = evaluate(eval_step, state, val_ds, max_batches=4)
        logger.log_losses(int(state.step), val, prefix="val")

    total = max_steps if max_steps is not None else tc.step.total_step
    step = int(state.step)
    epoch = 0
    t_last = time.time()
    done = False
    try:
        state, step = _run_epochs(
            cfg, state, step, total, epoch, train_ds, val_ds, train_step,
            eval_step, logger, rng, mesh, vocoder, model, t_last)
    except (KeyboardInterrupt, Exception):
        # Failure containment (the reference has none, SURVEY.md §5.3):
        # persist an emergency checkpoint so the run is resumable, then
        # re-raise for visibility.
        try:
            # device arrays go straight to orbax: on a multi-host mesh,
            # device_get of non-addressable shards would fail, and orbax
            # coordinates sharded saves natively (scripts/multihost_smoke.py)
            save_train_state(tc.ckpt_path, step, state.variables(),
                             state.opt_state)
            logger.log(step, {"emergency_checkpoint": 1.0}, prefix="failure")
        finally:
            logger.close()
        raise
    save_train_state(tc.ckpt_path, step, state.variables(), state.opt_state)
    logger.close()
    return state


def _run_epochs(cfg, state, step, total, epoch, train_ds, val_ds, train_step,
                eval_step, logger, rng, mesh, vocoder, model, t_last):
    tc = cfg.train
    done = False
    while not done:
        epoch += 1
        for superbatch in train_ds.epoch_superbatches(seed=tc.seed + epoch):
            if mesh is not None:
                superbatch = jax.device_put(
                    superbatch,
                    make_shardings(mesh, batch_specs(superbatch, True)))
            rng, step_rng = jax.random.split(rng)
            state, losses = train_step(state, superbatch, step_rng)
            step += 1

            if step % tc.step.log_step == 0:
                dt = (time.time() - t_last) / tc.step.log_step
                t_last = time.time()
                logger.log_losses(step, losses, prefix="train",
                                  extra={"sec_per_step": dt, "epoch": epoch})
            if step % tc.step.val_step == 0:
                val = evaluate(eval_step, state, val_ds)
                logger.log_losses(step, val, prefix="val")
            if step % tc.step.synth_step == 0 and vocoder is not None:
                _synth_preview(cfg, model, state, val_ds, vocoder, step)
            if step % tc.step.save_step == 0:
                save_train_state(tc.ckpt_path, step, state.variables(),
                                 state.opt_state)
            if step >= total:
                done = True
                break
    return state, step


def _synth_preview(cfg, model, state, val_ds, vocoder, step):
    """Synthesize one validation sample, save wav + mel plot
    (tools.synth_one_sample equivalent, fs_two/utils/tools.py:141-206)."""
    from scipy.io import wavfile

    from tts_king_tpu.utils.plotting import plot_mel

    batch = next(iter(val_ds.batches(seed=step, batch_size=1)), None)
    if batch is None:
        return
    out = model.apply(
        state.variables(), batch["speakers"], batch["texts"],
        batch["src_lens"], max_mel_len=cfg.model.max_seq_len, train=False)
    n = int(np.asarray(out["mel_lens"])[0])
    mel_pred = np.asarray(out["postnet_mel"])[0, :n]
    gt_n = int(batch["mel_lens"][0])
    mel_gt = batch["mels"][0, :gt_n]

    os.makedirs(cfg.train.result_path, exist_ok=True)
    with open(os.path.join(cfg.preprocess.preprocessed_path, "stats.json")) as f:
        st = json.load(f)
    stats = st["pitch"] + st["energy"][:2]
    fig = plot_mel(
        [(mel_pred.T, np.zeros(n), np.zeros(n)),
         (mel_gt.T, np.zeros(gt_n), np.zeros(gt_n))],
        stats, ["Synthesized", "Ground truth"])
    fig.savefig(os.path.join(cfg.train.result_path, f"step_{step}.png"))
    import matplotlib.pyplot as plt

    plt.close(fig)

    if vocoder is not None:
        wavs = vocoder.generate(mel_pred[None], lengths=[n * cfg.preprocess.stft.hop_length])
        wavfile.write(
            os.path.join(cfg.train.result_path, f"step_{step}.wav"),
            cfg.preprocess.audio.sampling_rate, wavs[0])
