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
from tts_king_tpu.parallel.mesh import (build_mesh, fs2_param_specs,
                                        globalize_batch, globalize_like,
                                        shard_train_state)
from tts_king_tpu.train.evaluate import evaluate
from tts_king_tpu.train.state import (create_sharded_train_state,
                                      create_train_state, make_optimizer)
from tts_king_tpu.train.step import make_eval_step, make_train_step
from tts_king_tpu.utils.logging import MetricsLogger


def train(cfg: TTSConfig, max_steps: Optional[int] = None,
          use_mesh: bool = True, vocoder=None):
    """Run FS2 training from a preprocessed corpus. Returns final state.

    Multi-host: when launched under jax.distributed (process_count > 1,
    see scripts/train.py --distributed), each process loads a disjoint row
    block of every batch (FS2Dataset shard=...), batches are assembled into
    global arrays without cross-host copies, state lives sharded on the
    global mesh, and orbax coordinates checkpoint save/restore across
    processes. Replaces the reference's single-device train.py:78-235 with
    a pod-scale driver.
    """
    pp = cfg.preprocess
    tc = cfg.train
    root = pp.preprocessed_path

    n_proc = jax.process_count()
    distributed = n_proc > 1
    shard = (jax.process_index(), n_proc)

    with open(os.path.join(root, "stats.json")) as f:
        stats = json.load(f)
    with open(os.path.join(root, "speakers.json")) as f:
        n_speakers = len(json.load(f))

    train_ds = FS2Dataset("train.txt", pp, tc,
                          max_mel_len=cfg.model.max_seq_len, shard=shard)
    val_ds = FS2Dataset("val.txt", pp, tc, drop_last=False,
                        apply_masking=False,
                        max_mel_len=cfg.model.max_seq_len, shard=shard)

    model = build_fastspeech2(cfg.model, stats, n_speakers,
                              pp.mel.n_mel_channels)
    optimizer = make_optimizer(tc.optimizer, cfg.model.transformer.encoder_hidden)

    mesh = None
    if distributed:
        if not use_mesh:
            raise ValueError("multi-process training requires use_mesh=True")
        mesh = build_mesh(dp=cfg.mesh.dp, tp=cfg.mesh.tp)
        tp = mesh.shape["tp"]
        if len(jax.local_devices()) % tp:
            raise ValueError(
                f"tp={tp} must divide the {len(jax.local_devices())} local "
                f"devices per process so tp stays inside a host (ICI) and "
                f"the dp axis crosses hosts in contiguous blocks.")
        if mesh.shape["dp"] % n_proc:
            raise ValueError(
                f"dp={mesh.shape['dp']} must be a multiple of the "
                f"{n_proc} processes for per-process batch sharding.")
    elif use_mesh and len(jax.devices()) > 1:
        mesh = build_mesh(dp=cfg.mesh.dp, tp=cfg.mesh.tp)
    if mesh is not None and tc.optimizer.batch_size % mesh.shape["dp"]:
        # Fail loudly: silently falling back to one device would cost
        # the user dp-times throughput without a word.
        raise ValueError(
            f"batch_size={tc.optimizer.batch_size} does not shard "
            f"evenly over the data axis (dp={mesh.shape['dp']}). Pick a "
            f"batch_size divisible by dp, set mesh.dp to a divisor of the "
            f"batch size, or pass use_mesh=False to train single-device.")

    if distributed:
        _startup_rendezvous()

    rng = jax.random.PRNGKey(tc.seed)
    if train_ds.superbatches_per_epoch() == 0:
        raise RuntimeError(
            f"training set produces no batches: {len(train_ds.meta)} "
            f"utterances < batch_size*group_size = "
            f"{tc.optimizer.batch_size * tc.optimizer.grad_acc_step}")
    # init needs argument shapes/dtypes only — synthetic zeros avoid
    # loading a full superbatch of feature payloads before training starts
    b0, l0 = 1, 8
    sample_args = (np.zeros((b0,), np.int32),
                   np.zeros((b0, l0), np.int32),
                   np.full((b0,), l0, np.int32))
    if distributed:
        state, _ = create_sharded_train_state(
            model, optimizer, rng, sample_args, mesh,
            start_step=cfg.acoustic.restore_step)
    else:
        state = create_train_state(model, optimizer, rng, sample_args,
                                   start_step=cfg.acoustic.restore_step)

    ckpt_dir = tc.ckpt_path
    if cfg.acoustic.restore_step and not os.path.isdir(ckpt_dir):
        # fail loudly: silently training from random weights while the
        # step counter claims a resume would look like a successful run
        raise FileNotFoundError(
            f"restore_step={cfg.acoustic.restore_step} but checkpoint "
            f"directory {ckpt_dir!r} does not exist")
    if cfg.acoustic.restore_step:
        from flax.serialization import from_state_dict

        payload = restore_train_state(ckpt_dir, cfg.acoustic.restore_step)
        # Restores optimizer state too — the reference saved but never
        # re-loaded it (fs_two/model/optimizer.py:32-33 has no call site).
        if distributed:
            # Orbax returns full host arrays in every process; re-shard them
            # onto the global mesh (each process contributes the shards its
            # devices own).
            state = state.replace(
                params=globalize_like(state.params, payload["params"]),
                batch_stats=globalize_like(state.batch_stats,
                                           payload["batch_stats"]),
                opt_state=globalize_like(
                    state.opt_state,
                    from_state_dict(state.opt_state, payload["opt_state"])),
                step=globalize_like(state.step,
                                    np.asarray(payload["step"], np.int32)))
        else:
            state = state.replace(
                params=payload["params"], batch_stats=payload["batch_stats"],
                opt_state=from_state_dict(state.opt_state, payload["opt_state"]),
                step=jax.numpy.asarray(payload["step"], jax.numpy.int32))

    if mesh is not None and not distributed:
        state = shard_train_state(state, mesh, optimizer,
                                  fs2_param_specs(state.params))

    # Multi-process CPU (Gloo) runs: first dispatch of each new program
    # shape is compiled + rendezvoused + warmed in lockstep, or a peer
    # still compiling can miss a new Gloo clique's hardcoded 30 s context
    # init window (parallel/lockstep.py has the full story). Identity on
    # single-process and TPU-pod runs.
    from tts_king_tpu.parallel.lockstep import maybe_lockstep

    # donate_argnums: the loop rebinds state every step, so the old
    # params+Adam buffers are dead after the call — donation halves the
    # optimizer-state peak memory (no-op where the backend lacks it)
    train_step = maybe_lockstep(
        jax.jit(make_train_step(model, optimizer, cfg.model.use_cwt),
                donate_argnums=(0,)),
        "train_step")
    eval_step = maybe_lockstep(
        jax.jit(make_eval_step(model, cfg.model.use_cwt)), "eval_step")

    # Only process 0 writes metrics; all processes still run every
    # computation (collectives need all participants).
    if jax.process_index() == 0:
        logger = MetricsLogger(tc.result_path, cfg.exp_name,
                               cfg.logger.wandb_key, cfg.logger.offline)
    else:
        logger = _NullLogger()
    os.makedirs(tc.ckpt_path, exist_ok=True)

    # gate on mesh (not `distributed`) so single-process multi-device
    # validation gets the same explicit dp batch sharding the train path
    # uses, instead of compiler-chosen layouts
    eval_globalize = None
    if mesh is not None:
        def eval_globalize(b):
            if b["speakers"].shape[0] % mesh.shape["dp"]:
                # ragged val tail (single-process only: sharded datasets
                # drop it) — leave as host arrays; exact, just not
                # dp-placed. Distributed batches are always divisible.
                return b
            return globalize_batch(mesh, b)
    if distributed:
        vocoder = None  # synth preview needs locally-addressable params

    if cfg.run_debug_eval:
        val = evaluate(eval_step, state, val_ds, max_batches=4,
                       globalize=eval_globalize)
        logger.log_losses(int(state.step), val, prefix="val")

    total = max_steps if max_steps is not None else tc.step.total_step
    step = int(state.step)
    # Resume continues the epoch data sequence where the run left off:
    # derive (epoch, offset) from the restored step instead of replaying
    # the first epochs' permutations/masks a second time.
    spe = train_ds.superbatches_per_epoch()
    epoch = step // spe
    start_batch = step % spe
    t_last = time.time()
    # _run_epochs keeps this updated with the last COMPLETED (state, step)
    # so the emergency path below saves actual progress, not the state
    # captured before the try (which would persist zero training).
    progress = {"state": state, "step": step}
    try:
        state, step = _run_epochs(
            cfg, state, step, total, epoch, train_ds, val_ds, train_step,
            eval_step, logger, rng, mesh, vocoder, model, t_last,
            eval_globalize, start_batch=start_batch, progress=progress)
    except (KeyboardInterrupt, Exception):
        # Failure containment (the reference has none, SURVEY.md §5.3):
        # persist an emergency checkpoint so the run is resumable, then
        # re-raise for visibility. Single-process only: a distributed
        # orbax save is itself a collective (save barrier + sharded
        # writes), and an exception is not guaranteed symmetric across
        # processes — one process saving alone would block 10 min at the
        # save barrier and bury the real error under a barrier timeout.
        try:
            if jax.process_count() == 1:
                state, step = progress["state"], progress["step"]
                try:
                    # device arrays go straight to orbax (sharded-save safe)
                    save_train_state(tc.ckpt_path, step, state.variables(),
                                     state.opt_state)
                    logger.log(step, {"emergency_checkpoint": 1.0},
                               prefix="failure")
                except Exception as save_err:
                    # best-effort only: if the crash happened after the
                    # step donated these buffers (donate_argnums), the
                    # arrays are gone — report, never mask the real error
                    import sys

                    sys.stderr.write(
                        f"[train] emergency checkpoint failed: {save_err}\n")
        finally:
            logger.close()
        raise
    save_train_state(tc.ckpt_path, step, state.variables(), state.opt_state)
    logger.close()
    return state


def _step_tracer():
    import sys

    t0 = time.time()
    rank = jax.process_index()

    def trace(msg):
        sys.stderr.write(f"[train p{rank} t+{time.time() - t0:7.1f}s] "
                         f"{msg}\n")
        sys.stderr.flush()

    return trace


def _startup_rendezvous(timeout_ms: int = 900_000):
    """Block until every process finishes its uncoordinated startup work
    (imports, corpus metadata, restore prep) before the first
    cross-process collective is built; see parallel/lockstep.py for why
    transport-level init timeouts make this necessary on CPU."""
    from tts_king_tpu.parallel.lockstep import coordination_barrier

    coordination_barrier("ttk_train_startup", timeout_ms)


class _NullLogger:
    """No-op metrics sink for non-zero processes of a distributed run."""

    def log_losses(self, *a, **k):
        pass

    def log(self, *a, **k):
        pass

    def close(self):
        pass


def _run_epochs(cfg, state, step, total, epoch, train_ds, val_ds, train_step,
                eval_step, logger, rng, mesh, vocoder, model, t_last,
                eval_globalize=None, start_batch=0, progress=None):
    tc = cfg.train
    done = False
    # TTK_TRAIN_TRACE=1: per-step stderr progress markers (dispatch-time,
    # monotonic seconds + process index). The intended tool for diagnosing
    # multi-process desync — compare the per-step timelines of two worker
    # logs to see which process lags where.
    trace = (_step_tracer() if os.environ.get("TTK_TRAIN_TRACE")
             else (lambda m: None))
    while not done:
        epoch += 1
        trace(f"epoch {epoch} batch plan ready")
        for superbatch in train_ds.epoch_superbatches(
                seed=tc.seed + epoch, start_batch=start_batch):
            if mesh is not None:
                # Per-process local rows -> one global sharded array
                # (single-process: equivalent to a sharded device_put).
                superbatch = globalize_batch(mesh, superbatch,
                                             extra_leading_axis=True)
            # fold_in(base, step) instead of iterated splits: O(1) to
            # derive at ANY step, so a resumed run's dropout stream is
            # position-identical to the uninterrupted run's by construction
            step_rng = jax.random.fold_in(rng, step)
            trace(f"step {step + 1} dispatch "
                  f"shape={tuple(superbatch['texts'].shape)}")
            state, losses = train_step(state, superbatch, step_rng)
            step += 1
            if progress is not None:
                progress["state"], progress["step"] = state, step

            if step % tc.step.log_step == 0:
                dt = (time.time() - t_last) / tc.step.log_step
                t_last = time.time()
                # Fetch on EVERY process, not just the one that writes:
                # forcing the async-dispatched step chain is a de-facto
                # cross-process rendezvous (the chain ends in collectives),
                # so a process-0-only float() lets the other processes race
                # ahead unboundedly — on CPU/Gloo far enough that a later
                # new clique's context init (hardcoded 30 s KV timeout,
                # no flag reaches it) expires and kills the job.
                host_losses = type(losses)(*jax.device_get(tuple(losses)))
                logger.log_losses(step, host_losses, prefix="train",
                                  extra={"sec_per_step": dt, "epoch": epoch})
            if step % tc.step.val_step == 0:
                val = evaluate(eval_step, state, val_ds,
                               globalize=eval_globalize)
                logger.log_losses(step, val, prefix="val")
                if tc.objective_val_utts and jax.process_count() == 1:
                    # free-running MCD / duration-MAE (train/metrics.py);
                    # skipped on multi-host runs (params aren't process-
                    # local there). F0 metrics need a vocoder: scripts/
                    # evaluate.py --objective covers those offline.
                    from tts_king_tpu.train.metrics import evaluate_objective

                    obj = evaluate_objective(
                        model, state.variables(), val_ds,
                        max_utts=tc.objective_val_utts,
                        max_mel_len=cfg.model.max_seq_len)
                    logger.log(step, obj, prefix="objective")
            if step % tc.step.synth_step == 0 and vocoder is not None:
                _synth_preview(cfg, model, state, val_ds, vocoder, step)
            if step % tc.step.save_step == 0:
                save_train_state(tc.ckpt_path, step, state.variables(),
                                 state.opt_state)
            if step >= total:
                done = True
                break
        start_batch = 0   # the fast-forward applies to the resume epoch only
    return state, step


def _synth_preview(cfg, model, state, val_ds, vocoder, step):
    """Synthesize one validation sample, save wav + mel plot
    (tools.synth_one_sample equivalent, fs_two/utils/tools.py:141-206).

    The sample ROTATES through the val set with the preview step —
    batches() is deterministic-ordered, so a fixed index would render
    the same utterance forever."""
    from scipy.io import wavfile

    from tts_king_tpu.utils.plotting import plot_mel

    from tts_king_tpu.data.dataset import L_STEP, T_STEP, _quantize

    n_val = len(val_ds.meta)
    if n_val == 0:
        return
    k = (step // max(cfg.train.step.synth_step, 1)) % n_val
    e = val_ds._entry(int(k))
    # quantized pad lengths (same grid as the batched loaders) so rotating
    # previews reuse a handful of compiled shapes instead of one per sample
    L = _quantize(len(e[3]), L_STEP)
    T = _quantize(val_ds._mel_len(e[1], e[0]), T_STEP, val_ds.max_mel_len)
    batch = val_ds._collate([val_ds._item_from_entry(e)], L, T)
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

    # caller guarantees vocoder is not None (distributed runs pass None
    # and skip the preview entirely)
    wavs = vocoder.generate(mel_pred[None],
                            lengths=[n * cfg.preprocess.stft.hop_length])
    wavfile.write(
        os.path.join(cfg.train.result_path, f"step_{step}.wav"),
        cfg.preprocess.audio.sampling_rate, wavs[0])
