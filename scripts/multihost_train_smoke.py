#!/usr/bin/env python
"""End-to-end multi-host TRAINING smoke: the real train() entry across
2 processes.

scripts/multihost_smoke.py validates the primitives (one hand-built step +
distributed checkpointing). This runs the actual production driver —
`scripts/train.py --distributed` semantics through train/loop.py — across
two OS processes joined by jax.distributed (4 virtual CPU devices each,
dp4 x tp2 mesh with dp crossing the process boundary):

  phase 1: train() for N steps with per-process data loading
           (FS2Dataset shard=(rank, 2): each process reads only its half
           of every batch), checkpointing at N/2 and N;
  phase 2: train() again with restore_step=N/2 — the distributed RESUME
           path (orbax restore + re-shard onto the global mesh).

The coordinator also runs the identical schedule in ONE process with the
same 8-device mesh and asserts the final validation losses match — per-
process sharded input + cross-host collectives change nothing numerically
(deterministic per-item masking makes the global batches bit-identical).

Replaces (and completes) the reference's single-device train.py:78-235.

Usage:
  python scripts/multihost_train_smoke.py [--steps 16]      # coordinator
"""

import argparse
import json
import os
import socket
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_PROCESSES = 2
LOCAL_DEVICES = 4


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _scrubbed_env(n_local=LOCAL_DEVICES) -> dict:
    """Virtual CPU devices, no axon TPU plugin (a second TPU claimant
    deadlocks — same recipe as multihost_smoke.py)."""
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_", "PALLAS_AXON", "AXON_",
                                "TPU_"))}
    env["JAX_PLATFORMS"] = "cpu"
    # The collective timeouts default to ~30 s. On a 1-core box a COLD
    # compile cache makes worker skew minutes long (both processes compile
    # every padded shape; the first to finish sits inside an executing
    # Gloo collective while the other still compiles), which trips the
    # default timeout and kills the run. Raise them well past worst-case
    # compile skew — lockstep collectives bound steady-state skew anyway.
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count={n_local}"
                        " --xla_cpu_collective_timeout_seconds=900"
                        " --xla_cpu_collective_call_terminate_timeout_seconds=900")
    # Persistent compile cache: the micro train step compiles once per
    # padded shape; repeated runs (and the resume phase) skip them all.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(repo, ".jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    # Synchronous dispatch: each step call blocks until the collective
    # completes, so the two workers rendezvous at EVERY step and host-side
    # skew can never accumulate into a later Gloo context-init window
    # (async dispatch let worker 0 queue 4 steps and reach orbax's
    # save-time allgather — a NEW Gloo clique — 30+ s before worker 1
    # had dispatched anything, tripping the hardcoded 30 s KV timeout).
    env["JAX_CPU_ENABLE_ASYNC_DISPATCH"] = "false"
    # Per-step dispatch timeline in each worker log (train/loop.py): the
    # diagnostic that localizes cross-worker desync when a Gloo clique
    # init or an orbax barrier times out.
    env["TTK_TRAIN_TRACE"] = "1"
    return env


def _config(root: str, steps: int, restore_step: int = 0):
    from tts_king_tpu.config import (ModelConfig, OptimizerConfig,
                                     PreprocessConfig, StepConfig,
                                     TrainConfig, TransformerConfig,
                                     TTSConfig, VariancePredictorConfig)

    cfg = TTSConfig(
        exp_name="mh_train",
        preprocess=PreprocessConfig(
            raw_path=os.path.join(root, "raw"),
            preprocessed_path=os.path.join(root, "processed"),
            val_size=4),
        model=ModelConfig(
            transformer=TransformerConfig(
                encoder_layer=1, encoder_head=2, encoder_hidden=16,
                variance_hidden=16, decoder_layer=1, decoder_head=2,
                decoder_hidden=16, conv_filter_size=32),
            variance_predictor=VariancePredictorConfig(filter_size=16),
            max_seq_len=256),
        train=TrainConfig(
            ckpt_path=os.path.join(root, "ckpt"),
            result_path=os.path.join(root, "result"),
            # masking ON: exercises the per-item deterministic mask RNG
            max_masks_per_sentence=0.15,
            optimizer=OptimizerConfig(batch_size=4, grad_acc_step=2,
                                      warm_up_step=50),
            step=StepConfig(total_step=steps, log_step=4,
                            synth_step=10 ** 9, val_step=steps // 2,
                            save_step=steps // 2)),
    )
    cfg.mesh.dp = 4
    cfg.mesh.tp = 2
    cfg.acoustic.restore_step = restore_step
    return cfg


def prepare(root: str) -> None:
    """Build + preprocess a small synthetic corpus (shared by all runs)."""
    from tts_king_tpu.config import PreprocessConfig
    from tts_king_tpu.data.features import Preprocessor
    from tts_king_tpu.data.synthetic import generate_corpus

    raw = os.path.join(root, "raw")
    os.makedirs(raw, exist_ok=True)
    # 40 utts so the val split is a full dp-shardable batch
    # (val_size = min(4, n//10) must reach 4)
    generate_corpus(raw, n_speakers=2, utts_per_speaker=20, seed=0)
    pp = PreprocessConfig(raw_path=raw,
                          preprocessed_path=os.path.join(root, "processed"),
                          val_size=4)
    Preprocessor(pp, batch_size=8).build_from_path()
    print("prepared")


def run_schedule(root: str, steps: int, trace=lambda m: None) -> dict:
    """train() for `steps`, then RESUME from steps//2 and train to `steps`
    again; return final val losses (the resumed run's)."""
    import jax

    from tts_king_tpu.train.loop import train
    from tts_king_tpu.train.evaluate import evaluate
    from tts_king_tpu.train.step import make_eval_step
    from tts_king_tpu.data.dataset import FS2Dataset
    from tts_king_tpu.models.fs2 import build_fastspeech2
    from tts_king_tpu.parallel.mesh import build_mesh, globalize_batch

    cfg = _config(root, steps)
    trace("train #1 (fresh) starting")
    state = train(cfg, max_steps=steps)
    assert int(jax.device_get(state.step)) == steps
    trace("train #1 done")

    # Distributed resume: restore the mid-run checkpoint, train to `steps`.
    cfg2 = _config(root, steps, restore_step=steps // 2)
    trace("train #2 (resume) starting")
    state2 = train(cfg2, max_steps=steps)
    assert int(jax.device_get(state2.step)) == steps
    trace("train #2 done; final eval")

    # Final val loss of the resumed state, computed over the global mesh.
    import json as _json

    pp = cfg.preprocess
    with open(os.path.join(pp.preprocessed_path, "stats.json")) as f:
        stats = _json.load(f)
    with open(os.path.join(pp.preprocessed_path, "speakers.json")) as f:
        n_speakers = len(_json.load(f))
    model = build_fastspeech2(cfg.model, stats, n_speakers)
    shard = (jax.process_index(), jax.process_count())
    val_ds = FS2Dataset("val.txt", pp, cfg.train, drop_last=False,
                        apply_masking=False, max_mel_len=cfg.model.max_seq_len,
                        shard=shard)
    from tts_king_tpu.parallel.lockstep import maybe_lockstep

    eval_step = maybe_lockstep(jax.jit(make_eval_step(model, cfg.model.use_cwt)),
                               "final_eval")
    globalize = None
    if jax.process_count() > 1 or len(jax.devices()) > 1:
        mesh = build_mesh(dp=cfg.mesh.dp, tp=cfg.mesh.tp)
        globalize = lambda b: globalize_batch(mesh, b)
    val = evaluate(eval_step, state2, val_ds, globalize=globalize)
    return {"val_total": round(float(val.total), 4),
            "val_mel": round(float(val.mel), 4)}


def _trace(pid_tag, msg, t0=[None]):
    """Timestamped stderr progress marker (lands in the per-worker log);
    the first call anchors t=0 for that process."""
    import time

    if t0[0] is None:
        t0[0] = time.time()
    sys.stderr.write(f"[{pid_tag} t+{time.time() - t0[0]:7.1f}s] {msg}\n")
    sys.stderr.flush()


def worker(args) -> None:
    # SIGUSR1 -> all-thread Python stack dump on stderr (the worker log):
    # the one tool that answers "WHERE is the lagging worker?" when a Gloo
    # clique init or a barrier times out.
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1, all_threads=True)
    tag = f"w{args.process_id}"
    _trace(tag, f"start pid={os.getpid()}")
    import jax

    _trace(tag, "jax imported; distributed.initialize...")
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=NUM_PROCESSES,
                               process_id=args.process_id,
                               initialization_timeout=600,
                               shutdown_timeout_seconds=900)
    _trace(tag, "distributed.initialize done")
    assert len(jax.devices()) == NUM_PROCESSES * LOCAL_DEVICES
    assert len(jax.local_devices()) == LOCAL_DEVICES
    out = run_schedule(args.root, args.steps, trace=lambda m: _trace(tag, m))
    out.update(process_id=args.process_id,
               global_devices=len(jax.devices()))
    print(json.dumps(out))
    jax.distributed.shutdown()


def _sub(cmd_args, n_local, timeout=2400):
    here = os.path.abspath(__file__)
    repo = os.path.dirname(os.path.dirname(here))
    proc = subprocess.run([sys.executable, here] + cmd_args,
                          env=_scrubbed_env(n_local), cwd=repo,
                          capture_output=True, text=True, timeout=timeout)
    if proc.returncode != 0:
        raise RuntimeError(f"{cmd_args[:2]} failed:\n{proc.stderr[-3000:]}")
    return proc.stdout


def coordinator(args) -> None:
    root = args.root
    if not os.path.isdir(os.path.join(root, "processed")):
        _sub(["--mode", "prepare", "--root", root], 1)
        print("corpus prepared")

    # Single-process reference: same 8 devices, same mesh, one process.
    ref_root = root + "_ref"
    os.makedirs(ref_root, exist_ok=True)
    for link in ("raw", "processed"):
        dst = os.path.join(ref_root, link)
        if not os.path.exists(dst):
            os.symlink(os.path.join(root, link), dst)
    out = _sub(["--mode", "single", "--root", ref_root,
                "--steps", str(args.steps)], NUM_PROCESSES * LOCAL_DEVICES)
    expected = json.loads(
        [l for l in out.splitlines() if l.startswith("{")][-1])
    print(f"single-process reference: {expected}")

    here = os.path.abspath(__file__)
    repo = os.path.dirname(os.path.dirname(here))
    # Fresh ckpt/result dirs for the distributed run, shared corpus.
    dist_root = root + "_dist"
    os.makedirs(dist_root, exist_ok=True)
    for link in ("raw", "processed"):
        dst = os.path.join(dist_root, link)
        if not os.path.exists(dst):
            os.symlink(os.path.join(root, link), dst)

    def worker_phase(attempt: int):
        """Launch both workers; full per-worker stderr lands in
        <dist_root>/worker<i>.attempt<k>.log for post-mortems (the old
        3000-char tail got flooded by barrier spam and hid the root
        cause)."""
        # Partial orbax dirs from a failed prior attempt would poison
        # this one's saves — start each attempt from clean ckpt/result.
        import shutil
        for sub in ("ckpt", "result"):
            d = os.path.join(dist_root, sub)
            shutil.rmtree(d, ignore_errors=True)
            os.makedirs(d, exist_ok=True)
        port = _free_port()
        procs, logs = [], []
        for i in range(NUM_PROCESSES):
            log_path = os.path.join(dist_root,
                                    f"worker{i}.attempt{attempt}.log")
            logs.append(log_path)
            procs.append(subprocess.Popen(
                [sys.executable, "-u", here, "--mode", "worker",
                 "--root", dist_root,
                 "--steps", str(args.steps), "--process-id", str(i),
                 "--coordinator", f"localhost:{port}"],
                env=_scrubbed_env(LOCAL_DEVICES), cwd=repo,
                stdout=subprocess.PIPE, stderr=open(log_path, "w"),
                text=True))
        reports, ok = [], True
        for i, p in enumerate(procs):
            try:
                out, _ = p.communicate(timeout=2400)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
                ok = False
            lines = [l for l in out.splitlines() if l.startswith("{")]
            if p.returncode == 0 and lines:
                reports.append(json.loads(lines[-1]))
            else:
                ok = False
                with open(logs[i]) as f:
                    sys.stderr.write(
                        f"--- worker {i} (attempt {attempt}, "
                        f"full log {logs[i]}) tail:\n" + f.read()[-3000:]
                        + "\n")
        return ok and len(reports) == NUM_PROCESSES, reports

    ok, reports = worker_phase(0)
    if not ok:
        # A cold persistent compile cache is the one legitimate failure
        # mode here (first-ever run of new shapes on a slow box): attempt
        # 0 populated the cache up to the point of failure, so a single
        # retry runs with warm compiles and near-zero worker skew.
        sys.stderr.write("worker phase failed; retrying once on the "
                         "now-warm compile cache\n")
        ok, reports = worker_phase(1)
    if not ok:
        print(json.dumps({"ok": False}))
        sys.exit(1)

    vals = {r["val_total"] for r in reports}
    assert len(vals) == 1, f"val loss differs across processes: {vals}"
    got = reports[0]["val_total"]
    assert abs(got - expected["val_total"]) < 5e-3, (
        f"distributed val {got} != single-process {expected['val_total']}")
    print(json.dumps({
        "ok": True, "processes": NUM_PROCESSES,
        "global_devices": reports[0]["global_devices"],
        "mesh": "dp4xtp2", "steps": args.steps, "resumed_from": args.steps // 2,
        "val_total": got, "matches_single_process": True}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="coordinator",
                    choices=["coordinator", "prepare", "single", "worker"])
    ap.add_argument("--root", default="/tmp/mh_train_smoke")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--coordinator", default=None)
    args = ap.parse_args()
    if args.mode == "coordinator":
        coordinator(args)
    elif args.mode == "prepare":
        prepare(args.root)
    elif args.mode == "single":
        print(json.dumps(run_schedule(args.root, args.steps)))
    else:
        worker(args)


if __name__ == "__main__":
    main()
