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
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
    # Persistent compile cache: the micro train step compiles once per
    # padded shape; repeated runs (and the resume phase) skip them all.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(repo, ".jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
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


def run_schedule(root: str, steps: int) -> dict:
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
    state = train(cfg, max_steps=steps)
    assert int(jax.device_get(state.step)) == steps

    # Distributed resume: restore the mid-run checkpoint, train to `steps`.
    cfg2 = _config(root, steps, restore_step=steps // 2)
    state2 = train(cfg2, max_steps=steps)
    assert int(jax.device_get(state2.step)) == steps

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
    eval_step = jax.jit(make_eval_step(model, cfg.model.use_cwt))
    globalize = None
    if jax.process_count() > 1 or len(jax.devices()) > 1:
        mesh = build_mesh(dp=cfg.mesh.dp, tp=cfg.mesh.tp)
        globalize = lambda b: globalize_batch(mesh, b)
    val = evaluate(eval_step, state2, val_ds, globalize=globalize)
    return {"val_total": round(float(val.total), 4),
            "val_mel": round(float(val.mel), 4)}


def worker(args) -> None:
    import jax

    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=NUM_PROCESSES,
                               process_id=args.process_id)
    assert len(jax.devices()) == NUM_PROCESSES * LOCAL_DEVICES
    assert len(jax.local_devices()) == LOCAL_DEVICES
    out = run_schedule(args.root, args.steps)
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

    port = _free_port()
    here = os.path.abspath(__file__)
    repo = os.path.dirname(os.path.dirname(here))
    # Fresh ckpt/result dirs for the distributed run, shared corpus.
    dist_root = root + "_dist"
    os.makedirs(dist_root, exist_ok=True)
    for link in ("raw", "processed"):
        dst = os.path.join(dist_root, link)
        if not os.path.exists(dst):
            os.symlink(os.path.join(root, link), dst)
    procs = [
        subprocess.Popen(
            [sys.executable, here, "--mode", "worker", "--root", dist_root,
             "--steps", str(args.steps), "--process-id", str(i),
             "--coordinator", f"localhost:{port}"],
            env=_scrubbed_env(LOCAL_DEVICES), cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(NUM_PROCESSES)
    ]
    reports, ok = [], True
    for p in procs:
        try:
            out, err = p.communicate(timeout=2400)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            ok = False
        lines = [l for l in out.splitlines() if l.startswith("{")]
        if p.returncode == 0 and lines:
            reports.append(json.loads(lines[-1]))
        else:
            ok = False
            sys.stderr.write(err[-3000:] + "\n")
    if not ok or len(reports) != NUM_PROCESSES:
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
