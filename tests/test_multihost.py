"""Multi-host (multi-process) mesh smoke: two OS processes, 4 virtual CPU
devices each, joined via jax.distributed into one 8-device runtime running
the full dp4 x tp2 training step with the dp axis crossing the process
boundary. The reference has no distributed training at all
(fs_two/train.py:104, nn.DataParallel commented out — SURVEY.md §2.y);
this guards the piece of ours that single-process tests can't:
cross-process collectives and on-device global state creation.

Runs scripts/multihost_smoke.py end-to-end (coordinator -> 2 workers ->
loss match vs the single-process dryrun), in a subprocess so the in-suite
jax runtime is untouched.
"""

import pytest

pytestmark = pytest.mark.slow

import json
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_multihost_train_step_matches_single_process():
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_", "PALLAS_AXON", "AXON_",
                                "TPU_"))}
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "scripts",
                                      "multihost_smoke.py")],
        env=env, cwd=REPO_ROOT, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["ok"] is True
    assert report["processes"] == 2
    assert report["global_devices"] == 8
    assert report["mesh"] == "dp4xtp2"
    assert report["matches_single_process"] is True
    # sharded-state orbax save/restore across the two processes
    assert report["distributed_checkpoint"] is True


def test_multihost_train_driver_end_to_end():
    """The REAL train() entry across 2 processes: per-process data loading,
    distributed checkpointing, mid-run RESUME, and a final val loss that
    matches an identical single-process run
    (scripts/multihost_train_smoke.py; VERDICT r2 missing-#1). Reuses the
    persistent .jax_cache, so the dominant cost (micro-step compiles) is
    paid once across suite runs."""
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_", "PALLAS_AXON", "AXON_",
                                "TPU_"))}
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "scripts",
                                      "multihost_train_smoke.py"),
         "--steps", "8", "--root", "/tmp/mh_train_pytest"],
        env=env, cwd=REPO_ROOT, capture_output=True, text=True, timeout=3000)
    assert proc.returncode == 0, proc.stderr[-3000:] + proc.stdout[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["ok"] is True
    assert report["processes"] == 2
    assert report["mesh"] == "dp4xtp2"
    assert report["resumed_from"] == 4
    assert report["matches_single_process"] is True


def test_multihost_vocoder_gan_driver_end_to_end():
    """The real train_vocoder() GAN driver across 2 processes: per-process
    MelDataset sharding (per-item crop RNG -> bit-identical global
    batches), replicated GAN state created ON the global mesh, distributed
    orbax checkpointing of the full GAN state + folded inference params,
    mid-run RESUME, and a final generator that matches the identical
    single-process run within collective-order tolerance
    (scripts/multihost_vocoder_smoke.py)."""
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_", "PALLAS_AXON", "AXON_",
                                "TPU_"))}
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "scripts",
                                      "multihost_vocoder_smoke.py"),
         "--steps", "8", "--root", "/tmp/mh_voc_pytest"],
        env=env, cwd=REPO_ROOT, capture_output=True, text=True, timeout=3000)
    assert proc.returncode == 0, proc.stderr[-3000:] + proc.stdout[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["ok"] is True
    assert report["processes"] == 2
    assert report["mesh"] == "dp4"
    assert report["resumed_from"] == 4
    assert report["matches_single_process"] is True
