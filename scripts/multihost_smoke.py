#!/usr/bin/env python
"""Multi-host (multi-process) mesh smoke test.

The reference has no distributed path at all (SURVEY.md §2.y); ours is
pjit over a Mesh, which extends beyond one host via jax.distributed. This
script validates that extension without multi-host hardware: it spawns two
OS processes, each with 4 virtual CPU devices, joins them through
jax.distributed.initialize into one 8-device runtime, lays a dp4 x tp2 mesh
with the dp axis CROSSING the process boundary (the production layout:
tp inside a host on ICI, dp across hosts on DCN), and runs one full
training step (grad accumulation + clip + Adam) on globally-sharded arrays.

Checks asserted per worker, verified by the coordinator:
  * 8 global devices, 4 addressable per process;
  * train step produces a finite loss, identical across processes;
  * the loss equals the single-process virtual-mesh value for the same
    seeds (cross-process collectives change nothing numerically).

Usage:
  python scripts/multihost_smoke.py            # coordinator: spawns workers
  python scripts/multihost_smoke.py --process-id I --coordinator H:P --expected L
                                               # worker (internal)
"""

import argparse
import json
import os
import socket
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NUM_PROCESSES = 2
LOCAL_DEVICES = 4


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _scrubbed_env() -> dict:
    """Worker env: virtual CPU devices, no axon TPU plugin (the parent may
    hold the single TPU grant; a second claimant deadlocks — same recipe as
    __graft_entry__._respawn_on_virtual_mesh)."""
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_", "PALLAS_AXON", "AXON_",
                                "TPU_"))}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}")
    return env


def worker(process_id: int, coordinator: str, expected: float | None) -> None:
    import jax

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=NUM_PROCESSES,
                               process_id=process_id)
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == NUM_PROCESSES * LOCAL_DEVICES, n_global
    assert n_local == LOCAL_DEVICES, n_local

    import __graft_entry__
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tts_king_tpu.config import OptimizerConfig
    from tts_king_tpu.models.fs2 import FastSpeech2
    from tts_king_tpu.parallel.mesh import (batch_specs, build_mesh,
                                            fs2_param_specs)
    from tts_king_tpu.train.state import create_train_state, make_optimizer
    from tts_king_tpu.train.step import make_train_step

    # dp x tp grid over jax.devices() (process-major order): with dp=4 tp=2,
    # tp pairs stay inside a process and dp spans both — grad psums cross
    # the "host" boundary.
    dp, tp = 4, 2
    mesh = build_mesh(dp=dp, tp=tp)

    mc = __graft_entry__._tiny_model_config()
    model = FastSpeech2(model_config=mc, n_speakers=4, pitch_min=-2.0,
                        pitch_max=2.0, energy_min=-2.0, energy_max=2.0)
    opt = make_optimizer(OptimizerConfig(grad_acc_step=2), 32)

    acc, B, L, T = 2, 2 * dp, 8, 16
    rng = np.random.RandomState(0)
    d = rng.randint(1, 3, (acc, B, L))
    superbatch = dict(
        speakers=rng.randint(0, 4, (acc, B)).astype(np.int32),
        texts=rng.randint(1, 200, (acc, B, L)).astype(np.int32),
        src_lens=np.full((acc, B), L, np.int32),
        mels=rng.randn(acc, B, T, 80).astype(np.float32),
        mel_lens=d.sum(-1).astype(np.int32),
        energies=rng.randn(acc, B, L).astype(np.float32),
        durations=d.astype(np.int32),
        pitches_raw=rng.randn(acc, B, L).astype(np.float32),
        pitches_cwt=rng.randn(acc, B, L, 11).astype(np.float32),
        pitches_mean=rng.randn(acc, B).astype(np.float32),
        pitches_std=rng.rand(acc, B).astype(np.float32),
    )

    # Globally-sharded batch: every process holds the same full numpy value
    # (deterministic seed) and contributes only its addressable shards.
    def globalize(x, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    superbatch = jax.tree.map(globalize, superbatch,
                              batch_specs(superbatch, True))

    # State is created ON-DEVICE with global out_shardings (jit respects
    # them across processes) — the multi-host-safe alternative to
    # device_put-ing host arrays, which requires addressable shardings.
    sample = (np.zeros((B,), np.int32),
              rng.randint(1, 200, (B, L)).astype(np.int32),
              np.full((B,), L, np.int32))

    def init_state():
        return create_train_state(model, opt, jax.random.PRNGKey(0), sample)

    shape = jax.eval_shape(init_state)
    param_specs = fs2_param_specs(shape.params)
    opt_specs = optax.tree_map_params(
        opt, lambda _, spec: spec, shape.opt_state, param_specs,
        transform_non_params=lambda _: P())
    spec_tree = shape.replace(
        step=P(),
        params=param_specs,
        batch_stats=jax.tree.map(lambda _: P(), shape.batch_stats),
        opt_state=opt_specs)
    out_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), spec_tree,
                          is_leaf=lambda s: isinstance(s, P))
    state = jax.jit(init_state, out_shardings=out_sh)()

    train_step = jax.jit(make_train_step(model, opt))
    state, losses = train_step(state, superbatch, jax.random.PRNGKey(1))
    total = float(losses.total)
    assert np.isfinite(total), "non-finite loss in multihost smoke"
    assert int(state.step) == 1
    if expected is not None:
        assert abs(total - expected) < 5e-3, (
            f"multihost loss {total} != single-process {expected}")

    # Distributed checkpointing: the SHARDED device arrays go straight to
    # orbax (no device_get — non-addressable shards cannot be fetched);
    # every process participates and orbax coordinates through the same
    # jax.distributed runtime. Restore returns host arrays in each process;
    # verify a tp-SHARDED leaf round-tripped bit-exactly (proves shards
    # from both processes landed and reassembled).
    from tts_king_tpu.checkpoint import restore_train_state, save_train_state

    ckpt_dir = "/tmp/multihost_smoke_ckpt"
    save_train_state(ckpt_dir, 1,
                     {"params": state.params,
                      "batch_stats": state.batch_stats})
    payload = restore_train_state(ckpt_dir, step=1)
    leaf = payload["params"]["encoder"]["layer_0"]["slf_attn"]["w_qs"][
        "kernel"]
    want = jax.device_get(
        jax.jit(lambda p: p, out_shardings=NamedSharding(mesh, P()))(
            state.params)["encoder"]["layer_0"]["slf_attn"]["w_qs"]["kernel"])
    np.testing.assert_array_equal(np.asarray(leaf), want)

    print(json.dumps({"process_id": process_id, "global_devices": n_global,
                      "local_devices": n_local, "mesh": f"dp{dp}xtp{tp}",
                      "loss": round(total, 4), "ckpt": "ok"}))
    jax.distributed.shutdown()


def _single_process_reference() -> float:
    """Same step on one process with 8 virtual devices -> expected loss."""
    code = ("import __graft_entry__, sys, io, contextlib\n"
            "buf = io.StringIO()\n"
            "with contextlib.redirect_stdout(buf):\n"
            f"    __graft_entry__.dryrun_multichip({NUM_PROCESSES * LOCAL_DEVICES})\n"
            "import re\n"
            "m = re.search(r'loss=([0-9.]+)', buf.getvalue())\n"
            "print(m.group(1))\n")
    env = _scrubbed_env()
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={NUM_PROCESSES * LOCAL_DEVICES}")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=here,
                          capture_output=True, text=True, timeout=1200)
    if proc.returncode != 0:
        raise RuntimeError(f"reference run failed: {proc.stderr[-2000:]}")
    return float(proc.stdout.strip().splitlines()[-1])


def coordinator() -> None:
    expected = _single_process_reference()
    print(f"single-process reference loss: {expected}")

    port = _free_port()
    here = os.path.abspath(__file__)
    env = _scrubbed_env()
    procs = [
        subprocess.Popen(
            [sys.executable, here, "--process-id", str(i),
             "--coordinator", f"localhost:{port}",
             "--expected", str(expected)],
            env=env, cwd=os.path.dirname(os.path.dirname(here)),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(NUM_PROCESSES)
    ]
    outs = []
    ok = True
    for p in procs:
        try:
            out, err = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            ok = False
        outs.append((p.returncode, out, err))
        if p.returncode != 0:
            ok = False

    reports = []
    for rc, out, err in outs:
        line = [l for l in out.splitlines() if l.startswith("{")]
        if rc == 0 and line:
            reports.append(json.loads(line[-1]))
        else:
            sys.stderr.write(err[-3000:] + "\n")
    if not ok or len(reports) != NUM_PROCESSES:
        print(json.dumps({"ok": False}))
        sys.exit(1)
    losses = {r["loss"] for r in reports}
    assert len(losses) == 1, f"loss mismatch across processes: {losses}"
    print(json.dumps({"ok": True, "processes": NUM_PROCESSES,
                      "global_devices": reports[0]["global_devices"],
                      "mesh": reports[0]["mesh"],
                      "loss": reports[0]["loss"],
                      "matches_single_process": True,
                      "distributed_checkpoint": all(
                          r.get("ckpt") == "ok" for r in reports)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--expected", type=float, default=None)
    args = ap.parse_args()
    if args.process_id is None:
        coordinator()
    else:
        worker(args.process_id, args.coordinator, args.expected)


if __name__ == "__main__":
    main()
