#!/usr/bin/env python
"""Serving load test: continuous-batching scheduler vs the round-1
fixed-window scheduler. Reports p50/p99 latency and throughput.

Usage: python scripts/bench_serve.py [--n 64] [--rate 40] [--policy both]
       [--config config.yaml]

Open-loop load: requests arrive at a Poisson rate (default 40 req/s) with
random lengths/speakers; latency is measured submit -> wav.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run_load_measured(king, policy, n, rate, seed=0, max_batch=16):
    """Open-loop Poisson load; latency = submit -> future done callback."""
    from tts_king_tpu.serve import SynthesisServer

    server = SynthesisServer(king, max_batch=max_batch, max_wait_ms=10,
                             policy=policy)
    rng = np.random.RandomState(seed)
    gaps = rng.exponential(1.0 / rate, size=n)
    lengths = rng.randint(12, 48, size=n)
    done_at = {}

    def make_cb(i):
        def cb(_f):
            done_at[i] = time.monotonic()
        return cb

    try:
        # Compile every shape the load can hit before measuring —
        # first-touch XLA compiles are 20-40 s each through the relay and
        # would otherwise dominate the measurement (and, mid-traffic,
        # stall the pipeline: the production failure mode prewarm exists
        # to prevent).
        server.prewarm(max_phonemes=48)
        futures = []
        submit_at = []
        t_start = time.monotonic()
        for i in range(n):
            time.sleep(gaps[i])
            submit_at.append(time.monotonic())
            f = server.submit(
                phonemes=rng.randint(64, 200, size=(int(lengths[i]),)),
                speaker=int(rng.randint(0, 3)))
            f.add_done_callback(make_cb(i))
            futures.append(f)
        for f in futures:
            f.result(timeout=600)
        t_end = time.monotonic()
    finally:
        server.close()

    lat = np.asarray([done_at[i] - submit_at[i] for i in range(n)])
    return {
        "policy": policy,
        "max_batch": max_batch,
        "n": n,
        "offered_rate_rps": rate,
        "throughput_rps": round(n / (t_end - t_start), 2),
        "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
        "p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 1),
        "mean_ms": round(float(lat.mean()) * 1e3, 1),
    }


def run_overload_sustained(king, n, rate, admission_depth=64,
                           deadline_ms=2000.0, seed=0, max_batch=16):
    """Sustained open-loop OVERLOAD test (offered rate deliberately above
    capacity): verifies the admission bound holds, latency of ADMITTED
    requests stays bounded, and reports the rejection/shed rates — the
    overload-safety contract (serve.py admission_depth + deadlines).
    """
    from tts_king_tpu.serve import (DeadlineExceeded, ServerOverloaded,
                                    SynthesisServer)

    server = SynthesisServer(king, max_batch=max_batch,
                             admission_depth=admission_depth,
                             default_deadline_ms=deadline_ms)
    rng = np.random.RandomState(seed)
    gaps = rng.exponential(1.0 / rate, size=n)
    lengths = rng.randint(12, 48, size=n)
    done_at = {}

    def make_cb(i):
        def cb(_f):
            done_at[i] = time.monotonic()
        return cb

    try:
        # Compile the full serving shape grid before offering load (see
        # run_load_measured): an unwarmed shape hit mid-run stalls the
        # pipeline for one 20-40 s compile, expiring everything queued
        # behind it — measured as p99 13.6 s at 160 rps before prewarm.
        server.prewarm(max_phonemes=48)

        futures = {}
        submit_at = {}
        rejected = 0
        max_queue = 0
        t_start = time.monotonic()
        for i in range(n):
            time.sleep(gaps[i])
            max_queue = max(max_queue, server._queue.qsize())
            try:
                submit_at[i] = time.monotonic()
                f = server.submit(
                    phonemes=rng.randint(64, 200, size=(int(lengths[i]),)),
                    speaker=int(rng.randint(0, 3)))
                f.add_done_callback(make_cb(i))
                futures[i] = f
            except ServerOverloaded:
                rejected += 1
        shed = 0
        ok = []
        for i, f in futures.items():
            try:
                f.result(timeout=600)
                ok.append(i)
            except DeadlineExceeded:
                shed += 1
        t_end = time.monotonic()
        stats = server.stats()
    finally:
        server.close()

    lat = np.asarray([done_at[i] - submit_at[i] for i in ok])
    return {
        "scenario": "overload_sustained",
        "n": n,
        "offered_rate_rps": rate,
        "admission_depth": admission_depth,
        "deadline_ms": deadline_ms,
        "admitted": len(futures),
        "rejected": rejected,
        "shed_after_admission": shed,
        "completed": len(ok),
        "rejection_rate": round(rejected / n, 3),
        "max_observed_queue": max_queue,
        "queue_bound_held": bool(max_queue <= admission_depth),
        "completed_rps": round(len(ok) / (t_end - t_start), 2),
        "admitted_p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1)
        if len(lat) else None,
        "admitted_p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 1)
        if len(lat) else None,
        "server_stats": stats,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--rate", type=float, default=40.0)
    ap.add_argument("--policy", default="both",
                    choices=["both", "continuous", "window"])
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--config", default=None)
    ap.add_argument("--overload", action="store_true",
                    help="run the sustained overload scenario instead "
                         "(bounded queue + deadlines; n>=512 recommended)")
    ap.add_argument("--admission-depth", type=int, default=64)
    ap.add_argument("--deadline-ms", type=float, default=2000.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tts_king_tpu.config import TTSConfig, load_config
    from tts_king_tpu.pipeline import TTSKing

    # Persistent compile cache: the warmup compiles ~20 shape buckets;
    # repeat invocations skip them all.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    cfg = load_config(args.config) if args.config else TTSConfig()
    king = TTSKing(cfg, dtype=jnp.bfloat16)
    # untrained weights: bias the duration head so outputs have real lengths
    dp = king.tts.variables["params"]["variance_adaptor"][
        "duration_predictor"]["linear_layer"]
    dp["bias"] = jnp.full_like(dp["bias"], 1.5)

    if args.overload:
        print(json.dumps(run_overload_sustained(
            king, args.n, args.rate, admission_depth=args.admission_depth,
            deadline_ms=args.deadline_ms, max_batch=args.max_batch)))
        return

    policies = (["continuous", "window"] if args.policy == "both"
                else [args.policy])
    for policy in policies:
        print(json.dumps(run_load_measured(king, policy, args.n, args.rate,
                                           max_batch=args.max_batch)))


if __name__ == "__main__":
    main()
