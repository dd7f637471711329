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
        # Warm every (batch-bucket, phoneme-bucket, mel-bucket) shape the
        # load can hit — first-touch XLA compiles are 20-40 s each through
        # the relay and would otherwise dominate the measurement. Bursts of
        # 16 identical-length requests form full batches; the sequential
        # singles warm the B=1 bucket.
        for ln in (12, 16, 24, 32, 40, 48):
            burst = [server.submit(phonemes=rng.randint(64, 200, size=(ln,)))
                     for _ in range(max_batch)]
            for f in burst:
                f.result(timeout=900)
            server.submit(
                phonemes=rng.randint(64, 200, size=(ln,))).result(timeout=900)
            fours = [server.submit(phonemes=rng.randint(64, 200, size=(ln,)))
                     for _ in range(4)]
            for f in fours:
                f.result(timeout=900)
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--rate", type=float, default=40.0)
    ap.add_argument("--policy", default="both",
                    choices=["both", "continuous", "window"])
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--config", default=None)
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

    policies = (["continuous", "window"] if args.policy == "both"
                else [args.policy])
    for policy in policies:
        print(json.dumps(run_load_measured(king, policy, args.n, args.rate,
                                           max_batch=args.max_batch)))


if __name__ == "__main__":
    main()
