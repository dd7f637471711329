#!/usr/bin/env python
"""Characterize the host<->device link of the current session.

The serving latency percentiles in results/serving_load_test.jsonl are
sensitive to the axon relay's per-dispatch overhead and transfer
bandwidth: every completed request ships its int16 waveform host-side, so
a slow session link dominates low-load p50 while saturation throughput
(deep pipeline, overlapped transfers) barely moves. This probe measures
the two link numbers a load-test row should be read against:

  * jitted-call overhead: wall time of a cached ~0.5 ms-device matmul
    chain returning a scalar (fixed per-dispatch cost floor);
  * put+get 1 MB: synchronous host->device->host round trip of 1 MB
    (per-MB transfer cost; one 16-request wav batch is ~3.5 MB).

Prints one JSON line; run next to bench_serve.py and store the line as
the artifact's environment row.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    x = jnp.ones((2048, 2048), jnp.bfloat16)

    @jax.jit
    def chain(a):
        for _ in range(3):
            a = a @ a
        return a.sum()

    float(chain(x))
    calls = []
    for _ in range(20):
        t0 = time.perf_counter()
        float(chain(x))
        calls.append(time.perf_counter() - t0)

    h = np.ones((256, 1024), np.float32)  # 1 MB
    xfers = []
    for _ in range(20):
        t0 = time.perf_counter()
        _ = np.asarray(jax.device_put(h))
        xfers.append(time.perf_counter() - t0)

    print(json.dumps({
        "_env": "relay_link_probe",
        "platform": str(jax.devices()[0]),
        "jitted_call_overhead_ms_p50": round(
            float(np.percentile(calls, 50)) * 1e3, 2),
        "jitted_call_overhead_ms_min": round(min(calls) * 1e3, 2),
        "put_get_1mb_ms_p50": round(
            float(np.percentile(xfers, 50)) * 1e3, 2),
        "put_get_1mb_ms_min": round(min(xfers) * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
