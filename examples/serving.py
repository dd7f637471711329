#!/usr/bin/env python
"""Production-serving walkthrough: HTTP service lifecycle end to end.

Covers: starting the HTTP front in-process, /tts (WAV) and /stream
(chunked PCM) clients, overload behavior (429 / deadline 504), the
/stats counters, and the graceful drain/restart story — SIGTERM-style
drain persisting tuned padding grids + prewarm shapes to a state file a
replacement server adopts.

Runs standalone with random weights on any backend, so it doubles as a
smoke test:  python examples/serving.py
Pass --micro to use a toy-sized model (seconds on CPU instead of minutes
of TPU compiles — the flow is identical, only the weights shrink).
(The CLI equivalent of everything here:
  python -m tts_king_tpu.serve --port 8765 --prewarm \
      --state-file serving_state.json
then SIGTERM the process and start it again.)
"""

import argparse
import json
import os
import sys
import tempfile
import threading
import urllib.error
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def post(base, path, body, timeout=300):
    req = urllib.request.Request(
        f"{base}{path}", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--micro", action="store_true",
                    help="toy model sizes (fast on CPU; identical flow)")
    args = ap.parse_args()

    from tts_king_tpu.config import TTSConfig, load_config, micro_config
    from tts_king_tpu.pipeline import TTSKing
    from tts_king_tpu.serve import SynthesisServer, serve_http

    if args.micro:
        cfg = micro_config()
    else:
        cfg_path = os.path.join(os.path.dirname(__file__), "..",
                                "config.yaml")
        cfg = load_config(cfg_path) if os.path.exists(cfg_path) else TTSConfig()
    king = TTSKing(cfg)
    if args.micro:
        # bias the duration head so untrained weights emit nonzero durations
        import jax.numpy as jnp
        dp = king.tts.variables["params"]["variance_adaptor"][
            "duration_predictor"]["linear_layer"]
        dp["bias"] = jnp.full_like(dp["bias"], 1.5)

    # --- start the HTTP front (port 0 = ephemeral) --------------------
    httpd, server = serve_http(king, port=0, max_batch=8,
                               admission_depth=32)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    print("serving on", base)

    # --- one-shot WAV ------------------------------------------------
    phonemes = [70, 80, 90, 100, 110, 90, 80]
    r = post(base, "/tts", {"phonemes": phonemes, "speaker": 0})
    print(f"/tts -> {r.status}, {len(r.read())} bytes of WAV")

    # deadlines: a request that cannot be served in time comes back 504
    # instead of silently consuming device compute
    try:
        post(base, "/tts", {"phonemes": phonemes, "deadline_ms": 0.001})
        print("/tts with 1us deadline -> served (machine faster than us)")
    except urllib.error.HTTPError as e:
        print(f"/tts with 1us deadline -> {e.code} (shed, no compute spent)")

    # --- low-latency streaming ---------------------------------------
    r = post(base, "/stream", {"phonemes": phonemes})
    pcm = np.frombuffer(r.read(), np.int16)
    print(f"/stream -> {r.status}, {pcm.shape[0]} samples "
          f"(chunks arrive as vocoded; first after ~one FS2 call + one "
          f"vocoder window)")

    # --- stats + load-derived tuning ---------------------------------
    stats = json.loads(urllib.request.urlopen(base + "/stats").read())
    print("stats:", stats)
    print("suggested padding grids from recorded load:",
          server.suggest_buckets())

    # --- graceful drain/restart --------------------------------------
    state_file = os.path.join(tempfile.gettempdir(),
                              "ttk_example_serving_state.json")
    httpd.shutdown()                       # stop accepting HTTP
    server.drain(timeout=60)               # finish admitted work
    server.save_serving_state(state_file)  # hand tuning to the successor
    print("drained; serving state ->", state_file)

    # replacement process: adopts the tuned grids, prewarms the shapes
    # that carried the previous process's traffic (prewarm=False here to
    # keep the example fast)
    state = SynthesisServer.load_serving_state(state_file)
    server2 = SynthesisServer.from_serving_state(king, state, prewarm=False,
                                                 max_batch=8)
    wav = server2.submit(phonemes=phonemes).result(timeout=300)
    print(f"restarted server answered: {wav.shape[0]} samples")
    server2.close()
    print("done")


if __name__ == "__main__":
    main()
