"""TPU benchmarks for the five BASELINE.md configs.

Default invocation (the driver contract) prints ONE JSON line for the
headline metric — config 3, end-to-end batched multi-speaker synthesis —
as {"metric", "value", "unit", "vs_baseline"}.

`python bench.py --all` additionally runs:
  1. FS2 text->mel inference, one sentence, single speaker
  2. HiFi-GAN mel->wav inference (fixed-length mel batch)
  3. end-to-end batched multi-speaker synthesis (headline)
  4. feature extraction (mel + F0 + energy) throughput
  5. FS2 training step, single chip
plus extra rows: int8 vocoder, HiFi-GAN GAN training step, streaming TTFA,
and production-serving TTFA.

The reference publishes no speed numbers (BASELINE.json `published: {}`);
vs_baseline compares against the north-star target RTF 0.01/chip where RTF
applies (>1 beats the target).

Completion is forced with device-side checksums: block_until_ready is
unreliable through the remote TPU relay in this environment.
"""

import json
import sys
import time

import numpy as np

TARGET_RTF = 0.01
SAMPLE_RATE = 22050
HOP = 256


def _timeit(fn, *args, iters=8):
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters


def _spread_fields(per_call_secs):
    """Variance-protocol fields (VERDICT r4 item 8): median/IQR/min of the
    repeated measurements, in ms, plus the repeat count — so a future
    regression is distinguishable from session noise without a prose note."""
    s = np.sort(np.asarray(per_call_secs, np.float64)) * 1e3
    q1, q3 = np.percentile(s, [25, 75])
    return {"median_ms": round(float(np.median(s)), 2),
            "iqr_ms": round(float(q3 - q1), 2),
            "min_ms": round(float(s[0]), 2),
            "repeats": int(len(s))}


def _sustained_scan_diff(steps_fn, args, ka=1, kb=5, repeats=5):
    """Sustained per-step seconds via scan differencing, under the pinned
    variance protocol: compile/warm both K-step executables once, then take
    `repeats` interleaved (K=ka, K=kb) pairs; each pair yields
    (t_kb - t_ka)/(kb - ka). Returns (median_sec, spread_fields).

    Scan differencing cancels the remote-relay dispatch/fetch overhead that
    otherwise dominates per-call host timing (DESIGN.md "Where the train
    step time goes"); the median-of-5 with IQR replaces the old min-of-3 so
    rows carry their own spread."""
    fa, fb = steps_fn(ka), steps_fn(kb)
    float(fa(*args))
    float(fb(*args))
    per = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fa(*args))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(fb(*args))
        tb = time.perf_counter() - t0
        per.append((tb - ta) / (kb - ka))
    return float(np.median(per)), _spread_fields(per)


# Peak dense bf16 matmul rate per chip (for the MFU estimate).
_PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12, "TPU v5e": 197e12,
    "TPU v5p": 459e12, "TPU v5": 459e12,
    "TPU v6 lite": 918e12, "TPU v6e": 918e12,
}


def _cost_flops(jitted, *args):
    """Total FLOPs of one call per XLA's compiled cost analysis (None if
    unavailable, e.g. on CPU)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        return flops or None
    except Exception:
        return None


def _mfu_fields(flops, sec):
    """achieved TFLOP/s + model FLOPs utilization vs the chip's bf16 peak."""
    import jax

    if not flops:
        return {"achieved_tflops": None, "mfu": None}
    peak = _PEAK_BF16_FLOPS.get(jax.devices()[0].device_kind)
    tflops = flops / sec / 1e12
    return {"achieved_tflops": round(tflops, 2),
            "mfu": round(flops / sec / peak, 4) if peak else None}


def _build_models():
    import jax
    import jax.numpy as jnp

    from tts_king_tpu.config import TTSConfig
    from tts_king_tpu.models.fs2 import build_fastspeech2
    from tts_king_tpu.models.hifigan import Generator

    cfg = TTSConfig()  # shipped sizes: 4L/6L d256 FS2, 512-ch HiFi-GAN x256
    stats = {"pitch": [-7.0, 9.5], "energy": [-1.4, 6.1]}
    fs2 = build_fastspeech2(cfg.model, stats, n_speakers=66,
                            dtype=jnp.bfloat16)
    fs2_vars = fs2.init(
        jax.random.PRNGKey(0), np.zeros((1,), np.int32),
        np.ones((1, 8), np.int32), np.ones((1,), np.int32), train=False)
    voc = Generator(cfg.vocoder, dtype=jnp.bfloat16)
    voc_vars = voc.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 80)))
    return cfg, fs2, fs2_vars, voc, voc_vars


def bench_e2e(cfg, fs2, fs2_vars, voc, voc_vars, B=32, L=128, T=1000):
    """Config 3: batched multi-speaker synthesis (all 66 speaker ids cycle)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    speakers = jnp.asarray(np.arange(B) % 66, jnp.int32)
    texts = jnp.asarray(rng.randint(1, 206, (B, L)), jnp.int32)
    src_lens = jnp.full((B,), L, jnp.int32)

    @jax.jit
    def synthesize(fv, vv, s, t, sl):
        out = fs2.apply(fv, s, t, sl, max_mel_len=T, train=False)
        wav = voc.apply(vv, out["postnet_mel"])
        return jnp.sum(wav)

    # Depth-2 pipelining (the serving pattern): fetch of batch i-1 overlaps
    # compute of batch i, hiding the host<->device round trip.
    float(synthesize(fs2_vars, voc_vars, speakers, texts, src_lens))
    n_iters = 10
    t0 = time.perf_counter()
    prev = None
    for _ in range(n_iters):
        cur = synthesize(fs2_vars, voc_vars, speakers, texts, src_lens)
        if prev is not None:
            float(prev)
        prev = cur
    float(prev)
    sec = (time.perf_counter() - t0) / n_iters
    audio = B * T * HOP / SAMPLE_RATE
    rtf = sec / audio
    out = {"metric": "batched_synthesis_rtf", "value": round(rtf, 6),
           "unit": "rtf_per_chip", "vs_baseline": round(TARGET_RTF / rtf, 3),
           "mel_frames_per_sec_per_chip": round(B * T / sec)}
    out.update(_mfu_fields(
        _cost_flops(synthesize, fs2_vars, voc_vars, speakers, texts,
                    src_lens), sec))
    return out


def bench_fs2_single(cfg, fs2, fs2_vars):
    """Config 1: one Russian-length sentence, single speaker, text->mel."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    L, T = 64, 512
    texts = jnp.asarray(rng.randint(1, 206, (1, L)), jnp.int32)

    @jax.jit
    def fwd(v, t):
        out = fs2.apply(v, jnp.zeros((1,), jnp.int32), t,
                        jnp.full((1,), L, jnp.int32), max_mel_len=T,
                        train=False)
        return jnp.sum(out["postnet_mel"])

    sec = _timeit(fwd, fs2_vars, texts)
    out = {"metric": "fs2_single_sentence_latency",
           "value": round(sec * 1e3, 3), "unit": "ms", "vs_baseline": None,
           "mel_frames_per_sec_per_chip": round(T / sec)}
    out.update(_mfu_fields(_cost_flops(fwd, fs2_vars, texts), sec))
    return out


def bench_vocoder(cfg, voc, voc_vars, B=8, T=1000):
    """Config 2: mel->wav on a fixed-length mel batch."""
    import jax
    import jax.numpy as jnp

    mel = jnp.asarray(np.random.RandomState(2).randn(B, T, 80), jnp.bfloat16)

    @jax.jit
    def fwd(v, m):
        return jnp.sum(voc.apply(v, m))

    sec = _timeit(fwd, voc_vars, mel)
    rtf = sec / (B * T * HOP / SAMPLE_RATE)
    out = {"metric": "hifigan_mel_to_wav_rtf", "value": round(rtf, 6),
           "unit": "rtf_per_chip", "vs_baseline": round(TARGET_RTF / rtf, 3),
           "mel_frames_per_sec_per_chip": round(B * T / sec)}
    out.update(_mfu_fields(_cost_flops(fwd, voc_vars, mel), sec))
    return out


def bench_vocoder_int8(cfg, voc_vars, B=8, T=1000):
    """Config 2b: mel->wav with the int8-quantized fused MRF backend
    (ops/pallas/mrf_packed.py). Reported for the record: measured ~0.9x of
    the bf16 XLA packed path on v5e-lite (int8 MXU rate needs deeper
    contractions than these stages have — DESIGN.md 3.0)."""
    import jax
    import jax.numpy as jnp

    from tts_king_tpu.models.hifigan import Generator

    voc8 = Generator(cfg.vocoder, dtype=jnp.bfloat16,
                     mrf_backend="fused_int8")
    mel = jnp.asarray(np.random.RandomState(2).randn(B, T, 80), jnp.bfloat16)

    @jax.jit
    def fwd(v, m):
        return jnp.sum(voc8.apply(v, m))

    sec = _timeit(fwd, voc_vars, mel)
    rtf = sec / (B * T * HOP / SAMPLE_RATE)
    return {"metric": "hifigan_int8_mel_to_wav_rtf", "value": round(rtf, 6),
            "unit": "rtf_per_chip", "vs_baseline": round(TARGET_RTF / rtf, 3),
            "mel_frames_per_sec_per_chip": round(B * T / sec)}


def bench_features(cfg):
    """Config 4: batched mel+energy+F0 extraction throughput (x realtime)."""
    import jax.numpy as jnp

    from tts_king_tpu.ops.f0 import yin_f0
    from tts_king_tpu.ops.stft import MelExtractor

    B, T = 16, SAMPLE_RATE * 8  # 16 x 8 s utterances
    wav = jnp.asarray(np.random.RandomState(3).randn(B, T) * 0.3, jnp.float32)
    mel = MelExtractor()

    import jax

    @jax.jit
    def extract(y):
        m, e = mel.mel_and_energy(y)
        f0 = yin_f0(y, SAMPLE_RATE, HOP)
        return jnp.sum(m) + jnp.sum(e) + jnp.sum(f0)

    sec = _timeit(extract, wav, iters=4)
    xrt = (B * T / SAMPLE_RATE) / sec
    return {"metric": "feature_extraction_speed", "value": round(xrt, 1),
            "unit": "x_realtime_per_chip", "vs_baseline": None}


def bench_train_step(cfg, fs2, fs2_vars):
    """Config 5: full FS2 training step (batch 16, grad-acc 4), single chip."""
    import jax
    import jax.numpy as jnp

    from tts_king_tpu.config import OptimizerConfig
    from tts_king_tpu.train.state import TrainState, make_optimizer
    from tts_king_tpu.train.step import make_train_step

    opt = make_optimizer(OptimizerConfig(), 256)
    # f32 params for training
    params = jax.tree.map(lambda x: x.astype(jnp.float32)
                          if jnp.issubdtype(x.dtype, jnp.floating) else x,
                          fs2_vars["params"])
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       batch_stats=fs2_vars.get("batch_stats", {}),
                       opt_state=opt.init(params))

    acc, B, L, T = 4, 16, 96, 640
    rng = np.random.RandomState(4)
    d = rng.randint(4, 9, (acc, B, L))
    superbatch = dict(
        speakers=rng.randint(0, 66, (acc, B)).astype(np.int32),
        texts=rng.randint(1, 206, (acc, B, L)).astype(np.int32),
        src_lens=np.full((acc, B), L, np.int32),
        mels=rng.randn(acc, B, T, 80).astype(np.float32),
        mel_lens=np.minimum(d.sum(-1), T).astype(np.int32),
        energies=rng.randn(acc, B, L).astype(np.float32),
        durations=d.astype(np.int32),
        pitches_raw=rng.randn(acc, B, L).astype(np.float32),
        pitches_cwt=rng.randn(acc, B, L, 11).astype(np.float32),
        pitches_mean=rng.randn(acc, B).astype(np.float32),
        pitches_std=rng.rand(acc, B).astype(np.float32),
    )
    model = __import__("tts_king_tpu.models.fs2", fromlist=["x"]).FastSpeech2(
        model_config=cfg.model, n_speakers=66, pitch_min=-7.0,
        pitch_max=9.5, energy_min=-1.4, energy_max=6.1)
    ts = make_train_step(model, opt)
    superbatch = jax.device_put(superbatch)

    # Sustained device-side step time via scan differencing: run K steps
    # inside ONE executable and difference two K values, cancelling the
    # remote-relay dispatch/fetch overhead that otherwise dominates
    # per-call host timing (DESIGN.md "Where the train step time goes").
    def steps_fn(k):
        @jax.jit
        def run(state, sb, rng):
            def body(carry, i):
                st, _ = carry
                st, losses = ts(st, sb, jax.random.fold_in(rng, i))
                return (st, losses.total), None
            (st, tot), _ = jax.lax.scan(body, (state, jnp.float32(0)),
                                        jnp.arange(k))
            return tot
        return run

    rngk = jax.random.PRNGKey(0)
    sec, spread = _sustained_scan_diff(steps_fn, (state, superbatch, rngk))

    out = {"metric": "fs2_train_step", "value": round(sec * 1e3, 1),
           "unit": "ms_per_optimizer_step_bs16x4_sustained",
           "vs_baseline": None, **spread}
    # XLA's cost analysis counts a scan body once regardless of trip count,
    # so derive true per-step FLOPs from an acc=1 superbatch (its scan runs
    # exactly once) scaled by the accumulation factor.
    sb1 = {k: v[:1] for k, v in jax.device_get(superbatch).items()}
    train_step1 = jax.jit(ts)
    flops1 = _cost_flops(train_step1, state, sb1, rngk)
    out.update(_mfu_fields(flops1 * acc if flops1 else None, sec))
    return out


# Useful (native grouped-conv) FLOPs of one GAN train step at the bench
# shapes (bs16 x 8192), from XLA cost analysis of the native-lowering f32
# program (round-3 row: 23.03 TF/s x 0.113 s). The production step lowers
# the MSD's grouped convs block-diagonally (models/hifigan.py:_disc_conv),
# which inflates the compiled program's nominal FLOP count with structural
# zeros — MFU here is reported against the USEFUL count so it stays
# comparable across lowerings.
_GAN_STEP_USEFUL_FLOPS = 2.602e12


def bench_vocoder_train_step(cfg):
    """HiFi-GAN GAN training step (G + MPD + MSD fwd/bwd, both optimizer
    updates) at the upstream recipe's shapes: batch 16 x 8192-sample
    segments (hifi config.yaml:18,23), in the production TPU training
    configuration (bf16 compute, pair-batched disc side, split gen side,
    block-diag grouped-conv lowering — DESIGN.md 3.10). Sustained via
    scan differencing, like the FS2 row."""
    import jax
    import jax.numpy as jnp

    from tts_king_tpu.train.vocoder import VocoderTrainer

    vcfg = cfg.vocoder
    B = 16
    seg_frames = vcfg.segment_size // vcfg.hop_size
    trainer = VocoderTrainer(vcfg, compute_dtype=jnp.bfloat16)
    state = trainer.init_state(jax.random.PRNGKey(0), seg_frames)
    ts = trainer.make_train_step()

    rng = np.random.RandomState(6)
    batch = jax.device_put(dict(
        mel=rng.randn(B, seg_frames, vcfg.num_mels).astype(np.float32),
        wav=(rng.randn(B, vcfg.segment_size) * 0.1).astype(np.float32),
        mel_loss=rng.randn(B, seg_frames, vcfg.num_mels).astype(np.float32),
    ))

    def steps_fn(k):
        @jax.jit
        def run(st, b):
            def body(carry, _):
                st, _ = carry
                st, losses = ts(st, b)
                return (st, losses.gen), None
            (st, tot), _ = jax.lax.scan(body, (st, jnp.float32(0)),
                                        None, length=k)
            return tot
        return run

    sec, spread = _sustained_scan_diff(steps_fn, (state, batch))

    out = {"metric": "hifigan_train_step", "value": round(sec * 1e3, 1),
           "unit": "ms_per_step_bs16_seg8192_sustained", "vs_baseline": None,
           "compute_dtype": "bfloat16", **spread}
    # The K=1 scan body runs exactly once, so its cost analysis IS one
    # step — but the block-diag lowering pads it with structural zeros;
    # report that as nominal and compute MFU on the useful count.
    nominal = _cost_flops(steps_fn(1), state, batch)
    if nominal:
        out["nominal_tflops_compiled"] = round(nominal / 1e12, 2)
    out.update(_mfu_fields(_GAN_STEP_USEFUL_FLOPS, sec))
    out["flops_basis"] = "useful (native-lowering cost analysis)"
    return out


def bench_streaming_latency(cfg, fs2, fs2_vars, voc, voc_vars):
    """Time-to-first-audio for streaming synthesis of one sentence: FS2
    forward + the first halo'd vocoder window (ops/streaming.py)."""
    import jax
    import jax.numpy as jnp

    from tts_king_tpu.ops.streaming import generator_receptive_field

    L, T = 64, 512
    rng = np.random.RandomState(5)
    texts = jnp.asarray(rng.randint(1, 206, (1, L)), jnp.int32)
    halo = generator_receptive_field(cfg.vocoder)
    chunk = 32
    window = chunk + 2 * halo

    @jax.jit
    def first_chunk(fv, vv, t):
        out = fs2.apply(fv, jnp.zeros((1,), jnp.int32), t,
                        jnp.full((1,), L, jnp.int32), max_mel_len=T,
                        train=False)
        wav = voc.apply(vv, out["postnet_mel"][:, :window])
        return jnp.sum(wav)

    sec = _timeit(first_chunk, fs2_vars, voc_vars, texts)
    return {"metric": "streaming_time_to_first_audio",
            "value": round(sec * 1e3, 1), "unit": "ms",
            "vs_baseline": None}


def bench_serving_ttfa(cfg):
    """Time-to-first-audio through the PRODUCTION serving path
    (serve.SynthesisServer.stream), measured submit -> first chunk in hand.
    Exercises the round-3 speculative first-window dispatch: FS2 and the
    first vocoder window are chained device-side (dispatch->dispatch->sync
    instead of dispatch->sync->dispatch->sync), so the host sync on the
    realized mel length overlaps the window's compute."""
    import jax.numpy as jnp

    from tts_king_tpu.pipeline import TTSKing
    from tts_king_tpu.serve import SynthesisServer

    king = TTSKing(cfg, dtype=jnp.bfloat16)
    dp = king.tts.variables["params"]["variance_adaptor"][
        "duration_predictor"]["linear_layer"]
    dp["bias"] = jnp.full_like(dp["bias"], 1.5)

    server = SynthesisServer(king)
    rng = np.random.RandomState(9)
    phonemes = rng.randint(64, 200, size=(64,))
    try:
        for _ in range(2):                      # warm all shapes
            for _ in server.stream(phonemes=phonemes):
                pass
        ttfas = []
        for _ in range(12):
            t0 = time.perf_counter()
            gen = server.stream(phonemes=phonemes)
            next(gen)
            ttfas.append(time.perf_counter() - t0)
            for _ in gen:                       # drain
                pass
        used_speculative = bool(server._first_window_fns
                                or server._fused_head_fns)
    finally:
        server.close()
    return {"metric": "serving_time_to_first_audio",
            "value": round(float(np.median(ttfas)) * 1e3, 1), "unit": "ms",
            "vs_baseline": None, "speculative_window": used_speculative}


def main():
    run_all = "--all" in sys.argv
    only = None
    if "--only" in sys.argv:
        # --only fs2_single,features : targeted quiet-box reruns of named
        # rows (the keys below) without paying for the full sweep.
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    cfg, fs2, fs2_vars, voc, voc_vars = _build_models()

    named = {
        "fs2_single": lambda: bench_fs2_single(cfg, fs2, fs2_vars),
        "vocoder": lambda: bench_vocoder(cfg, voc, voc_vars),
        "vocoder_int8": lambda: bench_vocoder_int8(cfg, voc_vars),
        "e2e": lambda: bench_e2e(cfg, fs2, fs2_vars, voc, voc_vars),
        "features": lambda: bench_features(cfg),
        "train_step": lambda: bench_train_step(cfg, fs2, fs2_vars),
        "vocoder_train_step": lambda: bench_vocoder_train_step(cfg),
        "streaming": lambda: bench_streaming_latency(
            cfg, fs2, fs2_vars, voc, voc_vars),
        "serving": lambda: bench_serving_ttfa(cfg),
    }
    if only is not None:
        unknown = only - set(named)
        if unknown:
            raise SystemExit(f"unknown --only rows: {sorted(unknown)}; "
                             f"choose from {sorted(named)}")
        for key in named:
            if key in only:
                print(json.dumps(named[key]()), flush=True)
        return

    headline = bench_e2e(cfg, fs2, fs2_vars, voc, voc_vars)
    if run_all:
        results = [
            named["fs2_single"](),
            named["vocoder"](),
            named["vocoder_int8"](),
            headline,
            named["features"](),
            named["train_step"](),
            named["vocoder_train_step"](),
            named["streaming"](),
            named["serving"](),
        ]
        for r in results:
            print(json.dumps(r))
    else:
        print(json.dumps(headline))


if __name__ == "__main__":
    main()
