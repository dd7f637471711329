"""Dynamic-batching synthesis server tests."""

import types

import numpy as np
import pytest

from tests.test_pipeline import small_cfg  # noqa: F401  (fixture)


@pytest.fixture(scope="module")
def king(small_cfg):  # noqa: F811
    import jax.numpy as jnp

    from tts_king_tpu.pipeline import TTSKing

    k = TTSKing(small_cfg)
    # bias the duration head so untrained weights produce nonzero durations
    dp = k.tts.variables["params"]["variance_adaptor"]["duration_predictor"][
        "linear_layer"]
    dp["bias"] = jnp.full_like(dp["bias"], 1.5)
    return k


def test_server_batches_requests(king):
    from tts_king_tpu.serve import SynthesisServer

    server = SynthesisServer(king, max_batch=4, max_wait_ms=50)
    try:
        rng = np.random.RandomState(0)
        futures = []
        for i in range(6):
            phonemes = rng.randint(64, 200, size=(5 + i,))
            futures.append(server.submit(phonemes=phonemes, speaker=i % 3))
        wavs = [f.result(timeout=120) for f in futures]
        for wav in wavs:
            assert wav.dtype == np.int16
            assert wav.ndim == 1
        # longer phoneme sequences should not produce shorter audio than much
        # shorter ones (duration head is constant-biased)
        assert len(wavs[-1]) > 0
    finally:
        server.close()


def test_server_mel_mode_and_errors(king):
    from tts_king_tpu.serve import SynthesisServer

    server = SynthesisServer(king, max_batch=2, max_wait_ms=5,
                             return_wav=False)
    try:
        f = server.submit(phonemes=np.array([70, 80, 90]))
        mel, n = f.result(timeout=120)
        assert mel.shape[1] == 80 and mel.shape[0] == n

        bad = server.submit(phonemes=np.array([1.5, 2.5]))  # float ids: cast ok
        mel2, n2 = bad.result(timeout=120)
        assert mel2.shape[1] == 80
    finally:
        server.close()


def test_server_window_policy_still_works(king):
    from tts_king_tpu.serve import SynthesisServer

    server = SynthesisServer(king, max_batch=4, max_wait_ms=20,
                             policy="window")
    try:
        fs = [server.submit(phonemes=np.array([70, 80, 90, 100]))
              for _ in range(3)]
        for f in fs:
            wav = f.result(timeout=120)
            assert wav.dtype == np.int16 and wav.ndim == 1
    finally:
        server.close()

    with pytest.raises(ValueError, match="policy"):
        SynthesisServer(king, policy="nonsense")


def test_server_over_dp_mesh(small_cfg):  # noqa: F811
    """Serve over a data-parallel mesh: results must match the single-device
    server bit for bit (same weights, same requests)."""
    import jax

    from tts_king_tpu.parallel.mesh import build_mesh
    from tts_king_tpu.pipeline import TTSKing
    from tts_king_tpu.serve import SynthesisServer

    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device mesh")

    def run(mesh):
        import jax.numpy as jnp

        k = TTSKing(small_cfg, mesh=mesh)
        dp = k.tts.variables["params"]["variance_adaptor"][
            "duration_predictor"]["linear_layer"]
        dp["bias"] = jnp.full_like(dp["bias"], 1.5)
        server = SynthesisServer(k, max_batch=4, max_wait_ms=20)
        try:
            rng = np.random.RandomState(7)
            futures = [server.submit(phonemes=rng.randint(64, 200, size=(6,)),
                                     speaker=i % 3) for i in range(5)]
            return [f.result(timeout=180) for f in futures]
        finally:
            server.close()

    wavs_mesh = run(build_mesh(dp=4, tp=1, devices=jax.devices()[:4]))
    wavs_single = run(None)
    assert len(wavs_mesh) == len(wavs_single)
    for a, b in zip(wavs_mesh, wavs_single):
        np.testing.assert_array_equal(a, b)


def test_per_item_speakers(king):
    out = king.tts.generate(
        np.array([[70, 80, 90, 0], [70, 80, 0, 0]]),
        speaker_name=[0, 2], src_lens=[3, 2])
    assert np.asarray(out["postnet_mel"]).shape[0] == 2


def test_length_groups_split():
    """Mixed-length batches split at phoneme-bucket boundaries only when
    that lowers total padded (batch-bucket x length-bucket) compute."""
    from tts_king_tpu.serve import SynthesisServer, _Request

    server = object.__new__(SynthesisServer)
    server.batch_buckets = [1, 4, 16]
    # _pbucket consults king.tts.phone_buckets (load-tuned grids); the
    # stub uses the pow2 default
    server.king = types.SimpleNamespace(tts=types.SimpleNamespace(
        phone_buckets=None))

    def reqs(lengths):
        return [_Request(np.zeros((n,), np.int32), 0, (1.0, 1.0, 1.0))
                for n in lengths]

    # <=4 requests: never split
    small = reqs([10, 60])
    assert server._length_groups(small) == [small]

    # 8 requests in two clear buckets (<=16 and <=64): split halves the
    # padded cost (4x16 + 4x64 < 16x64)
    mixed = reqs([10, 12, 14, 15, 50, 55, 60, 62])
    groups = server._length_groups(mixed)
    assert [sorted(len(r.phonemes) for r in g) for g in groups] == [
        [10, 12, 14, 15], [50, 55, 60, 62]]

    # a tiny large-bucket tail dispatches alone rather than padding the
    # small group up
    tail = reqs([10, 11, 12, 13, 100])
    groups = server._length_groups(tail)
    assert [len(g) for g in groups] == [4, 1]

    # deep-overload shape: 16 requests over adjacent buckets whose groups
    # would each still pad to B=16 — splitting would TRIPLE the padded
    # cost, so the batch stays whole
    overload = reqs([12, 14, 12, 15, 13, 25, 28, 30, 27, 26, 29,
                     50, 55, 60, 62, 58])
    assert server._length_groups(overload) == [overload]


def test_deferred_overflow_retry(king, monkeypatch):
    """When the duration predictor overflows the guessed mel bucket, the
    completer retries at the model cap and still resolves every future with
    the same audio lengths the synchronous path produces."""
    import tts_king_tpu.pipeline as pipeline
    from tts_king_tpu.serve import SynthesisServer

    rng = np.random.RandomState(3)
    phonemes = rng.randint(10, 100, size=(40,))

    # Synchronous reference (escalates buckets before returning).
    ref = king.tts.generate(phonemes[None], speaker_name=0)
    ref_len = int(np.asarray(ref["mel_lens"])[0])

    # Force the server's first guess to a bucket the prediction overflows
    # (biased duration head gives ~4.5 frames/phoneme -> ~180 > 128).
    monkeypatch.setattr(pipeline, "_FRAMES_PER_PHONE_GUESS", 1.0)
    assert ref_len > 128, "test premise: prediction must overflow bucket 128"

    server = SynthesisServer(king, max_batch=4)
    try:
        wav = server.submit(phonemes=phonemes).result(timeout=300)
    finally:
        server.close()
    hop = king.cfg.preprocess.stft.hop_length
    assert wav.shape == (ref_len * hop,)


def test_stream_endpoint(king):
    """Streaming endpoint: chunks arrive incrementally, concatenate to the
    full utterance length, and match the batched path away from the
    halo'd window edges — while batched traffic flows on the same server."""
    from tts_king_tpu.serve import SynthesisServer

    rng = np.random.RandomState(7)
    phonemes = rng.randint(10, 100, size=(24,))

    server = SynthesisServer(king, max_batch=4)
    try:
        batched_future = server.submit(phonemes=phonemes)
        chunks = list(server.stream(phonemes=phonemes, chunk_frames=16))
        batched = batched_future.result(timeout=300)
    finally:
        server.close()

    assert len(chunks) > 1, "expected incremental chunks"
    streamed = np.concatenate(chunks)
    assert streamed.dtype == np.int16
    assert streamed.shape == batched.shape
    # interiors match the batched path (streaming windows are exact inside
    # their halos); compare the middle half
    lo, hi = len(streamed) // 4, 3 * len(streamed) // 4
    frac_off = float(np.mean(
        np.abs(streamed[lo:hi].astype(np.int32)
               - batched[lo:hi].astype(np.int32)) > 2))
    assert frac_off < 0.01, f"{frac_off:.2%} of interior samples differ"


def test_http_front_end(king):
    """HTTP surface: /health, /tts (WAV container), /stream (chunked PCM)
    against a live server on an ephemeral port."""
    import json
    import threading
    import urllib.request
    import wave as wave_mod

    from tts_king_tpu.serve import serve_http

    httpd, server = serve_http(king, port=0, max_batch=4)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/health", timeout=60) as r:
            health = json.loads(r.read())
        assert health["ok"] is True

        body = json.dumps({"phonemes": [70, 80, 90, 100],
                           "speaker": 1}).encode()
        req = urllib.request.Request(f"{base}/tts", data=body,
                                     headers={"Content-Type":
                                              "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            data = r.read()
        import io
        with wave_mod.open(io.BytesIO(data)) as w:
            assert w.getframerate() == king.cfg.preprocess.audio.sampling_rate
            assert w.getnframes() > 0
            wav_http = np.frombuffer(w.readframes(w.getnframes()), np.int16)

        req = urllib.request.Request(f"{base}/stream", data=body,
                                     headers={"Content-Type":
                                              "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.headers["Content-Type"].startswith("audio/L16")
            pcm = np.frombuffer(r.read(), np.int16)
        assert pcm.shape == wav_http.shape

        # Errors raised BEFORE the first audio chunk (stream() is a
        # generator — nothing runs until the handler's first next()) must
        # come back as a clean JSON 500, not a connection reset after the
        # chunked headers already went out.
        bad = json.dumps({"phonemes": [70, 80, 90, 100],
                          "speaker": "no-such-speaker"}).encode()
        req = urllib.request.Request(f"{base}/stream", data=bad,
                                     headers={"Content-Type":
                                              "application/json"})
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected HTTP 500"
        except urllib.error.HTTPError as e:
            assert e.code == 500
            assert "error" in json.loads(e.read())
    finally:
        httpd.shutdown()
        server.close()


def test_overload_admission_control(king):
    """Past admission_depth waiting requests, submit() rejects immediately
    and the queue never grows beyond the bound (VERDICT r2 weak-#1)."""
    from tts_king_tpu.serve import ServerOverloaded, SynthesisServer

    server = SynthesisServer(king, max_batch=2, admission_depth=4)
    try:
        # Stall the dispatcher so the queue actually fills: monkey-free
        # approach — flood faster than the tiny pipeline can drain. The
        # first few are admitted; once 4 wait, rejections must start.
        rng = np.random.RandomState(0)
        rejected = 0
        futures = []
        for _ in range(400):
            try:
                futures.append(
                    server.submit(phonemes=rng.randint(64, 200, size=(40,))))
            except ServerOverloaded:
                rejected += 1
            assert server._queue.qsize() <= 4  # bound holds at all times
        assert rejected > 0, "overload never rejected anything"
        st = server.stats()
        assert st["rejected"] == rejected
        assert st["admitted"] == len(futures)
        # admitted requests still complete fine under/after the burst
        for f in futures:
            wav = f.result(timeout=300)
            assert wav.dtype == np.int16
        assert server.stats()["completed"] == len(futures)
    finally:
        server.close()


def test_deadline_shedding(king):
    """A request whose deadline passes while queued fails with
    DeadlineExceeded and never reaches the device."""
    import time as _time

    from tts_king_tpu.serve import DeadlineExceeded, SynthesisServer

    server = SynthesisServer(king, max_batch=2, admission_depth=64)
    try:
        rng = np.random.RandomState(1)
        # Saturate the pipeline, then submit an already-expired request.
        warm = [server.submit(phonemes=rng.randint(64, 200, size=(24,)))
                for _ in range(6)]
        doomed = server.submit(phonemes=rng.randint(64, 200, size=(24,)),
                               deadline_ms=0.0)
        with pytest.raises(DeadlineExceeded):
            doomed.result(timeout=120)
        for f in warm:
            f.result(timeout=300)
        assert server.stats()["shed"] >= 1
        # sane request afterwards still works
        ok = server.submit(phonemes=rng.randint(64, 200, size=(24,)),
                           deadline_ms=60000.0)
        assert ok.result(timeout=300).dtype == np.int16
    finally:
        server.close()


def test_vocoder_stage_sheds_fully_expired_batch(king):
    """A batch whose every member expired after FS2 dispatch is dropped at
    the vocoder stage without spending vocoder compute — the handles are a
    sentinel that would crash _vocode_batch (with TypeError, not
    DeadlineExceeded) if the stage tried to vocode it."""
    from tts_king_tpu.serve import (DeadlineExceeded, SynthesisServer,
                                    _Request, _now)

    server = SynthesisServer(king, max_batch=2)
    try:
        reqs = [_Request(np.arange(5, dtype=np.int32), 0, (1.0, 1.0, 1.0))
                for _ in range(2)]
        for r in reqs:
            r.deadline = _now() - 1.0
        server._mid.put((reqs, object()))
        for r in reqs:
            with pytest.raises(DeadlineExceeded):
                r.future.result(timeout=60)
        assert server.stats()["shed"] == 2
    finally:
        server.close()


def test_prewarm_compiles_serving_grid(king):
    """prewarm() walks the full (batch-bucket x phoneme-bucket x
    mel-bucket) grid through the production jit caches and the server
    serves normally afterwards."""
    from tts_king_tpu.pipeline import MEL_BUCKETS
    from tts_king_tpu.serve import SynthesisServer

    server = SynthesisServer(king, max_batch=4)
    try:
        out = server.prewarm(max_phonemes=20)
        assert out["batch_buckets"] == [1, 4]
        assert out["phone_buckets"] == [16, 32]
        assert out["mel_buckets"], "no vocoder shapes warmed"
        assert set(out["mel_buckets"]) <= set(MEL_BUCKETS)
        # prewarm must warm the SAME vocoder executable production
        # dispatches (the int16-fused one), not a lookalike
        voc_cache = king.vocoder._apply_i16._cache_size()
        wav = server.submit(
            phonemes=np.arange(64, 76, dtype=np.int32)).result(timeout=300)
        assert wav.dtype == np.int16
        assert king.vocoder._apply_i16._cache_size() == voc_cache, \
            "live request compiled a vocoder shape prewarm missed"
    finally:
        server.close()


def test_http_429_and_stats(king):
    """HTTP front maps ServerOverloaded to 429 (+Retry-After) and exposes
    /stats."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from tts_king_tpu.serve import serve_http

    httpd, server = serve_http(king, port=0, max_batch=2, admission_depth=1)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        body = json.dumps({"phonemes": [70, 80, 90, 100]}).encode()
        hdr = {"Content-Type": "application/json"}

        results = []

        def post_one():
            req = urllib.request.Request(f"{base}/tts", data=body,
                                         headers=hdr)
            try:
                with urllib.request.urlopen(req, timeout=300) as r:
                    results.append(r.status)
            except urllib.error.HTTPError as e:
                results.append(e.code)
                if e.code == 429:
                    assert e.headers.get("Retry-After") is not None

        threads = [threading.Thread(target=post_one) for _ in range(24)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert 200 in results
        assert 429 in results, f"no rejections among {results}"

        with urllib.request.urlopen(f"{base}/stats", timeout=60) as r:
            st = json.loads(r.read())
        assert st["rejected"] >= 1 and st["admitted"] >= 1
    finally:
        httpd.shutdown()
        server.close()


def test_stream_speculative_first_window(king):
    """TTFA path: with a long utterance (mel covers chunk+halo frames) the
    speculative device-chained first window fires, and the streamed audio
    still matches the plain stream bit-for-bit at every sample."""
    from tts_king_tpu.ops.streaming import generator_receptive_field
    from tts_king_tpu.serve import SynthesisServer

    rng = np.random.RandomState(11)
    phonemes = rng.randint(10, 100, size=(48,))  # long: ~3.5 frames/phone
    halo = generator_receptive_field(king.cfg.vocoder)
    chunk = 16

    server = SynthesisServer(king, max_batch=4)
    try:
        spec_chunks = list(server.stream(phonemes=phonemes,
                                         chunk_frames=chunk))
        # plain reference: same computation without the speculative window
        out = king.tts.generate(np.asarray(phonemes, np.int32)[None],
                                speaker_name=0)
        n = int(np.asarray(out["mel_lens"])[0])
        assert n >= chunk + halo, "fixture too short to exercise the path"
        assert server._fused_head_fns or server._first_window_fns, (
            "neither the fused head nor the speculative window compiled")
        from tts_king_tpu.ops.streaming import stream_vocoder

        mel = np.asarray(out["postnet_mel"], np.float32)[:1, :n]
        hop = king.cfg.preprocess.stft.hop_length
        scale = king.cfg.vocoder.max_wav_value
        ref_chunks = [
            (np.asarray(c, np.float32) * scale).astype(np.int16)
            for c in stream_vocoder(king.vocoder._apply,
                                    king.vocoder.variables, mel,
                                    chunk_frames=chunk, halo_frames=halo,
                                    hop=hop)]
    finally:
        server.close()

    got = np.concatenate(spec_chunks)
    want = np.concatenate(ref_chunks)
    assert got.shape == want.shape
    # int16 quantization absorbs sub-ulp float reassociation differences
    # between the fused and host-padded window programs
    assert np.mean(np.abs(got.astype(np.int32)
                          - want.astype(np.int32)) > 1) < 0.001


def test_optimal_buckets_dp():
    """Exact DP beats the power-of-2 grid on a skewed distribution and
    reproduces trivial cases."""
    from tts_king_tpu.pipeline import _phone_bucket
    from tts_king_tpu.serve import optimal_buckets

    # trivial: fewer uniques than k
    assert optimal_buckets([5, 5, 9], 4) == [5, 9]
    # max must be a top
    tops = optimal_buckets([3, 3, 3, 3, 100], 2)
    assert tops[-1] == 100 and 3 in tops
    # skew: most mass at 17 (pow2 pads to 32); DP with 3 tops must cut
    # total padding vs the pow2 grid
    rng = np.random.RandomState(0)
    lens = np.concatenate([np.full(90, 17), rng.randint(40, 48, 10)])
    tops = optimal_buckets(lens, 3)
    dp_cost = sum(min(t for t in tops if t >= l) for l in lens)
    pow2_cost = sum(_phone_bucket(l) for l in lens)
    assert dp_cost < 0.75 * pow2_cost
    # every value is covered
    assert max(lens) <= tops[-1]


def test_suggest_buckets_from_load(king):
    """The server derives better padding grids from its recorded load and
    tuned grids actually drive the pipeline."""
    from tts_king_tpu.serve import SynthesisServer

    server = SynthesisServer(king, max_batch=4)
    try:
        rng = np.random.RandomState(2)
        futures = [server.submit(phonemes=rng.randint(64, 200, size=(18,)))
                   for _ in range(12)]
        for f in futures:
            f.result(timeout=300)
        sug = server.suggest_buckets(k_batch=2, k_len=2)
    finally:
        server.close()
    assert sug["n_requests"] == 12 and sug["n_dispatches"] >= 1
    assert sug["phone_buckets"][-1] == 18
    assert sug["phone_padded_ratio_vs_current"] < 1.0  # beats pow2 (32)
    assert 1 in sug["batch_buckets"]

    # applying the tuned grid changes the padded shape the pipeline uses
    king.tts.phone_buckets = sug["phone_buckets"]
    try:
        out = king.tts.generate(np.asarray([[70] * 18], np.int32),
                                speaker_name=0, defer_overflow=True)
        # L padded to exactly 18 (the tuned top), not 32
        # (postnet_mel length is mel-bucketed; check via duration shape)
        assert out["duration_rounded"].shape[1] == 18
    finally:
        king.tts.phone_buckets = None


def test_drain_and_serving_state_roundtrip(king, tmp_path):
    """Graceful restart story: drain() completes admitted work while
    rejecting new submissions (ServerDraining), save_serving_state()
    persists the tuned grids, and from_serving_state() builds a
    replacement server that adopts them and answers identically."""
    import threading

    from tts_king_tpu.serve import ServerDraining, SynthesisServer

    phon = np.array([70, 80, 90, 100, 80, 70])
    server = SynthesisServer(king, max_batch=4)
    try:
        rng = np.random.RandomState(3)
        futures = [server.submit(phonemes=rng.randint(64, 200, size=(14,)))
                   for _ in range(8)]
        ref_wav = server.submit(phonemes=phon).result(timeout=300)
        king.tts.phone_buckets = [14, 48]   # pretend autotune was applied
        stats = {}
        t = threading.Thread(
            target=lambda: stats.update(server.drain(timeout=120)))
        t.start()
        # Admitted work completes even though the server is draining.
        for f in futures:
            assert f.result(timeout=300).dtype == np.int16
        t.join(timeout=120)
        assert not t.is_alive()
        assert stats["completed"] >= 9 and stats["queued"] == 0
        with pytest.raises(ServerDraining):
            server.submit(phonemes=phon)
        path = str(tmp_path / "serving_state.json")
        saved = server.save_serving_state(path)
        assert saved["phone_buckets"] == [14, 48]
        assert saved["suggested"]["n_requests"] >= 9
    finally:
        king.tts.phone_buckets = None

    # A fresh process: adopt the drained server's state.
    state = SynthesisServer.load_serving_state(path)
    server2 = SynthesisServer.from_serving_state(king, state, prewarm=False,
                                                 max_batch=4)
    try:
        assert king.tts.phone_buckets == [14, 48]
        wav2 = server2.submit(phonemes=phon).result(timeout=300)
    finally:
        server2.close()
        king.tts.phone_buckets = None
    # Identical model -> identical audio for the same request, even though
    # the adopted grid pads the phonemes differently (masking exactness).
    assert np.array_equal(wav2, ref_wav)


def test_tuned_grid_pads_up_beyond_top(king):
    """A request LONGER than the tuned grid's top pads UP via the pow2
    fallback instead of clamping to the grid top (clamping made
    texts[:, :L] = phonemes a broadcast ValueError, i.e. HTTP 500 for
    every long request after a --state-file restart)."""
    from tts_king_tpu.serve import SynthesisServer

    king.tts.phone_buckets = [8, 12]
    try:
        # direct pipeline path: 20 phonemes > grid top 12 -> pow2 32
        out = king.tts.generate(np.full((1, 20), 70, np.int32),
                                speaker_name=0, defer_overflow=True)
        assert out["duration_rounded"].shape[1] == 32
        # batched pipeline + streaming fused-head paths
        server = SynthesisServer(king, max_batch=2)
        try:
            phon = np.arange(64, 84, dtype=np.int32)
            wav = server.submit(phonemes=phon).result(timeout=300)
            assert wav.dtype == np.int16 and wav.size
            chunks = list(server.stream(phonemes=phon))
            assert sum(c.size for c in chunks) > 0
        finally:
            server.close()
    finally:
        king.tts.phone_buckets = None


def test_failed_batches_settle_stats_and_drain(king, monkeypatch):
    """Batches that fail in the dispatcher or the vocoder stage still
    count as 'failed', so drain()'s settled>=admitted wait terminates
    instead of burning its whole timeout after any failure."""
    import time as _time

    from tts_king_tpu.serve import SynthesisServer

    def boom(*a, **k):
        raise RuntimeError("boom")

    # dispatcher (_fs2_batch) failure path
    server = SynthesisServer(king, max_batch=2, max_wait_ms=5)
    try:
        monkeypatch.setattr(server, "_fs2_batch", boom)
        f = server.submit(phonemes=np.array([70, 80, 90]))
        with pytest.raises(RuntimeError):
            f.result(timeout=60)
        t0 = _time.monotonic()
        stats = server.drain(timeout=30)
        assert _time.monotonic() - t0 < 15, "drain burned its timeout"
        assert stats["failed"] == 1
    finally:
        server.close()

    # vocoder-stage (_vocode_batch) failure path
    server = SynthesisServer(king, max_batch=2, max_wait_ms=5)
    try:
        monkeypatch.setattr(server, "_vocode_batch", boom)
        f = server.submit(phonemes=np.array([70, 80, 90]))
        with pytest.raises(RuntimeError):
            f.result(timeout=60)
        t0 = _time.monotonic()
        stats = server.drain(timeout=30)
        assert _time.monotonic() - t0 < 15
        assert stats["failed"] == 1
    finally:
        server.close()


def test_prewarm_covers_raw_length_mel_buckets(king):
    """The mel bucket is derived from the RAW request length, so with a
    tuned phone grid a short-but-padded-up request dispatches a LOWER mel
    bucket than the grid top implies; prewarm must have compiled it
    (the gap caused 20-40s mid-traffic compile stalls)."""
    from tts_king_tpu.serve import SynthesisServer

    king.tts.phone_buckets = [17, 46]
    server = SynthesisServer(king, max_batch=1)
    try:
        server.prewarm(max_phonemes=46)
        fn = king.tts._apply["fn"]
        n_before = fn._cache_size()
        # 20 phonemes -> Lb=46 but T=bucket(20*8)=256, not bucket(46*8)
        out = king.tts.generate(np.full((1, 20), 70, np.int32),
                                speaker_name=0, defer_overflow=True)
        assert out["mel_bucket"] == 256
        assert fn._cache_size() == n_before, \
            "live request compiled a shape prewarm missed"
    finally:
        server.close()
        king.tts.phone_buckets = None


def test_suggest_buckets_ratio_vs_active_grid(king):
    """phone_padded_ratio_vs_current compares against the grid that is
    actually active on the pipeline (the tuned one after a restart), not
    the pow2 default nobody is using."""
    from tts_king_tpu.serve import SynthesisServer

    king.tts.phone_buckets = [18, 64]
    server = SynthesisServer(king, max_batch=2)
    try:
        futures = [server.submit(phonemes=np.full((18,), 70, np.int32))
                   for _ in range(4)]
        for f in futures:
            f.result(timeout=300)
        sug = server.suggest_buckets(k_len=2)
    finally:
        server.close()
        king.tts.phone_buckets = None
    # all traffic is length 18 and the active grid already has top 18:
    # the suggestion can't improve on it -> ratio exactly 1.0 (vs the
    # pow2 baseline it would be 18/32)
    assert sug["phone_buckets"][-1] == 18
    assert sug["phone_padded_ratio_vs_current"] == 1.0
