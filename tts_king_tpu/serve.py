"""Dynamic-batching synthesis server.

Production serving layer the reference never had: requests (text or phoneme
IDs, per-request speaker and prosody controls) are queued, grouped into
padded batches (one compiled program per shape bucket) and pipelined through
the device.

Scheduling (policy="continuous", the default):
  * a batch forms from whatever is queued RIGHT NOW (no fixed wait) — under
    load the device's own compute time accumulates the next batch, so
    batches grow to max_batch by themselves without adding latency;
  * while the in-flight pipeline is full, arrivals keep being admitted into
    the forming batch (that waiting is free — dispatch would block anyway);
  * large mixed-length batches split at phoneme-bucket boundaries (padded
    compute is B x bucket(max L));
  * a THREE-stage thread pipeline with bounded queues: FS2 dispatch (no
    host round trip — overflow checks are deferred), a vocoder stage that
    syncs on FS2(i) while FS2(i+1) dispatches, slices the mel to the
    tightest bucket the realized lengths allow (the FS2 bucket is a
    conservative 8-frames/phoneme guess; vocoding it whole wastes ~2x
    vocoder compute) and dispatches the vocoder, and a completer fetching
    wav(i-1) — dispatch, FS2, vocoder and fetch all overlap.

policy="window" reproduces the round-1 scheduler (wait out max_wait_ms per
batch, fully synchronous) for A/B benchmarking (scripts/bench_serve.py).

Requests with identical control knobs are batched together (controls are
traced scalars, so they don't force recompiles; mixing controls *within* a
batch would change per-item outputs, hence the grouping key).
"""

import json
import os
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np


_now = time.monotonic


def optimal_buckets(values, k: int):
    """Choose <=k bucket tops from observed integer sizes minimizing the
    total padded sum (every value pads up to the smallest chosen top >= it;
    the max must be a top). Exact O(U^2 k) DP over the U unique values —
    the basis of load-derived padding grids (suggest_buckets)."""
    vals = np.asarray(sorted(values), dtype=np.int64)
    if len(vals) == 0:
        return []
    uniq, counts = np.unique(vals, return_counts=True)
    U = len(uniq)
    if U <= k:
        return [int(u) for u in uniq]
    csum = np.concatenate([[0], np.cumsum(counts)])

    def cost(i, j):     # values in uniq[i..j] all pad to uniq[j]
        return int(uniq[j]) * int(csum[j + 1] - csum[i])

    INF = float("inf")
    # dp[j][m]: min cost covering uniq[0..j] with m tops, top at j
    dp = [[INF] * (k + 1) for _ in range(U)]
    arg = [[None] * (k + 1) for _ in range(U)]
    for j in range(U):
        dp[j][1] = cost(0, j)
    for m in range(2, k + 1):
        for j in range(m - 1, U):
            best, bi = INF, None
            for i in range(m - 2, j):
                c = dp[i][m - 1] + cost(i + 1, j)
                if c < best:
                    best, bi = c, i
            dp[j][m] = best
            arg[j][m] = bi
    m = min(k, U)
    tops = [int(uniq[U - 1])]
    j = U - 1
    while m > 1:
        i = arg[j][m]
        tops.append(int(uniq[i]))
        j, m = i, m - 1
    return sorted(tops)


class ServerOverloaded(RuntimeError):
    """Admission queue is full — the request was rejected, not enqueued.

    Clients should back off and retry (the HTTP front maps this to 429)."""


class DeadlineExceeded(RuntimeError):
    """The request's deadline passed before it was dispatched; no device
    compute was spent on it (HTTP front: 504)."""


class ServerDraining(RuntimeError):
    """The server is draining for shutdown/restart: no new admissions,
    queued work still completes (HTTP front: 503, no Retry-After)."""


@dataclass
class _Request:
    phonemes: np.ndarray        # (L,) int
    speaker: int
    controls: tuple             # (duration, pitch, energy)
    future: Future = field(default_factory=Future)
    t_submit: float = field(default_factory=_now)
    deadline: Optional[float] = None    # absolute monotonic time, or None


class SynthesisServer:
    """Batched text->wav serving on top of pipeline.TTSKing.

    Overload safety: admission is bounded (`admission_depth` waiting
    requests; beyond that submit() raises ServerOverloaded immediately
    instead of growing the queue and every latency with it), and requests
    may carry deadlines — a request whose deadline passes while queued is
    shed at dispatch time with DeadlineExceeded, spending no device compute.
    Counters for admitted/rejected/shed/completed are exposed via stats().
    """

    def __init__(self, king, max_batch: int = 16, max_wait_ms: float = 10.0,
                 return_wav: bool = True, policy: str = "continuous",
                 pipeline_depth: int = 2, batch_buckets=None,
                 admission_depth: int = 128,
                 default_deadline_ms: Optional[float] = None):
        if policy not in ("continuous", "window"):
            raise ValueError(f"unknown scheduling policy {policy!r}")
        self.king = king
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.return_wav = return_wav
        self.policy = policy
        self.admission_depth = admission_depth
        self.default_deadline = (default_deadline_ms / 1000.0
                                 if default_deadline_ms else None)
        self._stats_lock = threading.Lock()
        self._counters = {"admitted": 0, "rejected": 0, "shed": 0,
                          "completed": 0, "failed": 0}
        # Batches are padded UP to one of these sizes: jit re-traces per
        # batch shape, and a 20-40 s first-touch compile per distinct B
        # would dwarf any scheduling gain. Few buckets = few compiles;
        # padded rows cost little (device compute is sublinear in B).
        self.batch_buckets = sorted(batch_buckets or
                                    {1, 4, max_batch} | {max_batch})
        self._queue: "queue.Queue[_Request]" = queue.Queue(
            maxsize=admission_depth)
        self._first_window_fns: dict = {}   # (chunk, halo) -> jitted fn
        self._fused_head_fns: dict = {}     # (Lb, T, chunk, halo) -> fn
        # Load traces for bucket autotuning (suggest_buckets): per-request
        # phoneme lengths and per-dispatch formed batch sizes.
        from collections import deque

        self._trace_lens: deque = deque(maxlen=8192)
        self._trace_batches: deque = deque(maxlen=2048)
        # 3-stage pipeline: dispatcher -> _mid (FS2 in flight) -> vocoder
        # thread -> _inflight (vocoder in flight) -> completer.
        self._mid: "queue.Queue" = queue.Queue(maxsize=pipeline_depth)
        self._inflight: "queue.Queue" = queue.Queue(maxsize=pipeline_depth)
        self._stop = threading.Event()
        self._draining = threading.Event()
        self._prewarmed: Optional[dict] = None
        self._threads = [
            threading.Thread(target=self._dispatcher, daemon=True),
            threading.Thread(target=self._vocoder_stage, daemon=True),
            threading.Thread(target=self._completer, daemon=True),
        ]
        for t in self._threads:
            t.start()

    # ------------------------------------------------------------- public

    def submit(self, text: Optional[str] = None, phonemes=None, speaker=0,
               duration_control=1.0, pitch_control=1.0,
               energy_control=1.0, deadline_ms: Optional[float] = None
               ) -> Future:
        """Enqueue one utterance; resolves to int16 wav (or (mel, mel_len)).

        Raises ServerOverloaded when `admission_depth` requests are already
        waiting. deadline_ms (relative to now) bounds queueing: a request
        still undispatched past its deadline fails with DeadlineExceeded.
        """
        if self._draining.is_set():
            raise ServerDraining(
                "server is draining; resubmit to its replacement")
        if self._stop.is_set():
            raise RuntimeError("server is closed")
        if phonemes is None:
            if text is None:
                raise ValueError("need text or phonemes")
            phonemes = self.king.text_preprocess(text)[0]
        if isinstance(speaker, str):
            speaker = self.king.tts.speakers_dict[speaker]
        req = _Request(np.asarray(phonemes, np.int32), int(speaker),
                       (float(duration_control), float(pitch_control),
                        float(energy_control)))
        if deadline_ms is not None:
            req.deadline = req.t_submit + deadline_ms / 1000.0
        elif self.default_deadline is not None:
            req.deadline = req.t_submit + self.default_deadline
        try:
            self._queue.put_nowait(req)
        except queue.Full:
            with self._stats_lock:
                self._counters["rejected"] += 1
            raise ServerOverloaded(
                f"admission queue full ({self.admission_depth} requests "
                f"waiting); retry with backoff") from None
        with self._stats_lock:
            self._counters["admitted"] += 1
        self._trace_lens.append(len(req.phonemes))
        return req.future

    def suggest_buckets(self, k_batch: int = 3, k_len: int = 5) -> dict:
        """Derive padding grids from the MEASURED load instead of the
        static {1,4,max}xpow2 defaults: exact-DP bucket tops minimizing
        total padded work over the recorded traces (per-request phoneme
        lengths, per-dispatch formed batch sizes). Returns the suggestion
        plus the padded-work ratio vs the current grids; apply by
        constructing the next server with batch_buckets=... and setting
        king.tts.phone_buckets (each new bucket is one XLA compile, so
        this is an explicit operation, not continuous adaptation)."""
        from tts_king_tpu.pipeline import _bucket

        lens = list(self._trace_lens)
        batches = list(self._trace_batches)
        out = {"n_requests": len(lens), "n_dispatches": len(batches)}
        if lens:
            tops = optimal_buckets(lens, k_len)
            # "current" = what this server actually pads to (the tuned
            # grid when one is active, pow2 default else) — _pbucket
            cur = sum(self._pbucket(l) for l in lens)
            new = sum(_bucket(l, tops) for l in lens)
            out["phone_buckets"] = tops
            out["phone_padded_ratio_vs_current"] = round(new / max(cur, 1), 4)
        if batches:
            tops = optimal_buckets(batches, k_batch)
            if 1 not in tops:            # keep a singles lane
                tops = [1] + tops
            cur = sum(next((x for x in self.batch_buckets if x >= b), b)
                      for b in batches)
            new = sum(_bucket(b, tops) for b in batches)
            out["batch_buckets"] = tops
            out["batch_padded_ratio_vs_current"] = round(new / max(cur, 1), 4)
        return out

    def prewarm(self, max_phonemes: int = 64, batch_sizes=None,
                mel_buckets=None, duration_controls=(1.0,)) -> dict:
        """Compile every (batch-bucket, phoneme-bucket) FS2 executable and
        (batch-bucket, mel-bucket) vocoder executable this server can
        dispatch, BEFORE taking traffic.

        A shape first touched mid-traffic stalls the whole pipeline for one
        XLA compile (20-40 s through the relay), and every request queued
        behind it eats the stall: measured at 2x overload, admitted-request
        p99 was 13.6 s cold vs ~deadline-bounded prewarmed
        (results/serving_load_test.jsonl). Compiles go through the same jit
        caches the serving threads use (AcousticModel.generate /
        Vocoder.__call__), so after prewarm every dispatch is a cache hit;
        with jax_compilation_cache_dir set, repeat server starts skip the
        compiles entirely.

        The vocoder is warmed on the REAL FS2 output sliced to each mel
        bucket — the exact dtype/layout the vocoder stage dispatches
        (`_vocode_batch` tight slicing) — not on synthetic zeros.

        duration_controls: the d-control values to cover. generate()
        derives the mel bucket from the RAW (pre-padding) request length
        times d_control — NOT from the padded length — so for each phone
        bucket the whole span T(shortest raw length mapping to it) ..
        T(bucket top) is warmed, plus one bucket above it (the only
        overflow-escalation step seen in practice), so neither a
        short-but-padded-up request nor a rare deferred-overflow redo
        compiles mid-traffic. Returns the warmed shape grids."""
        from tts_king_tpu.pipeline import (MEL_BUCKETS, _bucket,
                                           _FRAMES_PER_PHONE_GUESS)

        bsizes = sorted(set(batch_sizes or self.batch_buckets))
        pbs = sorted({self._pbucket(n)
                      for n in range(1, max_phonemes + 1)})
        warmed_mels = set()
        for B in bsizes:
            mel = None
            prev_pb = 0
            for Lb in pbs:
                # Shortest raw length padded to Lb is prev_pb+1; its mel
                # bucket is the lowest this (B, Lb) pair can dispatch.
                lens = [prev_pb + 1, Lb]
                ts = [_bucket(int(n * _FRAMES_PER_PHONE_GUESS * d),
                              MEL_BUCKETS)
                      for d in duration_controls for n in lens]
                t_lo, t_hi = min(ts), max(ts)
                span = [b for b in MEL_BUCKETS if t_lo <= b]
                span = span[: len([b for b in span if b <= t_hi]) + 1]
                prev_pb = Lb
                for T in span:
                    out = self.king.tts.generate(
                        np.ones((B, Lb), np.int32),
                        src_lens=np.full((B,), Lb, np.int32),
                        speaker_name=[0] * B, defer_overflow=True,
                        max_mel_len=T)
                    np.asarray(out["mel_lens_raw"])  # force the compile
                    if (mel is None
                            or out["postnet_mel"].shape[1] > mel.shape[1]):
                        mel = out["postnet_mel"]
            mbs = [b for b in (mel_buckets or MEL_BUCKETS)
                   if b <= mel.shape[1]] or [mel.shape[1]]
            for T in mbs:
                # same int16 executable _vocode_batch dispatches
                wav = self.king.vocoder.vocode_int16(mel[:, :T])
                np.asarray(wav[:1, :1])              # force the compile
                warmed_mels.add(T)
        self._prewarmed = {"batch_buckets": bsizes, "phone_buckets": pbs,
                           "mel_buckets": sorted(warmed_mels),
                           "max_phonemes": max_phonemes}
        return dict(self._prewarmed)

    def stats(self) -> dict:
        """Admission/shedding counters + current queue depth."""
        with self._stats_lock:
            out = dict(self._counters)
        out["queued"] = self._queue.qsize()
        out["admission_depth"] = self.admission_depth
        return out

    def synthesize_many(self, texts: Sequence[str], speakers=None,
                        **controls):
        """Blocking convenience API: submit all, wait for all."""
        speakers = speakers if speakers is not None else [0] * len(texts)
        futures = [self.submit(t, speaker=s, **controls)
                   for t, s in zip(texts, speakers)]
        return [f.result() for f in futures]

    def stream(self, text: Optional[str] = None, phonemes=None, speaker=0,
               duration_control=1.0, pitch_control=1.0,
               energy_control=1.0, chunk_frames: int = 64):
        """Low-latency streaming endpoint: bypasses the batching pipeline
        and yields int16 waveform chunks as they are vocoded
        (ops/streaming.py). Safe to call while batched traffic flows: JAX
        dispatch is thread-safe and the device serializes; a stream
        interleaves with batch work at window granularity.

        Time-to-first-audio engineering (DESIGN.md §3.4): the first vocoder
        window is dispatched SPECULATIVELY on the device-resident FS2 mel —
        chained in the device queue with no host round trip between the two
        programs — while the host's fetch of the realized mel length
        overlaps with the window's compute. The serial
        dispatch->sync->dispatch->sync chain becomes
        dispatch->dispatch->sync. The speculative window is used only when
        it is provably exact (utterance covers chunk+halo frames, no mel-
        bucket overflow); otherwise the plain path runs — bit-identical
        output either way."""
        if self._draining.is_set():
            raise ServerDraining(
                "server is draining; resubmit to its replacement")
        if self._stop.is_set():
            raise RuntimeError("server is closed")
        if phonemes is None:
            if text is None:
                raise ValueError("need text or phonemes")
            phonemes = self.king.text_preprocess(text)[0]
        if isinstance(speaker, str):
            speaker = self.king.tts.speakers_dict[speaker]

        from tts_king_tpu.ops.streaming import (generator_receptive_field,
                                                stream_vocoder)

        halo = generator_receptive_field(self.king.cfg.vocoder)
        hop = self.king.cfg.preprocess.stft.hop_length

        # FS2 + speculative first vocoder window. Preferred: ONE fused
        # program (saves a whole dispatch round trip vs chaining two);
        # falls back to generate() + device-chained window when fusion
        # isn't applicable (mesh inference).
        fused = self._fused_stream_head(phonemes, speaker,
                                        (float(duration_control),
                                         float(pitch_control),
                                         float(energy_control)),
                                        chunk_frames, halo)
        if fused is not None:
            out, win0, bucket = fused
        else:
            out = self.king.tts.generate(
                np.asarray(phonemes, np.int32)[None],
                duration_control=float(duration_control),
                pitch_control=float(pitch_control),
                energy_control=float(energy_control),
                speaker_name=int(speaker), defer_overflow=True)
            bucket = out.get("mel_bucket", out["postnet_mel"].shape[1])
            win0 = None
            if (bucket >= chunk_frames + halo
                    and self.king.vocoder.kind != "MelGAN"):
                # speculative first window, chained device-side (HiFi-GAN
                # only: MelGAN needs the log10 mel prep, done host-side
                # below after the fetch)
                win0 = self._first_window(out["postnet_mel"], chunk_frames,
                                          halo)
        # ONE batched host fetch for everything the first yield needs:
        # realized lengths + the speculative window. Separate np.asarray
        # fetches each pay a full relay round trip (~28 ms on axon), and
        # the old raw -> n -> win0 chain paid three of them before first
        # audio (measured: 99 ms TTFA vs the 32 ms fused lower bound).
        import jax

        fetch = [out["mel_lens_raw"], out["mel_lens"]]
        if win0 is not None:
            fetch.append(win0)
        fetched = jax.device_get(fetch)
        raw = int(fetched[0][0])
        win0_host = fetched[2] if win0 is not None else None
        if raw > bucket:
            # Rare mel-bucket overflow: redo synchronously (escalated
            # buckets), discard the speculative window.
            out = self.king.tts.generate(
                np.asarray(phonemes, np.int32)[None],
                duration_control=float(duration_control),
                pitch_control=float(pitch_control),
                energy_control=float(energy_control),
                speaker_name=int(speaker))
            win0_host = None
            n = int(np.asarray(out["mel_lens"])[0])
        else:
            n = int(fetched[1][0])

        start_frame = 0
        if win0_host is not None and n >= chunk_frames + halo:
            # exact: all chunk+halo window frames are real mel content.
            # Start the mel's device->host copy in the background first so
            # it overlaps the consumer handling the first chunk.
            if hasattr(out["postnet_mel"], "copy_to_host_async"):
                out["postnet_mel"].copy_to_host_async()
            # win0 is device-cast int16 (half the fetch bytes of float32)
            yield np.asarray(win0_host)[
                0, halo * hop : (halo + chunk_frames) * hop]
            start_frame = chunk_frames

        mel = np.asarray(out["postnet_mel"], np.float32)[:1, : max(n, 1)]
        if self.king.vocoder.kind == "MelGAN":
            mel = mel / np.log(10.0)
        for chunk in stream_vocoder(self.king.vocoder._apply_i16,
                                    self.king.vocoder.variables, mel,
                                    chunk_frames=chunk_frames,
                                    halo_frames=halo, hop=hop,
                                    start_frame=start_frame):
            yield np.asarray(chunk)

    def _fused_stream_head(self, phonemes, speaker, controls,
                           chunk_frames: int, halo: int):
        """FS2 forward + first vocoder window as ONE compiled program —
        a single dispatch produces (mel, lens, first audio window). Returns
        (out_dict, window_wav, mel_bucket) or None when not applicable
        (mesh inference shards the acoustic model differently). Exactness
        gating vs overflow / short utterances happens in stream()."""
        import jax
        import jax.numpy as jnp

        from tts_king_tpu.pipeline import (MEL_BUCKETS, _bucket,
                                           _FRAMES_PER_PHONE_GUESS,
                                           _phone_pad)

        tts = self.king.tts
        if (getattr(tts, "mesh", None) is not None
                or self.king.vocoder.kind == "MelGAN"):
            return None
        phonemes = np.asarray(phonemes, np.int32)
        L = len(phonemes)
        pb = getattr(tts, "phone_buckets", None)
        Lb = _phone_pad(L, pb)
        d_ctl = controls[0]
        guess = int(L * _FRAMES_PER_PHONE_GUESS * d_ctl)
        max_cap = self.king.cfg.model.max_seq_len
        T = min(_bucket(guess, MEL_BUCKETS), max_cap)
        if T < chunk_frames + halo:
            return None

        key = (Lb, T, chunk_frames, halo)
        fn = self._fused_head_fns.get(key)
        if fn is None:
            fs2_apply = tts._compiled(T)   # partial(model.apply, train=False)
            voc_apply_i16 = self.king.vocoder._apply_i16

            @jax.jit
            def fn(fs2_vars, voc_vars, speakers, texts, src_lens,
                   d_c, p_c, e_c):
                out = fs2_apply(fs2_vars, speakers, texts, src_lens,
                                max_mel_len=T, d_control=d_c, p_control=p_c,
                                e_control=e_c)
                mel = out["postnet_mel"]
                left = jnp.repeat(mel[:1, :1], halo, axis=1)
                window = jnp.concatenate(
                    [left, mel[:1, : chunk_frames + halo]], axis=1)
                # window comes back int16 (in-graph scale+cast): the first
                # yield's fetch moves half the bytes
                return out, voc_apply_i16(voc_vars, window)

            self._fused_head_fns[key] = fn

        texts = np.zeros((1, Lb), np.int32)
        texts[0, :L] = phonemes
        out, win0 = fn(tts.variables, self.king.vocoder.variables,
                       np.asarray([int(speaker)], np.int32), texts,
                       np.asarray([L], np.int32), *controls)
        return out, win0, T

    def _first_window(self, mel_dev, chunk_frames: int, halo: int):
        """Dispatch the vocoder on mel frames [0, chunk+halo) with the left
        halo edge-padded in-graph, taking the DEVICE-resident (possibly
        still computing) FS2 output — no host transfer in between."""
        import jax
        import jax.numpy as jnp

        key = (chunk_frames, halo)
        fn = self._first_window_fns.get(key)
        if fn is None:
            apply_i16 = self.king.vocoder._apply_i16

            @jax.jit
            def fn(variables, mel):
                left = jnp.repeat(mel[:1, :1], halo, axis=1)
                window = jnp.concatenate(
                    [left, mel[:1, : chunk_frames + halo]], axis=1)
                return apply_i16(variables, window)

            self._first_window_fns[key] = fn
        return fn(self.king.vocoder.variables, mel_dev)

    def close(self):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=10)

    def drain(self, timeout: Optional[float] = None) -> dict:
        """Graceful shutdown, phase 1: stop admitting (submit raises
        ServerDraining -> HTTP 503), let everything already admitted run
        to completion, then stop the pipeline threads. Returns final
        stats. With `timeout`, returns once the clock runs out even if
        work remains queued (callers can check stats()["queued"]).

        The restart half of the story: pair with save_serving_state() /
        load_serving_state() so the next process starts with this one's
        tuned padding grids and prewarms exactly the shapes that carried
        real traffic (main()'s --state-file does both ends)."""
        self._draining.set()
        deadline = None if timeout is None else _now() + timeout
        while deadline is None or _now() < deadline:
            with self._stats_lock:
                c = dict(self._counters)
            settled = c["completed"] + c["failed"] + c["shed"]
            if (settled >= c["admitted"] and self._queue.empty()
                    and self._mid.empty() and self._inflight.empty()):
                break
            time.sleep(0.02)
        self.close()
        return self.stats()

    def save_serving_state(self, path: str) -> dict:
        """Persist what this process learned about its load so a restart
        skips the warmup cliff: tuned padding grids (the active ones,
        plus fresh suggest_buckets() output from the recorded traces) and
        the prewarm grid. JSON, human-editable."""
        state = {
            "batch_buckets": self.batch_buckets,
            "phone_buckets": getattr(self.king.tts, "phone_buckets", None),
            "prewarm": self._prewarmed,
            "suggested": self.suggest_buckets(),
            "stats": self.stats(),
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1)
        os.replace(tmp, path)
        return state

    @staticmethod
    def load_serving_state(path: str) -> dict:
        with open(path) as f:
            return json.load(f)

    @classmethod
    def from_serving_state(cls, king, state: dict, prewarm: bool = True,
                           **kw):
        """Construct a server adopting a previous process's tuned grids
        (preferring its live grids, falling back to its recorded
        suggestions), then prewarm the same shape grid that carried the
        previous process's traffic."""
        suggested = state.get("suggested") or {}
        batch_buckets = (state.get("batch_buckets")
                         or suggested.get("batch_buckets"))
        phone_buckets = (state.get("phone_buckets")
                         or suggested.get("phone_buckets"))
        if phone_buckets:
            king.tts.phone_buckets = sorted(phone_buckets)
        if batch_buckets:
            kw.setdefault("batch_buckets", sorted(batch_buckets))
        server = cls(king, **kw)
        pw = state.get("prewarm")
        if prewarm and pw:
            server.prewarm(max_phonemes=pw.get("max_phonemes", 64),
                           batch_sizes=pw.get("batch_buckets"),
                           mel_buckets=pw.get("mel_buckets"))
        return server

    # --------------------------------------------------------- scheduling

    def _gather_batch(self):
        """Collect the next batch according to the scheduling policy.
        Returns a list of requests, or None on shutdown."""
        try:
            first = self._queue.get(timeout=0.05)
        except queue.Empty:
            return None
        batch = [first]

        if self.policy == "window":
            # Round-1 behavior: wait out max_wait_ms hoping for company.
            deadline = _now() + self.max_wait
            while len(batch) < self.max_batch:
                timeout = deadline - _now()
                if timeout <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=timeout))
                except queue.Empty:
                    break
            return batch

        # Continuous: drain what's already here without waiting...
        while len(batch) < self.max_batch:
            try:
                batch.append(self._queue.get_nowait())
            except queue.Empty:
                break
        # ...and while the pipeline is full (dispatch would block anyway),
        # keep admitting arrivals into this batch for free. Block in
        # coarse 50 ms waits: on a single-core host a fine-grained poll
        # (2 ms) burns the CPU the dispatch/completion threads need and
        # measurably cuts overload throughput (scripts/bench_serve.py).
        while (len(batch) < self.max_batch and self._mid.full()
               and not self._stop.is_set()):
            try:
                batch.append(self._queue.get(timeout=0.05))
            except queue.Empty:
                pass
        return batch

    # ------------------------------------------------------------ threads

    def _length_groups(self, reqs):
        """Split one formed batch at phoneme-bucket boundaries ONLY when
        that lowers total padded compute (the serving analogue of the
        training dataset's sorted group batching). Padded compute is
        bucket(B) x bucket(max L): a 12-phoneme item batched with a
        48-phoneme one costs 4x its own compute — but a split whose
        sub-groups still pad up to the same batch bucket (e.g. 16 mixed
        requests -> three groups of ~5, each padded to B=16) TRIPLES the
        cost instead, which collapsed throughput under deep overload.
        The explicit cost test handles both regimes."""
        if len(reqs) <= 4:
            return [reqs]
        groups = {}
        for r in reqs:
            groups.setdefault(self._pbucket(len(r.phonemes)), []).append(r)
        if len(groups) == 1:
            return [reqs]
        # merge tiny groups upward so no dispatch runs near-empty
        split = []
        pending = []
        for bucket in sorted(groups):
            pending.extend(groups[bucket])
            if len(pending) >= 4:
                split.append(pending)
                pending = []
        if pending:
            # tail group dispatches on its own: merging it into an earlier
            # (smaller-bucket) group would pad that whole group up to the
            # tail's bucket, undoing the split's savings
            split.append(pending)

        def cost(rs):
            b = next((x for x in self.batch_buckets if x >= len(rs)),
                     len(rs))
            return b * self._pbucket(max(len(r.phonemes) for r in rs))

        if sum(cost(g) for g in split) < cost(reqs):
            return split
        return [reqs]

    def _pbucket(self, n: int) -> int:
        """Phoneme-length padding bucket — the tuned grid when one is set
        on the pipeline (suggest_buckets), the power-of-2 default else."""
        from tts_king_tpu.pipeline import _phone_pad

        pb = getattr(self.king.tts, "phone_buckets", None)
        return _phone_pad(n, pb)

    def _shed_expired(self, batch):
        """Drop requests whose deadline passed while queued — before any
        device compute is spent on them."""
        now = _now()
        alive = []
        for req in batch:
            if req.deadline is not None and now > req.deadline:
                req.future.set_exception(DeadlineExceeded(
                    f"deadline passed after {now - req.t_submit:.3f}s "
                    f"in queue"))
                with self._stats_lock:
                    self._counters["shed"] += 1
            else:
                alive.append(req)
        return alive

    def _dispatcher(self):
        while not self._stop.is_set():
            batch = self._gather_batch()
            if not batch:
                continue
            batch = self._shed_expired(batch)
            groups = {}
            for req in batch:
                groups.setdefault(req.controls, []).append(req)
            groups = [(controls, sub)
                      for controls, reqs in groups.items()
                      for sub in self._length_groups(reqs)]
            for controls, reqs in groups:
                try:
                    handles = self._fs2_batch(reqs, controls)
                except Exception as e:
                    n_failed = 0
                    for req in reqs:
                        if not req.future.done():
                            req.future.set_exception(e)
                            n_failed += 1
                    # counted here too (not just _completer) so stats are
                    # accurate and drain()'s settled>=admitted wait ends
                    with self._stats_lock:
                        self._counters["failed"] += n_failed
                    continue
                # Bounded: blocks when `pipeline_depth` FS2 batches are in
                # flight, providing backpressure to _gather_batch.
                self._mid.put((reqs, handles))

    def _vocoder_stage(self):
        """Middle pipeline stage: waits for FS2(i) (the only host sync,
        overlapped with FS2(i+1) dispatch and wav(i-1) fetch on the other
        threads), handles the rare mel-bucket overflow, slices the mel to
        the tightest length bucket the REALIZED lengths allow — the FS2
        bucket is a conservative 8-frames/phoneme guess, so vocoding it
        whole wastes ~2x vocoder compute — and dispatches the vocoder."""
        while not (self._stop.is_set() and self._mid.empty()):
            try:
                reqs, handles = self._mid.get(timeout=0.05)
            except queue.Empty:
                continue
            now = _now()
            if reqs and all(r.deadline is not None and now > r.deadline
                            for r in reqs):
                # Every request in the batch expired while FS2 was in
                # flight (e.g. queued behind a cold compile): skip the
                # vocoder dispatch — the dominant remaining compute would
                # be spent on answers nobody is waiting for. Mixed batches
                # proceed: the live items need the batch anyway.
                for req in reqs:
                    req.future.set_exception(DeadlineExceeded(
                        f"deadline passed after {now - req.t_submit:.3f}s "
                        f"(post-dispatch, pre-vocoder)"))
                with self._stats_lock:
                    self._counters["shed"] += len(reqs)
                continue
            try:
                self._inflight.put((reqs, self._vocode_batch(reqs, handles)))
            except Exception as e:
                n_failed = 0
                for req in reqs:
                    if not req.future.done():
                        req.future.set_exception(e)
                        n_failed += 1
                with self._stats_lock:
                    self._counters["failed"] += n_failed

    def _completer(self):
        while not (self._stop.is_set() and self._mid.empty()
                   and self._inflight.empty()):
            try:
                reqs, handles = self._inflight.get(timeout=0.05)
            except queue.Empty:
                continue
            try:
                self._complete_batch(reqs, handles)
                with self._stats_lock:
                    self._counters["completed"] += len(reqs)
            except Exception as e:
                with self._stats_lock:
                    self._counters["failed"] += len(reqs)
                for req in reqs:
                    if not req.future.done():
                        req.future.set_exception(e)

    # ------------------------------------------------------------- device

    def _fs2_batch(self, reqs, controls, defer=True):
        """Pack and dispatch FS2 WITHOUT forcing anything to the host — the
        overflow check generate() would sync on is deferred to the vocoder
        stage (defer_overflow)."""
        d_ctl, p_ctl, e_ctl = controls
        self._trace_batches.append(len(reqs))
        L = max(len(r.phonemes) for r in reqs)
        B = next((b for b in self.batch_buckets if b >= len(reqs)),
                 len(reqs))
        phonemes = np.zeros((B, L), np.int32)
        src_lens = np.ones((B,), np.int32)   # padded rows: 1 pad phoneme
        for i, r in enumerate(reqs):
            phonemes[i, : len(r.phonemes)] = r.phonemes
            src_lens[i] = len(r.phonemes)
        speakers = [r.speaker for r in reqs] + [0] * (B - len(reqs))

        out = self.king.tts.generate(
            phonemes, duration_control=d_ctl, pitch_control=p_ctl,
            energy_control=e_ctl, speaker_name=speakers, src_lens=src_lens,
            defer_overflow=defer)
        # sync mode escalated buckets already: nothing to re-check, so
        # report the realized mel length as the "bucket". Overflow is
        # detected on the RAW predicted lengths (mel_lens is clamped).
        bucket = out.get("mel_bucket", out["postnet_mel"].shape[1])
        return out, bucket, controls

    def _vocode_batch(self, reqs, handles):
        from tts_king_tpu.pipeline import MEL_BUCKETS, _bucket

        out, bucket, controls = handles
        raw = np.asarray(out["mel_lens_raw"])[: len(reqs)]
        if raw.max(initial=0) > bucket:
            # Rare: the duration predictor overflowed the guessed mel
            # bucket. Retry with the synchronous bucket escalation (the
            # same path direct generate() calls take).
            out, bucket, controls = self._fs2_batch(reqs, controls,
                                                    defer=False)
            raw = np.asarray(out["mel_lens_raw"])[: len(reqs)]
        mel_lens = np.minimum(raw, bucket)
        mel = out["postnet_mel"]
        tight = min(_bucket(int(mel_lens.max(initial=1)), MEL_BUCKETS),
                    mel.shape[1])
        if tight < mel.shape[1]:
            mel = mel[:, :tight]      # device-side slice, stays async
        if not self.return_wav:
            return mel, mel_lens
        # int16 on device: halves the fetch bytes in _complete_batch
        return self.king.vocoder.vocode_int16(mel), mel_lens

    def _complete_batch(self, reqs, handles):
        dev, mel_lens = handles
        if self.return_wav:
            hop = self.king.cfg.preprocess.stft.hop_length
            wav = np.asarray(dev)
            for i, req in enumerate(reqs):
                req.future.set_result(wav[i, : mel_lens[i] * hop])
        else:
            mel = np.asarray(dev)
            for i, req in enumerate(reqs):
                req.future.set_result((mel[i, : mel_lens[i]],
                                       int(mel_lens[i])))


# --------------------------------------------------------------- HTTP front

def serve_http(king, host="127.0.0.1", port=8765, state=None, **server_kw):
    """Wrap a SynthesisServer in a stdlib HTTP front end.

    Endpoints:
      GET  /health  -> {"ok": true, "speakers": N}
      GET  /stats   -> admission/shedding counters + queue depth
      POST /tts     -> WAV file; JSON body {"text" | "phonemes": [...],
                       "speaker", "duration_control", "pitch_control",
                       "energy_control", "deadline_ms"}; 429 + Retry-After
                       when the admission queue is full, 503 while
                       draining, 504 when the deadline passes before
                       dispatch
      POST /stream  -> chunked raw int16 PCM (audio/L16), same body —
                       first chunk after one FS2 call + one vocoder window

    state: a load_serving_state() dict from a previous process — adopts
    its tuned padding grids and prewarms its traffic's shape grid
    (SynthesisServer.from_serving_state).

    Returns (httpd, synthesis_server); caller runs httpd.serve_forever()
    and closes both. Port 0 binds an ephemeral port
    (httpd.server_address[1]).
    """
    import io
    import json as _json
    import wave
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from itertools import chain

    if state is not None:
        server = SynthesisServer.from_serving_state(king, state, **server_kw)
    else:
        server = SynthesisServer(king, **server_kw)
    sr = king.cfg.preprocess.audio.sampling_rate

    class _StreamAborted(Exception):
        """Mid-stream failure after the 200 + chunked headers went out;
        the connection is dropped instead of writing a bogus second
        response."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _body(self):
            n = int(self.headers.get("Content-Length", 0))
            return _json.loads(self.rfile.read(n) or b"{}")

        def _synth_kwargs(self, body, with_deadline=False):
            kw = dict(speaker=body.get("speaker", 0))
            for k in ("duration_control", "pitch_control", "energy_control"):
                if k in body:
                    kw[k] = float(body[k])
            if with_deadline and "deadline_ms" in body:
                kw["deadline_ms"] = float(body["deadline_ms"])
            if "phonemes" in body:
                kw["phonemes"] = np.asarray(body["phonemes"], np.int32)
            else:
                kw["text"] = body["text"]
            return kw

        def _error(self, code, msg, retry_after=None):
            payload = _json.dumps({"error": msg}).encode()
            try:
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                if retry_after is not None:
                    self.send_header("Retry-After", str(retry_after))
                self.end_headers()
                self.wfile.write(payload)
            except Exception:
                pass

        def do_GET(self):
            if self.path in ("/health", "/stats"):
                doc = ({"ok": True, "speakers": len(king.speakers)}
                       if self.path == "/health" else server.stats())
                payload = _json.dumps(doc).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            else:
                self.send_error(404)

        def do_POST(self):
            try:
                body = self._body()
                if self.path == "/tts":
                    try:
                        fut = server.submit(
                            **self._synth_kwargs(body, with_deadline=True))
                    except ServerDraining as e:
                        return self._error(503, str(e))
                    except ServerOverloaded as e:
                        return self._error(429, str(e), retry_after=1)
                    try:
                        wav = fut.result(timeout=600)
                    except DeadlineExceeded as e:
                        return self._error(504, str(e))
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as w:
                        w.setnchannels(1)
                        w.setsampwidth(2)
                        w.setframerate(sr)
                        w.writeframes(np.asarray(wav, np.int16).tobytes())
                    data = buf.getvalue()
                    self.send_response(200)
                    self.send_header("Content-Type", "audio/wav")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                elif self.path == "/stream":
                    gen = server.stream(**self._synth_kwargs(body))
                    # Pull the first chunk BEFORE committing to a 200:
                    # synthesis errors that fire before any audio exists
                    # (bad text, G2P failure, unknown speaker) must come
                    # back as clean JSON 500s, not a connection reset
                    # halfway through a chunked response. Costs nothing —
                    # the first chunk is the TTFA-critical work either way.
                    first = next(gen, None)
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     f"audio/L16;rate={sr};channels=1")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    chunks = (chain((first,), gen)
                              if first is not None else gen)
                    try:
                        for chunk in chunks:
                            data = np.asarray(chunk, np.int16).tobytes()
                            self.wfile.write(f"{len(data):X}\r\n".encode())
                            self.wfile.write(data)
                            self.wfile.write(b"\r\n")
                        self.wfile.write(b"0\r\n\r\n")
                    except Exception:
                        # Headers are out; a second status line would be
                        # protocol garbage. Drop the connection — the
                        # missing terminating 0-chunk tells the client
                        # the stream was truncated.
                        self.close_connection = True
                        raise _StreamAborted()
                else:
                    self.send_error(404)
            except _StreamAborted:
                pass
            except ServerDraining as e:
                self._error(503, str(e))
            except Exception as e:  # surface errors as 500 JSON
                msg = _json.dumps({"error": str(e)}).encode()
                try:
                    self.send_response(500)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(msg)))
                    self.end_headers()
                    self.wfile.write(msg)
                except Exception:
                    pass

    httpd = ThreadingHTTPServer((host, port), Handler)
    return httpd, server


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="tts_king_tpu synthesis server")
    ap.add_argument("--config", default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 inference compute")
    ap.add_argument("--admission-depth", type=int, default=64,
                    help="max queued requests before 429")
    ap.add_argument("--default-deadline-ms", type=float, default=None,
                    help="shed requests still queued past this deadline")
    ap.add_argument("--prewarm", type=int, nargs="?", const=64, default=None,
                    metavar="MAX_PHONEMES",
                    help="compile the full serving shape grid before "
                         "accepting traffic (avoids mid-traffic XLA "
                         "compile stalls)")
    ap.add_argument("--state-file", default=None,
                    help="serving-state JSON: loaded at startup (adopt the "
                         "previous process's tuned padding grids + prewarm "
                         "its traffic's shape grid), written at graceful "
                         "shutdown (SIGTERM/SIGINT -> drain, save, exit)")
    ap.add_argument("--drain-timeout", type=float, default=30.0,
                    help="max seconds to wait for queued work at shutdown")
    args = ap.parse_args(argv)

    import signal

    import jax.numpy as jnp

    from tts_king_tpu.config import TTSConfig, load_config
    from tts_king_tpu.pipeline import TTSKing

    cfg = load_config(args.config) if args.config else TTSConfig()
    king = TTSKing(cfg, dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    server_kw = dict(max_batch=args.max_batch,
                     admission_depth=args.admission_depth,
                     default_deadline_ms=args.default_deadline_ms)
    prior = None
    if args.state_file and os.path.exists(args.state_file):
        prior = SynthesisServer.load_serving_state(args.state_file)
        print(f"adopting serving state from {args.state_file}: "
              f"batch_buckets={prior.get('batch_buckets')} "
              f"phone_buckets={prior.get('phone_buckets')}", flush=True)
    httpd, server = serve_http(king, host=args.host, port=args.port,
                               state=prior, **server_kw)
    if args.prewarm and not (prior and prior.get("prewarm")):
        print("prewarming serving shape grid "
              f"(max_phonemes={args.prewarm})...", flush=True)
        print(f"prewarmed: {server.prewarm(max_phonemes=args.prewarm)}",
              flush=True)

    def _graceful(signum, frame):
        # Stop accepting HTTP, drain admitted work, persist tuned state.
        # shutdown() must come from another thread (serve_forever's loop).
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _graceful)
    print(f"serving on http://{args.host}:{httpd.server_address[1]} "
          f"(/tts /stream /health)", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        stats = server.drain(timeout=args.drain_timeout)
        if args.state_file:
            server.save_serving_state(args.state_file)
            print(f"serving state saved to {args.state_file}", flush=True)
        print(f"drained: {stats}", flush=True)


if __name__ == "__main__":
    main()
