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
  * dispatch and completion run on separate threads with a bounded
    in-flight queue (depth 2): the vocoder of batch i runs on-device while
    FS2 of batch i+1 is dispatched and results of batch i-1 are fetched —
    the host<->device round trip and the FS2/vocoder stages overlap.

policy="window" reproduces the round-1 scheduler (wait out max_wait_ms per
batch, fully synchronous) for A/B benchmarking (scripts/bench_serve.py).

Requests with identical control knobs are batched together (controls are
traced scalars, so they don't force recompiles; mixing controls *within* a
batch would change per-item outputs, hence the grouping key).
"""

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np


_now = time.monotonic


@dataclass
class _Request:
    phonemes: np.ndarray        # (L,) int
    speaker: int
    controls: tuple             # (duration, pitch, energy)
    future: Future = field(default_factory=Future)
    t_submit: float = field(default_factory=_now)


class SynthesisServer:
    """Batched text->wav serving on top of pipeline.TTSKing."""

    def __init__(self, king, max_batch: int = 16, max_wait_ms: float = 10.0,
                 return_wav: bool = True, policy: str = "continuous",
                 pipeline_depth: int = 2, batch_buckets=None):
        if policy not in ("continuous", "window"):
            raise ValueError(f"unknown scheduling policy {policy!r}")
        self.king = king
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.return_wav = return_wav
        self.policy = policy
        # Batches are padded UP to one of these sizes: jit re-traces per
        # batch shape, and a 20-40 s first-touch compile per distinct B
        # would dwarf any scheduling gain. Few buckets = few compiles;
        # padded rows cost little (device compute is sublinear in B).
        self.batch_buckets = sorted(batch_buckets or
                                    {1, 4, max_batch} | {max_batch})
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._inflight: "queue.Queue" = queue.Queue(maxsize=pipeline_depth)
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._dispatcher, daemon=True),
            threading.Thread(target=self._completer, daemon=True),
        ]
        for t in self._threads:
            t.start()

    # ------------------------------------------------------------- public

    def submit(self, text: Optional[str] = None, phonemes=None, speaker=0,
               duration_control=1.0, pitch_control=1.0,
               energy_control=1.0) -> Future:
        """Enqueue one utterance; resolves to int16 wav (or (mel, mel_len))."""
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
        self._queue.put(req)
        return req.future

    def synthesize_many(self, texts: Sequence[str], speakers=None,
                        **controls):
        """Blocking convenience API: submit all, wait for all."""
        speakers = speakers if speakers is not None else [0] * len(texts)
        futures = [self.submit(t, speaker=s, **controls)
                   for t, s in zip(texts, speakers)]
        return [f.result() for f in futures]

    def close(self):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=10)

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
        while (len(batch) < self.max_batch and self._inflight.full()
               and not self._stop.is_set()):
            try:
                batch.append(self._queue.get(timeout=0.05))
            except queue.Empty:
                pass
        return batch

    # ------------------------------------------------------------ threads

    @staticmethod
    def _length_groups(reqs):
        """Split one formed batch at phoneme-bucket boundaries when it is
        large enough to amortize extra dispatches (the serving analogue of
        the training dataset's sorted group batching): padded compute is
        B x bucket(max L), so a 12-phoneme item batched with a 48-phoneme
        one costs 4x its own compute. Under load (deep queue -> big
        batches) splitting saves more device time than the extra dispatch
        costs — which the depth-2 pipeline hides anyway; small batches
        stay whole."""
        from tts_king_tpu.pipeline import _phone_bucket

        if len(reqs) <= 4:
            return [reqs]
        groups = {}
        for r in reqs:
            groups.setdefault(_phone_bucket(len(r.phonemes)), []).append(r)
        # merge tiny tail groups upward so no dispatch runs near-empty
        out = []
        pending = []
        for bucket in sorted(groups):
            pending.extend(groups[bucket])
            if len(pending) >= 4:
                out.append(pending)
                pending = []
        if pending:
            # tail group dispatches on its own: merging it into an earlier
            # (smaller-bucket) group would pad that whole group up to the
            # tail's bucket, undoing the split's savings
            out.append(pending)
        return out

    def _dispatcher(self):
        while not self._stop.is_set():
            batch = self._gather_batch()
            if not batch:
                continue
            groups = {}
            for req in batch:
                groups.setdefault(req.controls, []).append(req)
            groups = [(controls, sub)
                      for controls, reqs in groups.items()
                      for sub in self._length_groups(reqs)]
            for controls, reqs in groups:
                try:
                    handles = self._dispatch_batch(reqs, controls)
                except Exception as e:
                    for req in reqs:
                        if not req.future.done():
                            req.future.set_exception(e)
                    continue
                # Bounded: blocks when `pipeline_depth` batches are in
                # flight, providing backpressure to _gather_batch.
                self._inflight.put((reqs, handles))

    def _completer(self):
        while not (self._stop.is_set() and self._inflight.empty()):
            try:
                reqs, handles = self._inflight.get(timeout=0.05)
            except queue.Empty:
                continue
            try:
                self._complete_batch(reqs, handles)
            except Exception as e:
                for req in reqs:
                    if not req.future.done():
                        req.future.set_exception(e)

    # ------------------------------------------------------------- device

    def _dispatch_batch(self, reqs, controls, defer=True):
        """Run FS2 and dispatch the vocoder; returns device handles without
        forcing ANYTHING back to the host — no round trip on this path.
        The overflow check generate() would sync on is deferred to the
        completer (it fetches mel_lens with the results anyway and retries
        the rare overflowed batch synchronously, defer=False)."""
        d_ctl, p_ctl, e_ctl = controls
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
        if not self.return_wav:
            return out["postnet_mel"], out["mel_lens_raw"], bucket, controls
        # Async dispatch: the float waveform stays on device; the vocoder
        # computes while the dispatcher loops back for the next batch.
        wav_dev = self.king.vocoder(out["postnet_mel"])
        return wav_dev, out["mel_lens_raw"], bucket, controls

    def _complete_batch(self, reqs, handles):
        dev, mel_lens_dev, bucket, controls = handles
        raw = np.asarray(mel_lens_dev)[: len(reqs)]
        if raw.max(initial=0) > bucket:
            # Rare: the duration predictor overflowed the guessed mel
            # bucket. Retry with the synchronous bucket escalation (the
            # same path direct generate() calls take), completing inline.
            dev, mel_lens_dev, bucket, _ = self._dispatch_batch(
                reqs, controls, defer=False)
            raw = np.asarray(mel_lens_dev)[: len(reqs)]
        mel_lens = np.minimum(raw, bucket)
        if self.return_wav:
            hop = self.king.cfg.preprocess.stft.hop_length
            scale = self.king.cfg.vocoder.max_wav_value
            wav = (np.asarray(dev, np.float32) * scale).astype(np.int16)
            for i, req in enumerate(reqs):
                req.future.set_result(wav[i, : mel_lens[i] * hop])
        else:
            mel = np.asarray(dev)
            for i, req in enumerate(reqs):
                req.future.set_result((mel[i, : mel_lens[i]],
                                       int(mel_lens[i])))
