"""Dynamic-batching synthesis server.

Production serving layer the reference never had: requests (text or phoneme
IDs, per-request speaker and prosody controls) are queued and drained by a
single device thread that groups compatible requests into padded batches —
one compiled program per (phoneme-bucket, mel-bucket) shape, shared across
the fleet of requests. Throughput scales with batch size (bench.py: compute
is sublinear in B on the MXU) while per-request latency stays bounded by
``max_wait_ms``.

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


class SynthesisServer:
    """Batched text->wav serving on top of pipeline.TTSKing."""

    def __init__(self, king, max_batch: int = 16, max_wait_ms: float = 10.0,
                 return_wav: bool = True):
        self.king = king
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.return_wav = return_wav
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------- public

    def submit(self, text: Optional[str] = None, phonemes=None, speaker=0,
               duration_control=1.0, pitch_control=1.0,
               energy_control=1.0) -> Future:
        """Enqueue one utterance; resolves to int16 wav (or (mel, mel_len))."""
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
        self._thread.join(timeout=5)

    # ------------------------------------------------------------- worker

    def _worker(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            deadline = _now() + self.max_wait
            while len(batch) < self.max_batch:
                timeout = deadline - _now()
                if timeout <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=timeout))
                except queue.Empty:
                    break
            # group by controls (same-knob requests share a batch)
            groups = {}
            for req in batch:
                groups.setdefault(req.controls, []).append(req)
            for controls, reqs in groups.items():
                try:
                    self._run_batch(reqs, controls)
                except Exception as e:  # surface errors to every waiter
                    for req in reqs:
                        if not req.future.done():
                            req.future.set_exception(e)

    def _run_batch(self, reqs, controls):
        d_ctl, p_ctl, e_ctl = controls
        L = max(len(r.phonemes) for r in reqs)
        phonemes = np.zeros((len(reqs), L), np.int32)
        src_lens = np.zeros((len(reqs),), np.int32)
        for i, r in enumerate(reqs):
            phonemes[i, : len(r.phonemes)] = r.phonemes
            src_lens[i] = len(r.phonemes)
        speakers = [r.speaker for r in reqs]

        out = self.king.tts.generate(
            phonemes, duration_control=d_ctl, pitch_control=p_ctl,
            energy_control=e_ctl, speaker_name=speakers, src_lens=src_lens)
        mel_lens = np.asarray(out["mel_lens"])
        if self.return_wav:
            hop = self.king.cfg.preprocess.stft.hop_length
            wavs = self.king.vocoder.generate(
                out["postnet_mel"], lengths=mel_lens * hop)
            for req, wav in zip(reqs, wavs):
                req.future.set_result(wav)
        else:
            mel = np.asarray(out["postnet_mel"])
            for i, req in enumerate(reqs):
                req.future.set_result((mel[i, : mel_lens[i]], int(mel_lens[i])))
