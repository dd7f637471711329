"""HiFi-GAN vocoder training data (hifi/meldataset.py equivalent).

The reference keeps this pipeline dormant (imported by no live path,
SURVEY.md §2.9) and leaves HIFIapi.train unimplemented; here it feeds a real
GAN training loop (train/vocoder.py). Semantics kept from meldataset.py:
random fixed-size segment cropping (segment_size samples, zero-pad short
clips), mel via the torch.stft-style path ((n_fft-hop)//2 reflect pad), a
separate fmax_loss mel for the L1 loss term, and a fine-tuning mode that
reads precomputed acoustic-model mels and crops aligned segments.
"""

import os
import random
from typing import List, Optional

import numpy as np

from tts_king_tpu.config import VocoderModelConfig
from tts_king_tpu.data.features import load_wav
from tts_king_tpu.ops.stft import hifigan_mel


class MelDataset:
    def __init__(self, wav_paths: List[str], cfg: VocoderModelConfig,
                 split: bool = True, fine_tuning: bool = False,
                 base_mels_path: Optional[str] = None,
                 seed: int = 1234, shuffle: bool = True):
        self.paths = list(wav_paths)
        if shuffle:
            random.Random(seed).shuffle(self.paths)
        self.cfg = cfg
        self.split = split
        self.fine_tuning = fine_tuning
        self.base_mels_path = base_mels_path
        self.fmax = cfg.mel_fmax
        self.fmax_loss = cfg.mel_fmax_loss
        self.frames_per_seg = cfg.segment_size // cfg.hop_size

    def __len__(self):
        return len(self.paths)

    def _segment(self, wav, rng):
        seg = self.cfg.segment_size
        if len(wav) >= seg:
            start = rng.randint(0, len(wav) - seg) if self.split else 0
            return wav[start : start + seg] if self.split else wav
        return np.pad(wav, (0, seg - len(wav)))

    def load_item(self, idx: int, rng: random.Random):
        """One (mel, wav, mel_loss) item. Cropping/padding delegates to
        _load_segment — a single code path keeps the fine-tuning
        pad/clamp semantics identical between per-item and batched
        loading (the crop branch used to live here too and drifted: it
        missed the short-wav pad, yielding misaligned mel/mel_loss)."""
        cfg = self.cfg
        wav, mel = self._load_segment(idx, rng)
        mel_loss = np.asarray(hifigan_mel(
            wav[None], cfg.n_fft, cfg.num_mels, cfg.sampling_rate,
            cfg.hop_size, cfg.win_size, cfg.mel_fmin,
            self.fmax_loss or self.fmax), np.float32)[0]
        if mel is None:   # not fine-tuning: mel from the wav at self.fmax
            if (self.fmax_loss or self.fmax) == self.fmax:
                mel = mel_loss   # identical transform: don't compute twice
            else:
                mel = np.asarray(hifigan_mel(
                    wav[None], cfg.n_fft, cfg.num_mels, cfg.sampling_rate,
                    cfg.hop_size, cfg.win_size, cfg.mel_fmin, self.fmax),
                    np.float32)[0]
        return mel.astype(np.float32), wav.astype(np.float32), mel_loss

    def _load_segment(self, idx: int, rng: random.Random):
        """(wav_segment, mel_or_None): the aligned crop WITHOUT computing
        any spectrogram — mels are computed batched in batches()."""
        cfg = self.cfg
        wav = load_wav(self.paths[idx], cfg.sampling_rate)
        if not self.fine_tuning:
            if self.split:
                wav = self._segment(wav, rng)
            return wav.astype(np.float32), None
        base = os.path.splitext(os.path.basename(self.paths[idx]))[0]
        mel = np.load(os.path.join(self.base_mels_path, base + ".npy"))
        if mel.ndim == 2 and mel.shape[0] == cfg.num_mels:
            mel = mel.T
        if self.split:
            if mel.shape[0] >= self.frames_per_seg:
                start = rng.randint(0, mel.shape[0] - self.frames_per_seg)
                mel = mel[start : start + self.frames_per_seg]
                wav = wav[start * cfg.hop_size :
                          (start + self.frames_per_seg) * cfg.hop_size]
            else:
                mel = np.pad(mel, ((0, self.frames_per_seg - mel.shape[0]),
                                   (0, 0)))
            if len(wav) < cfg.segment_size:
                wav = np.pad(wav, (0, cfg.segment_size - len(wav)))
            wav = wav[: cfg.segment_size]
        return wav.astype(np.float32), mel.astype(np.float32)

    def batches(self, batch_size: int, seed: int = 0, shard=None):
        """Yield dict batches of aligned (mel, wav, mel_loss) segments.

        Split mode computes the mels for the WHOLE batch in one (two, with
        a distinct fmax_loss) hifigan_mel call on equal-length segments —
        per-item spectrogram calls cost a device round trip each and were
        the input-pipeline bottleneck for GAN training.

        shard=(rank, nproc): multi-host mode — this process loads ONLY its
        contiguous row block of every batch (rows rank*B/n..(rank+1)*B/n),
        ready for parallel.mesh.globalize_batch. Segment crops use a
        per-item RNG keyed on (seed, global epoch position), so the
        assembled global batch is bit-identical to an unsharded run — the
        same determinism contract FS2Dataset's per-item masking keeps."""
        cfg = self.cfg
        rank, nproc = shard if shard is not None else (0, 1)
        if batch_size % nproc:
            raise ValueError(f"batch_size={batch_size} not divisible by "
                             f"process count {nproc}")
        rows = slice((rank * batch_size) // nproc,
                     ((rank + 1) * batch_size) // nproc)
        order = list(range(len(self.paths)))
        random.Random(seed).shuffle(order)
        for start in range(0, len(order) - batch_size + 1, batch_size):
            idxs = order[start : start + batch_size][rows]
            # crop randomness is a pure function of (seed, epoch position):
            # identical across sharded and unsharded runs. Integer seeds
            # only — tuple/str seeding would ride hash(), and str hashes
            # are randomized per process.
            rngs = [random.Random(seed * 1_000_003 + start + j)
                    for j in range(batch_size)][rows]
            if not self.split:
                # variable lengths: per-item path (batch_size 1 use only)
                items = [self.load_item(i, r) for i, r in zip(idxs, rngs)]
                yield {
                    "mel": np.stack([m for m, _, _ in items]),
                    "wav": np.stack([w for _, w, _ in items]),
                    "mel_loss": np.stack([l for _, _, l in items]),
                }
                continue
            loaded = [self._load_segment(i, r) for i, r in zip(idxs, rngs)]
            wav_b = np.stack([w for w, _ in loaded])
            mel_loss_b = np.asarray(hifigan_mel(
                wav_b, cfg.n_fft, cfg.num_mels, cfg.sampling_rate,
                cfg.hop_size, cfg.win_size, cfg.mel_fmin,
                self.fmax_loss or self.fmax), np.float32)
            if self.fine_tuning:
                mel_b = np.stack([m for _, m in loaded])
            elif (self.fmax_loss or self.fmax) == self.fmax:
                # default config has no distinct fmax_loss: the generator
                # input mel IS the loss mel — one spectrogram pass, not two
                mel_b = mel_loss_b
            else:
                mel_b = np.asarray(hifigan_mel(
                    wav_b, cfg.n_fft, cfg.num_mels, cfg.sampling_rate,
                    cfg.hop_size, cfg.win_size, cfg.mel_fmin, self.fmax),
                    np.float32)
            yield {"mel": mel_b, "wav": wav_b, "mel_loss": mel_loss_b}
