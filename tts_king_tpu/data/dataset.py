"""FastSpeech2 training dataset + batcher.

Feature-file layout and metadata format are identical to the reference
(fs_two/dataset.py): `train.txt` lines `name|speaker|{phones}|raw`, per-
utterance .npy files `<spk>-{mel,energy,duration,pitch,cwt-pitch,pitch-mean,
pitch-std}-<name>.npy`, `speakers.json` for the id map.

TPU-first batching: the reference's sorted group batching (DataLoader batch =
batch_size*group_size, collate sorts by text length desc and slices into
group_size real batches, fs_two/dataset.py:206-225) maps 1:1 onto this
framework's grad-accumulation superbatches of shape (acc, B, ...). Padded
lengths are quantized up to fixed steps so the jitted train step compiles a
small, bounded set of shapes.

Grapheme masking (README's masked-training feature) is applied per epoch at
batch assembly — fixing two reference bugs: the `> 1` gate that made ratio
0.15 dead (fs_two/dataset.py:149) and the once-at-load application.

Multi-host: `shard=(rank, count)` makes the dataset process-aware. Every
process computes the identical global batch plan (permutation, grouping,
sorting, padded lengths — all metadata-only, including mel lengths read
from .npy headers without touching the data) and then loads feature
payloads ONLY for its own contiguous row block of each microbatch. Masking
is keyed per (epoch seed, item index) so the global batch content is
bit-identical regardless of process count.
"""

import json
import os
from typing import Dict, Iterator, List, Optional

import numpy as np

from tts_king_tpu.config import PreprocessConfig, TrainConfig
from tts_king_tpu.text import text_to_sequence
from tts_king_tpu.text.symbols import MASK, SILENCES

_SILENCE_NAMES = [s.replace("@", "") for s in SILENCES]

L_STEP = 16    # phoneme-length padding quantum
T_STEP = 64    # mel-length padding quantum


def random_mask(phones: List[str], max_masks_per_sentence: float,
                rng: np.random.RandomState) -> List[str]:
    """Replace ~ratio of non-silence tokens with the mask symbol
    (fs_two/dataset.py:14-29 semantics: sampled with replacement, silences
    skipped)."""
    n = len(phones)
    masks_count = int(max_masks_per_sentence * n)
    if masks_count == 0:
        return phones
    out = list(phones)
    for ind in rng.randint(0, n, size=masks_count):
        if out[ind] not in _SILENCE_NAMES:
            out[ind] = MASK
    return out


def _quantize(n, step, cap=None):
    q = ((n + step - 1) // step) * step
    return min(q, cap) if cap else q


class FS2Dataset:
    """Loads preprocessed features and yields padded superbatches."""

    def __init__(self, metadata_file: str, preprocess: PreprocessConfig,
                 train: TrainConfig, sort: bool = True, drop_last: bool = True,
                 max_mel_len: Optional[int] = 1000, apply_masking=None,
                 use_native_loader: Optional[bool] = None,
                 shard: tuple = (0, 1)):
        self.root = preprocess.preprocessed_path
        self.cleaners = list(preprocess.text_cleaners)
        self.batch_size = train.optimizer.batch_size
        self.group_size = train.optimizer.grad_acc_step
        self.mask_ratio = train.max_masks_per_sentence
        self.apply_masking = (self.mask_ratio > 0
                              if apply_masking is None else apply_masking)
        self.sort = sort
        self.drop_last = drop_last
        self.max_mel_len = max_mel_len
        rank, count = shard
        if not (0 <= rank < count):
            raise ValueError(f"bad shard {shard}: need 0 <= rank < count")
        self.shard = (int(rank), int(count))
        self._mel_len_cache: Dict[tuple, int] = {}

        if use_native_loader is None:
            from tts_king_tpu import native

            use_native_loader = native.available()
        self.use_native_loader = use_native_loader

        self.meta = []
        with open(os.path.join(self.root, metadata_file), encoding="utf-8") as f:
            for line in f:
                line = line.strip("\n")
                if not line:
                    continue
                name, speaker, text, raw = line.split("|")
                self.meta.append((name, speaker, text, raw))
        with open(os.path.join(self.root, "speakers.json")) as f:
            self.speaker_map = json.load(f)

    def __len__(self):
        return len(self.meta)

    def _npy_path(self, kind, speaker, name):
        subdir = "pitch" if "pitch" in kind else kind
        return os.path.join(self.root, subdir, f"{speaker}-{kind}-{name}.npy")

    def _npy(self, kind, speaker, name):
        return np.load(self._npy_path(kind, speaker, name))

    def _entry(self, idx: int, mask_seed: Optional[int] = None):
        """(name, speaker, speaker_id, phoneme id sequence) — metadata only.

        Masking RNG is keyed by (mask_seed, idx), not by a shared stream, so
        every process of a sharded run derives the identical masked sequence
        for a given item regardless of iteration order.
        """
        name, speaker, text, _raw = self.meta[idx]
        phones = text.strip("{}").split(" ")
        if self.apply_masking and mask_seed is not None:
            item_rng = np.random.RandomState(
                (int(mask_seed) * 1000003 + int(idx)) % (2**32 - 1))
            phones = random_mask(phones, self.mask_ratio, item_rng)
        seq = np.asarray(
            text_to_sequence("{" + " ".join(phones) + "}", self.cleaners),
            np.int32)
        return (name, speaker, np.int32(self.speaker_map[speaker]), seq)

    def _mel_len(self, speaker: str, name: str) -> int:
        """Mel frame count from the .npy header (mmap — no data read)."""
        key = (speaker, name)
        n = self._mel_len_cache.get(key)
        if n is None:
            n = int(np.load(self._npy_path("mel", speaker, name),
                            mmap_mode="r").shape[0])
            self._mel_len_cache[key] = n
        return n

    def _item_from_entry(self, entry) -> Dict[str, np.ndarray]:
        """Load feature payloads for one metadata entry (keeps the entry's
        possibly-masked phoneme sequence)."""
        name, speaker, sid, seq = entry
        duration = self._npy("duration", speaker, name).astype(np.int32)
        if len(seq) != len(duration):
            # A length mismatch means text_to_sequence dropped symbols the
            # table doesn't know — training would silently pair phoneme i
            # with phoneme j's duration/pitch/energy targets. The
            # Preprocessor validates at build time; this catches corpora
            # prepared elsewhere.
            raise ValueError(
                f"{speaker}/{name}: phoneme sequence has {len(seq)} ids but "
                f"duration target has {len(duration)} — unknown symbols in "
                "the metadata phones were dropped by text_to_sequence")
        return {
            "id": name,
            "speaker": sid,
            "text": seq,
            "mel": self._npy("mel", speaker, name).astype(np.float32),
            "energy": self._npy("energy", speaker, name).astype(np.float32),
            "duration": duration,
            "pitch_raw": self._npy("pitch", speaker, name).astype(np.float32),
            "pitch_cwt": np.nan_to_num(
                self._npy("cwt-pitch", speaker, name).astype(np.float32)),
            "pitch_mean": self._npy("pitch-mean", speaker, name).astype(np.float32),
            "pitch_std": self._npy("pitch-std", speaker, name).astype(np.float32),
        }

    def load_item(self, idx: int, rng: Optional[np.random.RandomState] = None
                  ) -> Dict[str, np.ndarray]:
        """One item with (optional) phoneme masking applied — the same
        feature loading as the batched path (_item_from_entry), so the
        two can never drift."""
        name, speaker, text, raw = self.meta[idx]
        phones = text.strip("{}").split(" ")
        if self.apply_masking and rng is not None:
            phones = random_mask(phones, self.mask_ratio, rng)
        seq = np.asarray(
            text_to_sequence("{" + " ".join(phones) + "}", self.cleaners),
            np.int32)
        return self._item_from_entry(
            (name, speaker, np.int32(self.speaker_map[speaker]), seq))

    def _collate_native(self, entries, L: int, T: int):
        """Batch-load every feature family with the native threaded npy
        loader directly into the padded batch buffers (one C++ call per
        family instead of 7 np.load calls per item)."""
        from tts_king_tpu import native

        B = len(entries)
        names = [(spk, name) for (name, spk, _sid, _seq) in entries]

        def paths(kind):
            return [self._npy_path(kind, spk, name) for spk, name in names]

        def load(kind, rows, cols):
            arr, lens = native.load_npy_batch(paths(kind), rows, cols)
            if (lens < 0).any():
                # fail like the np.load path would — a silent all-zero row
                # would train on corrupt targets without a word
                bad = [names[i] for i in np.nonzero(lens < 0)[0]]
                raise FileNotFoundError(
                    f"failed to load {kind} for {bad[:3]}")
            return arr, lens

        mels, mel_lens = load("mel", T, 80)
        energies, _ = load("energy", L, 1)
        durations, dur_lens = load("duration", L, 1)
        pitches, _ = load("pitch", L, 1)
        cwt, _ = load("cwt-pitch", L, 11)
        pmean, _ = load("pitch-mean", 1, 1)
        pstd, _ = load("pitch-std", 1, 1)

        batch = {
            "speakers": np.asarray([sid for (_n, _s, sid, _q) in entries],
                                   np.int32),
            "texts": np.zeros((B, L), np.int32),
            "src_lens": np.zeros((B,), np.int32),
            "mels": mels,
            "mel_lens": mel_lens.astype(np.int32),
            "energies": energies[:, :, 0],
            "durations": durations[:, :, 0].astype(np.int32),
            "pitches_raw": pitches[:, :, 0],
            "pitches_cwt": np.nan_to_num(cwt),
            "pitches_mean": pmean[:, 0, 0],
            "pitches_std": pstd[:, 0, 0],
        }
        for b, (_name, _spk, _sid, seq) in enumerate(entries):
            l = min(len(seq), L)
            if min(int(dur_lens[b]), L) != l:
                # same contract as _item_from_entry: a shorter id sequence
                # means unknown symbols were silently dropped — refuse to
                # train on misaligned targets
                raise ValueError(
                    f"{names[b][0]}/{names[b][1]}: phoneme sequence has "
                    f"{len(seq)} ids but duration target has "
                    f"{int(dur_lens[b])} — unknown symbols in the metadata "
                    "phones were dropped by text_to_sequence")
            batch["texts"][b, :l] = seq[:l]
            batch["src_lens"][b] = l
        return batch

    def _collate(self, items: List[Dict[str, np.ndarray]], L: int, T: int):
        B = len(items)
        batch = {
            "speakers": np.zeros((B,), np.int32),
            "texts": np.zeros((B, L), np.int32),
            "src_lens": np.zeros((B,), np.int32),
            "mels": np.zeros((B, T, 80), np.float32),
            "mel_lens": np.zeros((B,), np.int32),
            "energies": np.zeros((B, L), np.float32),
            "durations": np.zeros((B, L), np.int32),
            "pitches_raw": np.zeros((B, L), np.float32),
            "pitches_cwt": np.zeros((B, L, 11), np.float32),
            "pitches_mean": np.zeros((B,), np.float32),
            "pitches_std": np.zeros((B,), np.float32),
        }
        for b, it in enumerate(items):
            l = min(len(it["text"]), L)
            t = min(it["mel"].shape[0], T)
            batch["speakers"][b] = it["speaker"]
            batch["texts"][b, :l] = it["text"][:l]
            batch["src_lens"][b] = l
            batch["mels"][b, :t] = it["mel"][:t]
            batch["mel_lens"][b] = t
            n = min(l, len(it["energy"]))
            batch["energies"][b, :n] = it["energy"][:n]
            batch["durations"][b, :n] = it["duration"][:n]
            batch["pitches_raw"][b, :n] = it["pitch_raw"][:n]
            c = min(l, it["pitch_cwt"].shape[0])
            batch["pitches_cwt"][b, :c] = it["pitch_cwt"][:c, :11]
            batch["pitches_mean"][b] = it["pitch_mean"]
            batch["pitches_std"][b] = it["pitch_std"]
        return batch

    def superbatches_per_epoch(self) -> int:
        """Superbatch count of one epoch — the batch plan is a pure
        function of metadata, so this is computable without loading
        features (train/loop.py derives the resume epoch/offset from it)."""
        group = self.batch_size * self.group_size
        full, tail = divmod(len(self.meta), group)
        if self.drop_last:
            return full
        return full + (1 if tail >= self.batch_size else 0)

    def epoch_superbatches(self, seed: int = 0, start_batch: int = 0
                           ) -> Iterator[Dict[str, np.ndarray]]:
        """Yield (acc, B_local, ...) superbatches for one epoch.

        Groups of batch_size*group_size items are length-sorted (desc) and
        sliced into `group_size` microbatches (the reference's grouped
        collate), padded jointly to quantized max lengths. The batch plan —
        permutation, sorting, L and T — is computed from metadata alone and
        is identical across shards; when shard=(rank, count) with count > 1,
        only rows [rank*B/count, (rank+1)*B/count) of each microbatch are
        loaded (B_local = batch_size // count).

        start_batch: skip the first N superbatches of the epoch WITHOUT
        loading their features (metadata-only fast-forward) — mid-epoch
        resume continues the epoch's data sequence where the crashed run
        left off instead of replaying it.
        """
        rank, nshards = self.shard
        bs = self.batch_size
        if bs % nshards:
            raise ValueError(
                f"batch_size={bs} not divisible by shard count {nshards}")
        rng = np.random.RandomState(seed)
        order = rng.permutation(len(self.meta))
        group = bs * self.group_size
        emitted = 0
        for start in range(0, len(order) - (group - 1 if self.drop_last else 0),
                           group):
            idxs = order[start : start + group]
            if len(idxs) < group and self.drop_last:
                break
            entries = [self._entry(int(i), mask_seed=seed) for i in idxs]
            if self.sort:
                entries.sort(key=lambda e: -len(e[3]))
            micro = [entries[i * bs : (i + 1) * bs]
                     for i in range(len(entries) // bs)]
            micro = [m for m in micro if len(m) == bs]
            if not micro:
                continue
            if emitted < start_batch:   # plan-only fast-forward
                emitted += 1
                continue
            emitted += 1
            L = _quantize(max(len(e[3]) for m in micro for e in m), L_STEP)
            T = _quantize(max(self._mel_len(e[1], e[0])
                              for m in micro for e in m),
                          T_STEP, self.max_mel_len)
            if nshards > 1:
                k = bs // nshards
                micro = [m[rank * k : (rank + 1) * k] for m in micro]
            if self.use_native_loader:
                collated = [self._collate_native(m, L, T) for m in micro]
            else:
                collated = [
                    self._collate([self._item_from_entry(e) for e in m], L, T)
                    for m in micro]
            yield {k2: np.stack([c[k2] for c in collated])
                   for k2 in collated[0]}

    def batches(self, seed: int = 0, batch_size: Optional[int] = None
                ) -> Iterator[Dict[str, np.ndarray]]:
        """Plain (B_local, ...) batches (no accumulation axis) — for
        evaluation. Sharded datasets yield each process's contiguous row
        block and drop the ragged tail (all shards must agree on batch
        count)."""
        rank, nshards = self.shard
        bs = batch_size or self.batch_size
        if bs % nshards:
            raise ValueError(
                f"batch_size={bs} not divisible by shard count {nshards}")
        order = np.arange(len(self.meta))
        for start in range(0, len(order), bs):
            idxs = order[start : start + bs]
            if len(idxs) < bs and (self.drop_last or nshards > 1):
                break
            entries = [self._entry(int(i),
                                   mask_seed=seed if self.apply_masking else None)
                       for i in idxs]
            L = _quantize(max(len(e[3]) for e in entries), L_STEP)
            T = _quantize(max(self._mel_len(e[1], e[0]) for e in entries),
                          T_STEP, self.max_mel_len)
            if nshards > 1:
                k = bs // nshards
                entries = entries[rank * k : (rank + 1) * k]
            yield self._collate([self._item_from_entry(e) for e in entries],
                                L, T)
