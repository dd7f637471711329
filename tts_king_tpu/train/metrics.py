"""Objective TTS metrics on FREE-RUNNING synthesis (no teacher forcing).

The reference's evaluation reports teacher-forced losses only
(fs_two/evaluate.py:18-54); loss scalars say little about what a user hears.
These are the standard objective TTS metrics computed against the prepared
corpus's ground-truth features:

  * MCD (dB)        — mel-cepstral distortion over a DTW alignment of the
                      free-running mel vs the GT mel (lengths differ because
                      durations are predicted);
  * duration MAE    — |predicted − GT| frames per phoneme;
  * F0-RMSE (Hz)    — frame-level F0 of the vocoded synthesis vs the GT
                      audio's frame-level F0 (saved by the feature pipeline
                      as `frame-pitch`, which the reference discards after
                      phoneme averaging), aligned by the same DTW path,
                      over frames voiced in both;
  * V/UV F1         — voiced/unvoiced agreement on the aligned frames.

All pure numpy on the host except the model/vocoder forwards.
"""

from typing import Dict, Optional

import numpy as np

MCD_K = 10.0 * np.sqrt(2.0) / np.log(10.0)


def mel_cepstra(mel: np.ndarray, n_coeffs: int = 13) -> np.ndarray:
    """(T, n_mels) log-mel -> (T, n_coeffs) cepstra (DCT-II, c0 dropped —
    c0 is overall energy, excluded from MCD by convention)."""
    T, M = mel.shape
    k = np.arange(1, n_coeffs + 1)
    basis = np.cos(np.pi * k[:, None] * (2 * np.arange(M) + 1)[None, :]
                   / (2.0 * M))            # (n_coeffs, M)
    return mel @ basis.T * np.sqrt(2.0 / M)


def dtw_path(cost: np.ndarray):
    """Classic DTW over a (T1, T2) cost matrix -> list of (i, j) pairs.

    Anti-diagonal sweep: every cell on diagonal d=i+j depends only on
    diagonals d-1 and d-2, so each diagonal is ONE vectorized update —
    O(T1+T2) Python iterations instead of O(T1*T2) (a row-sequential
    inner loop blocked the training loop for seconds per val utterance
    at max_seq_len-scale mels)."""
    T1, T2 = cost.shape
    acc = np.full((T1 + 1, T2 + 1), np.inf)
    acc[0, 0] = 0.0
    for d in range(2, T1 + T2 + 1):
        i = np.arange(max(1, d - T2), min(T1, d - 1) + 1)
        j = d - i
        # acc[i, j] = cost + min(acc[i-1, j], acc[i-1, j-1], acc[i, j-1]);
        # all three reads are on earlier diagonals — no aliasing
        acc[i, j] = cost[i - 1, j - 1] + np.minimum(
            np.minimum(acc[i - 1, j], acc[i, j - 1]), acc[i - 1, j - 1])
    # backtrack
    path = []
    i, j = T1, T2
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        moves = ((acc[i - 1, j - 1], i - 1, j - 1),
                 (acc[i - 1, j], i - 1, j),
                 (acc[i, j - 1], i, j - 1))
        _, i, j = min(moves, key=lambda t: t[0])
    path.reverse()
    return path


def mcd_dtw(mel_pred: np.ndarray, mel_gt: np.ndarray, n_coeffs: int = 13):
    """MCD in dB between two (T, n_mels) log-mels of different lengths.
    Returns (mcd_db, path) — the path is reused for F0 alignment."""
    c1 = mel_cepstra(np.asarray(mel_pred, np.float64), n_coeffs)
    c2 = mel_cepstra(np.asarray(mel_gt, np.float64), n_coeffs)
    # pairwise euclidean distances
    d2 = (np.sum(c1 * c1, 1)[:, None] + np.sum(c2 * c2, 1)[None, :]
          - 2.0 * c1 @ c2.T)
    dist = np.sqrt(np.maximum(d2, 0.0))
    path = dtw_path(dist)
    ii = np.fromiter((p[0] for p in path), np.int64)
    jj = np.fromiter((p[1] for p in path), np.int64)
    return float(MCD_K * np.mean(dist[ii, jj])), path


def duration_mae(d_pred: np.ndarray, d_gt: np.ndarray) -> float:
    """Mean |pred − GT| frames per phoneme (arrays trimmed to real length)."""
    n = min(len(d_pred), len(d_gt))
    if n == 0:
        return float("nan")
    return float(np.mean(np.abs(np.asarray(d_pred[:n], np.float64)
                                - np.asarray(d_gt[:n], np.float64))))


def f0_frame_metrics(f0_pred: np.ndarray, f0_gt: np.ndarray, path
                     ) -> Dict[str, float]:
    """F0-RMSE (Hz, frames voiced in both) + V/UV precision/recall/F1 over
    a DTW path of (pred_frame, gt_frame) pairs. 0 = unvoiced."""
    ii = np.asarray([p[0] for p in path])
    jj = np.asarray([p[1] for p in path])
    ii = np.clip(ii, 0, len(f0_pred) - 1)
    jj = np.clip(jj, 0, len(f0_gt) - 1)
    pv = np.asarray(f0_pred)[ii] > 0
    gv = np.asarray(f0_gt)[jj] > 0
    both = pv & gv
    out = {}
    if both.any():
        d = np.asarray(f0_pred, np.float64)[ii][both] - \
            np.asarray(f0_gt, np.float64)[jj][both]
        out["f0_rmse_hz"] = float(np.sqrt(np.mean(d * d)))
    else:
        out["f0_rmse_hz"] = float("nan")
    tp = float(np.sum(pv & gv))
    prec = tp / max(float(np.sum(pv)), 1.0)
    rec = tp / max(float(np.sum(gv)), 1.0)
    out["vuv_precision"] = prec
    out["vuv_recall"] = rec
    out["vuv_f1"] = (2 * prec * rec / (prec + rec)
                     if (prec + rec) > 0 else 0.0)
    return out


# jit caches are tied to the wrapped fn object; recreating the wrapper per
# evaluate_objective call would recompile at every val step. Keyed by model
# identity (the stored strong ref pins the object so the id stays valid).
_FWD_CACHE: dict = {}


def _forward_fn(model, max_mel_len):
    import jax

    key = (id(model), max_mel_len)
    hit = _FWD_CACHE.get(key)
    if hit is not None and hit[0] is model:
        return hit[1]

    @jax.jit
    def forward(variables, speakers, texts, src_lens):
        out = model.apply(variables, speakers, texts, src_lens,
                          max_mel_len=max_mel_len, train=False)
        return (out["postnet_mel"], out["mel_lens"], out["duration_rounded"])

    _FWD_CACHE[key] = (model, forward)
    return forward


def evaluate_objective(model, variables, dataset, max_utts: int = 16,
                       vocode_fn=None, f0_fn=None,
                       max_mel_len: Optional[int] = None
                       ) -> Dict[str, float]:
    """Free-running synthesis over the first `max_utts` val utterances ->
    mean objective metrics.

    dataset: FS2Dataset (val split, apply_masking=False).
    vocode_fn: optional (T, n_mels) mel -> (T*hop,) float waveform;
    f0_fn: optional (n,) waveform -> frame-level F0 in Hz (0 = unvoiced).
    F0/V-UV metrics require both plus the corpus's `frame-pitch` files
    (feature pipelines from round 3 on write them).
    """
    from tts_king_tpu.data.dataset import L_STEP, _quantize

    forward = _forward_fn(model, max_mel_len)

    mcds, dur_maes, f0s = [], [], []
    n = min(len(dataset.meta), max_utts)
    for idx in range(n):
        name, speaker, _text, _raw = dataset.meta[idx]
        entry = dataset._entry(idx)
        item = dataset._item_from_entry(entry)
        seq = item["text"]
        L = _quantize(len(seq), L_STEP)
        texts = np.zeros((1, L), np.int32)
        texts[0, : len(seq)] = seq
        mel_p, mel_lens, d_rounded = forward(
            variables, np.asarray([item["speaker"]], np.int32), texts,
            np.asarray([len(seq)], np.int32))
        T = int(np.asarray(mel_lens)[0])
        if T < 2:
            continue
        mel_pred = np.asarray(mel_p)[0, :T]
        mel_gt = item["mel"]
        mcd, path = mcd_dtw(mel_pred, mel_gt)
        mcds.append(mcd)
        dur_maes.append(duration_mae(
            np.asarray(d_rounded)[0, : len(seq)], item["duration"]))
        if vocode_fn is not None and f0_fn is not None:
            try:
                f0_gt = dataset._npy("frame-pitch", speaker, name)
            except FileNotFoundError:
                continue
            wav = np.asarray(vocode_fn(mel_pred), np.float32).reshape(-1)
            f0_pred = np.asarray(f0_fn(wav)).reshape(-1)
            f0s.append(f0_frame_metrics(f0_pred, f0_gt, path))

    out = {
        "n_utts": float(len(mcds)),
        "mcd_db": float(np.mean(mcds)) if mcds else float("nan"),
        "duration_mae_frames": (float(np.mean(dur_maes)) if dur_maes
                                else float("nan")),
    }
    if f0s:
        for k in ("f0_rmse_hz", "vuv_f1", "vuv_precision", "vuv_recall"):
            vals = [m[k] for m in f0s if np.isfinite(m[k])]
            out[k] = float(np.mean(vals)) if vals else float("nan")
    return out
