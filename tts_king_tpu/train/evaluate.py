"""Validation loop: teacher-forced loss means over the val split
(fs_two/evaluate.py:18-54 semantics: per-batch sums weighted by batch size,
divided by dataset length)."""

from typing import Optional

import numpy as np

from tts_king_tpu.train.loss import FS2Losses


def evaluate(eval_step, state, dataset, max_batches: Optional[int] = None):
    """eval_step: jitted make_eval_step fn; dataset: FS2Dataset (val)."""
    totals = np.zeros(len(FS2Losses._fields), np.float64)
    count = 0
    for i, batch in enumerate(dataset.batches(seed=0)):
        if max_batches is not None and i >= max_batches:
            break
        losses = eval_step(state, batch)
        B = batch["texts"].shape[0]
        totals += np.array([float(v) for v in losses]) * B
        count += B
    if count == 0:
        return FS2Losses(*([np.nan] * len(FS2Losses._fields)))
    return FS2Losses(*(totals / count))
