"""Validation loop: teacher-forced loss means over the val split
(fs_two/evaluate.py:18-54 semantics: per-batch sums weighted by batch size,
divided by dataset length)."""

from typing import Optional

import numpy as np

from tts_king_tpu.train.loss import FS2Losses


def evaluate(eval_step, state, dataset, max_batches: Optional[int] = None,
             globalize=None):
    """eval_step: jitted make_eval_step fn; dataset: FS2Dataset (val).

    globalize: optional fn assembling each per-process batch shard into a
    global sharded array (multi-host runs; see parallel.mesh.globalize_batch).
    The weighted mean stays correct — every process sees the same local row
    count sequence and eval_step's loss is the global-batch mean either way.
    """
    totals = np.zeros(len(FS2Losses._fields), np.float64)
    count = 0
    for i, batch in enumerate(dataset.batches(seed=0)):
        if max_batches is not None and i >= max_batches:
            break
        if globalize is not None:
            batch = globalize(batch)
        losses = eval_step(state, batch)
        B = batch["texts"].shape[0]
        totals += np.array([float(v) for v in losses]) * B
        count += B
    if count == 0:
        return FS2Losses(*([np.nan] * len(FS2Losses._fields)))
    return FS2Losses(*(totals / count))
