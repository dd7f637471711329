"""Sequence-parallel (time-sharded) vocoding over a device mesh.

The reference's answer to long sequences is "don't" (SURVEY.md §5.7: the
acoustic model truncates at max_seq_len and nothing handles long audio).
Here the HiFi-GAN generator — fully convolutional, bounded receptive field
(ops/streaming.py) — scales to arbitrarily long utterances by sharding the
TIME axis across the mesh: each device vocodes its own mel slice plus a
halo exchanged with its neighbors over ICI (`jax.lax.ppermute` inside
`shard_map`), then keeps only the center of its output. One long audiobook
paragraph vocodes N-ways parallel with two neighbor-to-neighbor transfers
of `halo x 80` mel frames — bytes, not megabytes — instead of gathering
the whole mel on one chip.

Correctness contract (same as streaming): with halo >= the generator's
receptive field, every sample strictly inside a device's slice equals the
full-pass output bit-for-bit; the first/last `halo` frames of the GLOBAL
sequence see mel-space zero padding instead of the full pass's conv-level
zero padding and may differ there (inaudible ramp-in, bounded by tests).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


def vocoder_time_sharded(model_apply, variables, mel, mesh, halo_frames,
                         upsample: int, axis: str = "dp"):
    """Vocode one long utterance with its time axis sharded over mesh[axis].

    model_apply: the generator's apply fn, (variables, (1, t, M)) -> (1, t*up)
    mel: (1, T, M) array (host or device)
    halo_frames: one-sided mel halo, >= generator_receptive_field(config)
    upsample: total upsampling factor (prod of upsample_rates, e.g. 256)

    Returns (1, T * upsample) waveform.
    """
    shard_map = jax.shard_map

    n = mesh.shape[axis]
    B, T, M = mel.shape
    assert B == 1, "time sharding is for a single long utterance"
    # pad T to a multiple of n (zeros; trimmed from the waveform below)
    Tp = ((T + n - 1) // n) * n
    if Tp != T:
        mel = jnp.pad(jnp.asarray(mel), [(0, 0), (0, Tp - T), (0, 0)])
    h = int(halo_frames)
    if Tp // n < h:
        raise ValueError(
            f"per-device slice {Tp // n} frames < halo {h}; the utterance "
            f"is too short to time-shard {n} ways — use the plain vocoder")

    def local_vocode(variables, mel_loc):
        # mel_loc: (1, Tp // n, M) — this device's slice.
        # Non-circular ppermute: devices with no neighbor receive ZEROS,
        # which is exactly the zero padding the sequence edges need.
        send_right = [(i, i + 1) for i in range(n - 1)]
        send_left = [(i + 1, i) for i in range(n - 1)]
        left_halo = jax.lax.ppermute(mel_loc[:, -h:], axis, send_right)
        right_halo = jax.lax.ppermute(mel_loc[:, :h], axis, send_left)
        window = jnp.concatenate([left_halo, mel_loc, right_halo], axis=1)
        wav = model_apply(variables, window)
        return wav[:, h * upsample: -h * upsample]

    fn = shard_map(
        local_vocode, mesh=mesh,
        in_specs=(P(), P(None, axis, None)),
        out_specs=P(None, axis),
    )
    wav = fn(variables, jnp.asarray(mel))
    return wav[:, : T * upsample]
