"""FastSpeech2 training loss.

Semantics parity with the reference (fs_two/model/loss.py:24-134), including
its quirks:
  * pitch/energy/log-duration MSE averaged over VALID (unmasked) source
    positions only (masked_select semantics);
  * mel losses (MSE + MAE + postnet MAE) computed on mask-zeroed tensors but
    averaged over the FULL padded tensor size (loss.py:83-96) — kept, because
    it rescales the mel term relative to the others and training dynamics
    depend on it;
  * log-duration targets are log(d + 1) (loss.py:56);
  * mel targets trimmed to the decoder-truncated length (loss.py:57);
  * CWT mode adds pitch mean/std MSE heads, otherwise those are 0.
"""

from typing import Any, Dict, NamedTuple

import jax.numpy as jnp


class FS2Losses(NamedTuple):
    total: jnp.ndarray
    mel: jnp.ndarray
    pitch: jnp.ndarray
    energy: jnp.ndarray
    duration: jnp.ndarray
    pitch_mean: jnp.ndarray
    pitch_std: jnp.ndarray


def _masked_mse(pred, target, valid):
    valid = valid.astype(pred.dtype)
    err = (pred - target) ** 2 * valid
    return jnp.sum(err) / jnp.maximum(jnp.sum(valid), 1.0)


def fastspeech2_loss(batch: Dict[str, Any], outputs: Dict[str, Any],
                     use_cwt: bool = False) -> FS2Losses:
    """batch: training targets; outputs: FastSpeech2.__call__ dict."""
    src_valid = ~outputs["src_masks"]          # (B, L)
    mel_valid = ~outputs["mel_masks"]          # (B, T') possibly truncated
    T = mel_valid.shape[1]

    mel_targets = batch["mels"][:, :T]
    log_d_targets = jnp.log(batch["durations"].astype(jnp.float32) + 1.0)

    if use_cwt:
        pitch_valid = jnp.repeat(src_valid[:, :, None], 11, axis=2)
        pitch_loss = _masked_mse(outputs["pitch_prediction"],
                                 batch["pitches_cwt"], pitch_valid)
        mean_loss = jnp.mean(
            (outputs["pitch_mean"][:, 0] - batch["pitches_mean"]) ** 2)
        std_loss = jnp.mean(
            (outputs["pitch_std"][:, 0] - batch["pitches_std"]) ** 2)
    else:
        pitch_loss = _masked_mse(outputs["pitch_prediction"],
                                 batch["pitches_raw"], src_valid)
        mean_loss = jnp.asarray(0.0, jnp.float32)
        std_loss = jnp.asarray(0.0, jnp.float32)

    energy_loss = _masked_mse(outputs["energy_prediction"],
                              batch["energies"], src_valid)
    duration_loss = _masked_mse(outputs["log_duration_prediction"],
                                log_d_targets, src_valid)

    # Mel terms: mask-zeroed, averaged over the FULL tensor (reference quirk).
    m = mel_valid[:, :, None].astype(mel_targets.dtype)
    mel_p = outputs["mel"][:, :T] * m
    post_p = outputs["postnet_mel"][:, :T] * m
    mel_t = mel_targets * m
    mel_mse = jnp.mean((mel_p - mel_t) ** 2)
    mel_mae = jnp.mean(jnp.abs(mel_p - mel_t))
    post_mae = jnp.mean(jnp.abs(post_p - mel_t))
    mel_loss = mel_mse + mel_mae + post_mae

    total = (mel_loss + duration_loss + pitch_loss + energy_loss
             + mean_loss + std_loss)
    return FS2Losses(total, mel_loss, pitch_loss, energy_loss, duration_loss,
                     mean_loss, std_loss)
