"""FastSpeech2 acoustic model, TPU-native.

Architecture parity with the reference (fs_two/model/fastspeech2.py,
fs_two/transformer/Models.py, fs_two/model/modules.py), re-designed for XLA:
static shapes everywhere, the length regulator as a fixed-size gather, and
behavioral quirks that affect outputs preserved deliberately:
  * duration predictor runs on encoder output *before* the speaker embedding
    is added (modules.py:158-159);
  * decoder truncates to max_seq_len in training (Models.py:172-180) and
    regenerates the sinusoid table past it at inference (Models.py:163-170,
    here a trace-time decision on the static length);
  * 256-bin bucketized pitch/energy embeddings with bins from stats.json
    min/max (modules.py:55-90);
  * inference duration rounding clamp(round(exp(logd)-1)*c, 0)
    (modules.py:199-204).
"""

from dataclasses import field
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tts_king_tpu.config import ModelConfig, VariancePredictorConfig
from tts_king_tpu.models.layers import (
    CNNScalar,
    FFTBlock,
    PostNet,
    VariancePredictor,
    sinusoid_position_table,
)
from tts_king_tpu.ops.cwt import inverse_batch_cwt
from tts_king_tpu.ops.length_regulator import length_regulate, round_durations
from tts_king_tpu.ops.masks import mask_from_lengths
from tts_king_tpu.text.symbols import VOCAB_SIZE


class Encoder(nn.Module):
    """Phoneme encoder: embedding + sinusoid positions + N FFT blocks
    (fs_two/transformer/Models.py:33-112)."""

    n_layers: int = 4
    n_head: int = 2
    d_model: int = 256
    d_inner: int = 1024
    kernel_size: tuple = (9, 1)
    dropout: float = 0.2
    max_seq_len: int = 1000
    vocab_size: int = VOCAB_SIZE
    dtype: Any = jnp.float32
    use_pallas: bool = False
    use_flash: bool = False
    probs_bf16: bool = False

    @nn.compact
    def __call__(self, src_seq, pad_mask, deterministic: bool = True,
                 train: bool = False):
        B, L = src_seq.shape
        d_k = self.d_model // self.n_head
        emb = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype,
                       name="src_word_emb")(src_seq)
        # padding_idx=0 semantics: pad token contributes nothing.
        emb = jnp.where((src_seq == 0)[:, :, None], 0.0, emb)

        if (not train) and L > self.max_seq_len:
            pos = jnp.asarray(sinusoid_position_table(L, self.d_model))
        else:
            table = jnp.asarray(
                sinusoid_position_table(self.max_seq_len + 1, self.d_model))
            pos = table[:L]
        x = emb + pos[None, :, :].astype(self.dtype)

        for i in range(self.n_layers):
            x = FFTBlock(self.d_model, self.n_head, d_k, d_k, self.d_inner,
                         self.kernel_size, self.dropout, dtype=self.dtype,
                         use_pallas=self.use_pallas,
                         use_flash=self.use_flash,
                         probs_bf16=self.probs_bf16,
                         name=f"layer_{i}")(x, pad_mask, deterministic)
        return x


class Decoder(nn.Module):
    """Mel decoder: sinusoid positions + N FFT blocks, with the reference's
    train-time truncation to max_seq_len (fs_two/transformer/Models.py:115-189)."""

    n_layers: int = 6
    n_head: int = 2
    d_model: int = 256
    d_inner: int = 1024
    kernel_size: tuple = (9, 1)
    dropout: float = 0.2
    max_seq_len: int = 1000
    dtype: Any = jnp.float32
    use_pallas: bool = False
    use_flash: bool = False
    probs_bf16: bool = False

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool = True,
                 train: bool = False):
        B, T, _ = x.shape
        d_k = self.d_model // self.n_head

        if (not train) and T > self.max_seq_len:
            pos = jnp.asarray(sinusoid_position_table(T, self.d_model))
        else:
            T = min(T, self.max_seq_len)
            x = x[:, :T]
            pad_mask = pad_mask[:, :T]
            table = jnp.asarray(
                sinusoid_position_table(self.max_seq_len + 1, self.d_model))
            pos = table[:T]
        x = x + pos[None, :, :].astype(self.dtype)

        for i in range(self.n_layers):
            x = FFTBlock(self.d_model, self.n_head, d_k, d_k, self.d_inner,
                         self.kernel_size, self.dropout, dtype=self.dtype,
                         use_pallas=self.use_pallas,
                         use_flash=self.use_flash,
                         probs_bf16=self.probs_bf16,
                         name=f"layer_{i}")(x, pad_mask, deterministic)
        return x, pad_mask


class VarianceAdaptor(nn.Module):
    """Duration/pitch/energy adaptor + length regulator
    (fs_two/model/modules.py:14-217)."""

    predictor: VariancePredictorConfig = field(default_factory=VariancePredictorConfig)
    n_bins: int = 256
    pitch_quantization: str = "linear"
    energy_quantization: str = "linear"
    pitch_min: float = -1.0
    pitch_max: float = 1.0
    energy_min: float = -1.0
    energy_max: float = 1.0
    d_model: int = 256
    use_cwt: bool = False
    dtype: Any = jnp.float32

    def _bins(self, lo, hi, quantization):
        if quantization == "log":
            return np.exp(np.linspace(np.log(lo), np.log(hi), self.n_bins - 1))
        return np.linspace(lo, hi, self.n_bins - 1)

    @nn.compact
    def __call__(
        self,
        x,                      # (B, L, H) encoder output
        speaker_embedding,      # (B, 1, H)
        src_mask,               # (B, L) True=pad
        max_mel_len: int,
        mel_mask=None,          # (B, T) or None (inference)
        pitch_raw_target=None,  # (B, L)
        pitch_cwt_target=None,  # (B, L, 11)
        energy_target=None,     # (B, L)
        duration_target=None,   # (B, L) int
        p_control: float = 1.0,
        e_control: float = 1.0,
        d_control: float = 1.0,
        deterministic: bool = True,
    ):
        vp = self.predictor
        # Duration predicted BEFORE the speaker embedding is added — a
        # reference quirk that changes outputs (modules.py:158-159).
        log_duration_prediction = VariancePredictor(
            vp.filter_size, vp.kernel_size, vp.dropout, dtype=self.dtype,
            name="duration_predictor")(x, src_mask, deterministic)
        x = x + speaker_embedding

        pitch_bins = jnp.asarray(
            self._bins(self.pitch_min, self.pitch_max, self.pitch_quantization),
            jnp.float32)
        energy_bins = jnp.asarray(
            self._bins(self.energy_min, self.energy_max, self.energy_quantization),
            jnp.float32)
        pitch_embed_table = nn.Embed(self.n_bins, self.d_model,
                                     dtype=self.dtype, name="pitch_embedding")
        energy_embed_table = nn.Embed(self.n_bins, self.d_model,
                                      dtype=self.dtype, name="energy_embedding")

        pitch_mean = pitch_std = None
        if self.use_cwt:
            # 11-channel CWT pitch spectrogram + scalar mean/std heads,
            # inverse-CWT reconstruction in-graph (modules.py:103-129).
            pitch_prediction = VariancePredictor(
                vp.filter_size, vp.kernel_size, 0.1, output_size=11,
                dtype=self.dtype,
                name="pitch_predictor")(x, src_mask, deterministic)
            pitch_mean = CNNScalar(name="pitch_mean")(
                jax.lax.stop_gradient(x), jax.lax.stop_gradient(pitch_prediction))
            pitch_std = CNNScalar(name="pitch_std")(
                jax.lax.stop_gradient(x), jax.lax.stop_gradient(pitch_prediction))
            pitch = inverse_batch_cwt(pitch_prediction)
            pitch = pitch * pitch_std + pitch_mean
            pitch_embedding = pitch_embed_table(
                jnp.searchsorted(pitch_bins, (pitch * p_control).astype(jnp.float32)))
        else:
            pitch_prediction = VariancePredictor(
                vp.filter_size, vp.kernel_size, vp.dropout, dtype=self.dtype,
                name="pitch_predictor")(x, src_mask, deterministic)
            if pitch_raw_target is not None:
                pitch_embedding = pitch_embed_table(
                    jnp.searchsorted(pitch_bins, pitch_raw_target.astype(jnp.float32)))
            else:
                pitch_prediction = pitch_prediction * p_control
                pitch_embedding = pitch_embed_table(
                    jnp.searchsorted(pitch_bins, pitch_prediction.astype(jnp.float32)))
        x = x + pitch_embedding

        energy_prediction = VariancePredictor(
            vp.filter_size, vp.kernel_size, vp.dropout, dtype=self.dtype,
            name="energy_predictor")(x, src_mask, deterministic)
        if energy_target is not None:
            energy_embedding = energy_embed_table(
                jnp.searchsorted(energy_bins, energy_target.astype(jnp.float32)))
        else:
            energy_prediction = energy_prediction * e_control
            energy_embedding = energy_embed_table(
                jnp.searchsorted(energy_bins, energy_prediction.astype(jnp.float32)))
        x = x + energy_embedding

        if duration_target is not None:
            x, mel_len = length_regulate(x, duration_target, max_mel_len)
            duration_rounded = duration_target
            mel_len_raw = mel_len
        else:
            duration_rounded = round_durations(log_duration_prediction, d_control)
            # Padded phonemes predict logd=0 -> round(e^0-1)=0 frames: no
            # masking needed, matching the reference's masked_fill(0.0).
            x, mel_len = length_regulate(x, duration_rounded, max_mel_len)
            # Raw (unclamped) total frames: the pipeline compares it to the
            # static mel bucket to decide escalation — comparing the CLAMPED
            # value can never exceed the bucket, which silently truncated
            # under-guessed utterances (the reference expands dynamically
            # and never truncates at inference, modules.py:220-252).
            mel_len_raw = mel_len
            mel_len = jnp.minimum(mel_len, max_mel_len)
            mel_mask = mask_from_lengths(mel_len, max_mel_len)

        return {
            "x": x,
            "mel_len_raw": mel_len_raw,
            "pitch_prediction": pitch_prediction,
            "energy_prediction": energy_prediction,
            "log_duration_prediction": log_duration_prediction,
            "duration_rounded": duration_rounded,
            "mel_len": mel_len,
            "mel_mask": mel_mask,
            "pitch_mean": pitch_mean,
            "pitch_std": pitch_std,
        }


class FastSpeech2(nn.Module):
    """Encoder -> (+speaker) -> VarianceAdaptor -> Decoder -> mel + PostNet
    residual (fs_two/model/fastspeech2.py:43-119).

    Returns a dict holding the same 12 quantities as the reference tuple.
    """

    model_config: ModelConfig
    n_speakers: int = 1
    pitch_min: float = -1.0
    pitch_max: float = 1.0
    energy_min: float = -1.0
    energy_max: float = 1.0
    n_mel_channels: int = 80
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        speakers,            # (B,) int
        texts,               # (B, L) int
        src_lens,            # (B,) int
        max_mel_len: Optional[int] = None,
        mel_lens=None,       # (B,) int or None
        energy_targets=None,
        duration_targets=None,
        pitch_raw_targets=None,
        pitch_cwt_targets=None,
        p_control: float = 1.0,
        e_control: float = 1.0,
        d_control: float = 1.0,
        train: bool = False,
    ) -> Dict[str, Any]:
        mc = self.model_config
        tc = mc.transformer
        deterministic = not train
        L = texts.shape[1]
        if max_mel_len is None:
            max_mel_len = mc.max_seq_len

        src_masks = mask_from_lengths(src_lens, L)
        mel_masks = (mask_from_lengths(mel_lens, max_mel_len)
                     if mel_lens is not None else None)

        output = Encoder(
            n_layers=tc.encoder_layer, n_head=tc.encoder_head,
            d_model=tc.encoder_hidden, d_inner=tc.conv_filter_size,
            kernel_size=tuple(tc.conv_kernel_size), dropout=tc.encoder_dropout,
            max_seq_len=mc.max_seq_len, dtype=self.dtype,
            use_pallas=mc.use_pallas_attention,
            use_flash=mc.use_flash_attention,
            probs_bf16=mc.attention_probs_bf16, name="encoder",
        )(texts, src_masks, deterministic, train)

        if mc.multi_speaker:
            spk = nn.Embed(self.n_speakers, tc.encoder_hidden,
                           dtype=self.dtype, name="speaker_emb")(speakers)
            speaker_embedding = spk[:, None, :]
        else:
            speaker_embedding = jnp.zeros(
                (texts.shape[0], 1, tc.encoder_hidden), output.dtype)

        va = VarianceAdaptor(
            predictor=mc.variance_predictor,
            n_bins=mc.variance_embedding.n_bins,
            pitch_quantization=mc.variance_embedding.pitch_quantization,
            energy_quantization=mc.variance_embedding.energy_quantization,
            pitch_min=self.pitch_min, pitch_max=self.pitch_max,
            energy_min=self.energy_min, energy_max=self.energy_max,
            d_model=tc.encoder_hidden, use_cwt=mc.use_cwt, dtype=self.dtype,
            name="variance_adaptor",
        )(
            output, speaker_embedding, src_masks, max_mel_len,
            mel_mask=mel_masks,
            pitch_raw_target=pitch_raw_targets,
            pitch_cwt_target=pitch_cwt_targets,
            energy_target=energy_targets,
            duration_target=duration_targets,
            p_control=p_control, e_control=e_control, d_control=d_control,
            deterministic=deterministic,
        )

        decoded, mel_masks_out = Decoder(
            n_layers=tc.decoder_layer, n_head=tc.decoder_head,
            d_model=tc.decoder_hidden, d_inner=tc.conv_filter_size,
            kernel_size=tuple(tc.conv_kernel_size), dropout=tc.decoder_dropout,
            max_seq_len=mc.max_seq_len, dtype=self.dtype,
            use_pallas=mc.use_pallas_attention,
            use_flash=mc.use_flash_attention,
            probs_bf16=mc.attention_probs_bf16, name="decoder",
        )(va["x"], va["mel_mask"], deterministic, train)

        mel = nn.Dense(self.n_mel_channels, dtype=self.dtype,
                       name="mel_linear")(decoded)
        # Masked postnet: every stage sees zeros past mel_len, making the
        # output bit-identical to running the stack at each item's true
        # length. (The reference instead runs at the dynamic batch max
        # length, leaking shorter items' mel-bias padding into their last
        # ~10 frames — a batch-composition-dependent quirk; this masked form
        # is batch-invariant and exact for single-utterance inference.)
        postnet_mel = PostNet(self.n_mel_channels,
                              embedding_dim=mc.postnet_dim, dtype=self.dtype,
                              name="postnet")(
            mel, train=train, pad_mask=mel_masks_out) + mel

        return {
            "mel": mel,
            "pitch_prediction": va["pitch_prediction"],
            "energy_prediction": va["energy_prediction"],
            "log_duration_prediction": va["log_duration_prediction"],
            "duration_rounded": va["duration_rounded"],
            "src_masks": src_masks,
            "mel_masks": mel_masks_out,
            "src_lens": src_lens,
            "mel_lens": va["mel_len"],
            "mel_lens_raw": va["mel_len_raw"],
            "postnet_mel": postnet_mel,
            "pitch_mean": va["pitch_mean"],
            "pitch_std": va["pitch_std"],
        }


def build_fastspeech2(model_config: ModelConfig, stats: Dict[str, Any],
                      n_speakers: int, n_mel_channels: int = 80,
                      dtype: Any = jnp.float32) -> FastSpeech2:
    """Construct a FastSpeech2 with bucketize bins from a stats.json dict
    (pitch/energy -> [min, max, mean, std]), mirroring modules.py:55-90."""
    pitch_min, pitch_max = stats["pitch"][:2]
    energy_min, energy_max = stats["energy"][:2]
    return FastSpeech2(
        model_config=model_config,
        n_speakers=n_speakers,
        pitch_min=float(pitch_min), pitch_max=float(pitch_max),
        energy_min=float(energy_min), energy_max=float(energy_max),
        n_mel_channels=n_mel_channels, dtype=dtype,
    )
