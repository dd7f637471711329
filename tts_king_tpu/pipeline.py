"""End-to-end synthesis pipeline: text -> phonemes -> mel -> waveform.

API parity with the reference stack (tts_king.py TTSKing, fsapi.py FSTWOapi,
hifiapi.py HIFIapi) with a TPU-first execution model:
  * every device computation is jit-compiled per (phoneme-bucket, mel-bucket)
    shape, cached across calls — no retraces in steady state;
  * phoneme lengths are padded up to power-of-two-ish buckets; the mel length
    is estimated from the duration predictor's typical expansion and retried
    with the next bucket if the prediction overflows (host-side, rare);
  * weights load from either reference torch checkpoints (converted) or
    native orbax checkpoints.
"""

import json
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tts_king_tpu.config import TTSConfig
from tts_king_tpu.models.fs2 import build_fastspeech2
from tts_king_tpu.models.hifigan import Generator

MEL_BUCKETS = (128, 256, 512, 1000)
# Typical frames-per-phoneme headroom used to pick the first mel bucket.
_FRAMES_PER_PHONE_GUESS = 8.0


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def _phone_bucket(n):
    b = 16
    while b < n:
        b *= 2
    return min(b, 1024)


def _phone_pad(n, buckets=None):
    """Phoneme padding length: the tuned grid when it covers n, else the
    power-of-2 default. A tuned grid only reflects lengths seen in past
    load — a longer request must still pad UP (clamping to the grid top
    would make the (B, Lb) buffer too small to hold the batch)."""
    if buckets and n <= buckets[-1]:
        return _bucket(n, buckets)
    return _phone_bucket(n)


def load_speakers(path):
    """speakers.json: {name: id} (fsapi.py:85-96)."""
    with open(path) as f:
        speakers = json.load(f)
    return speakers, list(speakers.keys())


def load_stats(path):
    with open(path) as f:
        return json.load(f)


class AcousticModel:
    """FastSpeech2 inference driver (FSTWOapi equivalent, fsapi.py:9-82)."""

    def __init__(self, config: TTSConfig, variables=None, n_speakers=None,
                 stats=None, dtype=jnp.float32, mesh=None):
        # mesh: optional jax.sharding.Mesh for data-parallel inference —
        # params replicate, batches shard over 'dp'; the batch size must
        # divide by the dp axis (the server pads its batches).
        self.mesh = mesh
        self.config = config
        weights_path = config.acoustic.weights_path
        model_dir = os.path.dirname(weights_path) if weights_path else None

        speakers_json = (os.path.join(model_dir, "speakers.json")
                         if model_dir else None)
        if speakers_json and os.path.exists(speakers_json):
            self.speakers_dict, self.speaker_names = load_speakers(speakers_json)
        else:
            n = n_speakers or 1
            self.speakers_dict = {str(i): i for i in range(n)}
            self.speaker_names = list(self.speakers_dict)

        if stats is None:
            stats_json = (os.path.join(model_dir, "stats.json")
                          if model_dir else None)
            if stats_json and os.path.exists(stats_json):
                stats = load_stats(stats_json)
            else:
                stats = {"pitch": [-3.0, 9.5], "energy": [-1.5, 6.1]}

        self.model = build_fastspeech2(
            config.model, stats, n_speakers or len(self.speaker_names))

        if variables is not None:
            self.variables = variables
        elif weights_path and os.path.exists(weights_path):
            if os.path.isdir(weights_path):
                from tts_king_tpu.checkpoint import restore_train_state

                payload = restore_train_state(weights_path)
                self.variables = {"params": payload["params"],
                                  "batch_stats": payload["batch_stats"]}
            else:
                from tts_king_tpu.checkpoint import convert_fs2_checkpoint

                tc = config.model.transformer
                self.variables = convert_fs2_checkpoint(
                    weights_path, tc.encoder_layer, tc.decoder_layer,
                    config.model.use_cwt)
        else:
            self.variables = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 8), jnp.int32), jnp.ones((1,), jnp.int32),
                train=False)
        if dtype != jnp.float32:
            self.variables = jax.tree.map(
                lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating)
                else x, self.variables)

        self._apply = {}
        self.phone_buckets = None   # optional tuned L-padding grid

    def _compiled(self, max_mel_len):
        # one jit; jax caches per static max_mel_len bucket internally
        if not self._apply:
            self._apply["fn"] = jax.jit(
                partial(self.model.apply, train=False),
                static_argnames=("max_mel_len",))
        return self._apply["fn"]

    def generate(self, phonemes, duration_control=1.0, pitch_control=1.0,
                 energy_control=1.0, speaker_name=None, max_mel_len=None,
                 src_lens=None, defer_overflow=False):
        """phonemes: (B, L) int array -> dict with postnet mel + mel lens.

        Pads L up to a bucket; picks/escalates the mel bucket until the
        predicted durations fit (or the model's max_seq_len is reached).
        src_lens: per-item phoneme counts for ragged batches (default: all L).

        defer_overflow=True skips the device sync that checks whether the
        predicted lengths fit the first mel bucket and returns immediately
        with `out["mel_bucket"]` set — the caller checks `mel_lens` against
        it whenever it fetches results anyway and retries the (rare)
        overflow itself. This keeps the serving dispatch path free of
        host<->device round trips (serve.py pipelining).
        """
        phonemes = np.asarray(phonemes)
        B, L = phonemes.shape
        # phone_buckets: opt-in load-tuned padding grid (serve.py
        # suggest_buckets); default power-of-2 buckets otherwise, and for
        # requests longer than the tuned grid covers.
        Lb = _phone_pad(L, self.phone_buckets)
        texts = np.zeros((B, Lb), np.int32)
        texts[:, :L] = phonemes
        src_lens = (np.asarray(src_lens, np.int32) if src_lens is not None
                    else np.full((B,), L, np.int32))

        speaker_ids = self._resolve_speakers(speaker_name, B)

        max_cap = self.config.model.max_seq_len
        if max_mel_len is not None:
            # exact bucket pin (serve.prewarm relies on this dispatching
            # the same executable the bucket-chosen path would); like the
            # auto buckets below, NOT clamped to max_seq_len — positional
            # sinusoids regenerate past it (models/layers.py)
            buckets = [max_mel_len]
        else:
            guess = int(L * _FRAMES_PER_PHONE_GUESS * duration_control)
            start = _bucket(guess, MEL_BUCKETS)
            buckets = [b for b in MEL_BUCKETS if b >= start] or [max_cap]

        variables = self.variables
        if self.mesh is not None:
            from tts_king_tpu.parallel.mesh import shard_for_inference

            dp = self.mesh.shape.get("dp", 1)
            if B % dp:
                pad = dp - B % dp
                texts = np.concatenate([texts, np.zeros((pad, Lb), np.int32)])
                src_lens = np.concatenate([src_lens, np.ones((pad,), np.int32)])
                speaker_ids = np.concatenate(
                    [speaker_ids, np.zeros((pad,), np.int32)])
            variables, (speaker_ids, texts, src_lens) = shard_for_inference(
                self.mesh, variables, (speaker_ids, texts, src_lens))

        out = None
        for T in buckets:
            fn = self._compiled(T)
            out = fn(variables, speaker_ids, texts, src_lens,
                     max_mel_len=T,
                     p_control=pitch_control, e_control=energy_control,
                     d_control=duration_control)
            if defer_overflow:
                out = dict(out)
                out["mel_bucket"] = T
                break
            # Escalate on the RAW (unclamped) predicted length — mel_lens
            # itself is clamped to T in-model, so comparing it could never
            # detect an under-guessed bucket (silent truncation bug).
            if int(jnp.max(out["mel_lens_raw"][:B])) <= T:
                break
        if out["postnet_mel"].shape[0] != B:
            out = jax.tree.map(lambda a: a[:B] if hasattr(a, "shape")
                               and a.ndim >= 1 else a, out)
        return out

    def _resolve_speakers(self, speaker_name, batch_size):
        """Scalar name/id or per-item sequence -> (B,) int32 ids."""
        if speaker_name is None:
            return np.zeros((batch_size,), np.int32)
        if isinstance(speaker_name, str):
            if speaker_name not in self.speakers_dict:
                raise KeyError(f"Speaker {speaker_name!r} not in speakers.json")
            return np.full((batch_size,), self.speakers_dict[speaker_name],
                           np.int32)
        arr = np.asarray(speaker_name)
        if arr.ndim == 0:
            return np.full((batch_size,), int(arr), np.int32)
        ids = [self.speakers_dict[s] if isinstance(s, str) else int(s)
               for s in speaker_name]
        if len(ids) != batch_size:
            raise ValueError("per-item speakers must match batch size")
        return np.asarray(ids, np.int32)

    def generate_mel(self, *args, **kwargs):
        """Returns the postnet mel only, like FSTWOapi.generate (fsapi.py:82)."""
        out = self.generate(*args, **kwargs)
        return out["postnet_mel"], out["mel_lens"]


class Vocoder:
    """Vocoder inference driver (HIFIapi equivalent, hifiapi.py:11-52).

    Supports both of the reference's vocoder choices
    (model_config.vocoder.model, fs_two/utils/model.py:46-99): HiFi-GAN
    (primary) and MelGAN (descript architecture; consumes log10 mels, so
    natural-log mels are divided by ln(10) — vocoder_infer:87-89)."""

    def __init__(self, config: TTSConfig, variables=None, dtype=jnp.float32):
        self.config = config
        self.kind = config.model.vocoder_model
        weights_path = config.vocoder.weights_path
        if self.kind == "MelGAN":
            from tts_king_tpu.models.melgan import (MelGANGenerator,
                                                    convert_melgan_state)

            self.model = MelGANGenerator(
                ratios=tuple(config.vocoder.upsample_rates), dtype=dtype)
            if variables is not None:
                self.variables = variables
            elif weights_path and os.path.exists(weights_path):
                from tts_king_tpu.checkpoint import load_torch_checkpoint

                state = load_torch_checkpoint(weights_path)
                if not any(k.startswith("model.") for k in state):
                    state = {k.split("mel2wav.", 1)[-1]: v
                             for k, v in state.items()}
                self.variables = convert_melgan_state(
                    state, ratios=tuple(config.vocoder.upsample_rates))
            else:
                self.variables = self.model.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 16, 80)))
        else:
            self.model = Generator(config.vocoder, dtype=dtype)
            if variables is not None:
                self.variables = variables
            elif weights_path and os.path.exists(weights_path):
                from tts_king_tpu.checkpoint import convert_hifigan_checkpoint

                self.variables = convert_hifigan_checkpoint(
                    weights_path,
                    n_ups=len(config.vocoder.upsample_rates),
                    n_kernels=len(config.vocoder.resblock_kernel_sizes))
            else:
                self.variables = self.model.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 16, 80)))
        self._apply = jax.jit(self.model.apply)
        # int16 scale+cast ON DEVICE: halves device->host transfer bytes
        # (int16 vs float32) and offloads the per-sample host work. The
        # int32 hop matters: XLA's direct f32->s16 convert SATURATES at
        # full scale, while numpy (and the reference's `.astype(np.int16)`,
        # hifiapi.py:49-51) WRAPS — f32->s32->s16 reproduces the wrap
        # bit-exactly (verified vs numpy on the golden fixtures).
        scale = self.config.vocoder.max_wav_value
        self._cast_i16 = jax.jit(
            lambda w: (w * scale).astype(jnp.int32).astype(jnp.int16))
        self._apply_i16 = jax.jit(
            lambda v, m: (self.model.apply(v, m) * scale)
            .astype(jnp.int32).astype(jnp.int16))

    def __call__(self, mel):
        """mel: (B, T, 80) natural-log mel -> float waveform in [-1, 1]."""
        return self._apply(self.variables, self._prep_mel(mel))

    def _prep_mel(self, mel):
        mel = jnp.asarray(mel)
        if self.kind == "MelGAN":
            mel = mel / np.log(10.0)
        return mel

    def vocode_int16(self, mel):
        """mel -> DEVICE int16 waveform scaled by max_wav_value — the
        scale+cast fused into the vocoder program (no float leaves the
        device). Async-safe: accepts device-resident (still computing)
        mels and returns without forcing a host sync."""
        return self._apply_i16(self.variables, self._prep_mel(mel))

    def generate(self, mel, lengths=None):
        """mel -> int16 numpy waveform scaled by max_wav_value
        (hifiapi.py:40-52); optional per-item sample lengths for trimming."""
        wav = np.asarray(self.vocode_int16(mel))
        if lengths is not None:
            return [w[:n] for w, n in zip(wav, np.asarray(lengths))]
        return wav

    def generate_long(self, mel, mesh, axis="dp"):
        """ONE long utterance, its time axis sharded across mesh[axis] with
        ICI halo exchange (ops/time_parallel.py) — audiobook-length audio
        without gathering the whole mel on a single chip. mel: (1, T, M)
        natural-log mel. Returns a (samples,) int16 waveform."""
        from tts_king_tpu.ops.streaming import generator_receptive_field
        from tts_king_tpu.ops.time_parallel import vocoder_time_sharded

        mel = jnp.asarray(mel)
        if self.kind == "MelGAN":
            mel = mel / np.log(10.0)
        up = int(np.prod(self.config.vocoder.upsample_rates))
        halo = generator_receptive_field(self.config.vocoder)
        wav = vocoder_time_sharded(self._apply, self.variables, mel, mesh,
                                   halo_frames=halo, upsample=up, axis=axis)
        return np.asarray(self._cast_i16(wav)[0])


class TTSKing:
    """Text -> speech orchestrator (tts_king.py:18-66 equivalent)."""

    def __init__(self, config="./config.yaml", lexicon_path=None,
                 dtype=jnp.float32, mesh=None):
        # mesh: optional jax.sharding.Mesh — FS2 batches shard over 'dp'
        # (padded to a dp multiple by AcousticModel.generate); the vocoder
        # consumes the already-sharded mels, so it data-parallelizes too.
        if isinstance(config, str):
            from tts_king_tpu.config import load_config

            config = load_config(config)
        self.cfg = config
        self.tts = AcousticModel(config, dtype=dtype, mesh=mesh)
        self.vocoder = Vocoder(config, dtype=dtype)
        self.speakers = self.tts.speaker_names
        self._lexicon = None
        self._lexicon_path = lexicon_path or config.preprocess.lexicon_path

    @property
    def lexicon(self):
        if self._lexicon is None and os.path.exists(self._lexicon_path):
            from tts_king_tpu.text.g2p import read_lexicon

            self._lexicon = read_lexicon(self._lexicon_path)
        return self._lexicon

    def text_preprocess(self, text):
        from tts_king_tpu.text.g2p import preprocess_rus

        return np.array([preprocess_rus(text, lexicon=self.lexicon)])

    def generate_mel(self, text, duration_control=1.0, pitch_control=1.0,
                     energy_control=1.0, speaker=0):
        phonemes = self.text_preprocess(text)
        mel, mel_lens = self.tts.generate_mel(
            phonemes, duration_control, pitch_control, energy_control,
            speaker_name=speaker)
        return mel, mel_lens

    def mel_to_wav(self, mel_spec, mel_lens=None):
        hop = self.cfg.preprocess.stft.hop_length
        lengths = (np.asarray(mel_lens) * hop) if mel_lens is not None else None
        return self.vocoder.generate(mel_spec, lengths)

    def speak(self, text, duration_control=1.0, pitch_control=1.0,
              energy_control=1.0, speaker=0):
        mel, mel_lens = self.generate_mel(
            text, duration_control, pitch_control, energy_control, speaker)
        return self.mel_to_wav(mel, mel_lens)

    def speak_streaming(self, text, duration_control=1.0, pitch_control=1.0,
                        energy_control=1.0, speaker=0, chunk_frames=64):
        """Yield int16 waveform chunks as they are vocoded (low-latency
        playback): audio starts after one small vocoder window instead of
        the full utterance (ops/streaming.py)."""
        from tts_king_tpu.ops.streaming import (generator_receptive_field,
                                                stream_vocoder)

        mel, mel_lens = self.generate_mel(
            text, duration_control, pitch_control, energy_control, speaker)
        n = int(np.asarray(mel_lens)[0])
        mel = np.asarray(mel)[:1, :max(n, 1)]
        halo = generator_receptive_field(self.cfg.vocoder)
        # int16-returning window program: scale+cast stays on device
        for chunk in stream_vocoder(self.vocoder._apply_i16,
                                    self.vocoder.variables, mel,
                                    chunk_frames=chunk_frames,
                                    halo_frames=halo,
                                    hop=self.cfg.preprocess.stft.hop_length):
            yield np.asarray(chunk)
