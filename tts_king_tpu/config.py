"""Typed configuration tree.

One validated dataclass hierarchy covering every knob of the reference's
single config.yaml (see /root/reference/config.yaml; SURVEY.md §2.21), loadable
from YAML in the reference layout. Fixes the reference's config-drift bugs
(missing ``tts.load_path``/``secondary`` keys) by being explicit and typed.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import yaml


@dataclass
class LoggerConfig:
    offline: bool = False
    wandb_key: Optional[str] = None


@dataclass
class AcousticCheckpointConfig:
    """FastSpeech2 weights source (torch .pth.tar or orbax dir) + resume step."""
    weights_path: Optional[str] = None
    restore_step: int = 0


@dataclass
class VocoderModelConfig:
    """HiFi-GAN generator hyperparameters + training knobs."""
    weights_path: Optional[str] = None
    max_wav_value: float = 32768.0
    resblock: str = "1"
    batch_size: int = 8
    learning_rate: float = 2e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    lr_decay: float = 0.999
    seed: int = 1234
    upsample_rates: List[int] = field(default_factory=lambda: [8, 8, 2, 2])
    upsample_kernel_sizes: List[int] = field(default_factory=lambda: [16, 16, 4, 4])
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: List[int] = field(default_factory=lambda: [3, 7, 11])
    resblock_dilation_sizes: List[List[int]] = field(
        default_factory=lambda: [[1, 3, 5], [1, 3, 5], [1, 3, 5]])
    segment_size: int = 8192
    num_mels: int = 80
    n_fft: int = 1024
    hop_size: int = 256
    win_size: int = 1024
    sampling_rate: int = 22050
    mel_fmin: float = 0.0
    mel_fmax: float = 8000.0
    # fmax for the training mel-L1 target (None = mel_fmax); the original
    # HiFi-GAN recipe uses full-band (None -> sr/2) for the loss mel.
    mel_fmax_loss: Optional[float] = None


@dataclass
class OptimizerConfig:
    batch_size: int = 16
    betas: Tuple[float, float] = (0.95, 0.999)
    eps: float = 1e-5
    weight_decay: float = 0.0
    grad_clip_thresh: float = 1.0
    grad_acc_step: int = 4
    warm_up_step: int = 4000
    anneal_steps: List[int] = field(default_factory=lambda: [300000, 400000, 500000])
    anneal_rate: float = 0.7


@dataclass
class StepConfig:
    total_step: int = 900000
    log_step: int = 100
    synth_step: int = 1000
    val_step: int = 1000
    save_step: int = 5000


@dataclass
class TrainConfig:
    ckpt_path: str = "./output/ckpt"
    result_path: str = "./output/result"
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    step: StepConfig = field(default_factory=StepConfig)
    # Fraction of non-silence tokens replaced by @mask per sentence, applied
    # per-epoch. (The reference gated this on `> 1`, making it dead at the
    # default 0.15 — fs_two/dataset.py:149; here it actually runs.)
    max_masks_per_sentence: float = 0.15
    seed: int = 1234
    # Free-running objective metrics (MCD/duration-MAE, train/metrics.py)
    # over this many val utterances at every val_step; 0 disables.
    objective_val_utts: int = 8


@dataclass
class AudioConfig:
    sampling_rate: int = 22050
    max_wav_value: float = 32768.0


@dataclass
class STFTConfig:
    filter_length: int = 1024
    hop_length: int = 256
    win_length: int = 1024


@dataclass
class MelConfig:
    n_mel_channels: int = 80
    mel_fmin: float = 0.0
    mel_fmax: Optional[float] = 8000.0


@dataclass
class VarianceFeatureConfig:
    feature: str = "phoneme_level"  # or "frame_level"
    normalization: bool = True


@dataclass
class PreprocessConfig:
    dataset: str = "MAIN"
    lexicon_path: str = "./rus_all.dict"
    raw_path: str = "./speakers"
    preprocessed_path: str = "./processed"
    val_size: int = 512
    text_cleaners: List[str] = field(default_factory=list)
    language: str = "ru"
    audio: AudioConfig = field(default_factory=AudioConfig)
    stft: STFTConfig = field(default_factory=STFTConfig)
    mel: MelConfig = field(default_factory=MelConfig)
    pitch: VarianceFeatureConfig = field(default_factory=VarianceFeatureConfig)
    energy: VarianceFeatureConfig = field(default_factory=VarianceFeatureConfig)
    # Optional speaker allow-list (replaces the reference's broken
    # `config.secondary` path, preprocessor.py:85-87).
    speakers_filter: Optional[List[str]] = None


@dataclass
class TransformerConfig:
    encoder_layer: int = 4
    encoder_head: int = 2
    encoder_hidden: int = 256
    variance_hidden: int = 256
    decoder_layer: int = 6
    decoder_head: int = 2
    decoder_hidden: int = 256
    conv_filter_size: int = 1024
    conv_kernel_size: Tuple[int, int] = (9, 1)
    encoder_dropout: float = 0.2
    decoder_dropout: float = 0.2


@dataclass
class VariancePredictorConfig:
    filter_size: int = 256
    kernel_size: int = 3
    dropout: float = 0.5


@dataclass
class VarianceEmbeddingConfig:
    pitch_quantization: str = "linear"  # or "log"
    energy_quantization: str = "linear"
    n_bins: int = 256


@dataclass
class ModelConfig:
    transformer: TransformerConfig = field(default_factory=TransformerConfig)
    variance_predictor: VariancePredictorConfig = field(
        default_factory=VariancePredictorConfig)
    variance_embedding: VarianceEmbeddingConfig = field(
        default_factory=VarianceEmbeddingConfig)
    use_cwt: bool = False
    multi_speaker: bool = True
    max_seq_len: int = 1000
    # PostNet width (the reference hard-codes 512, Layers.py:78)
    postnet_dim: int = 512
    vocoder_model: str = "HiFi-GAN"
    vocoder_use_cpu: bool = False
    # Fused Pallas attention kernel for inference (ops/pallas/attention.py).
    use_pallas_attention: bool = False
    # Flash attention (stock Pallas TPU kernel, custom VJP): cuts the
    # decoder's (B,H,T,T) probability traffic out of the HBM-bound train
    # step (DESIGN.md 3.1). TPU-only; exact up to softmax reassociation.
    use_flash_attention: bool = False
    # Store attention probabilities in bf16: halves the train step's
    # largest autodiff residual stream with no change to f32 softmax or
    # accumulation (TPU matmuls consume bf16 inputs at default precision).
    # MEASURED SLOWER at shipped sizes (81 ms vs 68 ms sustained at
    # bs16x4 — the cast breaks XLA fusions for more than the bytes it
    # saves; DESIGN.md 3.3); numerics-verified opt-in for other shapes.
    attention_probs_bf16: bool = False


@dataclass
class MeshConfig:
    """Device-mesh layout for pjit: data-parallel x tensor-parallel."""
    dp: int = -1  # -1: all remaining devices
    tp: int = 1


@dataclass
class TTSConfig:
    """Root config."""
    exp_name: str = "multi"
    run_debug_eval: bool = False
    logger: LoggerConfig = field(default_factory=LoggerConfig)
    acoustic: AcousticCheckpointConfig = field(default_factory=AcousticCheckpointConfig)
    vocoder: VocoderModelConfig = field(default_factory=VocoderModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    preprocess: PreprocessConfig = field(default_factory=PreprocessConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def validate(self):
        t = self.model.transformer
        if t.encoder_hidden % t.encoder_head:
            raise ValueError("encoder_hidden must divide by encoder_head")
        if t.decoder_hidden % t.decoder_head:
            raise ValueError("decoder_hidden must divide by decoder_head")
        for fc in (self.preprocess.pitch, self.preprocess.energy):
            if fc.feature not in ("phoneme_level", "frame_level"):
                raise ValueError(f"bad variance feature level: {fc.feature}")
        for q in (self.model.variance_embedding.pitch_quantization,
                  self.model.variance_embedding.energy_quantization):
            if q not in ("linear", "log"):
                raise ValueError(f"bad quantization: {q}")
        if self.train.optimizer.grad_acc_step < 1:
            raise ValueError("grad_acc_step must be >= 1")
        return self


def _build(cls, data):
    """Recursively build a dataclass from a plain dict, with key checks."""
    if data is None:
        return cls()
    if dataclasses.is_dataclass(data):
        return data
    import typing

    hints = typing.get_type_hints(cls)
    kwargs = {}
    field_names = {f.name for f in dataclasses.fields(cls)}
    for key, value in data.items():
        if key not in field_names:
            raise KeyError(f"unknown config key {key!r} for {cls.__name__}")
        sub = hints.get(key)
        if isinstance(sub, type) and dataclasses.is_dataclass(sub):
            kwargs[key] = _build(sub, value)
        elif sub is Tuple[float, float] or sub is Tuple[int, int]:
            kwargs[key] = tuple(value)
        else:
            kwargs[key] = value
    return cls(**kwargs)


def load_config(path):
    """Load a YAML config.

    Accepts either this framework's native layout (top-level keys matching
    TTSConfig fields) or the reference's config.yaml layout (tts/hifi/
    train_config/preprocess_config/model_config), which is translated.
    """
    with open(path) as f:
        raw = yaml.safe_load(f)
    if "model_config" in raw or "preprocess_config" in raw:
        raw = _from_reference_layout(raw)
    cfg = _build(TTSConfig, raw)
    return cfg.validate()


def _from_reference_layout(raw):
    """Translate the reference config.yaml schema into the native layout."""
    out = {}
    out["exp_name"] = raw.get("exp_name", "multi")
    out["run_debug_eval"] = raw.get("run_debug_eval", False)
    if "logger" in raw:
        lg = raw["logger"] or {}
        out["logger"] = {"offline": bool(lg.get("offline", False)),
                         "wandb_key": lg.get("wandb_key") or None}
    if "tts" in raw:
        out["acoustic"] = {"weights_path": raw["tts"].get("weights_path"),
                           "restore_step": raw["tts"].get("restore_step", 0)}
    if "hifi" in raw:
        h = dict(raw["hifi"])
        voc = {
            "weights_path": h.get("weights_path"),
            "max_wav_value": h.get("MAX_WAV_VALUE", 32768.0),
            "resblock": str(h.get("resblock", "1")),
            "batch_size": h.get("batch_size", 8),
            "learning_rate": h.get("learning_rate", 2e-4),
            "adam_b1": h.get("adam_b1", 0.8),
            "adam_b2": h.get("adam_b2", 0.99),
            "lr_decay": h.get("lr_decay", 0.999),
            "seed": h.get("seed", 1234),
            "upsample_rates": h.get("upsample_rates", [8, 8, 2, 2]),
            "upsample_kernel_sizes": h.get("upsample_kernel_sizes", [16, 16, 4, 4]),
            "upsample_initial_channel": h.get("upsample_initial_channel", 512),
            "resblock_kernel_sizes": h.get("resblock_kernel_sizes", [3, 7, 11]),
            "resblock_dilation_sizes": h.get(
                "resblock_dilation_sizes", [[1, 3, 5]] * 3),
            "segment_size": h.get("segment_size", 8192),
            "num_mels": h.get("num_mels", 80),
            "n_fft": h.get("n_fft", 1024),
            "hop_size": h.get("hop_size", 256),
            "win_size": h.get("win_size", 1024),
            "sampling_rate": h.get("sampling_rate", 22050),
        }
        out["vocoder"] = voc
    if "train_config" in raw:
        tc = raw["train_config"]
        opt = tc.get("optimizer", {})
        out["train"] = {
            "ckpt_path": tc.get("path", {}).get("ckpt_path", "./output/ckpt"),
            "result_path": tc.get("path", {}).get("result_path", "./output/result"),
            "optimizer": {
                "batch_size": opt.get("batch_size", 16),
                "betas": tuple(opt.get("betas", (0.95, 0.999))),
                "eps": opt.get("eps", 1e-5),
                "weight_decay": opt.get("weight_decay", 0.0),
                "grad_clip_thresh": opt.get("grad_clip_thresh", 1.0),
                "grad_acc_step": opt.get("grad_acc_step", 4),
                "warm_up_step": opt.get("warm_up_step", 4000),
                "anneal_steps": list(opt.get("anneal_steps", [300000, 400000, 500000])),
                "anneal_rate": opt.get("anneal_rate", 0.7),
            },
            "step": tc.get("step", {}),
            "max_masks_per_sentence": tc.get("max_masks_per_sentence", 0.15),
        }
    if "preprocess_config" in raw:
        pc = raw["preprocess_config"]
        pp = pc.get("preprocessing", {})
        out["preprocess"] = {
            "dataset": pc.get("dataset", "MAIN"),
            "lexicon_path": pc.get("path", {}).get("lexicon_path", "./rus_all.dict"),
            "raw_path": pc.get("path", {}).get("raw_path", "./speakers"),
            "preprocessed_path": pc.get("path", {}).get(
                "preprocessed_path", "./processed"),
            "val_size": pp.get("val_size", 512),
            "text_cleaners": pp.get("text", {}).get("text_cleaners", []),
            "language": pp.get("text", {}).get("language", "ru"),
            "audio": pp.get("audio", {}),
            "stft": pp.get("stft", {}),
            "mel": pp.get("mel", {}),
            "pitch": pp.get("pitch", {}),
            "energy": pp.get("energy", {}),
        }
    if "model_config" in raw:
        mc = raw["model_config"]
        tr = dict(mc.get("transformer", {}))
        if "conv_kernel_size" in tr:
            tr["conv_kernel_size"] = tuple(tr["conv_kernel_size"])
        out["model"] = {
            "transformer": tr,
            "variance_predictor": mc.get("variance_predictor", {}),
            "variance_embedding": mc.get("variance_embedding", {}),
            "use_cwt": mc.get("use_cwt", False),
            "multi_speaker": mc.get("multi_speaker", True),
            "max_seq_len": mc.get("max_seq_len", 1000),
            "vocoder_model": mc.get("vocoder", {}).get("model", "HiFi-GAN"),
            "vocoder_use_cpu": mc.get("vocoder", {}).get("use_cpu", False),
        }
    return out


def micro_config() -> TTSConfig:
    """Toy-sized TTSConfig — the full architecture at tiny widths.

    For demos, tests, and TPU-less smoke runs (examples/*.py --micro):
    every pipeline feature behaves identically, the compiles just take
    seconds on CPU instead of minutes through a TPU relay."""
    return TTSConfig(
        model=ModelConfig(
            transformer=TransformerConfig(
                encoder_layer=1, encoder_head=2, encoder_hidden=16,
                variance_hidden=16, decoder_layer=1, decoder_head=2,
                decoder_hidden=16, conv_filter_size=32),
            variance_predictor=VariancePredictorConfig(filter_size=16),
            max_seq_len=256),
        vocoder=VocoderModelConfig(
            upsample_rates=[8, 8, 2, 2], upsample_kernel_sizes=[16, 16, 4, 4],
            upsample_initial_channel=16, resblock_kernel_sizes=[3],
            resblock_dilation_sizes=[[1, 3, 5]]),
    )
