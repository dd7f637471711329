"""tts_king_tpu — a TPU-native (JAX/XLA/Pallas/pjit) neural TTS framework.

Same capability surface as the reference diff7/tts-king stack (FastSpeech2
acoustic model + HiFi-GAN vocoder + Russian text frontend + feature/training
pipelines), re-designed TPU-first: static shapes, gather-based length
regulation, pjit over device meshes, and batched XLA signal processing.
"""

__version__ = "0.1.0"

from tts_king_tpu.config import TTSConfig, load_config  # noqa: F401


def __getattr__(name):
    # Lazy heavy imports so `import tts_king_tpu` stays cheap.
    if name == "TTSKing":
        from tts_king_tpu.pipeline import TTSKing

        return TTSKing
    if name == "FastSpeech2":
        from tts_king_tpu.models.fs2 import FastSpeech2

        return FastSpeech2
    if name == "Generator":
        from tts_king_tpu.models.hifigan import Generator

        return Generator
    raise AttributeError(name)
