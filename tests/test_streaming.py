"""Streaming vocoder: chunked synthesis must match the full pass in the
interior of every chunk (the halo absorbs the convolutional context)."""

import numpy as np


def test_stream_matches_full_pass():
    import jax
    import jax.numpy as jnp

    from tests.test_vocoder_training import _tiny_cfg
    from tts_king_tpu.models.hifigan import Generator
    from tts_king_tpu.ops.streaming import (generator_receptive_field,
                                            stream_vocoder)

    cfg = _tiny_cfg()  # hop 16, upsample 4x4
    voc = Generator(cfg)
    variables = voc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, cfg.num_mels)))
    apply = jax.jit(voc.apply)

    rng = np.random.RandomState(0)
    T = 150
    mel = rng.randn(1, T, cfg.num_mels).astype(np.float32)

    full = np.asarray(apply(variables, mel))[0]

    rf = generator_receptive_field(cfg)
    assert rf < 40
    chunks = list(stream_vocoder(apply, variables, mel, chunk_frames=48,
                                 halo_frames=rf, hop=cfg.hop_size))
    streamed = np.concatenate(chunks)
    assert streamed.shape == full.shape

    # Interior samples (away from the true sequence edges) must match the
    # full pass; the only tolerated differences are at the utterance edges
    # where edge-padding differs from the full pass's zero context.
    edge = rf * cfg.hop_size
    np.testing.assert_allclose(streamed[edge:-edge], full[edge:-edge],
                               rtol=1e-4, atol=1e-5)

    # streaming latency: the first chunk must be available from a window of
    # (chunk + 2*halo) frames, not the full utterance
    assert len(chunks[0]) == 48 * cfg.hop_size


from tests.test_pipeline import small_cfg  # noqa: F401  (fixture)


def test_ttsking_speak_streaming(small_cfg, tmp_path):  # noqa: F811
    import jax.numpy as jnp

    from tts_king_tpu.pipeline import TTSKing

    cfg = small_cfg
    lex = tmp_path / "mini.dict"
    lex.write_text("привет P R I0 V E0 T\n", encoding="utf-8")
    cfg.preprocess.lexicon_path = str(lex)
    king = TTSKing(cfg)
    dp = king.tts.variables["params"]["variance_adaptor"][
        "duration_predictor"]["linear_layer"]
    dp["bias"] = jnp.full_like(dp["bias"], 1.8)

    chunks = list(king.speak_streaming("привет", chunk_frames=16))
    assert chunks, "no streamed chunks"
    assert all(c.dtype == np.int16 for c in chunks)
    total = sum(len(c) for c in chunks)
    wavs = king.speak("привет")
    assert abs(total - len(wavs[0])) <= 0
