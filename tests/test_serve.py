"""Dynamic-batching synthesis server tests."""

import numpy as np
import pytest

from tests.test_pipeline import small_cfg  # noqa: F401  (fixture)


@pytest.fixture(scope="module")
def king(small_cfg):  # noqa: F811
    import jax.numpy as jnp

    from tts_king_tpu.pipeline import TTSKing

    k = TTSKing(small_cfg)
    # bias the duration head so untrained weights produce nonzero durations
    dp = k.tts.variables["params"]["variance_adaptor"]["duration_predictor"][
        "linear_layer"]
    dp["bias"] = jnp.full_like(dp["bias"], 1.5)
    return k


def test_server_batches_requests(king):
    from tts_king_tpu.serve import SynthesisServer

    server = SynthesisServer(king, max_batch=4, max_wait_ms=50)
    try:
        rng = np.random.RandomState(0)
        futures = []
        for i in range(6):
            phonemes = rng.randint(64, 200, size=(5 + i,))
            futures.append(server.submit(phonemes=phonemes, speaker=i % 3))
        wavs = [f.result(timeout=120) for f in futures]
        for wav in wavs:
            assert wav.dtype == np.int16
            assert wav.ndim == 1
        # longer phoneme sequences should not produce shorter audio than much
        # shorter ones (duration head is constant-biased)
        assert len(wavs[-1]) > 0
    finally:
        server.close()


def test_server_mel_mode_and_errors(king):
    from tts_king_tpu.serve import SynthesisServer

    server = SynthesisServer(king, max_batch=2, max_wait_ms=5,
                             return_wav=False)
    try:
        f = server.submit(phonemes=np.array([70, 80, 90]))
        mel, n = f.result(timeout=120)
        assert mel.shape[1] == 80 and mel.shape[0] == n

        bad = server.submit(phonemes=np.array([1.5, 2.5]))  # float ids: cast ok
        mel2, n2 = bad.result(timeout=120)
        assert mel2.shape[1] == 80
    finally:
        server.close()


def test_per_item_speakers(king):
    out = king.tts.generate(
        np.array([[70, 80, 90, 0], [70, 80, 0, 0]]),
        speaker_name=[0, 2], src_lens=[3, 2])
    assert np.asarray(out["postnet_mel"]).shape[0] == 2
