"""Data-parallel inference over the device mesh: sharded batches produce
the same outputs as the single-device path, including ragged batch padding."""

import numpy as np

from tests.test_pipeline import small_cfg  # noqa: F401 (fixture)


def test_dp_inference_matches_single_device(small_cfg):  # noqa: F811
    from tts_king_tpu.parallel.mesh import build_mesh
    from tts_king_tpu.pipeline import AcousticModel

    am = AcousticModel(small_cfg, n_speakers=4)
    mesh = build_mesh(dp=4, tp=1)
    am_dp = AcousticModel(small_cfg, n_speakers=4,
                          variables=am.variables, mesh=mesh)

    rng = np.random.RandomState(0)
    phonemes = rng.randint(64, 200, size=(8, 7))
    speakers = list(rng.randint(0, 4, size=(8,)))

    ref = am.generate(phonemes, speaker_name=speakers)
    got = am_dp.generate(phonemes, speaker_name=speakers)
    np.testing.assert_array_equal(np.asarray(ref["mel_lens"]),
                                  np.asarray(got["mel_lens"]))
    np.testing.assert_allclose(np.asarray(ref["postnet_mel"]),
                               np.asarray(got["postnet_mel"]),
                               rtol=1e-4, atol=1e-5)

    # ragged batch (6 items over dp=4): padded internally, trimmed on return
    ref6 = am.generate(phonemes[:6], speaker_name=speakers[:6])
    got6 = am_dp.generate(phonemes[:6], speaker_name=speakers[:6])
    assert np.asarray(got6["postnet_mel"]).shape[0] == 6
    np.testing.assert_allclose(np.asarray(ref6["postnet_mel"]),
                               np.asarray(got6["postnet_mel"]),
                               rtol=1e-4, atol=1e-5)
