"""Golden regression fixture: a frozen (params, inputs, outputs) snapshot of
the tiny FastSpeech2 committed in tests/fixtures/golden_fs2.npz. Any change
to model numerics — refactors, kernel swaps, layout changes — must keep
these outputs bit-stable (f32 CPU, atol 1e-5) or consciously regenerate the
fixture (see the generation snippet in git history)."""

import dataclasses
import os

import numpy as np

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_fs2.npz")


def test_golden_fs2_outputs():
    from flax.traverse_util import unflatten_dict

    from tests.test_train import _tiny_setup
    from tts_king_tpu.models.fs2 import FastSpeech2

    z = np.load(FIXTURE)
    variables = {}
    for key in z.files:
        if not key.startswith("var::"):
            continue
        _, coll, path = key.split("::", 2)
        variables.setdefault(coll, {})[tuple(path.split("/"))] = z[key]
    variables = {coll: unflatten_dict(tree)
                 for coll, tree in variables.items()}

    _model, _opt, _state, mc = _tiny_setup()
    mc = dataclasses.replace(mc, postnet_dim=32)
    model = FastSpeech2(model_config=mc, n_speakers=3, pitch_min=-2,
                        pitch_max=2, energy_min=-2, energy_max=2)

    out = model.apply(variables, z["in::speakers"], z["in::texts"],
                      z["in::src_lens"], max_mel_len=32, train=False)

    np.testing.assert_array_equal(np.asarray(out["mel_lens"]),
                                  z["out::mel_lens"])
    np.testing.assert_allclose(np.asarray(out["log_duration_prediction"]),
                               z["out::log_duration_prediction"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["mel"]), z["out::mel"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["postnet_mel"]),
                               z["out::postnet_mel"], rtol=1e-5, atol=1e-5)


def test_golden_vocoder_outputs():
    """Frozen tiny HiFi-GAN Generator (params, mel, wav) snapshot — guards
    vocoder numerics across refactors and kernel swaps end-to-end, including
    the fused MRF backends (which must reproduce the same waveform)."""
    from flax.traverse_util import unflatten_dict

    from tts_king_tpu.config import VocoderModelConfig
    from tts_king_tpu.models.hifigan import Generator

    z = np.load(os.path.join(os.path.dirname(FIXTURE), "golden_vocoder.npz"))
    params = unflatten_dict(
        {tuple(k.split("::", 2)[2].split("/")): z[k]
         for k in z.files if k.startswith("var::")})
    cfg = VocoderModelConfig(upsample_rates=[4, 4],
                             upsample_kernel_sizes=[8, 8],
                             upsample_initial_channel=32)
    for backend, atol in (("xla", 1e-5), ("fused", 1e-5)):
        voc = Generator(cfg, mrf_backend=backend)
        wav = np.asarray(voc.apply({"params": params}, z["in::mel"]))
        np.testing.assert_allclose(wav, z["out::wav"], rtol=1e-5, atol=atol,
                                   err_msg=backend)
