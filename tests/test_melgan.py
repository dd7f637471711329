"""MelGAN generator parity vs a torch implementation of the descript
architecture (the reference's alternative vocoder, fs_two/utils/model.py:52-61),
including weight-norm folding and the Sequential-layout converter."""

import numpy as np
import pytest

from tests.oracle_util import run_oracle


def test_melgan_generator_parity():
    import jax.numpy as jnp

    from tts_king_tpu.models.melgan import MelGANGenerator, convert_melgan_state

    rng = np.random.RandomState(0)
    B, T = 2, 17
    ngf, n_res, ratios = 4, 2, (4, 2)
    mel = rng.randn(B, 80, T).astype(np.float32)

    out = run_oracle("melgan", dict(seed=3, ngf=ngf, n_residual_layers=n_res,
                                    ratios=np.array(ratios), mel=mel))
    state = {k[len("state__"):]: v for k, v in out.items()
             if k.startswith("state__")}
    variables = convert_melgan_state(state, ratios=ratios,
                                     n_residual_layers=n_res)

    model = MelGANGenerator(ngf=ngf, n_residual_layers=n_res, ratios=ratios)
    wav = np.array(model.apply(variables, mel.transpose(0, 2, 1)))

    ref = out["wav"][:, 0, :]
    assert wav.shape == ref.shape
    assert wav.shape[1] == T * int(np.prod(ratios))
    np.testing.assert_allclose(wav, ref, rtol=1e-4, atol=1e-5)
