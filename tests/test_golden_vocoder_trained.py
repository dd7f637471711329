"""Trained-vocoder golden regression (VERDICT r2 next-#8).

tests/fixtures/golden_trained_vocoder.npz freezes a micro HiFi-GAN that was
actually GAN-TRAINED (scripts/make_golden_trained_vocoder.py): folded
inference params + one input mel + the expected waveform. Guards the whole
training geometry across rounds — GAN losses, AdamW steps, weight-norm
parametrization, and the export fold — not just the generator forward
(which golden_vocoder.npz already covers with seed weights).
"""

import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "golden_trained_vocoder.npz")
STEPS = 300


def micro_voc_config():
    """Micro hop-256 HiFi-GAN: real 4-stage x256 upsample topology at 1/16
    width so the fixture stays small and CPU training stays fast."""
    from tts_king_tpu.config import VocoderModelConfig

    return VocoderModelConfig(
        upsample_rates=[8, 8, 2, 2], upsample_kernel_sizes=[16, 16, 4, 4],
        upsample_initial_channel=32, resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3]], segment_size=4096,
        batch_size=4, num_mels=80, n_fft=1024, hop_size=256, win_size=1024,
        mel_fmax=8000.0)


def _unflatten(flat):
    tree = {}
    for key, leaf in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return tree


@pytest.fixture(scope="module")
def fixture():
    if not os.path.exists(FIXTURE):
        pytest.skip("golden trained-vocoder fixture not generated yet "
                    "(scripts/make_golden_trained_vocoder.py)")
    z = np.load(FIXTURE)
    params = _unflatten({k[len("param:"):]: z[k] for k in z.files
                         if k.startswith("param:")})
    return z["mel"], z["expected_wav"], params


def test_trained_vocoder_output_frozen(fixture):
    from tts_king_tpu.models.hifigan import Generator

    mel, expected, params = fixture
    gen = Generator(micro_voc_config(), weight_norm=False)
    wav = np.asarray(gen.apply({"params": params}, mel), np.float32)
    assert wav.shape == expected.shape
    np.testing.assert_allclose(wav, expected, rtol=1e-4, atol=1e-5)


def test_trained_vocoder_beats_seed_init(fixture):
    """The committed weights are genuinely trained: their reconstruction
    mel-L1 on the frozen mel beats a seed-initialized generator's by a wide
    margin."""
    import jax

    from tts_king_tpu.models.hifigan import Generator
    from tts_king_tpu.ops.stft import hifigan_mel

    mel, expected, params = fixture
    vc = micro_voc_config()
    gen = Generator(vc, weight_norm=False)

    def recon_l1(wav):
        m = np.asarray(hifigan_mel(wav, vc.n_fft, vc.num_mels,
                                   vc.sampling_rate, vc.hop_size,
                                   vc.win_size, vc.mel_fmin,
                                   vc.mel_fmax))[:, : mel.shape[1]]
        return float(np.mean(np.abs(m - mel)))

    trained = recon_l1(expected)
    seed_params = gen.init(jax.random.PRNGKey(0), mel)["params"]
    seed_wav = np.asarray(gen.apply({"params": seed_params}, mel), np.float32)
    untrained = recon_l1(seed_wav)
    assert trained < 0.7 * untrained, (
        f"trained {trained:.3f} vs seed {untrained:.3f}: fixture does not "
        f"look trained")
