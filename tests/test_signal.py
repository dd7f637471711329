"""Signal-processing parity: STFT framing/window/magnitudes vs torch, mel
filterbank structure, ISTFT round trip, CWT forward/inverse behavior."""

import numpy as np
import pytest

import tests.conftest as cf
from tests.oracle_util import run_oracle


@pytest.fixture(scope="module")
def stft_golden():
    rng = np.random.RandomState(0)
    y = (0.5 * np.sin(2 * np.pi * 220 * np.arange(4096) / 22050)
         + 0.1 * rng.randn(4096)).astype(np.float32)
    y = np.stack([y, np.roll(y, 17)])
    return y, run_oracle("torch_stft", dict(y=y, n_fft=1024, hop=256, win=1024))


def test_tacotron_stft_magnitude(stft_golden):
    from tts_king_tpu.ops.stft import stft_magnitude

    y, golden = stft_golden
    got = np.array(stft_magnitude(y, 1024, 256, 1024, center_pad="tacotron"))
    want = golden["tacotron_mag"].transpose(0, 2, 1)  # torch (B, F, T)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_tacotron_energy(stft_golden):
    from tts_king_tpu.ops.stft import MelExtractor

    y, golden = stft_golden
    _, energy = MelExtractor().mel_and_energy(y)
    np.testing.assert_allclose(np.array(energy), golden["tacotron_energy"],
                               rtol=1e-3, atol=1e-3)


def test_hifigan_stft_magnitude(stft_golden):
    from tts_king_tpu.ops.stft import stft_magnitude

    y, golden = stft_golden
    got = np.array(stft_magnitude(y, 1024, 256, 1024, center_pad="hifigan",
                                  mag_eps=1e-9))
    want = golden["hifigan_mag"].transpose(0, 2, 1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_mel_filterbank_structure():
    """librosa.filters.mel(22050, 1024, 80, 0, 8000) structural properties:
    shape, non-negativity, Slaney area normalization, monotonic peaks."""
    from tts_king_tpu.ops.mel import hz_to_mel, mel_filterbank, mel_to_hz

    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    # Slaney normalization: integral of filter i over Hz ~ 1 (area 2/(hi-lo)
    # times triangle area (hi-lo)/2).
    fftfreqs = np.linspace(0, 22050 / 2, 513)
    df = fftfreqs[1] - fftfreqs[0]
    areas = fb.sum(axis=1) * df
    assert np.all(areas[5:-1] > 0.5) and np.all(areas[5:-1] < 1.5)
    # mel scale round trip
    f = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 8000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-6, atol=1e-6)


def test_istft_round_trip():
    from tts_king_tpu.ops.stft import _hann_window, frame_signal, istft

    import jax.numpy as jnp

    t = np.arange(8192) / 22050
    y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    ypad = jnp.pad(jnp.asarray(y), [(0, 0), (512, 512)], mode="reflect")
    window = jnp.asarray(_hann_window(1024, 1024))
    spec = jnp.fft.rfft(frame_signal(ypad, 1024, 256) * window, axis=-1)
    rec = np.array(istft(spec, 1024, 256, 1024))
    n = min(rec.shape[1], y.shape[1])
    # interior matches closely (edges lose energy to windowing)
    np.testing.assert_allclose(rec[0, 1024 : n - 1024], y[0, 1024 : n - 1024],
                               atol=5e-3)


def test_griffin_lim_recovers_tone():
    import jax.numpy as jnp

    from tts_king_tpu.ops.stft import griffin_lim, stft_magnitude

    t = np.arange(8192) / 22050
    y = (0.6 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    mag = stft_magnitude(jnp.asarray(y), 1024, 256, 1024)
    rec = np.array(griffin_lim(mag, n_iters=8))
    spec = np.abs(np.fft.rfft(rec[0] * np.hanning(len(rec[0]))))
    freq = np.fft.rfftfreq(len(rec[0]), 1 / 22050)[spec.argmax()]
    assert abs(freq - 440) < 15, freq


@pytest.mark.skipif(not cf.oracle_available(),
                    reason="no reference and no oracle recordings")
def test_inverse_batch_cwt_parity():
    from tts_king_tpu.ops.cwt import inverse_batch_cwt

    rng = np.random.RandomState(0)
    coefs = rng.randn(3, 40, 11).astype(np.float32)
    want = run_oracle("reference_inverse_cwt", dict(coefs=coefs))["recon"]
    got = np.array(inverse_batch_cwt(coefs))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_cwt_forward_inverse_consistency():
    """MexicanHat CWT -> weighted recomposition correlates strongly with the
    (standardized) input — the property the model's pitch path relies on."""
    from tts_king_tpu.ops.cwt import inverse_cwt, transform_cwt

    t = np.linspace(0, 4, 400)
    sig = np.sin(2 * np.pi * 1.3 * t) + 0.5 * np.sin(2 * np.pi * 5.7 * t)
    sig = ((sig - sig.mean()) / sig.std()).astype(np.float32)
    coefs = np.array(transform_cwt(sig))
    assert coefs.shape == (400, 11)
    rec = np.array(inverse_cwt(coefs))
    corr = np.corrcoef(rec[30:-30], sig[30:-30])[0, 1]
    assert corr > 0.85, corr


def test_cwt_batched_matches_single():
    from tts_king_tpu.ops.cwt import transform_cwt

    rng = np.random.RandomState(1)
    sig = rng.randn(3, 100).astype(np.float32)
    batched = np.array(transform_cwt(sig))
    for b in range(3):
        single = np.array(transform_cwt(sig[b]))
        np.testing.assert_allclose(batched[b], single, rtol=1e-4, atol=1e-5)
