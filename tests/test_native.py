"""Native C++ components: build, F0 agreement with the XLA implementation,
threaded npy batch loading."""

import numpy as np
import pytest

from tts_king_tpu import native


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return native.get_lib()


def test_native_yin_matches_xla(lib):
    from tts_king_tpu.ops.f0 import yin_f0 as yin_jax

    sr, hop = 22050, 256
    t = np.arange(3 * 4096) / sr
    wav = (0.6 * np.sin(2 * np.pi * 180 * t)
           + 0.2 * np.sin(2 * np.pi * 360 * t)).astype(np.float32)
    f0_native = native.yin_f0(wav, sr, hop)
    f0_xla = np.asarray(yin_jax(wav[None], sr, hop))[0]
    assert len(f0_native) == len(f0_xla)
    voiced_n = f0_native > 0
    voiced_x = f0_xla > 0
    # voicing decisions agree except possibly at boundaries
    assert np.mean(voiced_n == voiced_x) > 0.9
    both = voiced_n & voiced_x
    assert both.sum() > 10
    np.testing.assert_allclose(f0_native[both], f0_xla[both], rtol=0.02)
    med = np.median(f0_native[voiced_n])
    assert 170 < med < 190, med


def test_native_yin_batch(lib):
    sr, hop = 22050, 256
    t = np.arange(8192) / sr
    wavs = [(0.5 * np.sin(2 * np.pi * f * t[: n])).astype(np.float32)
            for f, n in [(150, 8192), (250, 6000), (330, 4000)]]
    f0s = native.yin_f0_batch(wavs, sr, hop, n_threads=2)
    assert len(f0s) == 3
    for f_target, f0 in zip([150, 250, 330], f0s):
        voiced = f0[f0 > 0]
        assert len(voiced) > 5
        assert abs(np.median(voiced) - f_target) < 8


def test_npy_batch_loader(lib, tmp_path):
    rng = np.random.RandomState(0)
    paths, refs = [], []
    specs = [((37, 80), np.float32), ((54, 80), np.float64), ((20,), np.int64),
             ((), np.float32)]
    for i, (shape, dtype) in enumerate(specs):
        arr = np.asarray(rng.randn(*shape) * 10).astype(dtype)
        p = tmp_path / f"a{i}.npy"
        np.save(p, arr)
        paths.append(str(p))
        refs.append(arr)

    batch, lengths = native.load_npy_batch(paths, max_rows=60, cols=80,
                                           n_threads=2)
    assert batch.shape == (4, 60, 80)
    assert lengths.tolist() == [37, 54, 20, 1]
    np.testing.assert_allclose(batch[0, :37], refs[0], rtol=1e-6)
    np.testing.assert_allclose(batch[1, :54], refs[1].astype(np.float32),
                               rtol=1e-6)
    np.testing.assert_allclose(batch[2, :20, 0], refs[2].astype(np.float32))
    assert np.all(batch[2, :20, 1:] == 0)
    np.testing.assert_allclose(batch[3, 0, 0], refs[3])
    # padding is zero
    assert np.all(batch[0, 37:] == 0)


def test_npy_loader_fortran_order(lib, tmp_path):
    """np.save writes fortran_order=True for F-contiguous arrays (np.asarray
    of a device array can come back that way — seen in production on
    cwt-pitch features); the native loader must match np.load, not reject
    them."""
    rng = np.random.RandomState(1)
    c_arr = rng.randn(27, 11).astype(np.float32)
    f_arr = np.asfortranarray(c_arr)
    assert f_arr.flags.f_contiguous and not f_arr.flags.c_contiguous
    p_c, p_f = tmp_path / "c.npy", tmp_path / "f.npy"
    np.save(p_c, c_arr)
    np.save(p_f, f_arr)
    with open(p_f, "rb") as fh:
        assert b"'fortran_order': True" in fh.read(80)

    batch, lengths = native.load_npy_batch([str(p_c), str(p_f)],
                                           max_rows=40, cols=11)
    assert lengths.tolist() == [27, 27]
    np.testing.assert_array_equal(batch[0], batch[1])
    np.testing.assert_allclose(batch[1, :27], c_arr, rtol=1e-6)
    # row/col truncation against an F-order payload
    batch2, lengths2 = native.load_npy_batch([str(p_f)], max_rows=20, cols=7)
    assert lengths2.tolist() == [20]
    np.testing.assert_allclose(batch2[0], c_arr[:20, :7], rtol=1e-6)


def test_npy_loader_missing_file(lib, tmp_path):
    batch, lengths = native.load_npy_batch([str(tmp_path / "nope.npy")],
                                           max_rows=4, cols=4)
    assert lengths[0] == -1
    assert np.all(batch == 0)
