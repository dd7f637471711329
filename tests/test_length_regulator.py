"""Length regulator: the gather formulation must bit-match the reference's
expand-and-concat loop (fs_two/model/modules.py:220-252)."""

import numpy as np

from tts_king_tpu.ops.length_regulator import (
    expand_values,
    length_regulate,
    round_durations,
)


def naive_expand(x, durations, max_len):
    """The reference algorithm, in numpy: repeat row i durations[i] times."""
    B, L, H = x.shape
    out = np.zeros((B, max_len, H), dtype=x.dtype)
    mel_len = []
    for b in range(B):
        rows = []
        for i in range(L):
            rows += [x[b, i]] * max(int(durations[b, i]), 0)
        mel_len.append(len(rows))
        rows = np.array(rows[:max_len]) if rows else np.zeros((0, H), x.dtype)
        out[b, : len(rows)] = rows
    return out, np.array(mel_len)


def test_matches_naive_loop():
    rng = np.random.RandomState(0)
    B, L, H, T = 3, 17, 8, 64
    x = rng.randn(B, L, H).astype(np.float32)
    durations = rng.randint(0, 7, size=(B, L))
    got, got_len = length_regulate(x, durations, T)
    want, want_len = naive_expand(x, durations, T)
    np.testing.assert_array_equal(np.array(got_len), want_len)
    np.testing.assert_allclose(np.array(got), want, rtol=0, atol=0)


def test_zero_durations():
    x = np.ones((2, 4, 3), np.float32)
    durations = np.zeros((2, 4), np.int64)
    out, mel_len = length_regulate(x, durations, 8)
    assert np.array(mel_len).tolist() == [0, 0]
    assert np.abs(np.array(out)).sum() == 0


def test_overflow_clamps_to_max_len():
    x = np.arange(6, dtype=np.float32).reshape(1, 3, 2) + 1
    durations = np.array([[5, 5, 5]])
    out, mel_len = length_regulate(x, durations, 8)
    assert int(mel_len[0]) == 15  # raw total; caller clamps
    want, _ = naive_expand(np.asarray(x), durations, 8)
    np.testing.assert_array_equal(np.array(out), want)


def test_expand_values():
    vals = np.array([[1.0, 2.0, 3.0]], np.float32)
    durations = np.array([[2, 0, 3]])
    out = expand_values(vals, durations, 8)
    np.testing.assert_array_equal(
        np.array(out)[0], [1, 1, 3, 3, 3, 0, 0, 0])


def test_round_durations_matches_reference_formula():
    # clamp(round(exp(logd)-1)*c, min=0), then int truncation
    # (modules.py:199-204 + the .item()/int() in expand).
    logd = np.log(np.array([[0.2, 1.0, 3.5, 6.0]], np.float32) + 1)
    got = np.array(round_durations(logd, 1.0))[0]
    assert got.tolist() == [0, 1, 4, 6]
    # round_durations returns floats (the reference's duration_rounded output
    # is round(exp(logd)-1)*c, unrounded after scaling); truncation to int
    # happens inside length_regulate.
    got_ctrl = np.array(round_durations(logd, 1.5))[0]
    assert got_ctrl.tolist() == [0.0, 1.5, 6.0, 9.0]
    assert got_ctrl.astype(np.int32).tolist() == [0, 1, 6, 9]
