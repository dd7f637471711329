"""Corpus tooling tests."""

import os

import numpy as np
from scipy.io import wavfile

from tts_king_tpu.data import corpus_tools as ct


def _touch_wav(path, n=1000):
    wavfile.write(path, 22050, np.zeros(n, np.int16))


def test_ljspeech_layout(tmp_path):
    root = tmp_path / "ds" / "spk1" / "book1"
    (root / "wavs").mkdir(parents=True)
    with open(root / "metadata.csv", "w", encoding="utf-8") as f:
        f.write("utt1|Раз|Раз\nutt2|Ещё раз|ещё раз\n")
    _touch_wav(str(root / "wavs" / "utt1.wav"))
    _touch_wav(str(root / "wavs" / "utt2.wav"))

    out = tmp_path / "speakers"
    vocab = ct.ljspeech_to_speaker_layout(str(tmp_path / "ds"), str(out))
    assert os.path.exists(out / "spk1" / "utt1.wav")
    lab = open(out / "spk1" / "utt2.lab", encoding="utf-8").read()
    assert lab == "ещйо раз"  # lowercased, ё -> йо (reference quirk)
    assert "раз" in vocab


def test_strip_and_clean_vocab():
    assert ct.strip_non_cyrillic("привет, world 123!") == "привет"
    cleaned = ct.clean_vocab(["длинноеслово", "да", "нет99!"])
    assert cleaned == ["да", "нет", "длинноеслово"]


def test_labs_to_metadata(tmp_path):
    d = tmp_path / "spk"
    d.mkdir()
    (d / "a.lab").write_text("текст а\n", encoding="utf-8")
    (d / "b.lab").write_text("текст б", encoding="utf-8")
    path = ct.labs_to_metadata_csv(str(d))
    lines = open(path, encoding="utf-8").read().strip().split("\n")
    assert lines == ["a|текст а|текст а", "b|текст б|текст б"]


def test_remove_unaligned(tmp_path):
    spk = tmp_path / "c" / "spk"
    spk.mkdir(parents=True)
    for base in ("good", "bad"):
        _touch_wav(str(spk / f"{base}.wav"))
        (spk / f"{base}.lab").write_text("x")
    (tmp_path / "badlist.txt").write_text("bad\nmissing\n")
    removed = ct.remove_unaligned(str(tmp_path / "c"),
                                  str(tmp_path / "badlist.txt"))
    assert removed == 1
    assert not (spk / "bad.wav").exists()
    assert (spk / "good.wav").exists()


def test_speaker_stats_and_filter(tmp_path):
    meta = tmp_path / "train.txt"
    lines = []
    for i in range(25):
        lines.append(f"utt{i}|spk_big|{{P A0 T}}|текст")
    lines.append("uttx|spk_small|{P A0}|текст")
    meta.write_text("\n".join(lines), encoding="utf-8")
    stats = ct.speaker_stats(str(meta))
    assert stats["spk_big"]["utterances"] == 25
    assert abs(stats["spk_big"]["mean_phones"] - 3) < 1e-6
    keep = ct.filter_speakers(stats, min_utterances=20)
    assert keep == ["spk_big"]
    keep2 = ct.filter_speakers(stats, min_utterances=20, remove=["spk_big"])
    assert keep2 == []


def test_align_script_check(tmp_path):
    """scripts/align.py check: reports and deletes unaligned utterances."""
    import subprocess
    import sys

    spk = tmp_path / "raw" / "spk"
    spk.mkdir(parents=True)
    for base, aligned in (("a", True), ("b", False)):
        _touch_wav(str(spk / f"{base}.wav"))
        (spk / f"{base}.lab").write_text("x")
        if aligned:
            (spk / f"{base}.TextGrid").write_text("")
    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "align.py")
    out = subprocess.run(
        [sys.executable, script, "check", "--corpus", str(tmp_path / "raw"),
         "--delete"], capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    assert "2 utterances, 1 without TextGrid" in out.stdout
    assert not (spk / "b.wav").exists()
    assert (spk / "a.wav").exists()
