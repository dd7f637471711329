"""Text frontend tests: symbol table layout and sequence round-trips."""

from tts_king_tpu.text import (
    phonemes_to_sequence,
    sequence_to_text,
    text_to_sequence,
)
from tts_king_tpu.text.symbols import SILENCES, VOCAB_SIZE, symbols


def test_symbol_count():
    # 206 symbols, vocab 207 — must match the reference embedding table
    # (fs_two/transformer/Models.py:40: len(symbols) + 1).
    assert len(symbols) == 206
    assert VOCAB_SIZE == 207


def test_symbol_table_landmarks():
    assert symbols[0] == "_"
    assert symbols[1] == "-"
    assert symbols[2] == "!"
    # ARPAbet block starts right after pad+special+punct+letters = 64.
    assert symbols[64] == "@AA"
    # Silences after the 84 ARPAbet symbols.
    assert symbols[64 + 84] == "@sp"
    assert SILENCES == ["@sp", "@spn", "@sil"]
    # Russian block after silences; @mask is the last symbol.
    assert symbols[64 + 84 + 3] == "@A"
    assert symbols[-1] == "@mask"
    # The table intentionally contains duplicate names (ARPAbet and Russian
    # share e.g. "@B"); lookup resolves to the LAST occurrence (Russian),
    # exactly like the reference's dict comprehension
    # (fs_two/text/__init__.py:8).
    from tts_king_tpu.text import _symbol_to_id

    assert _symbol_to_id["@B"] == max(
        i for i, s in enumerate(symbols) if s == "@B")


def test_braced_phoneme_parsing():
    seq = text_to_sequence("{A0 B sp}", [])
    names = [symbols[i] for i in seq]
    assert names == ["@A0", "@B", "@sp"]


def test_round_trip():
    seq = text_to_sequence("{P R I0 V E0 T sp}", [])
    assert sequence_to_text(seq) == "{P R I0 V E0 T sp}"


def test_mixed_text_and_phonemes():
    seq = text_to_sequence("abc {sp} d", [])
    names = [symbols[i] for i in seq]
    assert names == ["a", "b", "c", " ", "@sp", " ", "d"]


def test_phonemes_to_sequence():
    assert phonemes_to_sequence(["A0", "sp"]) == text_to_sequence("{A0 sp}", [])


def test_pad_symbol_dropped():
    # '_' (pad) and '~' are never emitted.
    assert text_to_sequence("_", []) == []


def test_reference_symbol_parity():
    """Positional parity with the reference symbol table (IDs must match
    converted checkpoints)."""
    import ast
    import re

    import tests.conftest as cf

    if not cf.reference_available():
        return
    ns = {}
    for mod in ("cmudict", "russian"):
        src = open(f"{cf.REFERENCE_ROOT}/fs_two/text/{mod}.py").read()
        m = re.search(r"^valid_symbols = (\[.*?\])", src, re.S | re.M)
        ns[mod] = ast.literal_eval(m.group(1))
    ref_symbols = (
        ["_"] + list("-") + list("!'(),.:;? ")
        + list("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz")
        + ["@" + s for s in ns["cmudict"]]
        + ["@sp", "@spn", "@sil"]
        + ["@" + s for s in ns["russian"] + ["mask"]]
    )
    assert symbols == ref_symbols
