"""Grapheme-to-phoneme frontends (CPU-side string processing).

Equivalent surface to the reference's input_process.py: a Russian G2P path
(external ``russian_g2p`` package when importable, lexicon fallback otherwise),
an English path (lexicon + optional ``g2p_en``), and a lexicon-only path.
All return numpy int arrays of symbol IDs ready for the acoustic model.
"""

import re
from string import punctuation

import numpy as np

from tts_king_tpu.text import text_to_sequence

_WORD_SPLIT_RE = re.compile(r"([,;.\-\?\!\s+])")
_LONE_PUNCT_RE = re.compile(r"\{[^\w\s]?\}")

_russian_transcriptor = None


def read_lexicon(lex_path):
    """Load a ``word phone phone ...`` pronunciation dictionary."""
    lexicon = {}
    with open(lex_path, encoding="utf-8") as f:
        for line in f:
            parts = re.split(r"\s+", line.strip("\n"))
            if not parts:
                continue
            word, phones = parts[0], parts[1:]
            lexicon.setdefault(word.lower(), phones)
    return lexicon


def _phones_to_ids(phones):
    """Join phones into the {..} braces format and convert to IDs."""
    text = "{" + "}{".join(phones) + "}"
    # A lone punctuation phone becomes a short pause.
    text = _LONE_PUNCT_RE.sub("{sp}", text)
    text = text.replace("}{", " ")
    return np.array(text_to_sequence(text, []))


def _get_russian_transcriptor():
    global _russian_transcriptor
    if _russian_transcriptor is None:
        from russian_g2p.Transcription import Transcription  # external package

        _russian_transcriptor = Transcription()
    return _russian_transcriptor


def preprocess_rus(text, lexicon=None):
    """Russian text -> symbol IDs.

    Uses the external ``russian_g2p`` transcriber when available (parity with
    the reference path, input_process.py:71-86); otherwise falls back to a
    lexicon lookup so the framework works standalone.
    """
    text = text.rstrip(punctuation)
    try:
        transcriptor = _get_russian_transcriptor()
    except ImportError:
        if lexicon is None:
            raise ImportError(
                "russian_g2p is not installed and no lexicon was provided; "
                "pass lexicon=read_lexicon(path_to_rus_all.dict)"
            )
        return preprocess_with_lexicon(text, lexicon)
    sentences = transcriptor.transcribe([text])[0]
    phones = [ph for sent in sentences for ph in sent + ["sp"]]
    return _phones_to_ids(phones)


def preprocess_eng(text, lexicon):
    """English text -> symbol IDs via lexicon, with g2p_en fallback per word."""
    text = text.rstrip(punctuation)
    try:
        from g2p_en import G2p  # optional external package

        g2p = G2p()
    except ImportError:
        g2p = None
    phones = []
    for w in _WORD_SPLIT_RE.split(text):
        lw = w.lower()
        if lw in lexicon:
            phones += lexicon[lw]
        elif g2p is not None:
            phones += [p for p in g2p(w) if p != " "]
        elif w.strip():
            phones.append(".")
    return _phones_to_ids(phones)


def preprocess_with_lexicon(text, lexicon):
    """Language-agnostic lexicon-only path: unknown words become pauses."""
    text = text.rstrip(punctuation)
    phones = []
    for w in _WORD_SPLIT_RE.split(text):
        lw = w.lower()
        if lw in lexicon:
            phones += lexicon[lw]
        else:
            phones += "."
    return _phones_to_ids(phones)
