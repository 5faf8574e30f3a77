"""Text frontend tests: cleaners, number norm, sequence round-trips.

Mirrors the reference's tests/test_text_processing.py strategy (SURVEY.md SS4).
"""

import numpy as np

from your_voice_tts_tpu.text import (
    RuleG2PBackend,
    CacheBackend,
    pad_with_eos_bos,
    phoneme_to_sequence,
    phonemes,
    sequence_to_phoneme,
    sequence_to_text,
    symbols,
    text_to_sequence,
)
from your_voice_tts_tpu.text.cleaners import (
    basic_cleaners,
    english_cleaners,
    german_cleaners,
    transliteration_cleaners,
)
from your_voice_tts_tpu.text.numbers import normalize_numbers


def test_vocab_tables():
    assert symbols[0] == "_" and symbols[1] == "~" and symbols[2] == "^"
    assert len(set(symbols)) == len(symbols)
    assert len(set(phonemes)) == len(phonemes)


def test_text_roundtrip():
    s = "hello world, this is a test!"
    seq = text_to_sequence(s, "basic_cleaners")
    assert seq.dtype == np.int32
    assert sequence_to_text(seq) == s


def test_english_cleaners():
    assert english_cleaners("Dr. Smith lives at 10 Main St.") == (
        "doctor smith lives at ten main saint"
    )
    assert english_cleaners("Hello   World") == "hello world"


def test_number_norm():
    assert normalize_numbers("1,234") == "twelve thirty-four"  # year-style range
    assert normalize_numbers("3,456") == "three thousand four hundred fifty-six"
    assert normalize_numbers("13") == "thirteen"
    assert normalize_numbers("21") == "twenty-one"
    assert normalize_numbers("100") == "one hundred"
    assert normalize_numbers("$5.50") == "five dollars, fifty cents"
    assert normalize_numbers("$1") == "one dollar"
    assert normalize_numbers("3.14") == "three point fourteen"
    assert normalize_numbers("2nd") == "second"
    assert normalize_numbers("21st") == "twenty-first"
    assert normalize_numbers("20th") == "twentieth"
    assert normalize_numbers("1984") == "nineteen eighty-four"
    assert normalize_numbers("2000") == "two thousand"
    assert normalize_numbers("2008") == "two thousand eight"
    assert normalize_numbers("1900") == "nineteen hundred"


def test_transliteration_and_german():
    assert transliteration_cleaners("Crème brûlée") == "creme brulee"
    assert german_cleaners("Über schöne Straße") == "ueber schoene strasse"
    assert basic_cleaners("  A  B  ") == " a b "


def test_phoneme_sequence_rule_backend():
    seq = phoneme_to_sequence("hello", backend=RuleG2PBackend())
    assert len(seq) > 0
    ipa = sequence_to_phoneme(seq)
    assert "h" in ipa and "l" in ipa


def test_phoneme_eos_bos():
    seq = phoneme_to_sequence("hi", enable_eos_bos=True, backend=RuleG2PBackend())
    assert phonemes[int(seq[0])] == "^"
    assert phonemes[int(seq[-1])] == "~"


def test_cache_backend():
    b = CacheBackend({"hello": "hɛloʊ"})
    seq = phoneme_to_sequence("hello", cleaner_names="basic_cleaners", backend=b)
    assert sequence_to_phoneme(seq) == "hɛloʊ"


def test_pad_with_eos_bos():
    seq = text_to_sequence("ab", "basic_cleaners")
    padded = pad_with_eos_bos(seq)
    assert symbols[int(padded[0])] == "^"
    assert symbols[int(padded[-1])] == "~"
    assert len(padded) == len(seq) + 2


def test_unknown_chars_dropped():
    seq = text_to_sequence("a你b", "basic_cleaners")
    assert sequence_to_text(seq) == "ab"
