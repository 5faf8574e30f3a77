"""Symbol and phoneme vocabularies.

Behavioral parity with the reference's ``utils/text/symbols.py`` (SURVEY.md
SS2.1 "Text frontend"): a grapheme table (pad/eos/bos + ASCII letters +
punctuation) and a phoneme table (pad/eos/bos + IPA set + punctuation).
IDs index the model's symbol embedding, so table ORDER is part of the
checkpoint format.
"""

_pad = "_"
_eos = "~"
_bos = "^"

_characters = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz!'(),-.:;? "
_punctuations = "!'(),-.:;? "

# IPA phoneme inventory (espeak-ng en/de output coverage; vowels + non-pulmonic
# + pulmonic consonants + suprasegmentals/diacritics), mirroring the upstream
# table structure.
_vowels = "iyɨʉɯuɪʏʊeøɘəɵɤoɛœɜɞʌɔæɐaɶɑɒᵻ"
_non_pulmonic_consonants = "ʘɓǀɗǃʄǂɠǁʛ"
_pulmonic_consonants = "pbtdʈɖcɟkɡqɢʔɴŋɲɳnɱmʙrʀⱱɾɽɸβfvθðszʃʒʂʐçʝxɣχʁħʕhɦɬɮʋɹɻjɰlɭʎʟ"
_suprasegmentals = "ˈˌːˑ"
_other_symbols = "ʍwɥʜʢʡɕʑɺɧ"
_diacritics = "ɚ˞ɫ"
_phoneme_chars = (
    _vowels
    + _non_pulmonic_consonants
    + _pulmonic_consonants
    + _suprasegmentals
    + _other_symbols
    + _diacritics
)

# "@PHONE" entries allow inline curly-brace ARPAbet in text ("{HH AH0 L OW1}"),
# like the reference's _arpabet symbols (utils/text/symbols.py + cmudict.py).
from .cmudict import VALID_SYMBOLS as _ARPABET  # noqa: E402

_arpabet = ["@" + s for s in _ARPABET]

symbols: list[str] = [_pad, _eos, _bos] + list(_characters) + _arpabet
phonemes: list[str] = [_pad, _eos, _bos] + sorted(set(_phoneme_chars)) + list(_punctuations)

pad = _pad
eos = _eos
bos = _bos


def make_symbols(characters: str, punctuations: str = _punctuations,
                 pad: str = _pad, eos: str = _eos, bos: str = _bos) -> list[str]:
    """Build a custom grapheme table (reference supports per-config
    characters). Punctuation not already in `characters` is appended — a
    dropped punctuations argument would silently delete those characters
    from every input sequence."""
    extra = [p for p in punctuations if p not in characters]
    return [pad, eos, bos] + list(characters) + extra
