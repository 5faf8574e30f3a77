"""CMU Pronouncing Dictionary support (reference utils/text/cmudict.py;
SURVEY.md:59).

Two uses, like upstream:
- inline ARPAbet in text: "turn {L EH1 F T} now" — handled by
  text_to_sequence via the "@PHONE" symbol-table entries;
- a dictionary-backed offline G2P (`CMUDictBackend` in text/__init__.py)
  that maps ARPAbet to the IPA phoneme table, making the no-espeak phoneme
  path real for in-vocabulary words.
"""

from __future__ import annotations

import re

_BASE_SYMBOLS = [
    "AA", "AE", "AH", "AO", "AW", "AY", "B", "CH", "D", "DH", "EH", "ER",
    "EY", "F", "G", "HH", "IH", "IY", "JH", "K", "L", "M", "N", "NG", "OW",
    "OY", "P", "R", "S", "SH", "T", "TH", "UH", "UW", "V", "W", "Y", "Z",
    "ZH",
]
_VOWELS = {"AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER", "EY", "IH", "IY",
           "OW", "OY", "UH", "UW"}
# like the reference's cmudict.valid_symbols: vowels carry 0/1/2 stress forms
VALID_SYMBOLS = sorted(
    _BASE_SYMBOLS + [v + d for v in _VOWELS for d in "012"])
_VALID = set(_BASE_SYMBOLS)

# ARPAbet -> IPA (General American). Stress digits handled separately.
ARPABET_TO_IPA = {
    "AA": "ɑ", "AE": "æ", "AH": "ʌ", "AO": "ɔ", "AW": "aʊ", "AY": "aɪ",
    "B": "b", "CH": "tʃ", "D": "d", "DH": "ð", "EH": "ɛ", "ER": "ɚ",
    "EY": "eɪ", "F": "f", "G": "ɡ", "HH": "h", "IH": "ɪ", "IY": "i",
    "JH": "dʒ", "K": "k", "L": "l", "M": "m", "N": "n", "NG": "ŋ",
    "OW": "oʊ", "OY": "ɔɪ", "P": "p", "R": "ɹ", "S": "s", "SH": "ʃ",
    "T": "t", "TH": "θ", "UH": "ʊ", "UW": "u", "V": "v", "W": "w",
    "Y": "j", "Z": "z", "ZH": "ʒ",
}

_ALT_RE = re.compile(r"\([0-9]+\)")


class CMUDict:
    """cmudict-format lexicon: "WORD  P1 P2 ..." lines; alternate
    pronunciations as WORD(1). Lookup returns the list of pronunciations
    (each a space-joined ARPAbet string) or None."""

    def __init__(self, path_or_lines, keep_ambiguous: bool = True):
        if isinstance(path_or_lines, str):
            with open(path_or_lines, encoding="latin-1") as f:
                entries = _parse_cmudict(f)
        else:
            entries = _parse_cmudict(path_or_lines)
        if not keep_ambiguous:
            entries = {w: p for w, p in entries.items() if len(p) == 1}
        self._entries = entries

    def __len__(self) -> int:
        return len(self._entries)

    def lookup(self, word: str) -> list[str] | None:
        return self._entries.get(word.upper())


def _parse_cmudict(lines) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for line in lines:
        if not line or line.startswith(";;;"):
            continue
        parts = line.split("  ")
        if len(parts) != 2:
            continue
        word = _ALT_RE.sub("", parts[0])
        pron = _validate(parts[1].strip())
        if pron is not None:
            out.setdefault(word, []).append(pron)
    return out


def _validate(pron: str) -> str | None:
    for ph in pron.split(" "):
        if ph.rstrip("012") not in _VALID:
            return None
    return pron


def arpabet_to_ipa(pron: str) -> str:
    """ARPAbet string ("HH AH0 L OW1") -> IPA, with stress digits rendered
    as IPA primary/secondary stress marks before the stressed vowel."""
    out: list[str] = []
    for ph in pron.split(" "):
        stress = ph[-1] if ph and ph[-1] in "012" else ""
        base = ph.rstrip("012")
        ipa = ARPABET_TO_IPA.get(base, "")
        if stress == "1":
            out.append("ˈ" + ipa)
        elif stress == "2":
            out.append("ˌ" + ipa)
        else:
            out.append(ipa)
    return "".join(out)
