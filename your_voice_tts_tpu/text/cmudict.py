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


# suffix-voicing classes (last phone of the base decides the suffix allomorph)
_SIBILANT = {"S", "Z", "SH", "CH", "JH", "ZH"}
_VOICELESS = {"P", "T", "K", "F", "TH"}


def _last_phone(pron: str) -> str:
    return pron.split(" ")[-1].rstrip("012")


def _s_suffix(pron: str) -> str:
    lp = _last_phone(pron)
    if lp in _SIBILANT:
        return pron + " IH0 Z"
    if lp in _VOICELESS:
        return pron + " S"
    return pron + " Z"


def _ed_suffix(pron: str) -> str:
    lp = _last_phone(pron)
    if lp in ("T", "D"):
        return pron + " IH0 D"
    if lp in _VOICELESS or lp in ("S", "SH", "CH"):
        return pron + " T"
    return pron + " D"


def derive(word: str, lookup) -> str | None:
    """Morphological derivation for out-of-lexicon inflections: plural /
    possessive -s, past -ed, progressive -ing, adverbial -ly, comparative
    -er / superlative -est, built from an in-lexicon base with the regular
    English voicing rules. Roughly doubles the effective coverage of a
    compact core lexicon. `lookup` maps WORD -> list[pron] | None."""
    w = word.upper()

    def base_pron(candidates):
        for c in candidates:
            if len(c) >= 2:
                prons = lookup(c)
                if prons:
                    return prons[0]
        return None

    def undouble(stem: str) -> list[str]:
        # stopp -> stop, runn -> run (the doubled-consonant spelling rule)
        out = [stem, stem + "E"]
        if len(stem) >= 2 and stem[-1] == stem[-2]:
            out.append(stem[:-1])
        return out

    if w.endswith("'S"):
        b = base_pron([w[:-2]])
        if b:
            return _s_suffix(b)
    if w.endswith("IES"):
        b = base_pron([w[:-3] + "Y"])
        if b:
            return _s_suffix(b)
    if w.endswith("ES"):
        b = base_pron([w[:-2]])
        if b:
            return _s_suffix(b)
    if w.endswith("S") and not w.endswith("SS"):
        b = base_pron([w[:-1]])
        if b:
            return _s_suffix(b)
    if w.endswith("IED"):
        b = base_pron([w[:-3] + "Y"])
        if b:
            return _ed_suffix(b)
    if w.endswith("ED"):
        b = base_pron(undouble(w[:-2]) + [w[:-1]])
        if b:
            return _ed_suffix(b)
    if w.endswith("ING"):
        b = base_pron(undouble(w[:-3]))
        if b:
            return b + " IH0 NG"
    if w.endswith("ILY"):
        # happily <- happy: -y (IY0) + -ily (AH0 L IY0)
        b = base_pron([w[:-3] + "Y"])
        if b and b.endswith(" IY0"):
            return b[: -len(" IY0")] + " AH0 L IY0"
    if w.endswith("LY"):
        b = base_pron([w[:-2]])
        if b:
            return b + " L IY0"
    if w.endswith("IEST"):
        b = base_pron([w[:-4] + "Y"])
        if b:
            return b + " AH0 S T"
    if w.endswith("EST"):
        b = base_pron(undouble(w[:-3]) + [w[:-2]])
        if b:
            return b + " AH0 S T"
    if w.endswith("IER"):
        b = base_pron([w[:-3] + "Y"])
        if b:
            return b + " ER0"
    if w.endswith("ER"):
        b = base_pron(undouble(w[:-2]) + [w[:-1]])
        if b:
            return b + " ER0"
    return None


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
