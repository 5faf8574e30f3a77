"""Espeak-path integration tests via a fake ``espeak-ng`` on PATH.

Real espeak-ng will never exist in this environment, so the subprocess
branch of EspeakBackend (reference: utils/text/__init__.py phonemize via
the ``phonemizer`` package's espeak engine) would otherwise ship untested
and die on the first machine that HAS espeak. A shell fixture emulating
``espeak-ng -q --ipa=3 -v <lang> <text>`` exercises: binary discovery,
subprocess invocation/parsing, the ``_`` phoneme-separator stripping, the
auto-selection chain, checkpoint-meta G2P pinning, and the error path.
"""

import os
import stat
import subprocess

import pytest

from your_voice_tts_tpu.text import (CMUDictBackend, EspeakBackend,
                                     RuleG2PBackend, default_g2p_backend,
                                     phoneme_to_sequence,
                                     sequence_to_phoneme)

# what the fake binary prints for any input: two words, phonemes separated
# by "_" within words (--ipa=3 format), one space between words
FAKE_IPA_RAW = "h_ə_l_ˈoʊ w_ˈɜː_l_d"
FAKE_IPA_CLEAN = "hələˈoʊ wˈɜːld".replace("ə", "ə")  # separator stripped


@pytest.fixture
def fake_espeak(tmp_path, monkeypatch):
    """Install a fake espeak-ng at the FRONT of PATH and return its dir."""
    script = tmp_path / "espeak-ng"
    script.write_text(
        "#!/bin/sh\n"
        "# emulate: espeak-ng -q --ipa=3 -v <lang> <text>\n"
        "[ \"$1\" = -q ] || { echo 'missing -q' >&2; exit 64; }\n"
        "[ \"$2\" = --ipa=3 ] || { echo 'missing --ipa=3' >&2; exit 64; }\n"
        "[ \"$3\" = -v ] || { echo 'missing -v' >&2; exit 64; }\n"
        "lang=\"$4\"; text=\"$5\"\n"
        "[ -n \"$text\" ] || { echo 'no text' >&2; exit 64; }\n"
        "case \"$text\" in *boom*) echo 'synthetic failure' >&2; exit 1;;"
        " esac\n"
        f"printf '%s\\n' '{FAKE_IPA_RAW}'\n")
    script.chmod(script.stat().st_mode | stat.S_IXUSR)
    monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}"
                               f"{os.environ.get('PATH', '')}")
    return str(tmp_path)


def test_fake_binary_is_discovered_and_parsed(fake_espeak):
    be = EspeakBackend("en-us")
    assert be._bin == os.path.join(fake_espeak, "espeak-ng")
    ipa = be.phonemize("hello world")
    # the --ipa=3 "_" in-word separator must be stripped entirely (a space
    # would read as the space symbol and erase word boundaries)
    assert "_" not in ipa
    assert ipa == FAKE_IPA_RAW.replace("_", "")
    assert " " in ipa  # word boundary survives


def test_flag_contract_is_exactly_what_the_fake_validates(fake_espeak):
    # the fixture exits 64 unless called with -q --ipa=3 -v <lang> <text>;
    # a passing phonemize proves the subprocess arg layout
    assert EspeakBackend("de").phonemize("hallo") != ""


def test_nonzero_exit_propagates(fake_espeak):
    with pytest.raises(subprocess.CalledProcessError):
        EspeakBackend("en-us").phonemize("boom now")


def test_auto_selection_prefers_espeak_when_present(fake_espeak):
    be = default_g2p_backend("en-us")
    assert isinstance(be, EspeakBackend)


def test_checkpoint_meta_pinning_builds_espeak(fake_espeak):
    # checkpoint meta records the training-time backend class name; the
    # pin must reconstruct it (text/__init__.py default_g2p_backend prefer=)
    be = default_g2p_backend("en-us", prefer="EspeakBackend")
    assert isinstance(be, EspeakBackend)


def test_pin_falls_through_loudly_when_espeak_missing(tmp_path, monkeypatch,
                                                      caplog):
    # PATH with no espeak at all: the pin cannot be honored -> auto chain
    # (bundled CMUDict) + warning that the phoneme stream will differ
    monkeypatch.setenv("PATH", str(tmp_path))
    import logging

    with caplog.at_level(logging.WARNING):
        be = default_g2p_backend("en-us", prefer="EspeakBackend")
    assert isinstance(be, (CMUDictBackend, RuleG2PBackend))
    assert any("DIFFER" in r.message for r in caplog.records)


def test_phoneme_sequence_roundtrip_through_fake_espeak(fake_espeak):
    be = default_g2p_backend("en-us")
    ids = phoneme_to_sequence("hello world", ["basic_cleaners"], backend=be)
    assert len(ids) > 0
    rt = sequence_to_phoneme(ids)
    # every emitted symbol that exists in the phoneme table roundtrips;
    # the stream came from the subprocess, not a Python fallback
    assert "l" in rt and " " in rt
