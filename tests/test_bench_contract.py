"""bench.py output-contract tests (VERDICT r3 next #1/#8).

Round 3's driver-recorded number was lost to an unbounded error field in
the ONE JSON line. These tests pin the contract: error fields are short
and ANSI-free, the emitted line is bounded and parseable, the exit code
reflects section errors, and the watchdog converts a wedged section into
a partial-but-parseable line within its poll interval.
"""

import json
import subprocess
import sys

import pytest

import bench


def test_short_err_strips_ansi_and_truncates(capsys):
    e = RuntimeError("\x1b[31mboom\x1b[0m " + "x" * 5000)
    try:
        raise e
    except RuntimeError as exc:
        msg = bench._short_err(exc)
    assert "\x1b" not in msg
    assert len(msg) <= 200
    assert msg.startswith("RuntimeError: boom")


def test_emit_clamps_strings_and_line_length(capsys):
    result = {"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 0.0,
              "extra": {"huge_error": "\x1b[2m" + "y" * 9000,
                        "big_blob": ["z" * 500] * 30,
                        "keep": 42}}
    with pytest.raises(SystemExit) as ex:
        bench._emit(result)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(line) <= 6000
    d = json.loads(line)
    assert "\x1b" not in line
    # an *_error key present -> nonzero exit (driver records the line either
    # way; the rc flags the failure instead of rc=0 hiding it)
    assert ex.value.code == 2


def test_emit_exit_zero_without_errors(capsys):
    with pytest.raises(SystemExit) as ex:
        bench._emit({"metric": "m", "value": 1.0, "unit": "u",
                     "vs_baseline": 0.0, "extra": {"ok_metric": 3}})
    assert ex.value.code == 0
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["extra"]["ok_metric"] == 3


@pytest.mark.slow
def test_watchdog_kills_wedged_section_with_parseable_line():
    code = (
        "import time, sys\n"
        f"sys.path.insert(0, {json.dumps(sys.path[0] or '.')})\n"
        "import bench\n"
        "w = bench._Watchdog()\n"
        "w.set_partial({'metric': 'm', 'value': 1.0, 'unit': 'u',\n"
        "               'vs_baseline': 0.0, 'extra': {}})\n"
        "w.begin('stuck_section', 6)\n"
        "time.sleep(60)\n")
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=60, cwd=bench.os.path.dirname(
                           bench.os.path.abspath(bench.__file__)))
    assert p.returncode == 3
    d = json.loads(p.stdout.strip().splitlines()[-1])
    assert d["extra"]["stuck_section_error"].startswith("section exceeded")
    assert d["extra"]["bench_sections"] == {"stuck_section": "running"}
