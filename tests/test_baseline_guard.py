"""Pin the BASELINE.md refresh guard (round-7 verdict What's-wrong #1).

The round-7 freeze destroyed BASELINE.md via a self-matching sed refresh
(6.8 KB -> 6.7 MB of duplicated paragraphs).  scripts/refresh_baseline.py is
the replacement: marker-delimited span replacement (idempotent) plus a
freeze-time sanity check.  These tests pin both halves.
"""
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SCRIPT = REPO / "scripts" / "refresh_baseline.py"


def run(*args):
    return subprocess.run([sys.executable, str(SCRIPT), *args], capture_output=True, text=True)


def test_committed_baseline_passes_guard():
    res = run("--check")
    assert res.returncode == 0, res.stderr
    assert "one measured block" in res.stdout


def test_refresh_is_idempotent(tmp_path):
    work = tmp_path / "BASELINE.md"
    work.write_bytes((REPO / "BASELINE.md").read_bytes())
    block = tmp_path / "block.md"
    block.write_text("## Measured results (round N)\nfresh numbers\n")
    assert run("--refresh", str(block), "--file", str(work)).returncode == 0
    once = work.read_bytes()
    assert run("--refresh", str(block), "--file", str(work)).returncode == 0
    assert work.read_bytes() == once


def test_guard_rejects_duplicated_measured_sections(tmp_path):
    work = tmp_path / "BASELINE.md"
    text = (REPO / "BASELINE.md").read_text()
    # simulate the round-7 failure mode: the measured heading re-inserted
    work.write_text(text + "\n## Measured results (dup)\n")
    res = run("--check", "--file", str(work))
    assert res.returncode == 1
    assert "Measured results" in res.stderr


def test_guard_rejects_oversize(tmp_path):
    work = tmp_path / "BASELINE.md"
    work.write_text((REPO / "BASELINE.md").read_text() + "x" * (70 * 1024))
    res = run("--check", "--file", str(work))
    assert res.returncode == 1
    assert "bytes" in res.stderr


def test_guard_rejects_missing_anchor_prefix(tmp_path):
    work = tmp_path / "BASELINE.md"
    text = (REPO / "BASELINE.md").read_text()
    begin = text.index("<!-- measured:begin -->")
    work.write_text("# BASELINE\n(gutted)\n" + text[begin:])
    res = run("--check", "--file", str(work))
    assert res.returncode == 1
    assert "anchor" in res.stderr


def test_refresh_refuses_marker_bearing_block(tmp_path):
    work = tmp_path / "BASELINE.md"
    work.write_bytes((REPO / "BASELINE.md").read_bytes())
    block = tmp_path / "block.md"
    block.write_text("## Measured results\n<!-- measured:begin -->\n")
    res = run("--refresh", str(block), "--file", str(work))
    assert res.returncode != 0
