"""Differential test against the REAL reference parser, when a built
copy is available (see scripts/ref_diff.py for build steps).

The driver environment has perl + a C toolchain, so
`cp -r /root/reference /tmp/refbuild && cd /tmp/refbuild &&
perl Makefile.PL && make` produces the genuine compiled HTML-Parser;
this test then requires byte-identical event streams on a randomized
corpus across option configurations. Skips cleanly when the build or
perl is absent.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BLIB = os.environ.get("REF_BLIB", "/tmp/refbuild/blib")

have_ref = (
    shutil.which("perl") is not None
    and os.path.exists(os.path.join(BLIB, "arch", "auto", "HTML",
                                    "Parser", "Parser.so"))
)


@pytest.mark.skipif(not have_ref, reason="built reference not present")
def test_event_streams_match_reference():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "ref_diff.py"),
         "1500"],
        capture_output=True, text=True, timeout=500)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "(0 diffs)" in out.stdout, out.stdout


@pytest.mark.skipif(not have_ref, reason="built reference not present")
def test_extraction_traces_match_reference_tokeparser():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "toke_diff.py"),
         "1000"],
        capture_output=True, text=True, timeout=500)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "(0 diffs)" in out.stdout, out.stdout


@pytest.mark.skipif(not have_ref, reason="built reference not present")
def test_headparser_linkextor_match_reference():
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "headlink_diff.py"), "1000"],
        capture_output=True, text=True, timeout=500)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "headers: 1000/1000" in out.stdout, out.stdout
    assert "links: 1000/1000" in out.stdout, out.stdout


@pytest.mark.skipif(not have_ref, reason="built reference not present")
def test_entity_codec_matches_reference():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "ent_diff.py"),
         "5000"],
        capture_output=True, text=True, timeout=500)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "decode diffs: 0/" in out.stdout, out.stdout
    assert "encode diffs: 0/" in out.stdout, out.stdout
