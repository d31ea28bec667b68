"""Structural invariants from the reference suite:

* t/offset.t:23-49 -- reported events exactly tile the document:
  offset == running sum, offset_end == offset+length,
  doc[offset:offset+length] == text.
* t/filter.t -- identity reconstruction from raw event text.
* t/crashme.t -- random byte soup must not crash or hang and must
  still tile the document.
"""

from __future__ import annotations

import random

import pytest

from html_parser_spark.config import ParserConfig
from tests.helpers import events

OFFSET_DOC = (
    "\n"
    '<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01//EN"\n'
    ' "http://www.w3.org/TR/html40/strict.dtd">\n'
    "\n"
    "<foo bar baz=3>heisan\n"
    "</foo> <?process>\n"
    "<!-- comment -->\n"
    "<xmp>xmp</xmp>\n"
    "\n"
)


def assert_tiles(doc, cfg=None, **kw):
    cfg = cfg or ParserConfig(**kw)
    sum_len = 0
    n = 0
    for e in events(doc, cfg, emit_document_events=True):
        assert e["offset"] == sum_len, (e, sum_len)
        assert e["offset_end"] == e["offset"] + e["length"]
        assert e["length"] == len(e["text"])
        assert doc[e["offset"]:e["offset"] + e["length"]] == e["text"]
        sum_len += e["length"]
        n += 1
    assert sum_len == len(doc)
    return n


def test_offset_tiling():
    assert assert_tiles(OFFSET_DOC) > 5


def test_offset_tiling_variants():
    docs = [
        "plain text only",
        "<a href=x>t</a>",
        "a<script>s</script>b<xmp>x",
        "<title>unterminated title",
        "<!-- unterminated comment",
        "2 <a href=foo",
        "<plaintext>never ends",
        "x]]>y",
        "<?pi",
        "<",
        "<a",
        "",
        "<![CDATA[x]]>",
    ]
    for doc in docs:
        assert_tiles(doc)
        assert_tiles(doc, strict_comment=True)
        assert_tiles(doc, xml_mode=True)
        # marked-section delimiters are internal E_NONE events, so the
        # tiling invariant holds via skipped_text reconstruction there
        cfg = ParserConfig(marked_sections=True, track_skipped_text=True)
        evs = events(doc, cfg, emit_document_events=True)
        assert "".join(
            (e["skipped_text"] or "") + e["text"] for e in evs
        ) == doc


def test_identity_reconstruction():
    """t/filter.t: concatenated raw text of all events == document
    (no filters, no unbroken_text)."""
    doc = OFFSET_DOC + "<a x='1' y z=\"2\">&amp;<![CDATA[raw]]></a>"
    text = "".join(e["text"] for e in events(doc, ParserConfig()))
    assert text == doc


def test_skipped_reconstruction_with_filters():
    """t/marked-sect.t:102-110 style: skipped_text + text rebuilds the
    document even when events are filtered."""
    doc = (
        "<h1>x</h1><script>js</script><p>para</p>"
        "<!-- c --><b>bold</b> tail"
    )
    cfg = ParserConfig(
        ignore_elements=("script",),
        ignore_tags=("b",),
        track_skipped_text=True,
    )
    evs = events(doc, cfg, emit_document_events=True)
    assert "".join((e["skipped_text"] or "") + e["text"] for e in evs) == doc


@pytest.mark.parametrize("seed", [42, 1, 7])
def test_crashme(seed):
    """t/crashme.t:14-30: parse random bytes with '<&>' oversampled."""
    rng = random.Random(seed)
    pool = "<>&;\"'=! \n\t-ABCabc019[]/?#xX"
    doc = "".join(rng.choice(pool) for _ in range(20000))
    for kw in ({}, {"strict_comment": True}, {"xml_mode": True},
               {"marked_sections": True},
               {"unbroken_text": True, "track_skipped_text": True}):
        cfg = ParserConfig(**kw)
        evs = events(doc, cfg, emit_document_events=True)
        assert evs[-1]["event"] == "end_document"
        if not kw:
            assert_tiles(doc, cfg)


def test_unicode_char_offsets():
    """t/unicode.t essence: offsets are in characters, not bytes."""
    doc = "å<b>ø</b>€"
    got = [(e["event"], e["offset"], e["length"])
           for e in events(doc, ParserConfig())]
    assert got == [
        ("text", 0, 1), ("start", 1, 3), ("text", 4, 1),
        ("end", 5, 4), ("text", 9, 1),
    ]
