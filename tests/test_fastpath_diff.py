"""Differential tests: the regex fast path for start tags must be
byte-identical to the character FSM on arbitrary tag soup, and the
lazy-position option must not change any non-position field."""

from __future__ import annotations

import random

import pytest

from html_parser_spark.config import EXTRACT_CONFIG, ParserConfig
from html_parser_spark.functions import tokenizer as tk

PIECES = [
    "<a>", "</a>", "<a b=c>", '<a b="c d">', "<a b='c'>", "<a b>",
    "<x ", ">", "<", '"', "'", "=", " ", "text ", "&amp;",
    '<p class="x" id=y>', "</p >", '<img src=x.png alt="a b">',
    "<br/>", "<a =b>", "<a b= >", '<a b="unterminated', "`", "/",
    "\n", "\t", '<a b c=1 d e="2">', "<title>t</title>",
    "<script>x<y</script>", "<SCRIPT a=1>", "<a$ b%=^>", "\x0b",
    "]]>", "<![CDATA[x]]>", "<!-- c -->", "<!doctype html>", "<?pi?>",
    "<a b=c=d>", '<a "b"=c>', "<a/>", "<a / >", "<a b=`x`>",
    # end-tag shapes for the _FAST_END path: trailing junk, quotes,
    # MSIE skip-until-gt forms, missing name, unterminated
    "</a >", "</a\n>", "</a b>", '</a "x>y">', "</ a>", "</>",
    "</a", "</1x>", "</a=b>",
]

CFGS = [
    ParserConfig(),
    EXTRACT_CONFIG,
    ParserConfig(unbroken_text=True),
    ParserConfig(track_skipped_text=True,
                 reported_events=("text", "start", "end")),
]


def _tokenize_slow(doc: str, cfg: ParserConfig):
    orig = tk._Parser.__init__

    def patched(self, d, c, e, _o=orig):
        _o(self, d, c, e)
        self.fast_start = False

    tk._Parser.__init__ = patched
    try:
        return tk.tokenize(doc, cfg)
    finally:
        tk._Parser.__init__ = orig


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fast_path_matches_fsm_on_soup(seed):
    rng = random.Random(seed)
    for trial in range(500):
        doc = "".join(rng.choice(PIECES)
                      for _ in range(rng.randint(1, 30)))
        cfg = CFGS[trial % len(CFGS)]
        assert tk.tokenize(doc, cfg) == _tokenize_slow(doc, cfg), \
            f"fast/slow divergence on {doc!r}"


def test_fast_path_disabled_for_option_configs():
    for cfg in (ParserConfig(xml_mode=True),
                ParserConfig(strict_names=True),
                ParserConfig(backquote=True),
                ParserConfig(empty_element_tags=True)):
        em = tk._Emitter("x", cfg)
        assert not tk._Parser("x", cfg, em).fast_start


def test_track_positions_off_leaves_other_fields_identical():
    doc = ("<html><head><title>T</title></head><body>\n<p a=1>x &amp; y"
           "</p>\n<script>s<t</script><br></body></html>")
    on = tk.tokenize(doc, ParserConfig())
    off = tk.tokenize(doc, ParserConfig(track_positions=False))
    assert len(on) == len(off)
    for a, b in zip(on, off):
        assert a[:5] == b[:5]          # event, span, tokens, is_cdata
        assert a[8:] == b[8:]          # skipped, flushed text
        assert b[5:8] == (0, 1, 0)     # positions stay at init values
