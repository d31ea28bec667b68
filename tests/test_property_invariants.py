"""Hypothesis property tests for the tokenizer's structural
invariants (SURVEY.md §5.4) — shrinking fuzz that complements the
differential campaigns (which need the compiled reference binary):

* reconstruction: raw event texts tile the document byte-for-byte
  (`t/offset.t:23-49`, `t/filter.t` identity);
* offset tiling: offset == running sum of lengths, and
  `doc[offset:offset+length] == text` per event;
* determinism: tokenize is a pure function of (doc, cfg).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from html_parser_spark.config import ParserConfig
from html_parser_spark.functions import project
from html_parser_spark.functions.tokenizer import tokenize

# markup-ish alphabet plus arbitrary unicode — biased toward the
# delimiters that drive the FSM
_soup = st.text(
    alphabet=st.one_of(
        st.sampled_from(list("<>&;=\"'`!-#[]/?abAB \t\nå ")),
        st.characters(max_codepoint=0x2FFF),
    ),
    max_size=200,
)

_configs = st.sampled_from([
    ParserConfig(),
    ParserConfig(unbroken_text=True),
    ParserConfig(strict_comment=True, strict_names=True),
    ParserConfig(xml_mode=True),
    ParserConfig(marked_sections=True),
    ParserConfig(empty_element_tags=True, backquote=True),
])


@settings(max_examples=300, deadline=None)
@given(doc=_soup, cfg=_configs)
def test_events_tile_document(doc: str, cfg: ParserConfig):
    rows = tokenize(doc, cfg)
    pos = 0
    parts = []
    for row in rows:
        p = project.project(doc, row, cfg)
        assert p["offset"] == pos
        assert p["length"] == len(p["text"])
        assert p["offset_end"] == pos + p["length"]
        # flushed unbroken-text rows may concatenate non-adjacent
        # spans only when events in between were filtered — with no
        # filters configured the slice must match exactly
        assert doc[pos:pos + p["length"]] == p["text"]
        pos += p["length"]
        parts.append(p["text"])
    assert pos == len(doc)
    assert "".join(parts) == doc


@settings(max_examples=150, deadline=None)
@given(doc=_soup, cfg=_configs)
def test_tokenize_deterministic(doc: str, cfg: ParserConfig):
    assert tokenize(doc, cfg) == tokenize(doc, cfg)


@settings(max_examples=150, deadline=None)
@given(doc=_soup)
def test_filtered_reconstruction_with_skipped_text(doc: str):
    """With only start events reported and skipped_text tracked,
    interleaving each reported event's accumulated skipped text with
    its raw source reconstructs the document
    (t/marked-sect.t:102-110 / t/skipped-text.t pattern)."""
    cfg = ParserConfig(track_skipped_text=True,
                       reported_events=("start",))
    doc2 = doc + "<sentinel>"
    rows = tokenize(doc2, cfg)
    if not rows or rows[-1][0] != "start" or \
            project.tagname(doc2, rows[-1], cfg) != "sentinel":
        return  # doc swallowed the sentinel (open literal/tag/comment)
    rebuilt = "".join(
        (r[8] or "") + project.raw_text(doc2, r) for r in rows)
    assert rebuilt == doc2


# ------------------------------------------------- binary parsers

@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=400))
def test_pdf_parser_never_raises(payload: bytes):
    """extract_pdf_text_bytes is total: arbitrary bytes (including
    truncated obj/stream/xref structures) never raise."""
    from html_parser_spark.operators.pdf import extract_pdf_text_bytes

    n_pages, text = extract_pdf_text_bytes(payload)
    assert n_pages >= 0 and isinstance(text, str)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=300))
def test_pdf_content_machine_never_raises(stream: bytes):
    """The content-stream text machine is total over arbitrary bytes
    (unterminated strings, dangling escapes, half dicts...)."""
    from html_parser_spark.operators.pdf import _content_text

    assert isinstance(_content_text(stream), str)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=200))
def test_image_header_parser_never_raises(payload: bytes):
    from html_parser_spark.operators.media import parse_image_header

    fmt, w, h = parse_image_header(payload)
    assert fmt in ("png", "jpeg", "gif", "webp", "tiff", "unknown")


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=300))
def test_png_pixel_decoder_never_raises(payload: bytes):
    """decode_png_pixels is total — corrupt signatures, chunk lengths
    past EOF, broken zlib all yield the (None,)*5 row, no exception."""
    from html_parser_spark.operators.media import decode_png_pixels

    out = decode_png_pixels(payload)
    assert len(out) == 5


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_content_blocks_kernel_never_raises(doc: str):
    """The block segmentation kernel is total over arbitrary tag
    soup; every emitted block is non-empty and already collapsed
    (idempotent under collapse_ws — Perl \\s semantics, which is
    narrower than str.strip's Unicode whitespace)."""
    from html_parser_spark.functions.assemble import collapse_ws
    from html_parser_spark.operators.content import (
        _blocks, CONTENT_CONFIG)

    for txt, n_words, ld, keep in _blocks(doc, CONTENT_CONFIG, 3, 0.5):
        assert txt and txt == collapse_ws(txt)
        assert n_words >= 1
        assert 0.0 <= ld <= 1.0


#: table-ish soup: the delimiters plus the tags the walk dispatches
#: on, concatenated token-wise so real (and broken) table structures
#: appear often
_table_soup = st.lists(
    st.one_of(
        st.sampled_from(list("<>&;=\"' /!-")),
        st.sampled_from(["table", "tr", "td", "th", "/table", "/tr",
                         "/td", "colspan", "rowspan", "1", "99",
                         "x", "script"]),
        st.text(st.characters(max_codepoint=0x2FF), max_size=4),
    ),
    max_size=80,
).map("".join)


@settings(max_examples=300, deadline=None)
@given(doc=_table_soup)
def test_table_walker_never_raises(doc: str):
    """_table_cells is total over arbitrary tag soup, and its output
    is structurally well-formed: dense document-order cell numbering
    per (table, row), spans >= 1, and grid_col >= cell_seq (each
    earlier cell occupies at least one column)."""
    from html_parser_spark.operators.content import (
        _table_cells, CONTENT_CONFIG)

    seen: dict = {}
    for (tab, row, cell, is_th, cs, rs, gc, txt) in _table_cells(
            doc, CONTENT_CONFIG):
        assert tab >= 0 and row >= 0 and cell >= 0
        assert cs >= 1 and rs >= 1 and gc >= cell
        assert isinstance(txt, str) and isinstance(is_th, bool)
        k = (tab, row)
        assert cell == seen.get(k, -1) + 1
        seen[k] = cell


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_round5_binary_parsers_never_raise(payload: bytes):
    """Every round-5 container parser is total over arbitrary bytes:
    corrupt sizes, torn records, hostile counts all degrade to empty
    or NULL results, never an exception — the executor-safety
    contract of the whole decode tier."""
    from html_parser_spark.operators.audio import (
        decode_wav_stats_bytes, parse_flac_meta, parse_mp3_meta)
    from html_parser_spark.operators.media import (
        decode_gif_pixels, decode_jpeg_pixels, parse_jpeg_orientation)
    from html_parser_spark.operators.video import parse_mp4
    from html_parser_spark.sources.tarshard import parse_tar
    from html_parser_spark.sources.warc import parse_warc, split_http

    assert len(parse_mp3_meta(payload)) == 5
    assert len(parse_flac_meta(payload)) == 5
    assert len(decode_wav_stats_bytes(payload)) == 5
    assert len(decode_gif_pixels(payload)) == 5
    assert len(decode_jpeg_pixels(payload)) == 5
    assert parse_jpeg_orientation(payload) is None \
        or isinstance(parse_jpeg_orientation(payload), int)
    m = parse_mp4(payload)
    assert m is None or isinstance(m, dict)
    assert isinstance(parse_tar(payload), list)
    assert isinstance(parse_warc(payload), list)
    assert len(split_http(payload)) == 3


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_round5_seeded_container_mutations_never_raise(tail: bytes):
    """Adversarial variant: take REAL fixture containers and replace
    their tails with arbitrary bytes, so parsers get past the
    signature checks into the deep structural code before hitting
    garbage."""
    from html_parser_spark.operators.audio import (
        parse_flac_meta, parse_mp3_meta)
    from html_parser_spark.operators.audio import _synth_flac, _synth_mp3
    from html_parser_spark.operators.media import (
        _synth_gif_full, decode_gif_pixels)
    from html_parser_spark.operators.video import (
        _synth_fmp4, _synth_mp4_full, parse_mp4)
    from html_parser_spark.sources.tarshard import _synth_tar, parse_tar
    from html_parser_spark.sources.warc import _synth_warc_bytes, parse_warc

    for base, fn in (
            (_synth_mp4_full(1), parse_mp4),
            (_synth_fmp4(2), parse_mp4),
            (_synth_tar(0), parse_tar),
            (_synth_warc_bytes(0, "<p>x</p>"), parse_warc),
            (_synth_gif_full(0), decode_gif_pixels),
            (_synth_mp3(0), parse_mp3_meta),
            (_synth_flac(0), parse_flac_meta)):
        keep = max(8, len(base) // 2)
        fn(base[:keep] + tail)  # must not raise
