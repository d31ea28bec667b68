"""Event filters, skipped_text and unbroken_text interplay:
t/skipped-text.t, t/ignore.t, t/marked-sect.t, t/unbroken-text.t."""

from __future__ import annotations

from html_parser_spark.config import ParserConfig
from html_parser_spark.functions import project
from html_parser_spark.functions.tokenizer import tokenize
from tests.helpers import events


def test_skipped_text_report_tags():
    """t/skipped-text.t:6-32: report_tags('a') with start +
    end_document handlers."""
    doc = (
        "<title>hi</title>\n"
        '<h1><a href="foo">link</a></h1>\n'
        'and <a foo="">some</a> text.\n'
    )
    cfg = ParserConfig(
        report_tags=("a",),
        reported_events=("start", "end_document"),
        track_skipped_text=True,
    )
    out = []
    for e in events(doc, cfg, emit_document_events=True):
        if e["event"] == "start":
            out.append(e["skipped_text"])
            out.append(e["text"].upper())
        elif e["event"] == "end_document":
            out.append(e["skipped_text"])
    assert "".join(out) == (
        "<title>hi</title>\n"
        '<h1><A HREF="FOO">link</a></h1>\n'
        'and <A FOO="">some</a> text.\n'
    )


def test_skipped_text_comment_stripper():
    """t/skipped-text.t:34-54: '' comment handler drops comments from
    skipped_text -> end_document's skipped_text reconstructs the doc
    minus comments."""
    doc = "<html>text</html>\n<!-- comment -->\nand some more <b>text</b>.\n"
    expected = doc.replace("<!-- comment -->", "", 1)
    cfg = ParserConfig(
        reported_events=("end_document",),
        false_handler_events=("comment",),
        track_skipped_text=True,
    )
    evs = events(doc, cfg, emit_document_events=True)
    assert evs[-1]["event"] == "end_document"
    assert evs[-1]["skipped_text"] == expected


def test_skipped_text_unbroken_interaction():
    """t/skipped-text.t:56-73."""
    doc = "a a<a>b b</a>c c<x>d d</x>e"
    cfg = ParserConfig(
        unbroken_text=True,
        reported_events=("text", "end_document"),
        false_handler_events=("end",),
        track_skipped_text=True,
    )
    out = []
    for e in events(doc, cfg, emit_document_events=True):
        if e["event"] == "text":
            out += ["X", e["skipped_text"], e["text"]]
        elif e["event"] == "end_document":
            out += ["Y", e["skipped_text"]]
    assert ":".join(out) == "X::a a:X:<a>:b bc c:X:<x>:d de:Y:"


def test_ignore_tags_skipped():
    """t/skipped-text.t:76-89 (minus the chunking aspect)."""
    doc = "Ā<foo>plain<bar>"
    cfg = ParserConfig(
        ignore_tags=("foo",),
        reported_events=("start",),
        track_skipped_text=True,
    )
    evs = [e for e in events(doc, cfg) if e["event"] == "start"]
    assert evs[0]["skipped_text"] == "Ā<foo>plain"


def test_ignore_elements_nesting():
    """ignore_elements tracks nested same-tag depth (hparser.c:239-259)."""
    # script is a literal element: its content is cdata, so the inner
    # <script> emits no start event; the first </script> both ends
    # literal mode and clears the ignore (Parser.pm:592-595)
    doc = "a<script>x<script>y</script>z</script>b<style>c</style>d"
    cfg = ParserConfig(ignore_elements=("script", "style"))
    got = [(e["event"], e["text"]) for e in events(doc, cfg)]
    assert got == [
        ("text", "a"), ("text", "z"), ("text", "b"), ("text", "d")
    ]
    # plain (non-literal) tags do track nesting depth
    doc = "a<div>x<div>y</div>z</div>b"
    cfg = ParserConfig(ignore_elements=("div",))
    got = [(e["event"], e["text"]) for e in events(doc, cfg)]
    assert got == [("text", "a"), ("text", "b")]


def test_ignore_unbalanced_at_eof():
    doc = "a<div>x"
    cfg = ParserConfig(ignore_elements=("div",))
    got = [(e["event"], e["text"]) for e in events(doc, cfg)]
    assert got == [("text", "a")]


def test_unbroken_text_coalesce():
    """t/unbroken-text.t semantics: consecutive text runs merge; the
    merged event carries the offset/line/column of its first segment."""
    doc = "abc\ndef<b>x</b>ghi"
    cfg = ParserConfig(unbroken_text=True, reported_events=("text",))
    rows = tokenize(doc, cfg)
    texts = [
        (project.raw_text(doc, r), r[5], r[6], r[7])
        for r in rows if r[0] == "text"
    ]
    # '<b>','</b>' unreported but text around them does NOT merge
    # across... actually with no skipped tracking they merge silently
    assert texts == [("abc\ndefxghi", 0, 1, 0)]

    cfg = ParserConfig(unbroken_text=True)
    rows = tokenize(doc, cfg)
    texts = [(project.raw_text(doc, r), r[5]) for r in rows
             if r[0] == "text"]
    assert texts == [("abc\ndef", 0), ("x", 10), ("ghi", 15)]


def test_marked_sections_basic():
    """t/marked-sect.t:21-58."""
    cfg = ParserConfig(marked_sections=True)

    def dtext_of(doc):
        return "".join(
            e["dtext"] for e in events(doc, cfg) if e["event"] == "text"
        )

    assert dtext_of("<![[foo]]>") == "foo"
    assert dtext_of("<![TEMP INCLUDE[bar]]>") == "bar"
    assert dtext_of(
        "<![ INCLUDE -- IGNORE -- [foo<![IGNORE[bar]]>]]>\n<br>"
    ) == "foo\n"
    assert dtext_of(
        "<![  CDATA   [&lt;foo<![IGNORE[bar]]>,bar&gt;]]><br>"
    ) == "&lt;foo<![IGNORE[bar,bar>]]>"
    assert dtext_of(
        "<![ RCDATA [&aring;<a>]]><![CDATA[&aring;<a>]]>&aring;<a><br>"
    ) == "\xe5<a>&aring;<a>\xe5"
    assert dtext_of(
        "<![INCLUDE RCDATA CDATA IGNORE [foo&aring;<a>]]><br>"
    ) == ""
    assert dtext_of(
        "<![INCLUDE RCDATA CDATA [foo&aring;<a>]]><br>"
    ) == "foo&aring;<a>"
    assert dtext_of("<![INCLUDE RCDATA [foo&aring;<a>]]><br>") == (
        "foo\xe5<a>"
    )
    assert dtext_of("<![INCLUDE [foo&aring;<a>]]><br>") == "foo\xe5"
    assert dtext_of("<![[foo&aring;<a>]]><br>") == "foo\xe5"
    assert dtext_of("<![CDATA[foo [1]]]>") == "foo [1]"


def test_marked_sections_offsets():
    """t/marked-sect.t:60-100: line.column:offset golden."""
    doc = (
        "<title>Test</title>\n"
        "<![CDATA\n"
        "  [foo&aring;<a>\n"
        "]]>\n"
        "<![[\n"
        "INCLUDE\n"
        "STUFF\n"
        "]]>\n"
        "  <h1>Test</h1>\n"
    )
    cfg = ParserConfig(marked_sections=True)
    got = []
    for e in events(doc, cfg, emit_document_events=True):
        txt = e["text"].replace("\n", "\\n").replace(" ", ".")
        got.append(
            "%d.%d:%d %s \"%s\"" % (
                e["line"], e["column"], e["offset"], e["event"], txt
            )
        )
    assert got == [
        '1.0:0 start_document ""',
        '1.0:0 start "<title>"',
        '1.7:7 text "Test"',
        '1.11:11 end "</title>"',
        '1.19:19 text "\\n"',
        '3.3:32 text "foo&aring;<a>\\n"',
        '4.3:49 text "\\n"',
        '5.4:54 text "\\nINCLUDE\\nSTUFF\\n"',
        '8.3:72 text "\\n.."',
        '9.2:75 start "<h1>"',
        '9.6:79 text "Test"',
        '9.10:83 end "</h1>"',
        '9.15:88 text "\\n"',
        '10.0:89 end_document ""',
    ]


def test_marked_section_reconstruction():
    """t/marked-sect.t:102-110: skipped_text+text reconstructs doc."""
    doc = "<Tag><![CDATA[This is cdata]]></Tag>"
    cfg = ParserConfig(marked_sections=True, track_skipped_text=True)
    evs = events(doc, cfg, emit_document_events=True)
    assert "".join((e["skipped_text"] or "") + e["text"] for e in evs) == doc
