"""Tag-soup tokenizer goldens transcribed from the reference test
corpus: t/cases.t:49-88, t/comment.t, t/msie-compat.t, t/declaration.t,
t/xml-mode.t, t/plaintext.t, t/textarea.t, t/script.t."""

from __future__ import annotations

import pytest

from html_parser_spark.config import ParserConfig
from tests.helpers import events

STRICT = ParserConfig(strict_comment=True)


def summarize(doc, cfg=STRICT):
    """Render events the way t/cases.t's handlers do."""
    out = []
    for e in events(doc, cfg):
        ev = e["event"]
        if ev == "start":
            out.append("START[%s]" % e["tagname"])
            for k in sorted(e["attr"]):
                out.append("\t%s: %s" % (k, e["attr"][k]))
        elif ev == "end":
            out.append("END[%s]" % e["tagname"])
        elif ev == "text":
            out.append("TEXT[%s]" % e["text"])
        elif ev == "comment":
            for tok in e["tokens"] or []:
                out.append("COMMENT[%s]" % tok)
        elif ev == "declaration":
            out.append("DECLARATION[%s]" % e["text"][2:-1])
    return out


# (html, expected) pairs from t/cases.t:49-88
CASES = [
    ('<a ">', ["START[a]", '\t": "']),
    ("<a/>", ["START[a/]"]),
    ("<a />", ["START[a]", "\t/: /"]),
    ("<a a/>", ["START[a]", "\ta/: a/"]),
    ("<a a/=/>", ["START[a]", "\ta/: /"]),
    ('<a x="foo&nbsp;bar">', ["START[a]", "\tx: foo\xa0bar"]),
    ('<a x="foo&nbspbar">', ["START[a]", "\tx: foo&nbspbar"]),
    ("<€ >", ["TEXT[<€]", "TEXT[ >]"]),
    ("2 < 5", ["TEXT[2 ]", "TEXT[<]", "TEXT[ 5]"]),
    ("2 <5> 2", ["TEXT[2 ]", "TEXT[<5>]", "TEXT[ 2]"]),
    ("2 <a", ["TEXT[2 ]", "TEXT[<a]"]),
    ("2 <a> 2", ["TEXT[2 ]", "START[a]", "TEXT[ 2]"]),
    ("2 <a href=foo", ["TEXT[2 ]", "TEXT[<a href=foo]"]),
    ("2 <a href='foo bar'> 2",
     ["TEXT[2 ]", "START[a]", "\thref: foo bar", "TEXT[ 2]"]),
    ("2 <a href=foo bar> 2",
     ["TEXT[2 ]", "START[a]", "\tbar: bar", "\thref: foo", "TEXT[ 2]"]),
    ('2 <a href="foo bar"> 2',
     ["TEXT[2 ]", "START[a]", "\thref: foo bar", "TEXT[ 2]"]),
    ('2 <a href="foo\'bar"> 2',
     ["TEXT[2 ]", "START[a]", "\thref: foo'bar", "TEXT[ 2]"]),
    ("2 <a href='foo\"bar'> 2",
     ["TEXT[2 ]", "START[a]", '\thref: foo"bar', "TEXT[ 2]"]),
    ("2 <a href='foo&quot;bar'> 2",
     ["TEXT[2 ]", "START[a]", '\thref: foo"bar', "TEXT[ 2]"]),
    ("2 <a.b> 2", ["TEXT[2 ]", "START[a.b]", "TEXT[ 2]"]),
    ("2 <a.b-12 a.b = 2 a> 2",
     ["TEXT[2 ]", "START[a.b-12]", "\ta: a", "\ta.b: 2", "TEXT[ 2]"]),
    ("2 <a_b> 2", ["TEXT[2 ]", "START[a_b]", "TEXT[ 2]"]),
    ('<!ENTITY nbsp   CDATA "&#160;" -- no-break space -->',
     ['DECLARATION[ENTITY nbsp   CDATA "&#160;" -- no-break space --]']),
    ("<!-- comment -->", ["COMMENT[ comment ]"]),
    ("<!-- comment -- --- comment -->",
     ["COMMENT[ comment ]", "COMMENT[- comment ]"]),
    ("<!-- comment <!-- not comment --> comment -->",
     ["COMMENT[ comment <!]", "COMMENT[> comment ]"]),
    ('<!-- <a href="foo"> -->', ['COMMENT[ <a href="foo"> ]']),
]


@pytest.mark.parametrize("html,expected", CASES, ids=range(len(CASES)))
def test_cases(html, expected):
    assert summarize(html) == expected


def test_comment_stream():
    """t/comment.t: the 19-case comment golden (fed here as one doc,
    which the chunking-invariance contract makes equivalent)."""
    doc = (
        "<foo><><!><!-><!--><!---><!----><!-----><!------>"
        "<!--+--\n\n>"
        "<!a'b>"
        "<!--foo--->"
        "<!--foo---->"
        "<!--foo----->-->"
        "<foo>"
        "<!3453><!-3456><!FOO><>"
    )
    cfg = ParserConfig()
    out = []
    for e in events(doc, cfg, emit_document_events=True):
        if e["event"] == "comment":
            out.append(e["token0"] if e["tokens"] else "")
        else:
            out.append("%s[%s]" % (e["event"], e["text"]))
    assert ":".join(out) == (
        "start_document[]:start[<foo>]:text[<>]::-:><!-::-:--:+:a'b:"
        "foo-:foo--:foo---:text[-->]:start[<foo>]:3453:-3456:FOO:"
        "text[<>]:end_document[]"
    )


def test_msie_compat():
    """t/msie-compat.t:25-48."""
    doc = (
        "<a>"
        "</a f>"
        "</a 'foo<>' 'bar>' x>"
        '</a "foo<>" "bar>" x>'
        "</ foo bar>"
        '</ "<>" >'
        "<!--comment>text<!--comment><p"
    )
    got = [
        (e["event"], e["tagname"], e["text"])
        for e in events(doc, ParserConfig())
    ]
    assert got == [
        ("start", "a", "<a>"),
        ("end", "a", "</a f>"),
        ("end", "a", "</a 'foo<>' 'bar>' x>"),
        ("end", "a", '</a "foo<>" "bar>" x>'),
        ("comment", " foo bar", "</ foo bar>"),
        ("comment", ' "<>" ', '</ "<>" >'),
        ("comment", "comment", "<!--comment>"),
        ("text", None, "text"),
        ("comment", "comment", "<!--comment>"),
        ("comment", "p", "<p"),
    ]


def test_bang_comment():
    got = [(e["event"], e["tagname"], e["text"])
           for e in events("<!comment>", ParserConfig())]
    assert got == [("comment", "comment", "<!comment>")]


def test_backquote():
    doc = "<a name=`foo bar`>"
    e = events(doc, ParserConfig())[0]
    assert e["attr"] == {"name": "`foo", "bar`": "bar`"}
    e = events(doc, ParserConfig(backquote=True))[0]
    assert e["attr"] == {"name": "foo bar"}


def test_declarations():
    """t/declaration.t."""
    doc = (
        '<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01//EN" --<comment>--\n'
        '  "http://www.w3.org/TR/html40/strict.dtd">'
    )
    e = events(doc, ParserConfig())[0]
    assert e["event"] == "declaration"
    assert e["tokens"] == [
        "DOCTYPE", "HTML", "PUBLIC", '"-//W3C//DTD HTML 4.01//EN"',
        "--<comment>--", '"http://www.w3.org/TR/html40/strict.dtd"',
    ]

    e = events('<!ENTITY foo "<!-- foo -->">', ParserConfig())[0]
    assert e["tokens"] == ["ENTITY", "foo", '"<!-- foo -->"']
    # case-insensitive declaration id
    e = events('<!Entity foo "x">', ParserConfig())[0]
    assert e["event"] == "declaration"
    assert e["tokens"] == ["Entity", "foo", '"x"']
    # unknown declaration name -> comment
    e = events("<!row --> foo", ParserConfig())[0]
    assert (e["event"], e["token0"]) == ("comment", "row --")
    # word token made of brackets after a string
    e = events(
        '<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Strict//EN"\n'
        ' "http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd"[]>',
        ParserConfig(),
    )[0]
    assert e["tokens"][-1] == "[]"


def test_xml_mode():
    """t/xml-mode.t:32-75."""
    xml = (
        '<?xml version="1.0"?>\n'
        '<?IS10744:arch name="html"?><!-- comment -->\n'
        "<DOC>\n"
        '<title html="h1">My first architectual document</title>\n'
        "<para/>\n"
        "<xmp><foo></foo></xmp>\n"
        "</DOC>\n"
    )

    def render(cfg):
        txt = []
        for e in events(xml, cfg):
            ev = e["event"]
            if ev == "start":
                s = "S[" + e["tagname"]
                for k in sorted(e["attr"]):
                    s += " %s=%s" % (k, e["attr"][k])
                txt.append(s + "]")
            elif ev == "end":
                txt.append("E[%s]" % e["tagname"])
            elif ev == "process":
                txt.append("PI[%s]" % e["token0"])
            elif ev == "text":
                txt.append(e["text"])
        return "".join(txt)

    assert render(ParserConfig(xml_mode=True)) == (
        'PI[xml version="1.0"]\n'
        'PI[IS10744:arch name="html"]\n'
        "S[DOC]\n"
        "S[title html=h1]My first architectual documentE[title]\n"
        "S[para]E[para]\n"
        "S[xmp]S[foo]E[foo]E[xmp]\n"
        "E[DOC]\n"
    )
    assert render(ParserConfig()) == (
        'PI[xml version="1.0"?]\n'
        'PI[IS10744:arch name="html"?]\n'
        "S[doc]\n"
        "S[title html=h1]My first architectual documentE[title]\n"
        "S[para/]\n"
        "S[xmp]<foo></foo>E[xmp]\n"
        "E[doc]\n"
    )


def test_empty_element_tags():
    """t/xml-mode.t:77-99: artificial end has empty text."""
    got = [
        (e["event"], e["tagname"], e["text"])
        for e in events("<Xyzzy foo=bar/>and some more",
                        ParserConfig(xml_mode=True))
    ]
    assert got[0] == ("start", "Xyzzy", "<Xyzzy foo=bar/>")
    assert got[1] == ("end", "Xyzzy", "")
    got = [
        (e["event"], e["tagname"], e["text"])
        for e in events("<Xyzzy foo=bar/>and some more",
                        ParserConfig(empty_element_tags=True))
    ]
    assert got[1] == ("end", "xyzzy", "")


def test_xml_pic():
    e = events("<?foo > bar?> and then", ParserConfig(xml_pic=True))[0]
    assert (e["text"], e["token0"]) == ("<?foo > bar?>", "foo > bar")


def test_plaintext():
    """t/plaintext.t."""
    doc = "<xmp><foo></xmp>x<plaintext><foo>\n</plaintext>\nfoo\n"
    got = [
        (e["event"], e["text"], bool(e["is_cdata"]))
        for e in events(doc, ParserConfig())
    ]
    assert got == [
        ("start", "<xmp>", False),
        ("text", "<foo>", True),
        ("end", "</xmp>", False),
        ("text", "x", False),
        ("start", "<plaintext>", False),
        ("text", "<foo>\n</plaintext>\nfoo\n", True),
    ]

    cfg = ParserConfig(closing_plaintext=True)
    doc = "<plaintext><foo>\n</plaintext>foo<b></b>\n"
    got = [(e["event"], e["text"]) for e in events(doc, cfg)]
    assert got == [
        ("start", "<plaintext>"),
        ("text", "<foo>\n"),
        ("end", "</plaintext>"),
        ("text", "foo"),
        ("start", "<b>"),
        ("end", "</b>"),
        ("text", "\n"),
    ]

    doc = "<plaintext><foo>\nfoo<b></b>\n"
    got = [(e["event"], e["text"], bool(e["is_cdata"]))
           for e in events(doc, cfg)]
    assert got == [
        ("start", "<plaintext>", False),
        ("text", "<foo>\nfoo<b></b>\n", True),
    ]


def test_textarea():
    """t/textarea.t: full event dump with text/dtext/is_cdata."""
    html = (
        "<html>\n"
        "<title>This is a <nice> title</title>\n"
        "<!--comment-->\n"
        '<script language="perl">while (<DATA>) { &amp; }</script>\n\n'
        "<FORM>\n\n"
        '<textarea name="foo" cols=50 rows=10>\n\n'
        "foo\n"
        "<foo>\n"
        "<!--comment-->\n"
        "&amp;\n"
        "foo\n"
        "</FORM>\n\n"
        "</textarea>\n\n"
        "</FORM>\n\n"
        "</html>\n"
    )

    def fmt(v):
        if v is None:
            return "<undef>"
        if v is True:
            return "1"
        if v is False:
            return ""
        return str(v).replace("\n", "\\n")

    dump = "".join(
        "|".join(fmt(e[f]) for f in ("event", "text", "dtext", "is_cdata"))
        + "\n"
        for e in events(html, ParserConfig(), emit_document_events=True)
    )
    assert dump == (
        "start_document||<undef>|<undef>\n"
        "start|<html>|<undef>|<undef>\n"
        "text|\\n|\\n|\n"
        "start|<title>|<undef>|<undef>\n"
        "text|This is a <nice> title|This is a <nice> title|\n"
        "end|</title>|<undef>|<undef>\n"
        "text|\\n|\\n|\n"
        "comment|<!--comment-->|<undef>|<undef>\n"
        "text|\\n|\\n|\n"
        'start|<script language="perl">|<undef>|<undef>\n'
        "text|while (<DATA>) { &amp; }|while (<DATA>) { &amp; }|1\n"
        "end|</script>|<undef>|<undef>\n"
        "text|\\n\\n|\\n\\n|\n"
        "start|<FORM>|<undef>|<undef>\n"
        "text|\\n\\n|\\n\\n|\n"
        'start|<textarea name="foo" cols=50 rows=10>|<undef>|<undef>\n'
        "text|\\n\\nfoo\\n<foo>\\n<!--comment-->\\n&amp;\\nfoo\\n"
        "</FORM>\\n\\n|\\n\\nfoo\\n<foo>\\n<!--comment-->\\n&\\nfoo\\n"
        "</FORM>\\n\\n|\n"
        "end|</textarea>|<undef>|<undef>\n"
        "text|\\n\\n|\\n\\n|\n"
        "end|</FORM>|<undef>|<undef>\n"
        "text|\\n\\n|\\n\\n|\n"
        "end|</html>|<undef>|<undef>\n"
        "text|\\n|\\n|\n"
        "end_document||<undef>|<undef>\n"
    )


def test_dtext():
    """t/dtext.t: entity decoding in the dtext projection."""
    doc = (
        "<title>&aring</title>\n"
        '<a href="foo&aring">&aring&aring;&#65&#65;&lt&#65&gt;&#x41&#X41;</a>\n'
        "<?&aring>\n"
        "foo&nbsp;bar\n"
        "foo&nbspbar\n"
        "&xyzzy\n"
        "&xyzzy;\n"
        "<!-- &#0; -->\n"
        "&#1;\n"
        "&#255;\n"
        "&#xFF\n"
        "&#xFFG\n"
        "<!-- &#256; -->\n"
        "&#40000000000000000000000000000;\n"
        "&#x400000000000000000000000000000000;\n"
        "&\n"
        "&#\n"
        "&#x\n"
        "<xmp>&aring</xmp>\n"
        "<script>&aring</script>\n"
        "<ScRIPT>&aring</scRIPT>\n"
        "<skript>&aring</script>\n"
    )
    evs = events(doc, ParserConfig(), emit_document_events=True)
    text = "".join(e["text"] for e in evs)
    dtext = "".join(
        (e["dtext"] if e["event"] == "text" else e["text"]) for e in evs
    )
    assert text == doc
    assert dtext == (
        "<title>\xe5</title>\n"
        '<a href="foo&aring">\xe5\xe5AA<A>AA</a>\n'
        "<?&aring>\n"
        "foo\xa0bar\n"
        "foo\xa0bar\n"
        "&xyzzy\n"
        "&xyzzy;\n"
        "<!-- &#0; -->\n"
        "\x01\n"
        "\xff\n"
        "\xff\n"
        "\xffG\n"
        "<!-- &#256; -->\n"
        "&#40000000000000000000000000000;\n"
        "&#x400000000000000000000000000000000;\n"
        "&\n"
        "&#\n"
        "&#x\n"
        "<xmp>&aring</xmp>\n"
        "<script>&aring</script>\n"
        "<ScRIPT>&aring</scRIPT>\n"
        "<skript>\xe5</script>\n"
    )


def test_script_nested_trap():
    """t/script.t: '</SCR'+'IPT>'-style content must not end the
    element early; only a real '</script' does."""
    doc = "<script>var x = '</scr' + 'ipt>';</script>"
    got = [(e["event"], e["text"]) for e in events(doc, ParserConfig())]
    # the literal scan stops at the first real '</script' match; the
    # embedded '</scr' does not match the full name
    assert got[0] == ("start", "<script>")
    assert got[1] == ("text", "var x = '</scr' + 'ipt>';")
    assert got[2] == ("end", "</script>")


def test_tag_event_type_prefixes():
    """ARG_TAG's event-type prefix string "!##/#?#" (hparser.c:424-427,
    indexed by event enum): declarations get '!'+name, comments
    '#'+content, ends '/'+name, PIs '?'+content; starts stay bare.
    All lowercased with the tagname fold. Expected values transcribed
    from the compiled reference via scripts/ref_dump.pl."""
    doc = "<!DOCTYPE html><!-- Com -->text<A>x</A><?Pi?>"
    got = [(e["event"], e["tag"], e["token0"])
           for e in events(doc, ParserConfig())]
    assert got == [
        ("declaration", "!doctype", "DOCTYPE"),
        ("comment", "# com ", " Com "),
        ("text", None, None),
        ("start", "a", "A"),
        ("text", None, None),
        ("end", "/a", "A"),
        ("process", "?pi?", "Pi?"),
    ]
