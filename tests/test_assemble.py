"""Extractor goldens: t/tokeparser.t, t/headparser.t, t/linkextor-*.t."""

from __future__ import annotations

from html_parser_spark.config import TOKEPARSER_CONFIG, ParserConfig
from html_parser_spark.functions import assemble
from html_parser_spark.functions.tokenizer import tokenize

TOKE_DOC = (
    "\n"
    "<!--This is a test-->\n"
    "<html><head><title>\n"
    "  This is the &lt;title&gt;\n"
    "</title>\n"
    "\n"
    '  <base href="http://www.perl.com">\n'
    "</head>\n"
    "\n"
    '<body background="bg.gif">\n'
    "\n"
    "    <h1>This is the <b>title</b> again\n"
    "    </h1>\n"
    "\n"
    "    And this is a link to the "
    '<a href="http://www.perl.com">'
    '<img src="camel.gif" alt="Perl">&nbsp;'
    "<!--nice isn't it-->Institute</a>\n"
    "\n"
    "   <br/><? process instruction >\n"
    "\n"
    "</body>\n"
    "</html>\n"
    "\n"
)


def toke_rows(doc):
    return tokenize(doc, TOKEPARSER_CONFIG)


def test_title_trimmed():
    """tokeparser.t:44-48: get_tag('title') then get_trimmed_text."""
    rows = toke_rows(TOKE_DOC)
    hit = assemble.get_tag(TOKE_DOC, rows, TOKEPARSER_CONFIG,
                           ("foo", "title"))
    assert hit is not None
    tag, i = hit
    assert tag == "title"
    txt, _ = assemble.get_trimmed_text(
        TOKE_DOC, rows, TOKEPARSER_CONFIG, start=i + 1
    )
    assert txt == "This is the <title>"


def test_token_counts():
    """tokeparser.t:54-83: 10 starts, 7 ends, 1 PI; 17 tags total."""
    rows = toke_rows(TOKE_DOC)
    by = {}
    for r in rows:
        by[r[0]] = by.get(r[0], 0) + 1
    assert by.get("start") == 10
    assert by.get("end") == 7
    assert by.get("process") == 1


def test_textify_img_alt():
    """tokeparser.t:88-93: get_text after <a> textifies img via alt."""
    rows = toke_rows(TOKE_DOC)
    _, i = assemble.get_tag(TOKE_DOC, rows, TOKEPARSER_CONFIG, ("a",))
    txt, _ = assemble.get_text(TOKE_DOC, rows, TOKEPARSER_CONFIG,
                               start=i + 1)
    assert txt == "Perl\xa0Institute"


def test_embedded_heading():
    doc = "<title>Title</title>\n<H1>\nHeading\n</h1>\n"
    rows = toke_rows(doc)
    _, i = assemble.get_tag(doc, rows, TOKEPARSER_CONFIG, ("h1",))
    txt, _ = assemble.get_trimmed_text(doc, rows, TOKEPARSER_CONFIG,
                                       start=i + 1)
    assert txt == "Heading"


def test_get_trimmed_text_stops():
    """tokeparser.t:123-141."""
    doc = (
        "<H1>This is a heading</H1>\n"
        "This is s<b>o</b>me<hr>text.\n"
        "<br />\n"
        "This is some more text.\n"
        "<p>\n"
        "This is even some more.\n"
    )
    rows = toke_rows(doc)
    _, i = assemble.get_tag(doc, rows, TOKEPARSER_CONFIG, ("/h1",))
    txt, j = assemble.get_trimmed_text(
        doc, rows, TOKEPARSER_CONFIG, ("br", "p"), start=i + 1
    )
    assert txt == "This is some text."
    # get_tag consumes the stopping <br>, then read on
    _, k = assemble.get_tag(doc, rows, TOKEPARSER_CONFIG, start=j)
    txt, _ = assemble.get_trimmed_text(
        doc, rows, TOKEPARSER_CONFIG, ("br", "p"), start=k + 1
    )
    assert txt == "This is some more text."


def test_get_phrase():
    """tokeparser.t:144-163."""
    doc = (
        "<H1>This is a <b>bold</b> heading</H1>\n"
        "This is some <i>italic</i> text.<br />"
        "This is some <span id=x>more text</span>.\n"
        "<p>\n"
        "This is even some more.\n"
    )
    rows = toke_rows(doc)
    _, i = assemble.get_tag(doc, rows, TOKEPARSER_CONFIG, ("h1",))
    txt, j = assemble.get_phrase(doc, rows, TOKEPARSER_CONFIG, start=i + 1)
    assert txt == "This is a bold heading"
    txt, j2 = assemble.get_phrase(doc, rows, TOKEPARSER_CONFIG, start=j)
    assert txt == ""
    _, k = assemble.get_tag(doc, rows, TOKEPARSER_CONFIG, start=j2)
    txt, _ = assemble.get_phrase(doc, rows, TOKEPARSER_CONFIG, start=k + 1)
    assert txt == "This is some italic text. This is some more text."


# --- HeadParser (t/headparser.t) ---------------------------------------

HEAD_DOC = (
    "\n"
    "<title>&Aring v\xe6re eller &#229; ikke v\xe6re</title>\n"
    '<meta http-equiv="Expires" content="Soon">\n'
    '<meta http-equiv="Foo" content="Bar">\n'
    "<meta name='twitter:card' content='photo' />\n"
    '<link href="mailto:gisle@aas.no" rev=made title="Gisle Aas">\n'
    "\n"
    "<script>\n\n    ignore this\n\n</script>\n"
    "<noscript> ... and this </noscript>\n"
    "\n"
    '<object classid="foo">\n'
    "\n"
    '<base href="http://www.sn.no">\n'
    '<meta name="Keywords" content="test, test, test,...">\n'
    '<meta name="Keywords" content="more">\n'
    '<meta charset="ISO-8859-1"><!-- HTML 5 -->\n'
    "\n"
    "Dette er vanlig tekst.  Denne teksten definerer ogs\xe5 slutten "
    "p\xe5\n&lt;head> delen av dokumentet.\n"
    "\n"
    "<style>\n\n   ignore this too\n\n</style>\n"
    "\n"
    "<isindex>\n"
    "\n"
    "Dette er ogs\xe5 vanlig tekst som ikke skal blir parset i det "
    "hele tatt.\n"
)

HEAD_CFG = ParserConfig(ignore_elements=("script", "style"))


def head_of(doc):
    return assemble.head_headers(doc, tokenize(doc, HEAD_CFG), HEAD_CFG)


def test_headparser_golden():
    headers = head_of(HEAD_DOC)
    d: dict[str, list[str]] = {}
    for k, v in headers:
        d.setdefault(k.upper(), []).append(v)
    assert d["TITLE"] == ["\xc5 v\xe6re eller \xe5 ikke v\xe6re"]
    assert d["EXPIRES"] == ["Soon"]
    assert d["CONTENT-BASE"] == ["http://www.sn.no"]
    assert d["X-META-KEYWORDS"] == ["test, test, test,...", "more"]
    assert d["X-META-CHARSET"] == ["ISO-8859-1"]
    assert d["X-META-TWITTER-CARD"] == ["photo"]
    assert d["LINK"][0].startswith("<mailto:gisle@aas.no>")
    # head ended at the body text -> no Isindex
    assert "ISINDEX" not in d


def test_headparser_perl_falsy_attrs():
    """Perl truthiness parity (verified against the compiled
    reference): name='0' and charset='0' suppress the header,
    prompt='0' falls back to '?', but http-equiv='0' IS a valid key
    (HeadParser tests defined+length there, not truth)."""
    assert head_of('<meta name="0" content="x">') == []
    assert head_of('<meta charset="0">') == []
    assert head_of('<isindex prompt="0">') == [("Isindex", "?")]
    assert head_of('<meta http-equiv="0" content="y">') == [("0", "y")]


def test_textify_falsy_spec_and_coderef():
    """TokeParser._textify parity: a Perl-falsy textify value falls
    back to the 'alt' attribute ($alt || \"alt\"); a callable spec is
    the coderef form."""
    from html_parser_spark.config import ParserConfig
    from html_parser_spark.functions import assemble
    from html_parser_spark.functions.tokenizer import tokenize

    cfg = ParserConfig()
    doc = '<img alt="pic">t'
    rows = tokenize(doc, cfg)
    assert assemble.get_text(doc, rows, cfg, None,
                             textify={"img": ""})[0] == "pict"
    assert assemble.get_text(doc, rows, cfg, None,
                             textify={"img": "0"})[0] == "pict"
    got = assemble.get_text(
        doc, rows, cfg, None,
        textify={"img": lambda t, a: f"<{t}:{a.get('alt')}>"})[0]
    assert got == "<img:pic>t"


def test_headparser_bom_and_title_tag_soup():
    headers = head_of("﻿\n<title>Hi <foo></title>")
    assert headers == [("Title", "Hi <foo>")]


def test_headparser_link_sorted_attrs():
    doc = (
        "<head><title>T</title>\n"
        '<link href="../../css/ummAdam.css" rel="stylesheet" '
        'type="text/css" />\n'
        "</head><body>x"
    )
    headers = head_of(doc)
    assert ("Link",
            '<../../css/ummAdam.css>; rel="stylesheet"; type="text/css"'
            ) in headers


def test_headparser_unterminated_title():
    # EOF synthesizes the </title> end event (pending_end_tag), which
    # flushes the title text
    headers = head_of("<title>Unfinished business")
    assert headers == [("Title", "Unfinished business")]


# --- LinkExtor (t/linkextor-base.t) ------------------------------------

LINK_DOC = (
    "<head>\n"
    '<base href="http://www.sn.no/">\n'
    "</head>\n"
    '<body background="http://www.sn.no/sn.gif">\n'
    "\n"
    'This is <A HREF="link.html">link</a> and an <img SRC="img.jpg"\n'
    'lowsrc="img.gif" alt="Image">.\n'
)

LINK_CFG = ParserConfig()


def test_linkextor_base():
    links = assemble.extract_links(
        LINK_DOC, tokenize(LINK_DOC, LINK_CFG), LINK_CFG,
        base="http://www.sn.no/foo/foo.html",
    )
    # 4 link *elements* (img carries two link attrs in one element)
    assert len({s for s, *_ in links}) == 4
    img = [(a, u) for s, t, a, u in links if t == "img"]
    assert ("src", "http://www.sn.no/foo/img.jpg") in img
    assert ("lowsrc", "http://www.sn.no/foo/img.gif") in img
    assert len(img) == 2


def test_linkextor_relative():
    links = assemble.extract_links(
        LINK_DOC, tokenize(LINK_DOC, LINK_CFG), LINK_CFG
    )
    assert links == [
        (0, "base", "href", "http://www.sn.no/"),
        (1, "body", "background", "http://www.sn.no/sn.gif"),
        (2, "a", "href", "link.html"),
        (3, "img", "src", "img.jpg"),
        (3, "img", "lowsrc", "img.gif"),
    ]
