"""Pure-Python tests for the eg/* recipe extractors: hanchors,
hrefsub (tokenpos surgery), hstrip (filtered identity rewrite)."""

from __future__ import annotations

from html_parser_spark.config import ParserConfig
from html_parser_spark.functions import assemble
from html_parser_spark.functions.tokenizer import tokenize

CFG = ParserConfig()


def _rows(doc, cfg=CFG):
    return tokenize(doc, cfg)


class TestAnchors:
    def test_basic(self):
        doc = '<p>intro</p><a href="/x">click  <b>me</b></a><a>bare</a>'
        out = assemble.anchors(doc, _rows(doc), CFG)
        assert out == [(0, "/x", "click me"), (1, None, "bare")]

    def test_entities_and_img_alt(self):
        doc = '<a href="/y">&lt;z&gt; <img src=p alt="pic"></a>'
        out = assemble.anchors(doc, _rows(doc), CFG)
        assert out == [(0, "/y", "<z> pic")]

    def test_unclosed_anchor_runs_to_eof(self):
        doc = '<a href="/u">tail text'
        out = assemble.anchors(doc, _rows(doc), CFG)
        assert out == [(0, "/u", "tail text")]


class TestRewriteLinks:
    def test_rewrites_only_value_bytes(self):
        doc = '<p>t</p><a x=1 href="/a">T</a><img src=i.png><a href=unq>'
        rw = lambda tag, name, raw: "NEW/" + raw.strip()
        got = assemble.rewrite_links(doc, _rows(doc), CFG, rw)
        assert got == ('<p>t</p><a x=1 href="NEW//a">T</a>'
                       '<img src=NEW/i.png><a href=NEW/unq>')

    def test_identity_when_no_links(self):
        doc = "<p>no links &amp; stuff</p>"
        got = assemble.rewrite_links(doc, _rows(doc), CFG,
                                     lambda t, n, r: "x")
        assert got == doc

    def test_boolean_and_missing_attrs_untouched(self):
        doc = "<a href><area nohref href='/q'>"
        rw = lambda tag, name, raw: raw.upper()
        got = assemble.rewrite_links(doc, _rows(doc), CFG, rw)
        assert got == "<a href><area nohref href='/Q'>"

    def test_quote_char_escaped_in_replacement(self):
        # a rewritten URL containing the active quote char must not
        # break out of the quoted span (eg/hrefsub re-quotes likewise)
        doc = '<a href="/a">x</a><img src=\'/b\'>'
        rw = lambda tag, name, raw: raw + '?q="v"&s=\'w\''
        got = assemble.rewrite_links(doc, _rows(doc), CFG, rw)
        assert got == ('<a href="/a?q=&quot;v&quot;&s=\'w\'">x</a>'
                       "<img src='/b?q=\"v\"&s=&#39;w&#39;'>")
        # and the result must re-parse with the full value intact
        links = assemble.extract_links(got, _rows(got), CFG)
        assert [u for _, _, _, u in links] == [
            '/a?q="v"&s=\'w\'', "/b?q=\"v\"&s='w'"]

    def test_unquoted_span_requoted_when_structural(self):
        # a new value with whitespace/'>'/leading quote spliced into
        # an UNQUOTED span would change the tag's structure (extra
        # boolean attrs, early close) — re-quoted like eg/hrefsub
        doc = "<a href=/old>x</a><img src=/i>"
        rw = lambda t, n, r: {"/old": "/new path", "/i": '"q'}[r]
        got = assemble.rewrite_links(doc, _rows(doc), CFG, rw)
        assert got == ('<a href="/new path">x</a>'
                       '<img src="&quot;q">')
        links = assemble.extract_links(got, _rows(got), CFG)
        assert [u for _, _, _, u in links] == ["/new path", '"q']

    def test_backquote_unquote_only_when_enabled(self):
        doc = "<a href=`/q`>"
        rw = lambda tag, name, raw: raw.upper()
        # backquote off: '`' is part of the raw value, not a quote
        got = assemble.rewrite_links(doc, _rows(doc), CFG, rw)
        assert got == "<a href=`/Q`>"
        bq = ParserConfig(backquote=True)
        got = assemble.rewrite_links(doc, _rows(doc, bq), bq, rw)
        assert got == "<a href=`/Q`>"


class TestStripMarkup:
    def test_drops_styling_tags_keeps_text(self):
        doc = "<p><b>bold</b> and <font size=2>styled</font></p>"
        got = assemble.strip_markup(doc, None, CFG)
        assert got == "<p>bold and styled</p>"

    def test_drops_style_script_subtrees(self):
        doc = "a<style>p{}</style>b<script>if(1<2){}</script>c"
        got = assemble.strip_markup(doc, None, CFG)
        assert got == "abc"

    def test_keeps_comments_and_declarations(self):
        doc = "<!doctype html><!-- c --><i>x</i>"
        got = assemble.strip_markup(doc, None, CFG)
        assert got == "<!doctype html><!-- c -->x"

    def test_nested_ignored_elements(self):
        doc = "a<style>s1<style>s2</style>"
        # nested same-tag depth tracking: outer close ends the element
        got = assemble.strip_markup(doc, None, CFG)
        assert got.startswith("a")
        assert "s1" not in got
