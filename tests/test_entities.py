"""Entity codec goldens: t/entities.t, t/entities2.t, t/uentities.t."""

from __future__ import annotations

from html_parser_spark.functions.entities import (
    ENTITY2CHAR,
    decode_entities,
    encode_entities,
    encode_entities_numeric,
)


def test_basic_roundtrip():
    a = "V&aring;re norske tegn b&oslash;r &#230res"
    a = decode_entities(a)
    assert a == "V\xe5re norske tegn b\xf8r \xe6res"
    a = encode_entities(a)
    assert a == "V&aring;re norske tegn b&oslash;r &aelig;res"
    a = decode_entities(a)
    assert encode_entities_numeric(a) == (
        "V&#xE5;re norske tegn b&#xF8;r &#xE6;res"
    )


def test_default_unsafe_set():
    assert encode_entities("<&>\"'") == "&lt;&amp;&gt;&quot;&#39;"
    assert encode_entities_numeric("<&>\"'") == (
        "&#x3C;&#x26;&#x3E;&#x22;&#x27;"
    )


def test_unsafe_ranges():
    assert encode_entities("abcdef", "a-c") == "&#97;&#98;&#99;def"
    assert encode_entities("[24/7]\\", "/") == "[24&#47;7]\\"
    assert encode_entities("[24/7]\\", "\\") == "[24/7]&#92;"
    assert encode_entities("[24/7]\\", "]\\") == "[24/7&#93;&#92;"


def test_rfc1866_full_table():
    # every Latin-1 named entity decodes with and without ';'
    # and round-trips through encode (t/entities.t:33-54)
    names = [k for k in ENTITY2CHAR if not k.endswith(";")
             and ord(ENTITY2CHAR[k]) >= 160]
    ent = "".join("&%s;" % n for n in names)
    plain = "".join(ENTITY2CHAR[n] for n in names)
    assert decode_entities(ent) == plain
    assert decode_entities(ent.replace(";", "")) == plain
    assert encode_entities(plain) == ent


def test_single_pass():
    assert decode_entities("abc&def&ghi&abc;&def;") == "abc&def&ghi&abc;&def;"
    assert decode_entities("{&#38;amp;&#x26;amp;&amp; also &#x42f;&#339;}") \
        == "{&amp;&amp;& also Яœ}"


def test_apos_one_way():
    assert decode_entities("&apos;") == "'"
    assert encode_entities("'", "'") == "&#39;"


def test_mixed_numeric():
    assert decode_entities(
        "Attention Home&#959&#969n&#1257rs...1&#1109t "
        "T&#1110&#1084e E&#957&#1257&#1075"
    ) == (
        "Attention Homeοωnөrs...1ѕt "
        "Tімe Eνөг"
    )


# --- t/uentities.t ----------------------------------------------------

def test_unicode_required_semicolon():
    assert decode_entities("&euro") == "&euro"
    assert decode_entities("&euro;") == "€"
    assert decode_entities("&aring") == "\xe5"
    assert decode_entities("&aring;") == "\xe5"


def test_numeric_edge_cases():
    assert decode_entities("&#500000") == chr(500000)
    assert decode_entities("&#x10FFFD") == "\U0010FFFD"
    assert decode_entities("&#xFFFC") == "￼"
    for hexpt in ("FDD0", "FDD1", "FDE0", "FDEF"):
        assert decode_entities("&#x" + hexpt) == "�"
    assert decode_entities("&#xFFFF") == "&#xFFFF"
    assert decode_entities("&#xFFFE") == "&#xFFFE"
    assert decode_entities("&#x10FFFF") == "�"
    assert decode_entities("&#x110000") == "&#x110000"
    assert decode_entities("&#XFFFFFFFF") == "&#XFFFFFFFF"
    assert decode_entities("&#0") == "&#0"
    assert decode_entities("&#0;") == "&#0;"
    assert decode_entities("&#x0") == "&#x0"
    assert decode_entities("&#X0;") == "&#X0;"
    assert decode_entities("&#&aring&#229&#229;&#xFFF") == (
        "&#\xe5\xe5\xe5࿿"
    )
    assert decode_entities("&#0009999999999999999999999999999;") == (
        "&#0009999999999999999999999999999;"
    )
    assert decode_entities("&#xFFFF0000FFFF0000FFFF1") == (
        "&#xFFFF0000FFFF0000FFFF1"
    )


def test_encode_decode_ranges():
    for lo, hi in ((32, 48), (120, 169), (240, 250), (250, 260),
                   (965, 975), (3000, 3005)):
        a = "".join(map(chr, range(lo, hi + 1)))
        assert decode_entities(encode_entities(a)) == a


def test_surrogate_pairs():
    assert decode_entities("&#56256;&#56453;") == chr(0x100085)
    assert decode_entities("&#56256") == "�"
    assert decode_entities("\xb0&rsquo;\xb0") == "\xb0’\xb0"


# --- t/entities2.t prefix expansion -----------------------------------

def test_prefix_expansion():
    assert decode_entities("foo&nbspbar") == "foo&nbspbar"
    assert decode_entities("foo&nbspbar", expand_prefix=True) == (
        "foo\xa0bar"
    )
