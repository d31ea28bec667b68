"""Public HTML::Tagset data needed by the extractors.

The reference depends on the public CPAN module ``HTML::Tagset`` for
two data sets (re-exported at `LinkExtor.pm:33-35`, used at
`TokeParser.pm:107-108,140`).  The module is pure public data; the two
tables are transcribed here.
"""

from __future__ import annotations

#: %HTML::Tagset::isPhraseMarkup -- phrasal-level (inline) elements
PHRASE_TAGS = frozenset((
    "a", "abbr", "acronym", "b", "basefont", "bdo", "big", "br", "cite",
    "code", "dfn", "em", "font", "i", "img", "input", "kbd", "label",
    "q", "s", "samp", "select", "small", "span", "strike", "strong",
    "sub", "sup", "textarea", "tt", "u", "var",
))

#: %HTML::Tagset::linkElements -- tag -> attributes that carry URLs
LINK_ELEMENTS: dict[str, tuple[str, ...]] = {
    "a": ("href",),
    "applet": ("archive", "codebase", "code"),
    "area": ("href",),
    "base": ("href",),
    "bgsound": ("src",),
    "blockquote": ("cite",),
    "body": ("background",),
    "del": ("cite",),
    "embed": ("pluginspage", "src"),
    "form": ("action",),
    "frame": ("src", "longdesc"),
    "iframe": ("src", "longdesc"),
    "ilayer": ("background",),
    "img": ("src", "lowsrc", "longdesc", "usemap"),
    "input": ("src", "usemap"),
    "ins": ("cite",),
    "isindex": ("action",),
    "head": ("profile",),
    "layer": ("background", "src"),
    "link": ("href",),
    "object": ("classid", "codebase", "data", "archive", "usemap"),
    "q": ("cite",),
    "script": ("src", "for"),
    "table": ("background",),
    "td": ("background",),
    "th": ("background",),
    "tr": ("background",),
    "xmp": ("href",),
}

#: default textify map (TokeParser.pm:40)
DEFAULT_TEXTIFY: dict[str, str] = {"img": "alt", "applet": "alt"}
