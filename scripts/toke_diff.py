"""Extractor-level differential: get_tag / get_trimmed_text /
get_phrase logic vs the reference HTML::TokeParser (built per
scripts/ref_diff.py; needs the pure-data HTML::Tagset stub that this
script writes to /tmp/perl5lib — the *data* comes from this engine's
tagset.py transcription, so what the diff validates is the assembly
LOGIC: textify, phrase-markup spacing, unget semantics, whitespace
collapsing).

Usage: python scripts/toke_diff.py [n_docs]
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from html_parser_spark.config import TOKEPARSER_CONFIG  # noqa: E402
from html_parser_spark.functions import assemble  # noqa: E402
from html_parser_spark.functions.tokenizer import tokenize  # noqa: E402

PIECES = [
    "<p>", "</p>", "<b>", "</b>", "<em>x</em>", "text ", "more words ",
    "&amp;", "&aring;", "<img src=x alt=\"the alt\">", "<img src=y>",
    "<applet alt=app>", "<br>", "<div>", "</div>", "<td>", "</td>",
    "<a href=/x>link</a>", "<title>T</title>", "  ", "\n",
    "<script>s</script>", "<span>s</span>", "<input>", "<h1>H</h1>",
    "two  spaces", "<ul><li>i</li></ul>", "&#229;", "tail",
    "<textarea>raw &amp;</textarea>", "<tt>t</tt>", "<u>u</u>",
]


def write_tagset_stub() -> None:
    from html_parser_spark.functions.tagset import (
        LINK_ELEMENTS, PHRASE_TAGS)

    os.makedirs("/tmp/perl5lib/HTML", exist_ok=True)
    tags = " ".join(sorted(PHRASE_TAGS))
    links = ",\n".join(
        f"  '{k}' => [qw({' '.join(v)})]"
        for k, v in sorted(LINK_ELEMENTS.items()))
    with open("/tmp/perl5lib/HTML/Tagset.pm", "w") as f:
        f.write(
            "package HTML::Tagset;\nuse strict; use warnings;\n"
            f"our %isPhraseMarkup = map {{ $_ => 1 }} qw({tags});\n"
            f"our %linkElements = (\n{links}\n);\n1;\n")


def protocol_a(doc: str) -> list:
    """get_tag; get_trimmed_text; repeat (mirrors toke_dump.pl)."""
    cfg = TOKEPARSER_CONFIG
    rows = tokenize(doc, cfg)
    out = []
    i = 0
    while True:
        t = assemble.get_tag(doc, rows, cfg, (), i)
        if t is None:
            break
        tag, idx = t
        txt, j = assemble.get_trimmed_text(doc, rows, cfg, (),
                                           start=idx + 1)
        out.append([tag, txt])
        i = j
    return out


def protocol_b(doc: str) -> list:
    """get_phrase; get_tag; repeat."""
    cfg = TOKEPARSER_CONFIG
    rows = tokenize(doc, cfg)
    out = []
    i = 0
    while True:
        phrase, j = assemble.get_phrase(doc, rows, cfg, start=i)
        out.append(phrase)
        t = assemble.get_tag(doc, rows, cfg, (), j)
        if t is None:
            break
        tag, idx = t
        out.append(tag)
        i = idx + 1
    return out


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    write_tagset_stub()
    rng = random.Random(4242)
    docs = ["".join(rng.choice(PIECES)
                    for _ in range(rng.randint(1, 20)))
            for _ in range(n)]
    from ref_diff import _run_perl
    out = _run_perl("toke_dump.pl",
                    "".join(json.dumps({"doc": d}) + "\n"
                            for d in docs))
    lines = [l for l in out.split("\n") if l]
    assert len(lines) == len(docs), (len(lines), len(docs))
    nf = 0
    for d, l in zip(docs, lines):
        ra, rb = json.loads(l)
        ma, mb = protocol_a(d), protocol_b(d)
        if ma != ra or mb != rb:
            nf += 1
            if nf <= 5:
                print("DIFF doc:", repr(d)[:100])
                if ma != ra:
                    print("  A mine:", ma[:6], "\n  A ref :", ra[:6])
                if mb != rb:
                    print("  B mine:", mb[:6], "\n  B ref :", rb[:6])
    print(f"{len(docs) - nf}/{len(docs)} identical extraction traces "
          f"({nf} diffs)")
    return 1 if nf else 0


if __name__ == "__main__":
    raise SystemExit(main())
