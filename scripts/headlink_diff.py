"""HeadParser + LinkExtor differential vs the compiled reference.

Usage: python scripts/headlink_diff.py [n_docs]

Validates head_headers (metadata capture incl. stop conditions, title
assembly, meta/link/base/isindex mapping) and extract_links (link-
attr selection + HTML5 trim) against the reference subclasses driven
by the real parser. The HTML::Tagset data stub is shared with
scripts/toke_diff.py.
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from html_parser_spark.config import ParserConfig  # noqa: E402
from html_parser_spark.functions import assemble  # noqa: E402
from html_parser_spark.functions.tokenizer import tokenize  # noqa: E402
from scripts.toke_diff import write_tagset_stub  # noqa: E402

PIECES = [
    "<head>", "</head>", "<html>", "<body>", "<title>the title</title>",
    "<title>a &amp; b</title>", "<title>unterminated",
    '<meta http-equiv="Expires" content="E">',
    '<meta name="author" content="me">', '<meta charset="utf-8">',
    '<meta name="">', "<meta>", '<base href=" /b ">', "<base>",
    "<isindex>", '<isindex prompt="p?">',
    '<link href="/s" rel=stylesheet type="text/css">', "<link rel=x>",
    "<script>ignore<me></script>", "<style>s</style>", "  ", "\n",
    "body text", "<p>para</p>", '<a href=" /x ">t</a>', "<a name=n>",
    '<img src="i.png" lowsrc="l.png" usemap="#m">', "<img>",
    '<form action="/f">', '<body background="bg.gif">',
    '<frame src="f.html" longdesc="d">', '<table background="t.png">',
    "<noscript>ns</noscript>", "<object>o</object>",
    '<applet code="a.class" codebase="/cb" archive="x.jar">',
    '<q cite="/c">', '<del cite="/d">', "&aring;", "text &amp; more",
]

_HEAD_CFG = ParserConfig(ignore_elements=("script", "style"))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    write_tagset_stub()
    rng = random.Random(777)
    docs = ["".join(rng.choice(PIECES)
                    for _ in range(rng.randint(1, 18)))
            for _ in range(n)]
    from ref_diff import _run_perl
    out = _run_perl("headlink_dump.pl",
                    "".join(json.dumps({"doc": d}) + "\n"
                            for d in docs))
    lines = [l for l in out.split("\n") if l]
    assert len(lines) == len(docs), (len(lines), len(docs))
    nh = nl = 0
    for d, l in zip(docs, lines):
        ref_h, ref_l = json.loads(l)
        rows = tokenize(d, _HEAD_CFG)
        mine_h = [[k, v] for k, v in
                  assemble.head_headers(d, rows, _HEAD_CFG)]
        rows2 = tokenize(d, ParserConfig())
        mine_l = [[t, a, u] for _seq, t, a, u in
                  assemble.extract_links(d, rows2, ParserConfig())]
        if mine_h != ref_h:
            nh += 1
            if nh <= 5:
                print("HEAD diff:", repr(d)[:110])
                print("  mine:", mine_h[:5])
                print("  ref :", ref_h[:5])
        if mine_l != ref_l:
            nl += 1
            if nl <= 5:
                print("LINK diff:", repr(d)[:110])
                print("  mine:", mine_l[:5])
                print("  ref :", ref_l[:5])
    print(f"headers: {n - nh}/{n} identical, links: {n - nl}/{n} "
          f"identical")
    return 1 if (nh or nl) else 0


if __name__ == "__main__":
    raise SystemExit(main())
