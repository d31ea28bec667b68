"""Entity-codec differential vs the built reference HTML::Entities
(see scripts/ref_diff.py for build steps).

Usage: python scripts/ent_diff.py [n_cases]

Known intentional divergence (filtered, reported separately): the
reference decoder splices replacements in place and, for an entity
at the very END of the string, reads the byte at the buffer's logical
end — which after a shrinking replacement still holds STALE data from
the original string. When that stale byte happens to be ';', a
trailing semicolon-requiring entity (e.g. '&euro') decodes even
though the documented rule requires the terminator. That is a
read-past-end memory artifact, not semantics; this engine implements
the documented rule (Entities.pm keys / util.c:187-189).
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from html_parser_spark.functions.entities import (  # noqa: E402
    ENTITY2CHAR,
    decode_entities,
    encode_entities,
)

FRAGS = [
    "&amp;", "&amp", "&ampx", "&lt;", "&lt", "&aring;", "&aring",
    "&AringX", "&Aring", "&euro;", "&euro", "&eur", "&#229;", "&#229",
    "&#0229;", "&#x00E5;", "&#XE5;", "&#0;", "&#x0;", "&#x110000;",
    "&#1114111;", "&#1114112;", "&#56256;&#56453;", "&#56256;",
    "&#56453;", "&#xFDD0;", "&#xFFFE;", "&#x1FFFF;", "&#xFFFD;",
    "&unknown;", "&unknown", "&;", "&", "&#;", "&#x;", "&#xg;",
    "& lt;", "a&b", "x", " ", "é", "ß", "&szlig;", "&nbsp;", "&nbsp",
    "&NBSP;", "&frac12;", "&there4;", "&alpha;", "&Alpha;",
    "&amp;amp;", "&&amp;;", "&#38;#38;", "<>\"'", "\x00", "\x7f",
    "&#x2028;", "high\U0001F600bit", "&#56256;&#xg;&#56453;",
    "&#56256;a&#56453;", "&oelig;", "&OElig", "&there4",
]

#: ';'-requiring entities for the trailing stale-byte filter
_SEMI_ONLY = {k[:-1]: v for k, v in ENTITY2CHAR.items()
              if k.endswith(";") and k[:-1] not in ENTITY2CHAR}


def is_stale_tail_artifact(mine: str, ref: str) -> bool:
    for name, ch in _SEMI_ONLY.items():
        bare = "&" + name
        if (mine.endswith(bare) and ref.endswith(ch)
                and mine[:-len(bare)] == ref[:-len(ch)]):
            return True
    return False


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    rng = random.Random(99)
    cases = ["".join(rng.choice(FRAGS)
                     for _ in range(rng.randint(1, 12)))
             for _ in range(n)]
    from ref_diff import _run_perl
    out = _run_perl("ent_dump.pl",
                    "".join(json.dumps(c) + "\n" for c in cases))
    lines = [l for l in out.split("\n") if l]
    assert len(lines) == len(cases), (len(lines), len(cases))

    nd = ne = nstale = 0
    for c, l in zip(cases, lines):
        rd, re_ = json.loads(l)
        md = decode_entities(c)
        me = encode_entities(c)
        if md != rd:
            if is_stale_tail_artifact(md, rd):
                nstale += 1
            else:
                nd += 1
                if nd <= 5:
                    print("DEC diff:", repr(c)[:90])
                    print("   mine:", repr(md)[:90])
                    print("   ref :", repr(rd)[:90])
        if me != re_:
            ne += 1
            if ne <= 5:
                print("ENC diff:", repr(c)[:90])
                print("   mine:", repr(me)[:90])
                print("   ref :", repr(re_)[:90])
    print(f"decode diffs: {nd}/{len(cases)} "
          f"(+{nstale} known stale-tail artifacts), "
          f"encode diffs: {ne}/{len(cases)}")
    return 1 if (nd or ne) else 0


if __name__ == "__main__":
    raise SystemExit(main())
