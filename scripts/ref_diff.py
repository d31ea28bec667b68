"""Differential tester: this engine's tokenizer vs the REAL reference
parser (built from /root/reference source into /tmp/refbuild).

Build the reference once:
    cp -r /root/reference /tmp/refbuild
    cd /tmp/refbuild && perl Makefile.PL && make

Then:  python scripts/ref_diff.py [n_docs]

Feeds identical documents (random tag soup + structured templates +
entity/unicode material) through both parsers across several option
configurations and compares the full event streams field by field.
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from html_parser_spark.config import ParserConfig  # noqa: E402
from html_parser_spark.functions import project  # noqa: E402
from html_parser_spark.functions.tokenizer import tokenize  # noqa: E402

PIECES = [
    "<a>", "</a>", "<a b=c>", '<a b="c d">', "<a b='c'>", "<a b>",
    "<x ", ">", "<", '"', "'", "=", " ", "text ", "&amp;", "&lt;x",
    '<p class="x" id=y>', "</p >", '<img src=x.png alt="a b">',
    "<br/>", "<a =b>", "<a b= >", '<a b="unterm', "`", "/", "\n",
    "\t", '<a b c=1 d e="2">', "<title>t</title>",
    "<script>x<y</script>", "<SCRIPT a=1>x</script>", "<a$ b%=^>",
    "]]>", "<![CDATA[x]]>", "<!-- c -->", "<!-- a -- b -->", "<!>",
    "<!doctype html>", "<?pi?>", "<?p", "<a b=c=d>", '<a "b"=c>',
    "<a/>", "<a / >", "<a b=`x`>", "&aring;", "&#229;", "&#xE5;",
    "&euro;", "&unknown;", "&#x110000;", "&ampx", "café ",
    "<textarea>a&amp;b</textarea>", "<xmp><p></xmp>", "<plaintext>x",
    "<style>p{}</style>", "<!--", "<a href=>", "<em>e</em>",
    "<![INCLUDE[x]]>", "<![IGNORE[y]]>", "<![ CDATA [z]]>",
    "<iframe>i</iframe>", "<p\x0bq>", "a&#56256;&#56453;b",
    "&#xFDD0;", "&#0;", "<!ENTITY x 'y'>", "<!DOCTYPE a [ <b> ]>",
    "<a b = c>", "</ a>", "</a b=c>", "<a\nb\n=\nc>", "&Aring",
    "naïve Ünïcøde ", "<A HREF=X>", "<t\u00e9>", "&#x10FFFF;",
]


def _run_perl(script, payload, timeout=600):
    """Drive a perl dump helper with explicit UTF-8 (perl emits raw
    UTF-8 regardless of locale), surfacing its stderr/returncode
    instead of dying on an empty-output assert, and killing the child
    on timeout."""
    import os
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    proc = subprocess.Popen(
        ["perl", os.path.join(here, script)],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, encoding="utf-8")
    try:
        out, err = proc.communicate(payload, timeout=timeout)
    except subprocess.TimeoutExpired:
        proc.kill()
        raise
    if proc.returncode != 0:
        sys.stderr.write(err[-4000:])
        raise RuntimeError(
            f"{script} failed rc={proc.returncode} — is the reference "
            "built at /tmp/refbuild? (see .claude/skills/verify)")
    return out

CONFIGS: list[dict] = [
    {},
    {"unbroken_text": 1},
    {"xml_mode": 1},
    {"strict_comment": 1},
    {"case_sensitive": 1},
    {"attr_encoded": 1},
    {"empty_element_tags": 1},
    {"backquote": 1},
    {"strict_end": 1},
    {"closing_plaintext": 1},
    {"strict_names": 1},
    {"marked_sections": 1},
    {"strict_comment": 1, "strict_names": 1, "strict_end": 1},
    {"xml_mode": 1, "case_sensitive": 1},
    {"unbroken_text": 1, "empty_element_tags": 1},
    {"ignore_tags": ["b", "i", "a"]},
    {"ignore_elements": ["div", "script", "title"]},
    {"report_tags": ["a", "p", "img"]},
    {"ignore_tags": ["a"], "report_tags": ["a", "p"],
     "unbroken_text": 1},
    {"boolean_attribute_value": "__BOOL__"},
    {"xml_pic": 1},
    {"marked_sections": 1, "unbroken_text": 1},
    # round-3 combination configs: filter x text-shaping x dialect
    # interactions not covered by the single-option rows above
    {"xml_mode": 1, "empty_element_tags": 1, "strict_comment": 1},
    {"ignore_elements": ["script", "div"], "unbroken_text": 1,
     "marked_sections": 1},
    {"case_sensitive": 1, "report_tags": ["A", "p", "IMG"]},
    {"ignore_tags": ["b"], "ignore_elements": ["i"],
     "report_tags": ["a", "b", "i", "p"], "strict_end": 1},
    {"backquote": 1, "attr_encoded": 1, "boolean_attribute_value": ""},
    {"closing_plaintext": 1, "unbroken_text": 1, "xml_pic": 1},
]


def my_events(doc: str, opts: dict) -> list[dict]:
    kw = {}
    for k, v in opts.items():
        if k == "boolean_attribute_value":  # reference setter name
            kw["bool_attr_val"] = v
        elif isinstance(v, list):
            kw[k] = tuple(v)
        else:
            kw[k] = bool(v)
    cfg = ParserConfig(**kw)
    out = []
    for row in tokenize(doc, cfg):
        p = project.project(doc, row, cfg)
        out.append({
            "event": p["event"],
            "text": p["text"],
            "dtext": p["dtext"],
            "tagname": p["tagname"],
            "attr": p["attr"],
            "attrseq": p["attrseq"],
            "is_cdata": p["is_cdata"],
            "offset": p["offset"],
            "length": p["length"],
            "line": p["line"],
            "column": p["column"],
            "tag": p["tag"],
            "token0": p["token0"],
            "tokenpos": p["tokenpos"],
            "offset_end": p["offset_end"],
            "tokens": p["tokens"],
        })
    return out


def norm_ref(ev: dict) -> dict:
    if ev.get("is_cdata") is not None:
        ev["is_cdata"] = bool(ev["is_cdata"])
    return ev


def compare(mine: list[dict], ref: list[dict], doc: str, opts: dict,
            verbose: bool) -> list[str]:
    errs = []
    if len(mine) != len(ref):
        errs.append(f"event count {len(mine)} vs {len(ref)}")
    for i, (m, r) in enumerate(zip(mine, ref)):
        r = norm_ref(r)
        for f in ("event", "text", "offset", "length", "line", "column",
                  "offset_end"):
            if m[f] != r[f]:
                errs.append(f"ev{i} {f}: {m[f]!r} vs {r[f]!r}")
        if m["tokenpos"] != r["tokenpos"]:
            errs.append(f"ev{i} tokenpos: {m['tokenpos']!r} vs "
                        f"{r['tokenpos']!r}")
        if (m["tokens"] or None) != (r["tokens"] or None):
            errs.append(f"ev{i} tokens: {m['tokens']!r} vs "
                        f"{r['tokens']!r}")
        if r["event"] == "text":
            if m["dtext"] != r["dtext"]:
                errs.append(f"ev{i} dtext: {m['dtext']!r} vs {r['dtext']!r}")
            if bool(m["is_cdata"]) != bool(r["is_cdata"]):
                errs.append(f"ev{i} is_cdata: {m['is_cdata']} vs "
                            f"{r['is_cdata']}")
        # tag/tagname/token0 are defined for EVERY tokened event
        # (comments get '#'+content, declarations '!'+name, ...), so
        # compare them unconditionally — a start/end-only comparison
        # would miss prefix bugs on comment/declaration/pi events
        if m["tagname"] != r["tagname"]:
            errs.append(f"ev{i} tagname: {m['tagname']!r} vs "
                        f"{r['tagname']!r}")
        if m["tag"] != r["tag"]:
            errs.append(f"ev{i} tag: {m['tag']!r} vs {r['tag']!r}")
        if m["token0"] != r["token0"]:
            errs.append(f"ev{i} token0: {m['token0']!r} vs "
                        f"{r['token0']!r}")
        if r["event"] == "start":
            if (m["attr"] or {}) != (r["attr"] or {}):
                errs.append(f"ev{i} attr: {m['attr']!r} vs {r['attr']!r}")
            if (m["attrseq"] or []) != (r["attrseq"] or []):
                errs.append(f"ev{i} attrseq: {m['attrseq']!r} vs "
                            f"{r['attrseq']!r}")
        if errs and not verbose:
            break
    return errs


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    verbose = os.environ.get("REF_DIFF_VERBOSE", "") == "1"
    rng = random.Random(20260817)
    # crashme-style raw-character soup (t/crashme.t pattern) mixed in
    # with the structured pieces: every 4th document is random chars
    byte_alphabet = ([chr(i) for i in range(1, 256)]
                     + list("<>&;=\"'!-#[]/?") * 20
                     + ["<a ", "</", "<!", "&#"] * 5)
    cases: list[tuple[str, dict]] = []
    for t in range(n_docs):
        if t % 4 == 3:
            doc = "".join(rng.choice(byte_alphabet)
                          for _ in range(rng.randint(1, 120)))
        else:
            doc = "".join(rng.choice(PIECES)
                          for _ in range(rng.randint(1, 25)))
        # independent draw: doc type cycles with period 4 and
        # 28 % 4 == 0, so t % len(CONFIGS) would pair each config
        # with only ONE doc type forever (7 configs would only ever
        # see byte soup, 21 would never see it)
        cases.append((doc, CONFIGS[rng.randrange(len(CONFIGS))]))

    payload = "".join(
        json.dumps({"doc": d, "opts": o}) + "\n" for d, o in cases)
    out = _run_perl("ref_dump.pl", payload)
    # split on \n only: decoded docs may contain NEL/U+2028 etc.
    ref_all = [json.loads(l) for l in out.split("\n") if l.strip()]
    assert len(ref_all) == len(cases), (len(ref_all), len(cases))

    n_fail = 0
    for (doc, opts), ref in zip(cases, ref_all):
        mine = my_events(doc, opts)
        errs = compare(mine, ref, doc, opts, verbose)
        if errs:
            n_fail += 1
            if n_fail <= 10:
                print(f"DIFF opts={opts} doc={doc!r}")
                for e in errs[:4]:
                    print("   ", e)
    print(f"{len(cases) - n_fail}/{len(cases)} identical event streams "
          f"({n_fail} diffs)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
