"""Event projection: raw event tuples -> named fields.

Replaces the reference's compiled argspec projection
(`/root/reference/hparser.c:359-622`): Catalyst column pruning plays
the role of the argspec compiler, so here we just materialize the
fields an operator asked for.
"""

from __future__ import annotations

from html_parser_spark.config import ParserConfig
from html_parser_spark.functions.entities import decode_entities
from html_parser_spark.functions.tokenizer import (
    ascii_lower,
    EV_COMMENT,
    EV_DECLARATION,
    EV_END,
    EV_PROCESS,
    EV_START,
    EV_TEXT,
)

# event-code prefix for the `tag` field ("!##/#?#" indexed by event
# enum, hparser.c:424-427): declaration '!', comment '#', end '/',
# process '?'; start stays bare (the e_type string's other '#' slots
# belong to events that never carry tokens)
_TAG_PREFIX = {EV_DECLARATION: "!", EV_COMMENT: "#", EV_END: "/",
               EV_PROCESS: "?"}


def raw_text(doc: str, row) -> str:
    """The raw source slice of an event (flushed unbroken-text rows
    carry their own concatenation, excluding ignored-event gaps)."""
    return row[9] if row[9] is not None else doc[row[1]:row[2]]


def token_strings(doc: str, row, cfg: ParserConfig) -> list[str] | None:
    """ARG_TOKENS (hparser.c:370-391): boolean attr slots resolve to
    bool_attr_val or the preceding token (the attr name, original case).
    """
    toks = row[3]
    if not toks:
        return None
    out: list[str] = []
    prev = ""
    for tok in toks:
        if tok is None:
            out.append(cfg.bool_attr_val if cfg.bool_attr_val is not None
                       else prev)
        elif isinstance(tok, str):
            prev = tok
            out.append(tok)
        else:
            prev = doc[tok[0]:tok[1]]
            out.append(prev)
    return out


def tokenpos(doc: str, row) -> list[int] | None:
    """ARG_TOKENPOS (hparser.c:393-410): (offset,length) pairs relative
    to the event text; (0,0) for boolean slots; None for synthetic/
    artificial tokens (tokens[0] outside the event span)."""
    toks = row[3]
    beg = row[1]
    if not toks:
        return None
    t0 = toks[0]
    if isinstance(t0, str) or t0 is None or t0[0] < beg:
        return None
    out: list[int] = []
    for tok in toks:
        if tok is None:
            out.extend((0, 0))
        else:
            out.extend((tok[0] - beg, tok[1] - tok[0]))
    return out


def token0(doc: str, row) -> str | None:
    toks = row[3]
    if not toks:
        return None
    t0 = toks[0]
    return t0 if isinstance(t0, str) else doc[t0[0]:t0[1]]


def tagname(doc: str, row, cfg: ParserConfig) -> str | None:
    t = token0(doc, row)
    if t is not None and not cfg.is_case_sensitive:
        t = ascii_lower(t)
    return t


def tag(doc: str, row, cfg: ParserConfig) -> str | None:
    t = tagname(doc, row, cfg)
    if t is None:
        return None
    return _TAG_PREFIX.get(row[0], "") + t


def _attr_value(doc: str, span, cfg: ParserConfig) -> str:
    """Unquote + entity-decode one attribute value (hparser.c:455-475)."""
    b, e = span
    if e > b:
        c = doc[b]
        if c == '"' or c == "'" or (c == "`" and cfg.backquote):
            # strip one layer of matching quotes
            b += 1
            e -= 1
    val = doc[b:e]
    if not cfg.attr_encoded:
        val = decode_entities(val, expand_prefix=False)
    return val


def attrs(doc: str, row, cfg: ParserConfig):
    """ARG_ATTR (hparser.c:431-509): map with first-occurrence-wins;
    names lowercased unless case-sensitive; boolean values resolve to
    bool_attr_val or the *original-case* attr name."""
    if row[0] is not EV_START or not row[3]:
        return None
    toks = row[3]
    out: dict[str, str] = {}
    seq: list[str] = []
    for i in range(1, len(toks) - 1, 2):
        nb, ne = toks[i]
        raw_name = doc[nb:ne]
        vtok = toks[i + 1]
        if vtok is None:
            val = (cfg.bool_attr_val if cfg.bool_attr_val is not None
                   else raw_name)
        else:
            val = _attr_value(doc, vtok, cfg)
        name = (raw_name if cfg.is_case_sensitive
                else ascii_lower(raw_name))
        seq.append(name)
        if name not in out:
            out[name] = val
    return out, seq


def dtext(doc: str, row) -> str | None:
    """ARG_DTEXT (hparser.c:534-551): decode entities in text events
    unless is_cdata; uses the MSIE prefix-expansion path."""
    if row[0] is not EV_TEXT:
        return None
    txt = raw_text(doc, row)
    if row[4]:  # is_cdata
        return txt
    return decode_entities(txt, expand_prefix=True)


def project(doc: str, row, cfg: ParserConfig) -> dict:
    """All fields of one event, as a dict (test/debug helper; the Spark
    operator materializes columns directly for speed)."""
    a = attrs(doc, row, cfg)
    text = raw_text(doc, row)
    return {
        "event": row[0],
        "text": text,
        "dtext": dtext(doc, row),
        "tagname": tagname(doc, row, cfg),
        "tag": tag(doc, row, cfg),
        "token0": token0(doc, row),
        "tokens": token_strings(doc, row, cfg),
        "tokenpos": tokenpos(doc, row),
        "attr": a[0] if a else None,
        "attrseq": a[1] if a else None,
        "is_cdata": row[4] if row[0] is EV_TEXT else None,
        "offset": row[5],
        "offset_end": row[5] + len(text),
        "length": len(text),
        "line": row[6],
        "column": row[7],
        "skipped_text": row[8],
    }
