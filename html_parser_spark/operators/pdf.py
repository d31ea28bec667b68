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
* a page-tree walk (``/Root`` → ``/Pages`` → ``/Kids``, ISO 32000-1
  §7.7.3): page text is ordered by visual page order, each page's
  ``/Contents`` reference(s) resolved through the object map, and
  indirect stream lengths (``/Length N 0 R``) resolved to the
  referenced integer object. Files with no intact catalog fall back
  to object-id order over all content streams.

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
            elif e in "01234567":
                # octal means 0-7 only: str.isdigit also accepts 8/9
                # (and Unicode digits), whose int(., 8) ValueError
                # would escape to the whole-file except and silently
                # drop the document's entire text
                oct_s = e
                i += 1
                while i < n and s[i] in "01234567" and len(oct_s) < 3:
                    oct_s += s[i]
                    i += 1
                out.append(chr(int(oct_s, 8) & 0xFF))
            elif e == "\n" or e == "\r":
                # line continuation: backslash + ANY EOL marker (CR,
                # LF, or CRLF) is disregarded (ISO 32000-1 7.3.4.2)
                i += 1
                if e == "\r" and i < n and s[i] == "\n":
                    i += 1
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


_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")


def _object_stream_text(objects: dict[int, bytes],
                        obj_id: int) -> str | None:
    """Decode one object's content stream to laid-out text, or None
    when the object has no usable stream.

    Stream extent (spec §7.3.8.2): slice exactly /Length bytes when
    the dict gives a direct length — the EOL-delimited fallback
    mis-parses streams whose DATA ends in 0x0D (the optional CR
    before 'endstream' swallows a real data byte and the inflate
    fails; hit by ~1/256 of Flate payloads, caught by the sf0.1
    oracle sweep). An indirect /Length N 0 R is resolved to the
    referenced integer object via the object map; only when that
    object is missing does the EOL-delimited regex fallback run.
    (?!\\d) makes the direct-length digit run atomic: without it
    '/Length 60 0 R' backtracks to group '6' and the
    '(?!\\s+\\d+\\s+R)' lookahead passes, slicing the stream to a
    bogus 6-byte length instead of resolving the reference."""
    body = objects.get(obj_id)
    if body is None:
        return None
    head = body.split(b"stream", 1)[0]
    sb = re.search(rb"stream\r?\n", body)
    if not sb:
        return None
    mlen = re.search(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)", head)
    length: int | None = int(mlen.group(1)) if mlen else None
    if length is None:
        mref = re.search(rb"/Length\s+(\d+)\s+\d+\s+R", head)
        if mref:
            ref_body = objects.get(int(mref.group(1)))
            if ref_body is not None:
                mnum = re.match(rb"\s*(\d+)", ref_body)
                if mnum:
                    length = int(mnum.group(1))
    if length is not None:
        data = body[sb.end():sb.end() + length]
    else:  # no resolvable /Length: EOL-delimited fallback
        sm = _STREAM_RE.search(body)
        if not sm:
            return None
        data = sm.group(1)
    if b"/FlateDecode" in head:
        try:
            data = zlib.decompress(data)
        except zlib.error:
            return None
    elif re.search(rb"/Filter\b", head):
        return None  # unsupported filter: deployment codec scope
    return _content_text(data)


def _walk_page_tree(objects: dict[int, bytes], root: int) -> list[int]:
    """Iterative /Kids walk from the /Pages root (spec §7.7.3):
    returns leaf /Type /Page object ids in visual page order.
    Explicit stack (no recursion) so a deep or degenerate tree can't
    blow the interpreter stack; a seen-set guards reference cycles."""
    order: list[int] = []
    seen: set[int] = set()
    stack = [root]
    while stack:
        oid = stack.pop()
        if oid in seen:
            continue
        seen.add(oid)
        body = objects.get(oid)
        if body is None:
            continue
        head = body.split(b"stream", 1)[0]
        if re.search(rb"/Type\s*/Page\b(?!s)", head):
            order.append(oid)
            continue
        mk = re.search(rb"/Kids\s*\[(.*?)\]", head, re.S)
        if mk:
            kids = [int(r.group(1))
                    for r in _REF_RE.finditer(mk.group(1))]
            stack.extend(reversed(kids))  # preserve /Kids order
    return order


def extract_pdf_text_bytes(payload: bytes) -> tuple[int, str]:
    """Whole-file parse: (n_pages, text). Never raises.

    Pages come from the catalog's page tree (/Root → /Pages → /Kids,
    spec §7.7.3) walked in /Kids order, so multi-page text follows
    VISUAL page order even when content-stream object ids are
    shuffled relative to it; each page's /Contents (single reference
    or array of references — an array's streams concatenate into one
    logical stream, §7.8.2) is resolved through the object map.
    Streams are inflated when /FlateDecode, taken raw when
    unfiltered, skipped (empty text) for unsupported filters.

    Files with no intact catalog/page tree (linearized fragments,
    truncation) fall back to the previous behavior: count
    /Type /Page objects and emit every content stream's text in
    object-id order. Duplicate object ids (incremental updates,
    §7.5.6) resolve last-wins — the appended newer version shadows
    the original, approximating the xref chain without parsing it."""
    try:
        objects: dict[int, bytes] = {}
        for m in _OBJ_RE.finditer(payload):
            objects[int(m.group(1))] = m.group(2)

        # LAST catalog in file order wins: an incremental update
        # (§7.5.6) may append the revised catalog under a NEW object
        # id, which duplicate-id shadowing alone would not see —
        # taking the last one approximates the xref chain for new
        # ids exactly as dict overwrite does for reused ids.
        root = None
        for oid, body in objects.items():
            head = body.split(b"stream", 1)[0]
            if re.search(rb"/Type\s*/Catalog\b", head):
                mp = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", head)
                if mp:
                    root = int(mp.group(1))

        page_ids = _walk_page_tree(objects, root) \
            if root is not None else []
        if page_ids:
            texts: list[str] = []
            for pid in page_ids:
                head = objects[pid].split(b"stream", 1)[0]
                mc = re.search(
                    rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)", head)
                if not mc:
                    continue
                cref = mc.group(1)
                if not cref.lstrip().startswith(b"["):
                    # a single indirect /Contents may point at the
                    # stream itself OR at an object holding an ARRAY
                    # of stream refs (both legal, §7.7.3.3); follow
                    # one level into the array form
                    rid = int(_REF_RE.search(cref).group(1))
                    tgt = objects.get(rid, b"")
                    if b"stream" not in tgt:
                        marr = re.search(rb"\[(.*?)\]", tgt, re.S)
                        if marr:
                            cref = marr.group(1)
                parts = [t for r in _REF_RE.finditer(cref)
                         if (t := _object_stream_text(
                             objects, int(r.group(1)))) is not None]
                if parts:
                    texts.append("".join(parts))
            joined = "\n".join(t.strip("\n") for t in texts
                               if t.strip())
            return len(page_ids), joined

        # Fallback: no page tree. Count /Type /Page objects; emit all
        # content streams' text in object-id order.
        n_pages = 0
        id_texts: list[tuple[int, str]] = []
        for oid, body in objects.items():
            head = body.split(b"stream", 1)[0]
            if re.search(rb"/Type\s*/Page\b(?!s)", head):
                n_pages += 1
                continue
            txt = _object_stream_text(objects, oid)
            if txt and txt.strip():
                id_texts.append((oid, txt))
        joined = "\n".join(t.strip("\n") for _, t in sorted(id_texts))
        return n_pages, joined
    except Exception:
        return 0, ""


def extract_pdf_text(df: DataFrame, key_col: str = "doc_id",
                     payload_col: str = "payload") -> DataFrame:
    """binary PDF payloads -> (doc_id, n_pages, pdf_text) via
    Arrow-batched UDF: one pass per batch, no shuffle — the same
    scale shape as the image metadata/pixel decodes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = [extract_pdf_text_bytes(bytes(p))
                   if p is not None else (0, "")
                   for p in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[key_col],
                "n_pages": [r[0] for r in res],
                "pdf_text": [r[1] for r in res],
            })

    return df.select(key_col, payload_col).mapInPandas(
        run, PDF_TEXT_SCHEMA)
