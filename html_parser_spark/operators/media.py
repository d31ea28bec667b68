"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed through Arrow-batched ``mapInPandas``.

The metadata decode is REAL: :func:`decode_image_meta` parses actual
PNG / JPEG / GIF container headers byte-by-byte (signature sniff +
IHDR / SOF segment walk / logical screen descriptor) — no imaging
library needed for format/width/height, which is exactly the
metadata a 100 TB curation pipeline filters on before ever paying
for pixel decode. PNG pixel decode is ALSO real
(:func:`decode_image_pixels`: chunk walk -> zlib inflate -> full
scanline un-filtering, pure stdlib); JPEG/video pixel decode stays a
deployment concern (needs libjpeg/libav) behind the identical
``mapInPandas`` signature — the batch iterator shape does not change.

``synth_image_payloads`` builds deterministic fixture blobs with
genuine headers (the driver oracle recomputes the embedded
dimensions in closed form, so the parser is verified against real
bytes, not against itself).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def with_binary(df: DataFrame, key_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(key, payload binary): stands in for an opaque blob column; at
    100 TB this is the `binary` column of the media table (never
    decoded during scans that don't ask for it — column pruning keeps
    blob I/O out of metadata-only queries)."""
    return df.select(
        F.col(key_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def _png_header(w: int, h: int) -> bytes:
    """Real PNG signature + IHDR chunk (33 bytes; CRC left zeroed —
    irrelevant for header parsing)."""
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    return (_PNG_SIG + struct.pack(">I", 13) + b"IHDR" + ihdr
            + b"\x00\x00\x00\x00")


def _jpeg_header(w: int, h: int) -> bytes:
    """Real JPEG SOI + SOF0 segment (21 bytes): the marker walk a
    parser performs is genuine even without APPn segments."""
    sof0 = (struct.pack(">H", 8 + 3 * 3) + b"\x08"
            + struct.pack(">HH", h, w) + b"\x03"
            + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01")
    return b"\xff\xd8\xff\xc0" + sof0


def _gif_header(w: int, h: int) -> bytes:
    """Real GIF89a signature + logical screen descriptor (13 bytes;
    dimensions little-endian)."""
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


#: header builders + per-format fixed header size, keyed doc_id % 3
_HEADERS = ((_png_header, 33), (_jpeg_header, 21), (_gif_header, 13))


def synth_image_payloads(df: DataFrame, key_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Deterministic fixture blobs with REAL image headers: format =
    doc_id % 3 (png/jpeg/gif), width = 16 + (doc_id*7) % 624,
    height = 16 + (doc_id*13) % 464, body = the document text bytes.
    Closed-form, so a SQL oracle can predict every parsed field."""

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for key, text in zip(pdf[key_col], pdf[text_col]):
                k = int(key)
                build, _ = _HEADERS[k % 3]
                w = 16 + (k * 7) % 624
                h = 16 + (k * 13) % 464
                body = (text if isinstance(text, str) else "").encode()
                payloads.append(build(w, h) + body)
            yield pd.DataFrame({"doc_id": pdf[key_col],
                                "payload": payloads})

    return df.select(key_col, text_col).mapInPandas(run, schema)


def parse_image_header(payload: bytes) -> tuple[str, int | None,
                                                int | None]:
    """Hand-rolled container-header parse: (format, width, height).

    * PNG: 8-byte signature, then the IHDR chunk's big-endian
      width/height (PNG spec 1.2 §11.2.2 layout).
    * JPEG: SOI then a marker-segment walk to the first SOFn frame
      header (skipping APPn/COM/DQT/DHT...), big-endian
      height/width at offsets +5/+7 into the segment.
    * GIF: 'GIF87a'/'GIF89a', little-endian logical-screen
      width/height.
    * anything else: ('unknown', None, None) — never raises.
    """
    if payload.startswith(_PNG_SIG) and len(payload) >= 24 \
            and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        # PNG spec caps dims at 2^31-1; larger values are corrupt and
        # would overflow the int32 output columns — report unparsed
        if w >= 1 << 31 or h >= 1 << 31:
            return "png", None, None
        return "png", w, h
    if payload[:2] == b"\xff\xd8":
        pos = 2
        n = len(payload)
        while pos + 4 <= n:
            if payload[pos] != 0xFF:
                break
            # JPEG allows runs of 0xFF fill bytes before a marker
            # (ITU T.81 §B.1.1.2) — skip them or the segment walk
            # desyncs and reads a fill byte as the marker code
            while pos + 1 < n and payload[pos + 1] == 0xFF:
                pos += 1
            if pos + 4 > n:
                break
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2  # standalone markers, no length
                continue
            if marker == 0xD9:  # EOI — also standalone (T.81
                break           # B.1.1.2); reading a length here
                                # desyncs on concatenated streams
            seg_len = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8,
                                                         0xCC):
                if pos + 9 <= n:
                    h, w = struct.unpack(
                        ">HH", payload[pos + 5:pos + 9])
                    return "jpeg", w, h
                break
            pos += 2 + seg_len
        return "jpeg", None, None
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return "gif", w, h
    return "unknown", None, None


def decode_image_meta(df: DataFrame, key_col: str = "doc_id",
                      payload_col: str = "payload") -> DataFrame:
    """binary payloads -> typed metadata via Arrow-batched UDF.

    One pass per Arrow batch; no shuffle. Metadata-only decode is the
    cheap pre-filter stage; full pixel decode is the CPU-bound stage
    you size executors for — keep
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` low enough that
    a batch of decoded frames fits in worker memory.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads are first-class rows (optional media
            # field, outer join): empty-bytes semantics, never a
            # worker TypeError
            payloads = [bytes(p) if p is not None else b""
                        for p in pdf[payload_col]]
            metas = [parse_image_header(p) for p in payloads]
            yield pd.DataFrame({
                "doc_id": pdf[key_col],
                "n_bytes": [len(p) for p in payloads],
                "format": [m[0] for m in metas],
                "width": pd.array([m[1] for m in metas],
                                  dtype="Int64"),
                "height": pd.array([m[2] for m in metas],
                                   dtype="Int64"),
            })

    return df.select(key_col, payload_col).mapInPandas(
        run, MEDIA_META_SCHEMA)


# ------------------------------------------------------- pixel decode

PIXELS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("r_sum", T.LongType()),
    T.StructField("g_sum", T.LongType()),
    T.StructField("b_sum", T.LongType()),
])


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _synth_png_full(doc_id: int) -> bytes:
    """A COMPLETE valid RGB8 PNG (signature, IHDR, zlib IDAT, IEND,
    real CRCs) with closed-form pixels: at (x, y) the channels are
    ((x+d)%256, (y+2d)%256, (x+y+3d)%256), d = doc_id. Rows alternate
    filter types None/Sub/Up so decode exercises real un-filtering.
    """
    import zlib

    w = 4 + doc_id % 13
    h = 4 + doc_id % 7
    stride = w * 3
    filtered = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = bytearray()
        for x in range(w):
            row += bytes(((x + doc_id) % 256, (y + 2 * doc_id) % 256,
                          (x + y + 3 * doc_id) % 256))
        if y == 0:
            ft, flt = 0, bytes(row)
        elif y % 2:  # Up
            ft = 2
            flt = bytes((row[i] - prev[i]) & 0xFF
                        for i in range(stride))
        else:        # Sub
            ft = 1
            flt = bytes((row[i] - (row[i - 3] if i >= 3 else 0)) & 0xFF
                        for i in range(stride))
        filtered += bytes([ft]) + flt
        prev = bytes(row)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(filtered), 6))
            + _png_chunk(b"IEND", b""))


def synth_png_images(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Deterministic fully-decodable PNG fixture blobs (see
    :func:`_synth_png_full`) — a SQL oracle can predict every decoded
    channel sum in closed form."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[key_col],
                "payload": [_synth_png_full(int(k))
                            for k in pdf[key_col]],
            })

    return df.select(key_col).mapInPandas(run, schema)


def _png_unfilter(raw: bytes, w: int, h: int,
                  bpp: int = 3) -> bytearray:
    """Reverse PNG scanline filtering (spec 1.2 §6: None/Sub/Up/
    Average/Paeth) — the full filter set, not just the fixture's."""
    stride = w * bpp
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(h):
        ft = raw[pos]
        pos += 1
        line = bytearray(raw[pos:pos + stride])
        pos += stride
        if ft == 1:    # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                line[i] = (line[i] + (a if pa <= pb and pa <= pc
                                      else b if pb <= pc else c)) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        out += line
        prev = line
    return out


def decode_png_pixels(payload: bytes) -> tuple:
    """Full stdlib PNG pixel decode for RGB8 non-interlaced images:
    chunk walk -> concatenated IDAT zlib stream -> un-filter ->
    per-channel sums. Returns (width, height, r_sum, g_sum, b_sum)
    or (None,)*5 for anything unsupported (never raises)."""
    import zlib

    if not payload.startswith(_PNG_SIG):
        return (None,) * 5
    pos = 8
    n = len(payload)
    w = h = None
    idat = bytearray()
    try:
        while pos + 8 <= n:
            clen = struct.unpack(">I", payload[pos:pos + 4])[0]
            ctype = payload[pos + 4:pos + 8]
            data = payload[pos + 8:pos + 8 + clen]
            if ctype == b"IHDR":
                w, h, depth, ctyp = struct.unpack(">IIBB", data[:10])
                if depth != 8 or ctyp != 2 or data[12] != 0:
                    return (None,) * 5  # not RGB8 non-interlaced
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
            pos += 12 + clen  # len + type + data + crc
        if w is None or not idat:
            return (None,) * 5
        px = _png_unfilter(zlib.decompress(bytes(idat)), w, h)
    except Exception:
        return (None,) * 5
    return (w, h, sum(px[0::3]), sum(px[1::3]), sum(px[2::3]))


def decode_image_pixels(df: DataFrame, key_col: str = "doc_id",
                        payload_col: str = "payload") -> DataFrame:
    """binary PNG payloads -> decoded pixel statistics via
    Arrow-batched UDF; one pass, no shuffle. This is the CPU-bound
    decode tier of the media pipeline — at 100 TB size
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of
    decoded frames fits worker memory (JPEG/video decode plugs in
    behind the same signature with an imaging/codec library)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = [decode_png_pixels(bytes(p)) if p is not None
                   else (None,) * 5
                   for p in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[key_col],
                "width": pd.array([r[0] for r in res], dtype="Int64"),
                "height": pd.array([r[1] for r in res], dtype="Int64"),
                "r_sum": pd.array([r[2] for r in res], dtype="Int64"),
                "g_sum": pd.array([r[3] for r in res], dtype="Int64"),
                "b_sum": pd.array([r[4] for r in res], dtype="Int64"),
            })

    return df.select(key_col, payload_col).mapInPandas(
        run, PIXELS_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_hash", T.StringType()),
])


def sample_frames(df: DataFrame, every_n_bytes: int = 64,
                  key_col: str = "doc_id",
                  payload_col: str = "payload") -> DataFrame:
    """Frame-sampling plumbing: 1→N fan-out inside the Arrow batch
    (video → sampled frames). The 'frame' here is a byte-slice hash;
    a real build emits decoded frame tensors with the same shape."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for key, payload in zip(pdf[key_col], pdf[payload_col]):
                if payload is None:  # no payload -> no frames
                    continue
                for i, off in enumerate(
                        range(0, len(payload), every_n_bytes)):
                    ids.append(key)
                    idxs.append(i)
                    hashes.append(hashlib.md5(
                        payload[off:off + every_n_bytes]).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_hash": hashes})

    return df.select(key_col, payload_col).mapInPandas(run, FRAME_SCHEMA)
