"""Tar shard source — the WebDataset layout of multimodal training
data.

Large-scale multimodal corpora ship as tar shards whose members
group into samples by basename stem (``sample0.jpg`` +
``sample0.cls`` + ``sample0.json`` = one sample) — the public
WebDataset convention. This module hand-rolls the POSIX ustar
member walk (512-byte blocks, octal sizes, prefix+name fields,
zero-block terminator) with the same torn-input resilience as the
WARC walk, handles whole-shard gzip (``.tar.gz``), and exposes
both the per-member rows and the stem-grouped sample view.

Scale shape: member extraction is one Arrow map stage per shard row
— no shuffle; the sample grouping is ONE partial-agg groupBy on
(shard, stem), the natural relational op. At 100 TB each input row
is one shard (the unit WebDataset already sizes for sequential
I/O), so a 1000-executor cluster streams members per-partition.
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from html_parser_spark.sources.warc import _gunzip_members

__all__ = ["parse_tar", "synth_tar_shards", "tar_members",
           "webdataset_samples"]


# ----------------------------------------------------- fixture build


def _tar_header(name: str, size: int) -> bytes:
    h = bytearray(512)
    nb = name.encode("utf-8")
    h[0:len(nb)] = nb                       # name (<= 100)
    h[100:108] = b"0000644\x00"             # mode
    h[108:116] = b"0000000\x00"             # uid
    h[116:124] = b"0000000\x00"             # gid
    h[124:136] = f"{size:011o}".encode() + b"\x00"
    h[136:148] = b"00000000000\x00"         # mtime
    h[148:156] = b" " * 8                   # checksum (spaces first)
    h[156] = 0x30                           # typeflag '0' regular
    h[257:263] = b"ustar\x00"
    h[263:265] = b"00"
    chk = sum(h)
    h[148:156] = f"{chk:06o}".encode() + b"\x00 "
    return bytes(h)


def _member_bytes(doc_id: int, j: int) -> list[tuple[str, bytes]]:
    """One WebDataset sample's members (alphabetical by extension) —
    closed-form, mirrored by the SQL oracle."""
    stem = f"shard/sample{j}-{doc_id}"
    return [
        (f"{stem}.cls", str(doc_id % 10).encode()),
        (f"{stem}.json", f'{{"id": {doc_id}}}'.encode()),
        (f"{stem}.txt", f"text {j} of doc {doc_id}".encode()),
    ]


def _synth_tar(doc_id: int) -> bytes:
    """A COMPLETE valid ustar shard with 1 + doc_id % 2 samples of
    three members each, padded data blocks and the two-zero-block
    terminator; every 3rd-mod-1 doc is a whole-shard .tar.gz."""
    import gzip

    out = bytearray()
    for j in range(1 + doc_id % 2):
        for name, data in _member_bytes(doc_id, j):
            out += _tar_header(name, len(data))
            out += data
            pad = (-len(data)) % 512
            out += b"\x00" * pad
    out += b"\x00" * 1024
    if doc_id % 3 == 1:
        return gzip.compress(bytes(out), mtime=0)
    return bytes(out)


def synth_tar_shards(df: DataFrame,
                     key_col: str = "doc_id") -> DataFrame:
    """Deterministic WebDataset-style tar shard blobs (see
    :func:`_synth_tar`)."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[key_col],
                "payload": [_synth_tar(int(k))
                            for k in pdf[key_col]],
            })

    return df.select(key_col).mapInPandas(run, schema)


# ------------------------------------------------------- parse side


def parse_tar(payload: bytes) -> list[tuple[str, bytes]]:
    """ustar walk -> [(member_name, data), ...] for regular files.
    Gzip shards are inflated first; non-regular members (dirs,
    links, pax headers) are skipped; a corrupt header ends the walk
    at the last good member (torn-shard resilience). Never
    raises."""
    try:
        if payload[:2] == b"\x1f\x8b":
            plain = _gunzip_members(payload)
            if plain is None:
                return []
            payload = plain
        elif payload[:3] == b"BZh":
            import bz2
            payload = bz2.decompress(payload)
        elif payload[:6] == b"\xfd7zXZ\x00":
            import lzma
            payload = lzma.decompress(payload)
        out: list[tuple[str, bytes]] = []
        pos, n = 0, len(payload)
        pending_name: str | None = None
        while pos + 512 <= n:
            block = payload[pos:pos + 512]
            if block == b"\x00" * 512:
                break  # terminator
            if block[257:262] != b"ustar":
                break  # corrupt header
            try:
                size = int(block[124:136].split(b"\x00")[0]
                           .strip() or b"0", 8)
            except ValueError:
                break
            if size < 0 or pos + 512 + size > n:
                break  # torn member
            name = block[0:100].split(b"\x00")[0].decode(
                "utf-8", "replace")
            prefix = block[345:500].split(b"\x00")[0].decode(
                "utf-8", "replace")
            if prefix:
                name = prefix + "/" + name
            typeflag = block[156]
            data = payload[pos + 512:pos + 512 + size]
            pos += 512 + size + ((-size) % 512)
            if typeflag == 0x4C:  # GNU longname: names the NEXT one
                pending_name = data.split(b"\x00")[0].decode(
                    "utf-8", "replace")
            elif typeflag == 0x78:  # pax header: 'len key=value\n'
                for rec in data.split(b"\n"):
                    _, _, kv = rec.partition(b" ")
                    k, sep, v = kv.partition(b"=")
                    if sep and k == b"path":
                        pending_name = v.decode("utf-8", "replace")
            elif typeflag in (0x30, 0x00):  # regular file
                out.append((pending_name or name, data))
                pending_name = None
            else:
                pending_name = None  # dirs/links reset the override
        return out
    except Exception:
        return []


_MEMBERS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("member_idx", T.IntegerType()),
    T.StructField("name", T.StringType()),
    T.StructField("stem", T.StringType()),
    T.StructField("ext", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("body", T.BinaryType()),
    T.StructField("body_text", T.StringType()),
])


def tar_members(df: DataFrame, key_col: str = "doc_id",
                payload_col: str = "payload") -> DataFrame:
    """binary tar shards -> one row per regular member, with the
    WebDataset stem/ext split (basename up to the first dot; the
    directory path stays in the stem so same-named files in
    different dirs don't collide). ``body`` carries the raw member
    bytes — binary members (images/audio/video) route straight into
    the media decoders from here — and ``body_text`` is the UTF-8
    decode when the member is valid text, else NULL. One Arrow map
    stage, no shuffle; at 100 TB select AWAY the body column in
    metadata-only queries so column pruning keeps the bytes on
    disk."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k, p in zip(pdf[key_col], pdf[payload_col]):
                for i, (name, data) in enumerate(
                        parse_tar(bytes(p))):
                    base = name.rsplit("/", 1)
                    d, b = (base if len(base) == 2 else ("", name))
                    dot = b.find(".")
                    stem = (d + "/" if d else "") \
                        + (b[:dot] if dot > 0 else b)
                    ext = b[dot + 1:] if dot > 0 else ""
                    try:
                        txt = data.decode("utf-8")
                    except UnicodeDecodeError:
                        txt = None
                    rows.append((int(k), i, name, stem, ext,
                                 len(data), data, txt))
            if rows:
                yield pd.DataFrame(
                    rows, columns=[f.name for f in _MEMBERS_SCHEMA])

    return df.select(key_col, payload_col).mapInPandas(
        run, _MEMBERS_SCHEMA)


def webdataset_samples(members: DataFrame) -> DataFrame:
    """member rows -> one row per WebDataset SAMPLE: (doc_id, stem,
    n_members, exts as a sorted '+'-joined tag, total bytes). ONE
    partial-agg groupBy on (shard, stem) — map-side combine, no
    skew (stems are near-unique by construction)."""
    return (members.groupBy("doc_id", "stem").agg(
        F.count("*").cast("int").alias("n_members"),
        F.array_join(F.array_sort(F.collect_list("ext")), "+")
        .alias("exts"),
        F.sum("n_bytes").alias("total_bytes")))
