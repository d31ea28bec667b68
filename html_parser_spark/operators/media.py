"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed through Arrow-batched ``mapInPandas``.

The decode kernels are STUBS: this container has no image/audio
libraries, so ``_decode_image_stub`` derives deterministic fake
metadata from the bytes. The Spark-side contract — schema, UDF
signature, Arrow batch shape, partitioning — is real and tested; a
deployment swaps the stub body for PIL/libav calls behind the same
`mapInPandas` signature (the batch iterator shape does not change).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real decoder path, if ever available
    import PIL.Image  # noqa: F401
    HAVE_PIL = True
except Exception:  # pragma: no cover - this container has no PIL
    HAVE_PIL = False


MEDIA_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])

_FORMATS = ("png", "jpeg", "webp")


def with_binary(df: DataFrame, key_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(key, payload binary): stands in for an image/audio blob
    column; at 100 TB this is the `binary` column of the media table
    (never decoded during scans that don't ask for it — column
    pruning keeps blob I/O out of metadata-only queries)."""
    return df.select(
        F.col(key_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def _decode_image_stub(payload: bytes) -> tuple[str, int, int]:
    """Deterministic fake decode: metadata as a pure function of the
    byte length. Replace with a real decoder (PIL etc.) in deployment;
    the surrounding batch plumbing is identical."""
    n = len(payload)
    return (_FORMATS[n % 3], 64 + n % 640, 64 + n % 480)


def decode_image_meta(df: DataFrame, key_col: str = "doc_id",
                      payload_col: str = "payload") -> DataFrame:
    """binary payloads -> typed metadata via Arrow-batched UDF.

    One pass per Arrow batch; no shuffle. With a real decoder this is
    the CPU-bound stage you size executors for — keep
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` low enough that
    a batch of decoded frames fits in worker memory.
    """
    if HAVE_PIL:  # pragma: no cover
        raise NotImplementedError(
            "real decoder wiring intentionally left to deployment")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_image_stub(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[key_col],
                "n_bytes": [len(p) for p in pdf[payload_col]],
                "format": [m[0] for m in metas],
                "width": [m[1] for m in metas],
                "height": [m[2] for m in metas],
            })

    return df.select(key_col, payload_col).mapInPandas(
        run, MEDIA_META_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_hash", T.StringType()),
])


def sample_frames(df: DataFrame, every_n_bytes: int = 64,
                  key_col: str = "doc_id",
                  payload_col: str = "payload") -> DataFrame:
    """Frame-sampling plumbing: 1→N fan-out inside the Arrow batch
    (video → sampled frames). The stub 'frame' is a byte-slice hash;
    a real build emits decoded frame tensors with the same shape."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for key, payload in zip(pdf[key_col], pdf[payload_col]):
                for i, off in enumerate(
                        range(0, len(payload), every_n_bytes)):
                    ids.append(key)
                    idxs.append(i)
                    hashes.append(hashlib.md5(
                        payload[off:off + every_n_bytes]).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_hash": hashes})

    return df.select(key_col, payload_col).mapInPandas(run, FRAME_SCHEMA)
