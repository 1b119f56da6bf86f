"""Multimodal column conventions + processing plumbing (extension surface,
SURVEY 2.4).

Convention: a modality column is an opaque ``BinaryType`` payload plus a
typed metadata struct::

    payload  BINARY                      -- encoded image/audio/video bytes
    meta     STRUCT<format STRING, n_bytes BIGINT, modality STRING>

Ingestion at scale uses ``spark.read.format('binaryFile')`` (path, length,
modificationTime, content) or parquet with a binary column; here the
testdata has no binary tables, so :func:`attach_payloads` synthesizes
payloads from ``documents.text`` (UTF-8 bytes) -- the *plumbing* (schemas,
Arrow batch shapes, mapInPandas signatures, partition sizing) is real and
tested; only the codec is fake.

Decoders: the container has no image/audio libraries, so decode is a
deterministic fake derived from payload bytes, clearly marked; when
Pillow/soundfile are importable the same entry points dispatch to them.

Scale notes (100 TB): payloads never pass through Python row-at-a-time --
mapInPandas moves Arrow record batches; cap batch bytes via
``spark.sql.execution.arrow.maxRecordsPerBatch`` and keep partitions at
100-500 MB via ``maxPartitionBytes`` so a single executor never holds more
than a few batches of payloads.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..queries import register, t

if TYPE_CHECKING:
    import pandas as pd


def attach_payloads(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize the binary-payload convention from a text column."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit("txt").alias("format"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit("text").alias("modality"),
        ),
    )


IMAGE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
        StructField("n_pixels", LongType()),
        StructField("thumb", BinaryType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, str, bytes]:
    """Deterministic FAKE image decode: dimensions and a 16-byte "thumbnail"
    derived from the payload bytes.  Stands in for PIL.Image.open; real
    decode plugs in here unchanged."""
    if not payload:
        return 0, 0, "empty", b""
    width = 16 + payload[0] % 240
    height = 16 + payload[-1] % 240
    thumb = bytes(payload[i % len(payload)] for i in range(16))
    return width, height, "fake", thumb


def decode_images(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "doc_id") -> DataFrame:
    """Decode image payloads to (width, height, format, n_pixels, thumb) via
    mapInPandas -- Arrow-batched, no per-row Python round trips.

    Uses Pillow when importable; otherwise the deterministic fake codec
    (this container has no image libraries)."""
    try:
        from PIL import Image  # noqa: F401

        use_real = True
    except ImportError:
        use_real = False

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                if use_real:
                    try:
                        from PIL import Image

                        img = Image.open(io.BytesIO(data))
                        w, h, fmt = img.width, img.height, img.format or "?"
                        thumb = data[:16]
                    except Exception:
                        w, h, fmt, thumb = _fake_decode(data)
                else:
                    w, h, fmt, thumb = _fake_decode(data)
                rows.append(
                    (int(doc_id), w, h, fmt, int(w) * int(h), thumb)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_SCHEMA.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(
        decode_batches, schema=IMAGE_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 256,
    frame_bytes: int = 64,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emit a "frame" (byte
    slice) every ``every_n_bytes``.  A real demuxer (pyav/ffmpeg) replaces
    the slicer; the fan-out shape (1 row -> N frame rows) is the real
    pattern."""

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                for idx, off in enumerate(range(0, len(data), every_n_bytes)):
                    out.append((int(doc_id), idx, data[off : off + frame_bytes]))
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(sample, schema=FRAME_SCHEMA)


# -- registered queries ------------------------------------------------------


@register(
    "x17_multimodal_stats",
    "SELECT doc_id, octet_length(encode(text)) AS n_bytes, "
    "sha256(text) AS payload_sha256 FROM documents",
    "binary payload stats: byte length + content digest (JVM-side)",
)
def x17_payload_stats(spark, sf_dir) -> DataFrame:
    d = attach_payloads(t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("payload_sha256"),
    )


@register(
    "x18_multimodal_decode",
    None,  # mapInPandas codec plumbing -> rows-only check (deterministic)
    "image-decode plumbing via Arrow-batched mapInPandas (fake codec)",
)
def x18_decode(spark, sf_dir) -> DataFrame:
    d = attach_payloads(t(spark, sf_dir, "documents"))
    # Registry boundary: the driver canonicalizer only handles scalar
    # columns, so hex the binary thumb (tests/test_registry_schema.py).
    return decode_images(d).withColumn("thumb_hex", F.hex("thumb")).drop(
        "thumb"
    )
