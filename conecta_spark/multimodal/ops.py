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

from ..plans.skew import spread
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


def _decode_payload(payload: bytes) -> tuple[int, int, str, bytes]:
    """Codec dispatch on the payload's magic bytes: a real PNG decodes
    through the pure-numpy reader (:mod:`.png` -- CRC-checked chunk walk,
    zlib inflate, all five scanline filters); anything else falls to the
    documented deterministic fake.  A UTF-8 text payload can never
    collide with the dispatch: 0x89 is not a valid UTF-8 leading byte,
    so the synthesized text corpora always take the fake arm."""
    from .png import PNG_SIG, decode_png

    if payload[:8] == PNG_SIG:
        img = decode_png(payload)
        h, w = img.shape
        return w, h, "png", img.tobytes()[:16]
    return _fake_decode(payload)


def decode_images(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "doc_id", codec: str = "auto") -> DataFrame:
    """Decode image payloads to (width, height, format, n_pixels, thumb) via
    mapInPandas -- Arrow-batched, no per-row Python round trips.

    ``codec="auto"`` uses Pillow when importable, else the deterministic
    fake codec (this container has no image libraries); ``codec="fake"``
    pins the fake codec regardless -- the registry entry x18 does this so
    its DuckDB oracle (which mirrors the fake codec's byte arithmetic in
    SQL) stays correct even on a host where PIL exists."""
    if codec == "fake":
        use_real = False
    else:
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
                        w, h, fmt, thumb = _decode_payload(data)
                else:
                    w, h, fmt, thumb = _decode_payload(data)
                rows.append(
                    (int(doc_id), w, h, fmt, int(w) * int(h), thumb)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_SCHEMA.fields]
            )

    # Deliberately NOT spread: the decode here is cheap per row (header
    # byte arithmetic, not pixel work), so widening a narrow scan pays a
    # payload-bytes shuffle + 32-way Arrow batch dispatch for less
    # per-row CPU than it costs (A/B measured x18 0.30 -> 0.55 s with
    # spread at sf0.1).  Real image corpora never arrive as one row
    # group, so the narrow-input case is a bench-scale artifact; the
    # genuinely heavy per-row map (png_roundtrip_stats) keeps spread.
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

    # not spread: frame "sampling" here is byte slicing, cheap per row
    # (see decode_images for the measured trade)
    return df.select(id_col, payload_col).mapInPandas(sample, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("scale_num", IntegerType()),
        StructField("scale_den", IntegerType()),
        StructField("resized", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    max_side: int = 64,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Resize plumbing: bound the longer image side to ``max_side``,
    preserving aspect ratio via exact integer scaling.  The fake codec
    "resizes" by striding the payload bytes (output length tracks the area
    ratio); Pillow's ``Image.resize`` replaces the stride when importable.
    The Spark shape is the real thing either way: Arrow-batched 1:1 map,
    binary in / binary out, no shuffle."""

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                w, h, _fmt, _thumb = _fake_decode(data)
                side = max(w, h)
                num, den = (max_side, side) if side > max_side else (1, 1)
                ow, oh = w * num // den, h * num // den
                stride = max(1, (den * den) // (num * num))
                rows.append(
                    (int(doc_id), ow, oh, num, den, data[::stride])
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZE_SCHEMA.fields]
            )

    # not spread: the fake-codec resize is byte arithmetic, cheap per
    # row (see decode_images for the measured trade)
    return df.select(id_col, payload_col).mapInPandas(
        resize, schema=RESIZE_SCHEMA
    )


FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("f_sum", LongType()),
        StructField("f_norm2", LongType()),
        StructField("feature_hex", StringType()),
    ]
)


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature-extraction plumbing: a ``FEATURE_DIM``-byte embedding per
    payload (deterministic fake: byte-bucket histogram folded mod 256 --
    a real vision encoder batch-infers here), emitted hex plus exact
    integer projections so downstream similarity ops (x10/x36) can consume
    it.  Scale shape: Arrow-batched map, feature width fixed, payload
    never leaves the task."""
    import numpy as np

    def feats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = np.frombuffer(
                    bytes(payload) if payload is not None else b"",
                    dtype=np.uint8,
                )
                vec = np.zeros(FEATURE_DIM, dtype=np.int64)
                if data.size:
                    np.add.at(vec, data % FEATURE_DIM, data.astype(np.int64))
                    vec %= 256
                rows.append(
                    (
                        int(doc_id),
                        int(vec.sum()),
                        int((vec * vec).sum()),
                        bytes(vec.astype(np.uint8)).hex(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    # not spread: the byte-histogram features are cheap per row (see
    # decode_images for the measured trade)
    return df.select(id_col, payload_col).mapInPandas(
        feats, schema=FEATURE_SCHEMA
    )


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
    # The fake codec is pure byte arithmetic over the UTF-8 payload, so
    # (like x45) the WHOLE mapInPandas pipeline is oracle-checkable: the
    # SQL mirrors width/height (first/last byte mod 240) and the cycled
    # 16-byte thumbnail via ASCII codepoints -- exact for this corpus.
    # Was rows-only through round 4; the codec pin (codec="fake") makes
    # the oracle stable even where PIL exists.
    "WITH p AS (SELECT doc_id, text, length(text) AS n FROM documents) "
    "SELECT doc_id, "
    " CASE WHEN n = 0 THEN 0"
    "  ELSE 16 + ascii(substr(text, 1, 1)) % 240 END AS width, "
    " CASE WHEN n = 0 THEN 0"
    "  ELSE 16 + ascii(substr(text, n, 1)) % 240 END AS height, "
    " CASE WHEN n = 0 THEN 'empty' ELSE 'fake' END AS format, "
    " CAST(CASE WHEN n = 0 THEN 0"
    "  ELSE (16 + ascii(substr(text, 1, 1)) % 240)"
    "   * (16 + ascii(substr(text, n, 1)) % 240) END AS BIGINT)"
    "  AS n_pixels, "
    " CASE WHEN n = 0 THEN ''"
    "  ELSE upper(hex(substr(repeat(text, CAST(16 / n AS INT) + 1),"
    "   1, 16))) END AS thumb_hex "
    "FROM p",
    "image-decode plumbing via Arrow-batched mapInPandas (fake codec, "
    "pinned; oracle mirrors the byte arithmetic in SQL)",
)
def x18_decode(spark, sf_dir) -> DataFrame:
    d = attach_payloads(t(spark, sf_dir, "documents"))
    # Registry boundary: the driver canonicalizer only handles scalar
    # columns, so hex the binary thumb (tests/test_registry_schema.py).
    return (
        decode_images(d, codec="fake")
        .withColumn("thumb_hex", F.hex("thumb"))
        .drop("thumb")
    )


@register(
    "x45_multimodal_features",
    "WITH cp AS (SELECT doc_id, list_transform(range(1, length(text)+1), "
    " i -> ascii(substr(text, i, 1))) AS bs FROM documents), "
    "vecs AS (SELECT doc_id, list_transform(range(0, 16), k -> "
    " CAST(coalesce(list_sum(list_filter(bs, b -> b % 16 = k)), 0) % 256"
    "  AS BIGINT)) AS v FROM cp) "
    "SELECT doc_id, CAST(list_sum(v) AS BIGINT) AS f_sum, "
    " CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS f_norm2, "
    " list_aggregate(list_transform(v, x -> lpad(lower(hex(x)), 2, '0')), "
    "  'string_agg', '') AS feature_hex "
    "FROM vecs",
    "feature-extraction plumbing: 16-byte embedding per payload via "
    "Arrow-batched mapInPandas (deterministic fake encoder -- byte-bucket "
    "histogram mod 256, exact integer math, so unusually for a multimodal "
    "op the full pipeline is oracle-checkable; the oracle mirrors the "
    "UTF-8 byte fold via ASCII codepoints, exact for this corpus)",
)
def x45_features(spark, sf_dir) -> DataFrame:
    d = attach_payloads(t(spark, sf_dir, "documents"))
    return extract_features(d)


PNG_SYNTH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixels", LongType()),
        StructField("pix_sum", LongType()),
        StructField("pix_first", LongType()),
        StructField("pix_last", LongType()),
    ]
)


def png_roundtrip_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The REAL byte-format decode proof (r8 verdict task 7): per doc,
    synthesize a deterministic grayscale image (pixel i = (id*31 + i)
    mod 256, width 4 + id%13, height 4 + id*7%11), encode it to a REAL
    PNG (zlib, CRC chunks, scanline filters cycling through all five
    predictor types), decode it back with the pure-numpy reader, and
    emit stats OF THE DECODED PIXELS.  The x70 oracle recomputes the
    same stats from the synthesis formula alone -- DuckDB never sees a
    PNG byte -- so any mis-parse (filter math, CRC, inflate, row order)
    value-diverges.  Scale shape: Arrow-batched 1:1 map, no shuffle;
    payloads live and die inside the task (the decode_images contract
    with a genuine codec in the slot)."""
    import numpy as np

    from .png import decode_png, encode_png

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                w, h = 4 + d % 13, 4 + (d * 7) % 11
                img = (
                    (d * 31 + np.arange(w * h, dtype=np.int64)) % 256
                ).astype(np.uint8).reshape(h, w)
                out = decode_png(encode_png(img))
                oh, ow = out.shape
                flat = out.astype(np.int64).ravel()
                rows.append(
                    (
                        d,
                        ow,
                        oh,
                        int(flat.size),
                        int(flat.sum()),
                        int(flat[0]),
                        int(flat[-1]),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in PNG_SYNTH_SCHEMA.fields]
            )

    # spread: the PNG encode/decode round-trip is pure per-row Python
    # (the heaviest map in the registry); parallelize a narrow scan
    return spread(df.select(id_col)).mapInPandas(batches, schema=PNG_SYNTH_SCHEMA)


@register(
    "x70_multimodal_png_decode",
    # n_pixels <= 16 * 14 = 224, so a bounded range cross join covers
    # every pixel index; the oracle recomputes the decoded pixel stats
    # from the synthesis formula -- a genuine cross-engine check of the
    # real PNG round-trip happening Spark-side.
    "WITH px AS (SELECT d.doc_id, i FROM documents d "
    "  CROSS JOIN range(0, 224) t(i) "
    "  WHERE i < (4 + d.doc_id % 13) * (4 + (d.doc_id * 7) % 11)) "
    "SELECT doc_id, "
    " CAST(4 + doc_id % 13 AS BIGINT) AS width, "
    " CAST(4 + (doc_id * 7) % 11 AS BIGINT) AS height, "
    " CAST(COUNT(*) AS BIGINT) AS n_pixels, "
    " CAST(SUM((doc_id * 31 + i) % 256) AS BIGINT) AS pix_sum, "
    " CAST(doc_id * 31 % 256 AS BIGINT) AS pix_first, "
    " CAST((doc_id * 31 + (4 + doc_id % 13) * (4 + (doc_id * 7) % 11)"
    "   - 1) % 256 AS BIGINT) AS pix_last "
    "FROM px GROUP BY doc_id",
    "REAL image-codec decode proof: synthesize -> encode to genuine PNG "
    "(zlib + CRC + all 5 scanline filters) -> pure-numpy decode -> pixel "
    "stats; the oracle recomputes them from the synthesis formula, never "
    "touching a PNG byte",
)
def x70_png_decode(spark, sf_dir) -> DataFrame:
    return png_roundtrip_stats(t(spark, sf_dir, "documents"))
