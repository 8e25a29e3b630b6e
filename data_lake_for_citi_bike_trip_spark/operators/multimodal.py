"""Multimodal column handling — image/audio/video as opaque binary.

Design (the part that matters at 100 TB):
- media travels as a ``binary`` payload column + typed metadata struct;
  Parquet stores it page-compressed, scans prune it unless selected.
- decode/feature-extract runs as Arrow-batched ``mapInPandas`` so bytes
  cross the JVM<->Python boundary once per batch, never per row; batch
  size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  (set low for large payloads — keep batches ~tens of MB).
- partitioning: payload tables repartition by a content-hash bucket so
  decode work balances even when payload sizes are skewed.

Codecs: PIL/librosa/ffmpeg are NOT in this container, but uncompressed
BMP and PPM are parseable with the stdlib alone — so the DEFAULT
('real') decoder genuinely decodes those formats end-to-end (see
``decode_bmp`` / ``decode_ppm`` / ``sniff_decode``), and the default
resizer does real nearest-neighbor resampling of BMP pixels via numpy.
Formats that need external codecs still raise NotImplementedError; the
registry lets deployments plug them in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Output schema of the image-decode stage.
IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
    ]
)

#: Decoder registry: name -> bytes -> (width, height, channels).
_DECODERS: dict[str, Callable[[bytes], tuple[int, int, int]]] = {}


def register_decoder(name: str, fn: Callable[[bytes], tuple[int, int, int]]) -> None:
    _DECODERS[name] = fn


def _resolve_decoder(decoder: str) -> Callable[[bytes], tuple[int, int, int]]:
    """Resolve on the DRIVER, at plan-build time: executors re-import this
    module with an empty registry, so the callable must travel inside the
    mapInPandas closure (cloudpickle), not be looked up worker-side."""
    if decoder in _DECODERS:
        return _DECODERS[decoder]
    raise NotImplementedError(
        f"decoder '{decoder}' not registered; install a codec and call "
        "register_decoder(), or register a fake for tests"
    )


# -- pure-stdlib codecs (the formats decodable without external deps) -------


def decode_bmp(raw: bytes) -> tuple[int, int, int]:
    """Uncompressed-BMP header parse (BITMAPINFOHEADER): width/height are
    int32 LE at offsets 18/22, bits-per-pixel uint16 LE at 28. Height can
    be negative (top-down rows) — dimension is its magnitude."""
    import struct

    if raw[:2] != b"BM":
        raise ValueError("not a BMP payload")
    width = struct.unpack_from("<i", raw, 18)[0]
    height = struct.unpack_from("<i", raw, 22)[0]
    bpp = struct.unpack_from("<H", raw, 28)[0]
    return width, abs(height), max(1, bpp // 8)


def decode_ppm(raw: bytes) -> tuple[int, int, int]:
    """Netpbm P6 (RGB) / P5 (gray) header parse."""
    parts = raw.split(maxsplit=3)
    magic, width, height = parts[0], int(parts[1]), int(parts[2])
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a P5/P6 netpbm payload")
    return width, height, 3 if magic == b"P6" else 1


def sniff_decode(raw: bytes) -> tuple[int, int, int]:
    """Default decoder: dispatch on magic bytes to the stdlib-decodable
    formats; anything else needs an externally registered codec."""
    if raw[:2] == b"BM":
        return decode_bmp(raw)
    if raw[:2] in (b"P6", b"P5"):
        return decode_ppm(raw)
    raise NotImplementedError(
        "only BMP/PPM are decodable without external codecs; "
        "register_decoder() a real one (PIL/opencv) for this format"
    )


_DECODERS.update({"bmp": decode_bmp, "ppm": decode_ppm, "real": sniff_decode})


def media_table(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents: utf-8 payload bytes +
    typed metadata — the schema shape a real ingest would produce."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/png").alias("mime"),
            F.octet_length("text").alias("declared_bytes"),
        ).alias("meta"),
    )


def _le_hex(col, nbytes: int):
    """Little-endian hex of an integer column, ``nbytes`` wide — byte
    pairs of the zero-padded big-endian hex, reversed. Pure codegen."""
    digits = nbytes * 2
    hx = F.lpad(F.hex(col.cast("bigint")), digits, "0")
    return F.concat(*[F.substring(hx, digits - 2 * i - 1, 2) for i in range(nbytes)])


def synthetic_bmp_table(docs: DataFrame) -> DataFrame:
    """REAL 24-bit BMP payloads built entirely JVM-side: the 54-byte
    BITMAPFILEHEADER+BITMAPINFOHEADER is assembled as a hex string
    (little-endian fields via ``_le_hex``) and ``unhex``-ed together with
    zeroed, 4-byte-row-padded pixel data. Dimensions derive from source
    columns (width = n_chars%31+1, height = doc_id%17+1) so an oracle can
    predict them — while the decode stage downstream parses genuine BMP
    bytes, not a fake."""
    dims = (
        docs.select(
            F.col("doc_id").alias("media_id"),
            (F.col("n_chars") % 31 + 1).cast("long").alias("w"),
            (F.col("doc_id") % 17 + 1).cast("long").alias("h"),
        )
        .withColumn("row_size", F.expr("((w * 3 + 3) div 4) * 4"))
        .withColumn("data_size", F.expr("row_size * h"))
    )
    header_hex = F.concat(
        F.lit("424D"),                        # 'BM'
        _le_hex(F.col("data_size") + 54, 4),  # file size
        F.lit("00000000"),                    # reserved
        F.lit("36000000"),                    # pixel data offset = 54
        F.lit("28000000"),                    # BITMAPINFOHEADER size = 40
        _le_hex(F.col("w"), 4),
        _le_hex(F.col("h"), 4),
        F.lit("0100"),                        # planes = 1
        F.lit("1800"),                        # bpp = 24
        F.lit("00000000"),                    # compression = BI_RGB
        _le_hex(F.col("data_size"), 4),
        F.lit("00" * 16),                     # ppm/palette fields
    )
    return dims.select(
        "media_id",
        F.unhex(
            F.concat(header_hex, F.expr("repeat('00', CAST(data_size AS INT))"))
        ).alias("payload"),
        F.struct(
            F.lit("image/bmp").alias("mime"),
            (F.col("data_size") + 54).alias("declared_bytes"),
        ).alias("meta"),
    )


def decode_images(media: DataFrame, decoder: str = "real") -> DataFrame:
    """Arrow-batched decode: mapInPandas over (media_id, payload)."""
    decode = _resolve_decoder(decoder)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                w, h, c = decode(raw)
                out.append(
                    (
                        int(media_id),
                        len(raw),
                        hashlib.sha1(raw).hexdigest(),
                        w,
                        h,
                        c,
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_META_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=IMAGE_META_SCHEMA
    )


def payload_stats(media_source_docs: DataFrame, chunk_bytes: int = 256) -> DataFrame:
    """Pure-expression payload metadata (no Python): byte length, content
    hash, chunk count — the part of the multimodal path that stays in
    codegen and is oracle-checkable."""
    nbytes = F.octet_length("text").cast("bigint")
    return media_source_docs.select(
        F.col("doc_id").alias("media_id"),
        nbytes.alias("n_bytes"),
        F.md5("text").alias("content_md5"),
        F.expr(f"(octet_length(text) + {chunk_bytes - 1}) div {chunk_bytes}").alias(
            "n_chunks"
        ),
    )


#: Output schema of the resize stage.
RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)

#: Output schema of video frame sampling (one row per sampled frame).
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)

_RESIZERS: dict[str, Callable[[bytes, int, int], bytes]] = {}
_FRAMERS: dict[str, Callable[[bytes, int], list[bytes]]] = {}


def register_resizer(name: str, fn: Callable[[bytes, int, int], bytes]) -> None:
    _RESIZERS[name] = fn


def register_framer(name: str, fn: Callable[[bytes, int], list[bytes]]) -> None:
    _FRAMERS[name] = fn


def resize_bmp(raw: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor resample of a 24-bit uncompressed BMP
    (numpy, vectorized index maps) re-encoded as BMP. Stdlib+numpy only."""
    import struct

    import numpy as np

    w, h, c = decode_bmp(raw)
    if c != 3:
        raise ValueError("resize_bmp handles 24-bit BMPs only")
    offset = struct.unpack_from("<I", raw, 10)[0]
    row_size = ((w * 3 + 3) // 4) * 4
    px = np.frombuffer(raw, dtype=np.uint8, count=row_size * h, offset=offset)
    px = px.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    out = px[ys][:, xs]
    out_row = ((width * 3 + 3) // 4) * 4
    padded = np.zeros((height, out_row), dtype=np.uint8)
    padded[:, : width * 3] = out.reshape(height, width * 3)
    data = padded.tobytes()
    header = bytearray(raw[:54])
    struct.pack_into("<I", header, 2, 54 + len(data))
    struct.pack_into("<I", header, 10, 54)
    struct.pack_into("<i", header, 18, width)
    struct.pack_into("<i", header, 22, height)
    struct.pack_into("<I", header, 34, len(data))
    return bytes(header) + data


_RESIZERS.update({"bmp": resize_bmp, "real": resize_bmp})


def resize_images(
    media: DataFrame, width: int, height: int, resizer: str = "real"
) -> DataFrame:
    """Arrow-batched resize. Same plumbing rules as decode: the codec
    callable is resolved DRIVER-side and ships in the closure; payloads
    cross the JVM boundary once per Arrow batch. The default resizer is
    a REAL BMP nearest-neighbor resampler; other formats need a
    registered codec."""
    if resizer not in _RESIZERS:
        raise NotImplementedError(
            f"resizer '{resizer}' not registered; install a codec and call "
            "register_resizer(), or register a fake for tests"
        )
    fn = _RESIZERS[resizer]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = [
                (int(mid), width, height, fn(bytes(payload), width, height))
                for mid, payload in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(
                out, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_nth: int = 10, framer: str = "real"
) -> DataFrame:
    """Video frame sampling: one output row per kept frame (a flatMap
    shape — mapInPandas yields more rows than it consumes)."""
    if framer not in _FRAMERS:
        # STUB: real demuxing needs ffmpeg/pyav, absent in this container.
        raise NotImplementedError(
            f"framer '{framer}' not registered; install a codec and call "
            "register_framer(), or register a fake for tests"
        )
    fn = _FRAMERS[framer]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, frame in enumerate(fn(bytes(payload), every_nth)):
                    rows.append((int(mid), i, frame))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=FRAME_SCHEMA
    )
