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

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so
``decode_image_batch`` dispatches to a decoder registry: the real entry
raises NotImplementedError; tests register a deterministic fake. The
Spark-side plumbing — schema, UDF signature, Arrow batch shape — is real
and tested.
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
    # STUB: real image decoding needs PIL/opencv, absent in this container.
    raise NotImplementedError(
        f"decoder '{decoder}' not registered; install a codec and call "
        "register_decoder(), or register a fake for tests"
    )


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


def resize_images(
    media: DataFrame, width: int, height: int, resizer: str = "real"
) -> DataFrame:
    """Arrow-batched resize. Same plumbing rules as decode: the codec
    callable is resolved DRIVER-side and ships in the closure; payloads
    cross the JVM boundary once per Arrow batch."""
    if resizer not in _RESIZERS:
        # STUB: real resizing needs PIL/opencv, absent in this container.
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
