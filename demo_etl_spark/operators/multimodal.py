"""Multimodal column plumbing (north-star extension; BASELINE.json).

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched pandas iterators (``mapInPandas``) —
the correct Spark shape for media work at 100 TB:

* payloads stay off the driver (never collected);
* decode/feature-extract runs once per Arrow batch, not per row;
* output schema is declared up front so Catalyst can prune downstream;
* partitioning is preserved — no shuffle is introduced by the map.

The actual codecs (PIL/libav/etc.) are NOT in this container, so the
decode step is a clearly-marked deterministic fake behind
``decode_image_stub`` — the Spark-side plumbing (schema, batch iteration,
UDF signatures) is real and tested. Swap ``_fake_decode`` for a real
decoder when the codec libraries are available.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from demo_etl_spark.context import DEFAULT_CONTEXT, RunContext
from demo_etl_spark.io import load_star

#: media table schema: opaque payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("source_doc_id", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature_hash", StringType()),
    ]
)


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Build a media table from documents: text bytes stand in for an
    encoded payload (deterministic; exercises the binary column path)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.col("doc_id").alias("source_doc_id"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB: deterministic fake of an image decode.

    Real implementation would be e.g. ``PIL.Image.open(io.BytesIO(p)).size``;
    codec libs are absent in this environment (see module docstring).
    """
    h = hashlib.md5(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, schema-declared."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["payload"].map(len).astype("int32"),
                    "width": dims.map(lambda t: t[0]).astype("int32"),
                    "height": dims.map(lambda t: t[1]).astype("int32"),
                    "feature_hash": pdf["payload"].map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


RESIZE_TARGET = (32, 32)
FRAME_SAMPLE_EVERY = 1024  # one sampled "frame" per KiB of payload

RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized_payload", BinaryType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_offset", IntegerType()),
        StructField("frame_hash", StringType()),
    ]
)


def resize_media(media: DataFrame, target: tuple[int, int] = RESIZE_TARGET) -> DataFrame:
    """mapInPandas resize: STUB decode (see ``_fake_decode``) + a
    deterministic downsample fake (payload truncated to w·h bytes — a
    real impl swaps in ``PIL.Image.resize``). The Spark plumbing —
    binary-in/binary-out Arrow batches, declared schema, no shuffle —
    is the real thing."""
    w_t, h_t = target

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": w_t,
                    "height": h_t,
                    "resized_payload": pdf["payload"].map(
                        lambda b: bytes(b)[: w_t * h_t]
                    ),
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, every: int = FRAME_SAMPLE_EVERY
) -> DataFrame:
    """mapInPandas frame sampling for video payloads: one output row per
    ``every`` bytes (STUB for per-frame decode; a real impl samples
    keyframes via libav). Demonstrates the 1→N exploding UDF shape —
    output rows ≠ input rows, schema declared up front."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [], "frame_index": [], "frame_offset": [], "frame_hash": []
            }
            vids = pdf[pdf["media_type"] == "video"]
            for mid, payload in zip(vids["media_id"], vids["payload"]):
                raw = bytes(payload)
                for i, off in enumerate(range(0, len(raw), every)):
                    chunk = raw[off:off + every]
                    out["media_id"].append(mid)
                    out["frame_index"].append(i)
                    out["frame_offset"].append(off)
                    out["frame_hash"].append(hashlib.md5(chunk).hexdigest())
            # explicit dtypes: a video-free batch yields 0 rows and pandas
            # would otherwise infer object columns Arrow can't cast
            yield pd.DataFrame(out).astype(
                {"media_id": "int64", "frame_index": "int32", "frame_offset": "int32"}
            )

    return media.mapInPandas(batches, FRAME_SCHEMA)


def build_features(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    docs = load_star(spark, sf_dir)["documents"]
    return extract_features(synthesize_media(docs))


def build_features_checked(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """The oracle-checked projection of the feature pipeline: the columns a
    SQL engine can reproduce (md5 + byte length of the payload). The stub-
    derived width/height are excluded here (pytest covers them) — but the
    values below still flow through the real mapInPandas path, so the
    driver check genuinely exercises the Arrow-batched Python plumbing."""
    return build_features(spark, sf_dir, ctx).select(
        "media_id", "media_type", "byte_len", "feature_hash"
    )


# Engine-parity oracle: byte_len and feature_hash of a utf-8 payload are
# SQL-expressible. DuckDB's md5(VARCHAR) hashes the string's UTF-8 bytes —
# exactly the payload the Python worker hashes; octet_length(encode(...))
# measures the same bytes (n_chars == byte_len is NOT assumed).
ORACLE_SQL_FEATURES = """
SELECT doc_id AS media_id,
       ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
       CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
       md5(text) AS feature_hash
FROM documents
"""


def build_frames(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """Registered frame-sampling query: the 1→N exploding mapInPandas
    shape, oracle-checked. The synthetic payload is the document's
    UTF-8 bytes and the corpus is ASCII, so the oracle can re-slice
    with char-based substr (byte offset == char offset there; a real
    codec payload would be checked by the pytest path instead)."""
    docs = load_star(spark, sf_dir)["documents"]
    return sample_frames(synthesize_media(docs))


ORACLE_SQL_FRAMES = f"""
WITH vids AS (
  SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 2
),
offsets AS (
  SELECT media_id, text,
         unnest(generate_series(0, greatest(length(text) - 1, 0),
                                {FRAME_SAMPLE_EVERY})) AS frame_offset
  FROM vids
)
SELECT media_id,
       CAST(frame_offset / {FRAME_SAMPLE_EVERY} AS INT) AS frame_index,
       CAST(frame_offset AS INT) AS frame_offset,
       md5(substr(text, frame_offset + 1, {FRAME_SAMPLE_EVERY})) AS frame_hash
FROM offsets
"""
