"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas stages.

The decode step is STUBBED (this container ships no image/audio libs): the
"decoder" derives deterministic fake features from the bytes so the
Spark-side plumbing — schema, batching, partitioning, UDF signatures — is
real and tested (tests/test_multimodal.py). Swapping `_fake_decode` for a
PIL/ffmpeg call is the only change needed on a real cluster.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),   # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),  # opaque bytes
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha256", StringType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: 16 floats derived from the
    sha256 of the payload. Replace with PIL/torchvision/ffmpeg on a cluster.

    Raises on empty payloads the way a real decoder would on corrupt media.
    """
    if not payload:
        raise ValueError("empty media payload (corrupt input)")
    h = hashlib.sha256(payload).digest()
    return (
        np.frombuffer(h[:FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
        / 65535.0
    )


def extract_features(media: DataFrame, on_error: str = "skip") -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Arrow moves the
    bytes in batches; rows with corrupt payloads are skipped (on_error='skip')
    or raise (on_error='raise')."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in FEATURE_SCHEMA.fields}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                try:
                    feat = _fake_decode(bytes(payload) if payload is not None else b"")
                except ValueError:
                    if on_error == "raise":
                        raise
                    continue
                out["media_id"].append(int(mid))
                out["kind"].append(kind)
                out["n_bytes"].append(len(payload))
                out["sha256"].append(hashlib.sha256(bytes(payload)).hexdigest())
                out["feature"].append([float(x) for x in feat])
            yield pd.DataFrame(out)

    return media.select(
        "media_id", "kind", "payload"
    ).mapInPandas(run, schema=FEATURE_SCHEMA)


# ------------------------------------------------------------- driver gate
def multimodal_features(spark, sf_dir: str) -> DataFrame:
    """The multimodal pipeline under the DuckDB value-hash gate: synthesize a
    media table from documents (payload = UTF-8 bytes of text, kind cycling
    image/audio/video), run the REAL mapInPandas feature extraction, and emit
    byte-count, sha256 and the 16 u16 feature components (the deterministic
    stub decoder derives them from the digest, so the whole derivation is
    restatable in SQL). Empty payloads exercise the corrupt-row skip path."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    media = d.select(
        F.col("doc_id").cast("long").alias("media_id"),
        kind.alias("kind"),
        F.lit(None).cast("string").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )
    feats = extract_features(media, on_error="skip")
    return feats.select(
        "media_id", "kind", "n_bytes", "sha256",
        F.array_join(
            F.transform(
                "feature",
                lambda x: F.round(x * 65535).cast("bigint").cast("string"),
            ),
            ",",
        ).alias("feature_u16"),
    ).orderBy("media_id")


def _mm_sql() -> str:
    # u16 little-endian pairs of the sha256 digest, restated over the hex
    # string: byte k = 16*hex[2k] + hex[2k+1]; u16 j = byte(2j) + 256*byte(2j+1)
    def hexval(pos: int) -> str:
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    def byte(k: int) -> str:
        return f"(16*{hexval(2 * k + 1)} + {hexval(2 * k + 2)})"

    u16s = [f"CAST({byte(2 * j)} + 256*{byte(2 * j + 1)} AS VARCHAR)"
            for j in range(FEATURE_DIM)]
    feature = " || ',' || ".join(u16s)
    return f"""
WITH m AS (
  SELECT doc_id::BIGINT AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         octet_length(encode(text))::BIGINT AS n_bytes,
         sha256(text) AS h
  FROM documents
  WHERE octet_length(encode(text)) > 0
)
SELECT media_id, kind, n_bytes, h AS sha256, {feature} AS feature_u16
FROM m ORDER BY media_id
"""


MULTIMODAL_FEATURES_SQL = _mm_sql()

ORACLES = {"multimodal_features": MULTIMODAL_FEATURES_SQL}
QUERIES = {"multimodal_features": multimodal_features}


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: passes metadata through, marks the payload as
    resized (payload transformation stubbed — NotImplemented on real decode).
    The output schema and partitioning behavior are what the real operator
    will have."""
    return media.withColumn("width", F.lit(width)).withColumn(
        "height", F.lit(height)
    ).withColumn("resized", F.lit(True))


def frame_sample_stub(media: DataFrame, every_ms: int) -> DataFrame:
    """Video frame sampling plumbing: emits one row per sampled timestamp
    using a JVM-side sequence explode (the real decoder would attach frame
    bytes per row)."""
    return (
        media.where(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce("duration_ms", F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ts_ms", "mime")
    )
