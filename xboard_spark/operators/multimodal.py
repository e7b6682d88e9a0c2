"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode step is stubbed two ways (choose with ``decoder=``):

- ``"fake"``  — a deterministic content-hash-derived feature vector /
  frame sample, so the full Spark plumbing (schema, batching, partitioning,
  UDF signature) is real and testable end-to-end.
- ``"real"``  — raises ``NotImplementedError`` with the exact integration
  point documented, so wiring a real codec later is a one-function change.

Scale design: ``mapInPandas`` streams Arrow record batches through Python —
memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
regardless of table size; binary payloads never pass through the driver;
per-file work parallelizes by input partition. For 100 TB of media the
table should store (uri, byte_range) pointers instead of inline bytes and
the UDF fetches from object storage — same signatures either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ms", T.LongType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def _fake_features(content: bytes) -> list[float]:
    """Deterministic stand-in for an image/audio embedding: bytes of the
    sha256 digest scaled to [0,1). Replace with a real model forward pass
    at the ``decoder="real"`` integration point."""
    digest = hashlib.sha256(content or b"").digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + featurize each media row (Arrow-batched, executor-side)."""
    if decoder == "real":
        raise NotImplementedError(
            "real decoders (PIL/ffmpeg) are not installed in this container; "
            "plug them in here — the mapInPandas plumbing below is unchanged"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(lambda b: len(b or b"")).astype("int64"),
                    "content_sha": content.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "features": content.map(_fake_features),
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, decoder: str = "fake"
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (a 1->N
    mapInPandas — the UDF yields more rows than it consumes, exactly how a
    real ffmpeg frame extractor plugs in)."""
    if decoder == "real":
        raise NotImplementedError(
            "real frame extraction needs ffmpeg; the fan-out plumbing below "
            "is the integration point"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [],
                "frame_idx": [],
                "frame_ms": [],
                "frame_sha": [],
            }
            for _, row in pdf.iterrows():
                if row["kind"] != "video":
                    continue
                duration = int(row["duration_ms"] or 0)
                content = row["content"] or b""
                for idx, ms in enumerate(range(0, max(duration, 1), every_ms)):
                    frame_seed = content + ms.to_bytes(8, "little")
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(idx)
                    out["frame_ms"].append(ms)
                    out["frame_sha"].append(
                        hashlib.sha256(frame_seed).hexdigest()[:16]
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)


def media_summary(features: DataFrame) -> DataFrame:
    """Post-decode rollup (pure JVM aggregation over the UDF output)."""
    return (
        features.groupBy("kind")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.count_distinct("content_sha").alias("n_distinct"),
        )
        .orderBy("kind")
    )
