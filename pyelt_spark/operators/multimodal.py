"""Multimodal (image/audio/video) column plumbing for training pipelines.

Media travel as opaque ``binary`` columns with a typed metadata struct —
the only layout that scales: Spark never interprets the bytes, Parquet
stores them column-compressed, and all interpretation happens inside
Arrow-batched ``mapInPandas`` stages whose batch size is bounded by bytes,
not rows.

The actual codecs (PIL/ffmpeg/librosa) are NOT available in this
container, so the decode kernels are stubbed: ``fake_decode=True`` (the
default) derives deterministic fake features from the bytes themselves
(sha-seeded), keeping every Spark-side contract — schema, partitioning,
UDF signature, Arrow batch shape — real and testable. Passing
``fake_decode=False`` raises ``NotImplementedError`` at the point where a
real codec would run.

Reference parity note: the reference has no media path at all; this module
is part of the "beyond the reference" training-data surface required by
the build brief.
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
        T.StructField("kind", T.StringType()),        # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),     # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("n_bytes", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded sha chain bytes)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), 3) + 1).cast("int"),
    )
    payload = F.sha2(F.concat_ws(":", F.lit(seed), F.col("id")), 512).cast("binary")
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            kinds.alias("kind"),
            F.concat(F.lit("x-fake/"), kinds).alias("mime"),
            payload.alias("payload"),
            F.struct(
                (F.pmod(F.col("id") * 37, 1920) + 1).cast("int").alias("width"),
                (F.pmod(F.col("id") * 53, 1080) + 1).cast("int").alias("height"),
                (F.pmod(F.col("id") * 97, 60000)).cast("int").alias("duration_ms"),
                F.lit(128).cast("int").alias("n_bytes"),
            ).alias("meta"),
        )
    )


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic pseudo-feature from the payload bytes (stub decoder)."""
    out, h = [], payload or b""
    while len(out) < dim:
        h = hashlib.sha256(h).digest()
        out.extend(b / 255.0 for b in h)
    return [float(x) for x in out[:dim]]


def extract_features(
    media: DataFrame, dim: int = 16, fake_decode: bool = True
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Partitioning contract: upstream should repartition so that the sum of
    payload bytes per partition fits executor memory — rows are cheap,
    payloads are not. spark.sql.execution.arrow.maxRecordsPerBatch bounds
    the Arrow slice."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "real media codecs (PIL/ffmpeg) are not installed in this "
                    "container; run with fake_decode=True"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [ _fake_feature(p, dim) for p in pdf["payload"] ],
                    "decode_ok": [p is not None for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 10_000, fake_decode: bool = True
) -> DataFrame:
    """Frame sampling for video rows (1:N fan-out through mapInPandas)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError("no real video codec in this container")
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                if row["kind"] != "video":
                    continue
                n_frames = max(int(row["meta"]["duration_ms"] // every_ms), 1)
                for i in range(n_frames):
                    ids.append(row["media_id"])
                    idxs.append(i)
                    frames.append(
                        hashlib.sha256(bytes(row["payload"]) + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(kernel, schema=FRAME_SCHEMA)


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224, fake_decode: bool = True
) -> DataFrame:
    """Image resize stage: binary → binary with updated meta."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError("no real image codec in this container")
            pdf = pdf.copy()
            mask = pdf["kind"] == "image"
            pdf.loc[mask, "payload"] = pdf.loc[mask, "payload"].map(
                lambda p: hashlib.sha256(bytes(p) + b"resize").digest()
            )
            pdf["meta"] = pdf.apply(
                lambda r: {
                    **dict(r["meta"]),
                    "width": width if r["kind"] == "image" else r["meta"]["width"],
                    "height": height if r["kind"] == "image" else r["meta"]["height"],
                },
                axis=1,
            )
            yield pdf

    return media.mapInPandas(kernel, schema=media.schema)
