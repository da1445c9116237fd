"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
``map<string,string>`` metadata sidecar (kind, width/height, sample_rate,
n_frames, ...). Everything metadata-driven (frame sampling, resize planning,
routing) is native Spark; the byte-level decode/feature step is a Pandas UDF
over ``mapInPandas`` whose REAL decoder is stubbed in this container (no
image/audio libs) behind an explicit ``NotImplementedError`` — the Spark-side
plumbing (schema, batching, partitioning, UDF signature) is real and tested.

Scale notes: payload columns dominate I/O — project them out of every plan
that doesn't decode (column pruning keeps the scan payload-free); decode
batches are bounded by arrow maxRecordsPerBatch so a partition of large blobs
can't blow worker memory; feature output is small and shuffles freely.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), False),
    ]
)

MEDIA_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
        T.StructField("n_bytes", T.IntegerType(), False),
    ]
)

_KINDS = ("image", "audio", "video")


def synth_media(spark: SparkSession, n: int, seed: int = 42, partitions: int = 8) -> DataFrame:
    """Deterministic fake media table (no external data): payload bytes are
    zlib-compressed seeded patterns; metadata is kind-appropriate."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["id"]:
                k = int(k)
                kind = _KINDS[k % len(_KINDS)]
                raw = hashlib.sha256(f"media:{seed}:{k}".encode()).digest() * (4 + k % 7)
                meta = {"codec": "fake"}
                if kind == "image":
                    meta.update(width=str(64 + k % 512), height=str(48 + k % 256))
                elif kind == "audio":
                    meta.update(sample_rate="16000", n_samples=str(1000 + k % 8000))
                else:
                    meta.update(n_frames=str(24 + k % 240), fps="24")
                rows.append(
                    {
                        "media_id": k,
                        "kind": kind,
                        "payload": zlib.compress(raw),
                        "meta": meta,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).repartition(partitions).mapInPandas(gen, schema=MEDIA)


def deterministic_fake_decoder(payload: bytes, kind: str) -> list[float]:
    """Stand-in feature extractor: 8 doubles from the payload digest.
    Deterministic so tests can assert exact values; replace with a real
    decode (PIL/torchaudio/decord) via the ``decoder`` parameter below."""
    d = hashlib.md5(payload).digest()
    return [b / 255.0 for b in d[:8]]


def extract_media_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], list[float]] | None = None,
    allow_fake: bool = True,
) -> DataFrame:
    """Decode/feature-extract step. Real decoding is NOT implemented in this
    container — pass ``decoder`` (a (payload, kind) -> list[float]) built on
    real media libs, or rely on the deterministic fake (allow_fake=True).
    With neither, raises NotImplementedError AT EXECUTOR TIME, loudly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = decoder
        if fn is None:
            if not allow_fake:
                raise NotImplementedError(
                    "real media decode requires image/audio libraries not "
                    "present in this environment; pass decoder= or allow_fake=True"
                )
            fn = deterministic_fake_decoder
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "features": [fn(bytes(p), k) for p, k in zip(pdf["payload"], pdf["kind"])],
                    "n_bytes": pd.array([len(bytes(p)) for p in pdf["payload"]], dtype="int32"),
                }
            )

    # project ONLY what the UDF reads -> column pruning drops other columns
    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=MEDIA_FEATURES
    )


def frame_sample(media: DataFrame, every_n: int = 24) -> DataFrame:
    """Video frame sampling plan: explode frame indices 0, n, 2n, ... from
    metadata — native (sequence + explode), no decode, no Python."""
    vids = media.where(F.col("kind") == "video").select(
        "media_id",
        F.element_at(F.col("meta"), "n_frames").cast("int").alias("n_frames"),
    )
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return vids.select(
        "media_id", F.explode(idx).alias("frame_idx"), "n_frames"
    )


def resize_plan(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize planning from metadata (scale factors, letterbox padding) —
    all native arithmetic; the pixel work belongs to the decode UDF."""
    imgs = media.where(F.col("kind") == "image").select(
        "media_id",
        F.element_at(F.col("meta"), "width").cast("int").alias("w"),
        F.element_at(F.col("meta"), "height").cast("int").alias("h"),
    )
    scale = F.least(F.lit(target_w) / F.col("w"), F.lit(target_h) / F.col("h"))
    new_w = F.floor(F.col("w") * scale + F.lit(0.5)).cast("int")
    new_h = F.floor(F.col("h") * scale + F.lit(0.5)).cast("int")
    return imgs.select(
        "media_id",
        "w",
        "h",
        new_w.alias("new_w"),
        new_h.alias("new_h"),
        ((F.lit(target_w) - new_w) / 2).cast("int").alias("pad_x"),
        ((F.lit(target_h) - new_h) / 2).cast("int").alias("pad_y"),
    )
