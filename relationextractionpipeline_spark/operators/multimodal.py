"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_features`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic crc-based feature vector stands
in for real decoded features.  Everything Spark-side is real and tested:
typed schema, Arrow batch shape through ``mapInPandas``, partition-count
preservation, metadata projection.

At 100 TB the payload column dominates I/O: keep assets in their own table
keyed by ``asset_id`` so metadata-only queries never scan payload bytes
(parquet column pruning does the rest), and decode via ``mapInPandas`` with
bounded Arrow batches (``spark.sql.execution.arrow.maxRecordsPerBatch``) so a
batch of large blobs fits executor memory.
"""

from __future__ import annotations

import hashlib
import os
from typing import Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)

FEATURE_DIM = 16


def synthetic_assets(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake asset table for plumbing tests."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes([(i * 7 + j) % 256 for j in range(32 + (i % 5) * 16)])
        rows.append(
            (
                i, kind, payload,
                64 + i % 4 * 32 if kind != "audio" else None,
                48 + i % 3 * 16 if kind != "audio" else None,
                1000 + i * 10 if kind != "image" else None,
                {"image": "png", "audio": "pcm", "video": "h264"}[kind],
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def materialize_assets(data_dir: str, n: int = 96) -> str:
    """Write the deterministic asset table to parquet (pandas, no Spark) so
    the Spark query and the DuckDB oracle read identical bytes.  ``payload``
    is stored both as binary and as lowercase hex (``payload_hex``) because
    DuckDB's ``md5`` only accepts VARCHAR — the oracle derives the fake
    features from the hex form; the Spark UDF derives the same string from
    the binary form via ``bytes.hex()``."""
    path = os.path.join(data_dir, f"assets{n}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(data_dir, exist_ok=True)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes([(i * 7 + j) % 256 for j in range(32 + (i % 5) * 16)])
        rows.append(
            {
                "asset_id": i,
                "kind": kind,
                "payload": payload,
                "payload_hex": payload.hex(),
                "width": 64 + i % 4 * 32 if kind != "audio" else None,
                "height": 48 + i % 3 * 16 if kind != "audio" else None,
                "duration_ms": 1000 + i * 10 if kind != "image" else None,
                "codec": {"image": "png", "audio": "pcm", "video": "h264"}[kind],
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["width"] = pdf["width"].astype("Int32")
    pdf["height"] = pdf["height"].astype("Int32")
    pdf["duration_ms"] = pdf["duration_ms"].astype("Int32")
    tmp = f"{path}.tmp{os.getpid()}"
    pdf.to_parquet(tmp, index=False)
    os.replace(tmp, path)
    return path


def _fake_feature(payload_hex: str, d: int) -> float:
    """One deterministic fake feature dimension, SQL-reproducible:
    ``int(md5(hex(payload) + ':' + str(d))[:8], 16) % 10000 / 10000``."""
    h = hashlib.md5(f"{payload_hex}:{d}".encode("ascii")).hexdigest()
    return (int(h[:8], 16) % 10_000) / 10_000.0


def _fake_features(payload: Optional[bytes], dim: int = FEATURE_DIM) -> List[float]:
    """Deterministic stand-in for a decoded feature vector (md5-derived so a
    SQL oracle can reproduce it — see ``_fake_feature``)."""
    hx = payload.hex() if payload is not None else ""
    return [_fake_feature(hx, d) for d in range(dim)]


def decode_features(assets: DataFrame, fake: bool = False) -> DataFrame:
    """payload → feature vector via mapInPandas (iterator API).

    Real decoders (PIL/librosa/ffmpeg) are not available in this container:
    without ``fake=True`` this raises NotImplementedError at executor time by
    design — the Spark plumbing (schema, batching, partitioning) is the part
    under test.
    """
    out_schema = (
        "asset_id long, kind string, features array<double>, n_bytes int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image/audio decode requires PIL/librosa/ffmpeg; "
                    "pass fake=True for the deterministic stand-in"
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "features": pdf["payload"].map(_fake_features),
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                }
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        run, schema=out_schema
    )


def decode_feature_rows(assets: DataFrame, fake: bool = False) -> DataFrame:
    """Exploded variant of ``decode_features``: one row per (asset, dim) with
    a scalar ``value`` — the shape downstream joins (and the driver's
    order-insensitive hash compare) want; arrays are unhashable in a sorted
    compare.  Same mapInPandas plumbing, fan-out inside the UDF batch."""
    out_schema = (
        "asset_id long, kind string, dim int, value double, n_bytes int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image/audio decode requires PIL/librosa/ffmpeg; "
                    "pass fake=True for the deterministic stand-in"
                )
            out = {"asset_id": [], "kind": [], "dim": [], "value": [],
                   "n_bytes": []}
            for aid, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                hx = payload.hex() if payload is not None else ""
                nb = len(payload) if payload is not None else 0
                for d in range(FEATURE_DIM):
                    out["asset_id"].append(aid)
                    out["kind"].append(kind)
                    out["dim"].append(d)
                    out["value"].append(_fake_feature(hx, d))
                    out["n_bytes"].append(nb)
            yield pd.DataFrame(out)

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        run, schema=out_schema
    )


def sample_frames(assets: DataFrame, every_ms: int = 500, fake: bool = False) -> DataFrame:
    """video → one row per sampled frame timestamp (decode stubbed).

    Frame *timestamps* derive from metadata only (native, real); frame pixel
    decode is the stubbed part.
    """
    frames = (
        assets.where(F.col("kind") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.col("duration_ms").cast("long"),
                    F.lit(every_ms).cast("long"),
                )
            ).alias("frame_ts_ms"),
        )
    )
    if not fake:
        return frames  # timestamps are real; pixels would need a decoder
    # md5 (not crc32) so a DuckDB oracle can reproduce the fake frame id
    return frames.withColumn(
        "frame_md5",
        F.md5(F.concat_ws(":", F.col("asset_id"), F.col("frame_ts_ms"))),
    )


def metadata_only_projection(assets: DataFrame) -> DataFrame:
    """Metadata scan that must never read payload bytes (column pruning —
    verify via .explain ReadSchema excludes 'payload')."""
    return assets.select("asset_id", "kind", "width", "height", "duration_ms", "codec")
