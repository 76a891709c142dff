"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns
with a metadata struct; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` (the only place Python touches bytes —
everything around it stays JVM-side). The actual codec step is STUBBED
(no image/audio libraries in this container): ``decode_features``
computes deterministic byte-level pseudo-features, and
``real_decode_stub`` raises ``NotImplementedError`` where Pillow/
ffmpeg would plug in. The Spark-side contract — schema, batch shape,
partition-parallel Arrow transfer — is real and tested.

Scale notes: payload columns dominate bytes at rest → keep them in a
separate parquet column (columnar pruning skips them unless selected);
``mapInPandas`` streams Arrow record batches, so executor memory is
bounded by batch size, not partition size. Set
``spark.sql.execution.arrow.maxRecordsPerBatch`` down (e.g. 64) when
payloads are MBs each.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOB_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("byte_entropy_proxy", DoubleType()),
    ]
)


def make_blob_table(documents: DataFrame) -> DataFrame:
    """Fake a multimodal table from ``documents``: UTF-8 payload bytes
    + metadata, the exact column shape a real image/audio table has."""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
    )


def real_decode_stub(payload: bytes, media_type: str):
    """Where Pillow / soundfile / pyav would decode. Deliberately not
    implemented in this container."""
    raise NotImplementedError(
        f"real decoder for {media_type} requires image/audio libraries "
        "not present in this environment; use decode_features' "
        "deterministic byte features instead"
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def resize_images(
    blobs: DataFrame,
    width: int = 32,
    height: int = 32,
    codec: str = "stub",
) -> DataFrame:
    """Image resize as Arrow-batched ``mapInPandas``.

    ``codec="stub"`` (default): the deterministic fake strides the
    payload bytes down to width×height — no image library needed; the
    Spark-side contract (binary in, binary out, typed dims, bounded
    batches) is the real part, and the byte-exact driver oracle is
    pinned to this codec.

    ``codec="pil"``: the REAL path — decode with Pillow, bilinear
    resize, re-encode PNG. Availability is checked on the driver at
    plan-build time (clear ImportError instead of an executor-side
    stack), and workers import Pillow inside the closure. The sandbox
    ships without Pillow, so tests exercise this branch behind
    ``pytest.importorskip("PIL")`` and it upgrades automatically
    wherever the environment gains the dependency."""
    if codec not in ("stub", "pil"):
        raise ValueError(f"codec must be 'stub' or 'pil', got {codec!r}")
    if codec == "pil":
        try:
            import PIL  # noqa: F401  (driver-side availability check)
        except ImportError as e:
            raise ImportError(
                "codec='pil' requires Pillow, which is not installed; "
                "use the default codec='stub' or install Pillow"
            ) from e

        def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            from PIL import Image

            for pdf in batches:
                out = []
                for b in pdf["payload"]:
                    img = Image.open(io.BytesIO(bytes(b)))
                    buf = io.BytesIO()
                    img.resize((width, height)).save(buf, format="PNG")
                    out.append(buf.getvalue())
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "media_type": pdf["media_type"],
                        "payload": out,
                        "width": width,
                        "height": height,
                    }
                )

    else:

        def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            target = width * height
            for pdf in batches:
                resized = pdf["payload"].map(
                    lambda b: bytes(b[:: max(1, len(b) // target)][:target])
                )
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "media_type": pdf["media_type"],
                        "payload": resized,
                        "width": width,
                        "height": height,
                    }
                )

    return blobs.mapInPandas(resize, schema=RESIZED_SCHEMA)


def sample_frames(blobs: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling as a one-to-many ``mapInPandas``.

    STUB: where pyav/ffmpeg would decode and pick every k-th frame,
    the deterministic fake splits the payload into ``n_frames`` equal
    byte slices. Output is exploded (one row per frame) — the shape a
    real frame sampler produces."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                step = max(1, len(payload) // n_frames)
                for i in range(n_frames):
                    frame = bytes(payload[i * step : (i + 1) * step])
                    rows.append((int(doc_id), i, frame, len(frame)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame", "n_bytes"]
            )

    return blobs.mapInPandas(sample, schema=FRAME_SCHEMA)


def decode_features(blobs: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Uses ``mapInPandas`` so each Python worker sees bounded pandas
    batches; the features are deterministic byte statistics standing in
    for real decoded features (resize / frame-sample / mel-spectrogram
    would produce columns the same way)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            byte_mean = payloads.map(
                lambda b: (sum(b) / len(b)) if len(b) else 0.0
            )
            # cheap entropy proxy: unique-byte fraction
            entropy = payloads.map(
                lambda b: (len(set(b)) / 256.0) if len(b) else 0.0
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes.astype("int64"),
                    "byte_mean": byte_mean.astype("float64"),
                    "byte_entropy_proxy": entropy.astype("float64"),
                }
            )

    return blobs.mapInPandas(extract, schema=FEATURE_SCHEMA)
