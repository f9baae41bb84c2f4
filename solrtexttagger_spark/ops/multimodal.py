"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery (schema, Arrow batch shape, mapInPandas signature,
partition sizing) is real and tested; the actual media decode is stubbed
behind import guards because codec libraries are not available in this
environment — `decode_image` raises NotImplementedError unless PIL is
importable, and `fake_decode_meta` provides a deterministic stand-in used by
tests and the metadata pipeline.

At 100 TB scale: binary payloads dominate row size, so these operators
repartition by target size (maxRecordsPerBatch tuned down) and never shuffle
payload bytes — metadata extraction is a narrow map, and any grouping
downstream operates on the extracted metadata columns only.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

try:  # pragma: no cover - not installed in this environment
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False


def decode_image(data: bytes):
    """Real decode path — requires PIL (not in this container)."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; use fake_decode_meta for plumbing tests"
        )
    import io

    from PIL import Image

    return Image.open(io.BytesIO(data))


def fake_decode_meta(data: bytes) -> tuple[str, int, int]:
    """Deterministic decode stand-in: format/width/height derived from the
    content hash. Replaced by a real decoder when codecs are present."""
    h = hashlib.sha256(data).digest()
    fmt = ["jpeg", "png", "webp"][h[0] % 3]
    width = 64 + (h[1] % 64) * 16
    height = 64 + (h[2] % 64) * 16
    return fmt, width, height


def extract_media_meta(
    df: DataFrame, *, id_col: str = "media_id", bin_col: str = "data"
) -> DataFrame:
    """Narrow mapInPandas over binary payloads -> typed metadata rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in MEDIA_META_SCHEMA.fields}
            for mid, data in zip(pdf[id_col], pdf[bin_col]):
                if data is None:
                    continue
                data = bytes(data)
                fmt, w, h = fake_decode_meta(data)
                rows["media_id"].append(mid)
                rows["n_bytes"].append(len(data))
                rows["sha256"].append(hashlib.sha256(data).hexdigest())
                rows["format"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
            yield pd.DataFrame(rows)

    narrowed = df.select(id_col, bin_col)
    return narrowed.mapInPandas(run, schema=MEDIA_META_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _fake_resize(data: bytes, w: int, h: int) -> bytes:
    """Deterministic resize stand-in: content-addressed pseudo-pixels of the
    requested size (REAL path: PIL Image.resize — env-blocked here). Output
    size scales with w*h so partition-sizing behavior is realistic."""
    seed = hashlib.sha256(data + f"{w}x{h}".encode()).digest()
    n = max(1, (w * h) // 64)
    return (seed * ((n // len(seed)) + 1))[:n]


def resize_images(
    df: DataFrame,
    *,
    width: int,
    height: int,
    id_col: str = "media_id",
    bin_col: str = "data",
) -> DataFrame:
    """Resize every image payload to (width, height): narrow mapInPandas,
    binary in -> binary out, no shuffle. The decode/encode kernel is the
    deterministic stand-in (`_fake_resize`); swap in PIL when present —
    the Spark plumbing (schema, batch shape, null handling) is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in RESIZED_SCHEMA.fields}
            for mid, data in zip(pdf[id_col], pdf[bin_col]):
                if data is None:
                    continue
                rows["media_id"].append(mid)
                rows["width"].append(width)
                rows["height"].append(height)
                rows["data"].append(_fake_resize(bytes(data), width, height))
            # explicit dtypes: an empty batch must not default to float64
            # columns (Arrow can't cast those to binary/int)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(rows["media_id"], dtype="int64"),
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "data": pd.Series(rows["data"], dtype="object"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    *,
    every_ms: int = 1000,
    max_frames: int = 16,
    id_col: str = "media_id",
    bin_col: str = "data",
) -> DataFrame:
    """Sample frames from video payloads: one output row per (video, frame),
    exploded INSIDE the pandas batch (no JVM-side explode of binary blobs).
    Deterministic stand-in: duration is derived from payload length
    (1 KiB ~ 1 s), frame bytes are content-addressed slices; the real path
    (pyav/ffmpeg) replaces only the kernel, not the plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in FRAME_SCHEMA.fields}
            for mid, data in zip(pdf[id_col], pdf[bin_col]):
                if data is None:
                    continue
                data = bytes(data)
                duration_ms = max(every_ms, len(data))  # 1 byte ~ 1 ms fake
                n = min(max_frames, max(1, duration_ms // every_ms))
                for i in range(int(n)):
                    seed = hashlib.sha256(data + f"frame{i}".encode()).digest()
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(i * every_ms)
                    rows["frame"].append(seed)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(rows["media_id"], dtype="int64"),
                    "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                    "ts_ms": pd.Series(rows["ts_ms"], dtype="int64"),
                    "frame": pd.Series(rows["frame"], dtype="object"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=FRAME_SCHEMA)


def extract_features(
    df: DataFrame,
    *,
    dim: int = 16,
    id_col: str = "media_id",
    bin_col: str = "data",
) -> DataFrame:
    """Binary payload -> embedding array<float> (the similarity operators'
    input shape). Deterministic stand-in: sha256-chunk-derived floats in
    [-1, 1); a real encoder (CLIP et al.) replaces only the kernel. Output
    feeds cosine_topk / lsh_cosine_topk / ivf_cosine_topk directly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for mid, data in zip(pdf[id_col], pdf[bin_col]):
                if data is None:
                    continue
                data = bytes(data)
                out = []
                for j in range(dim):
                    h = hashlib.sha256(data + f"f{j}".encode()).digest()
                    out.append(
                        float(int.from_bytes(h[:8], "big")) / float(1 << 63) - 1.0
                    )
                ids.append(mid)
                vecs.append(out)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "embedding": pd.Series(vecs, dtype="object"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=FEATURE_SCHEMA)


def repartition_for_payload(
    df: DataFrame,
    *,
    bin_col: str = "data",
    target_partition_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Size partitions by PAYLOAD bytes, not row count — with multi-MB
    binary cells, default row-count-based splits put gigabytes into one
    Arrow batch. One cheap agg estimates total payload, then a round-robin
    repartition to ceil(total/target) partitions."""
    from pyspark.sql import functions as F

    total = df.select(F.sum(F.length(bin_col))).collect()[0][0] or 0
    n = max(1, -(-int(total) // int(target_partition_bytes)))
    return df.repartition(n)
