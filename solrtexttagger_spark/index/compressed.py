"""Compressed index: every (term, seg) posting shard becomes one
delta+varint block with block-max metadata.

Pipeline position:  build_index() -> compress_index() -> wand_topk().
The blocks table is what gets persisted/range-partitioned at scale; the
uncompressed array form exists only as the build intermediate.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from solrtexttagger_spark.index.build import InvertedIndex
from solrtexttagger_spark.index.compression import encode_postings_block

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("seg", T.IntegerType()),
        T.StructField("df_seg", T.LongType()),
        T.StructField("cf_seg", T.LongType()),
        T.StructField("max_tf", T.IntegerType()),
        T.StructField("min_dl", T.IntegerType()),
        T.StructField("block", T.BinaryType()),
    ]
)


@dataclass
class CompressedIndex:
    blocks: DataFrame
    term_stats: DataFrame
    doc_count: int
    num_segments: int
    _avgdl: float | None = None

    @property
    def avgdl(self) -> float:
        if self._avgdl is None:
            total = self.term_stats.agg(F.sum("cf")).collect()[0][0] or 0
            self._avgdl = total / self.doc_count if self.doc_count else 0.0
        return self._avgdl


def compress_index(index: InvertedIndex) -> CompressedIndex:
    """Encode each (term, seg) shard into one block + block-max metadata."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in BLOCK_SCHEMA.fields}
            for term, seg, df_seg, cf_seg, postings in zip(
                pdf["term"], pdf["seg"], pdf["df_seg"], pdf["cf_seg"], pdf["postings"]
            ):
                doc_ids = np.fromiter(
                    (p["doc_id"] for p in postings), dtype=np.int64, count=len(postings)
                )
                tfs = np.fromiter(
                    (p["tf"] for p in postings), dtype=np.int64, count=len(postings)
                )
                dls = np.fromiter(
                    (p["dl"] for p in postings), dtype=np.int64, count=len(postings)
                )
                out["term"].append(term)
                out["seg"].append(seg)
                out["df_seg"].append(df_seg)
                out["cf_seg"].append(cf_seg)
                out["max_tf"].append(int(tfs.max()))
                out["min_dl"].append(int(dls.min()))
                out["block"].append(encode_postings_block(doc_ids, tfs, dls))
            yield pd.DataFrame(out)

    narrowed = index.postings.select(
        "term", "seg", "df_seg", "cf_seg", "postings"
    )
    blocks = narrowed.mapInPandas(encode, schema=BLOCK_SCHEMA)
    return CompressedIndex(
        blocks=blocks,
        term_stats=index.term_stats,
        doc_count=index.doc_count,
        num_segments=index.num_segments,
        _avgdl=index._avgdl,
    )
