"""Delta + varint block compression for posting segments — numpy-vectorized
(no per-value Python loops), executed inside Arrow-batched UDFs.

Replaces what the reference delegates to Lucene's FST50/block postings
formats (reference schema.xml:52-53, README.md:86-91) with an explicit,
inspectable codec:

  block layout (uint8 bytes):
    varint n
    n delta-varints of sorted doc_ids (first is absolute)
    n varints of tf
    n varints of dl

Every (term, seg) posting shard becomes one block plus block metadata
(max_tf, min_dl) from which a BM25 upper bound is computable WITHOUT
decoding — the 'block max' of block-max WAND (search/wand.py). Bounds are
stored avgdl-independently because tf/(tf + k1(1-b+b*dl/avgdl)) is
increasing in tf and decreasing in dl.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_THRESHOLDS = [np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)]


def varint_encode(values: np.ndarray) -> np.ndarray:
    """Vectorized LEB128 encode of a uint64 array -> uint8 array."""
    v = np.ascontiguousarray(values, dtype=_U64)
    n = len(v)
    if n == 0:
        return np.zeros(0, dtype=np.uint8)
    nbytes = np.ones(n, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += v >= t
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    max_b = int(nbytes.max())
    for k in range(max_b):
        mask = nbytes > k
        idx = starts[mask] + k
        byte = (v[mask] >> _U64(7 * k)) & _U64(0x7F)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[idx] = byte.astype(np.uint8) | cont
    return out


def varint_decode(buf: np.ndarray, count: int | None = None) -> np.ndarray:
    """Vectorized LEB128 decode of a uint8 array -> uint64 array."""
    b = np.ascontiguousarray(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(0, dtype=_U64)
    is_last = (b & 0x80) == 0
    # group starts: position 0 and every byte after a terminator
    starts = np.nonzero(np.r_[True, is_last[:-1]])[0]
    pos_in_group = np.arange(len(b)) - np.repeat(starts, np.diff(np.r_[starts, len(b)]))
    contrib = (b & 0x7F).astype(_U64) << (_U64(7) * pos_in_group.astype(_U64))
    vals = np.add.reduceat(contrib, starts)
    if count is not None:
        assert len(vals) == count, f"decoded {len(vals)} values, expected {count}"
    return vals


def encode_postings_block(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray
) -> bytes:
    """Encode one (term, seg) posting shard. doc_ids must be sorted."""
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    n = len(doc_ids)
    header = varint_encode(np.array([n], dtype=_U64))
    if n == 0:
        return header.tobytes()
    deltas = np.empty(n, dtype=_U64)
    deltas[0] = _U64(doc_ids[0])
    deltas[1:] = (doc_ids[1:] - doc_ids[:-1]).astype(_U64)
    parts = [
        header,
        varint_encode(deltas),
        varint_encode(np.asarray(tfs, dtype=_U64)),
        varint_encode(np.asarray(dls, dtype=_U64)),
    ]
    return np.concatenate(parts).tobytes()


def decode_postings_block(data: bytes):
    """-> (doc_ids int64, tfs int32, dls int32), doc_ids sorted."""
    b = np.frombuffer(data, dtype=np.uint8)
    vals = varint_decode(b)
    n = int(vals[0])
    assert len(vals) == 1 + 3 * n, f"block holds {len(vals) - 1} values, expected {3 * n}"
    deltas = vals[1 : 1 + n]
    doc_ids = np.cumsum(deltas.astype(np.int64))
    tfs = vals[1 + n : 1 + 2 * n].astype(np.int32)
    dls = vals[1 + 2 * n : 1 + 3 * n].astype(np.int32)
    return doc_ids, tfs, dls


def bm25_upper_bound(max_tf: int, min_dl: int, avgdl: float, k1: float, b: float) -> float:
    """Block-max score factor (pre-idf): achieved by the most favorable
    (tf, dl) combination the block admits."""
    tf = float(max_tf)
    dl = float(min_dl)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def encode_positions_block(positions_list) -> bytes:
    """Encode the per-doc position lists of one postings block (same doc
    order as the companion encode_postings_block):

      varint n_docs
      n_docs varints of per-doc position counts
      all positions, delta-varint encoded with the delta RESET at each
      doc boundary (first position per doc is absolute)

    Positions within a doc are sorted ascending (tokenizer order), so
    deltas are non-negative and small — the same compression regime as
    the doc-id deltas."""
    n_docs = len(positions_list)
    header = varint_encode(np.array([n_docs], dtype=_U64))
    if n_docs == 0:
        return header.tobytes()
    arrs = [np.ascontiguousarray(p, dtype=np.int64) for p in positions_list]
    counts = np.array([len(a) for a in arrs], dtype=_U64)
    flat = (
        np.concatenate(arrs) if len(arrs) else np.zeros(0, dtype=np.int64)
    )
    if len(flat):
        deltas = np.empty_like(flat)
        deltas[0] = flat[0]
        deltas[1:] = flat[1:] - flat[:-1]
        starts = np.r_[0, np.cumsum(counts.astype(np.int64))[:-1]]
        deltas[starts] = flat[starts]  # reset at every doc boundary
    else:
        deltas = flat
    parts = [header, varint_encode(counts), varint_encode(deltas.astype(_U64))]
    return np.concatenate(parts).tobytes()


def decode_positions_block(data: bytes):
    """-> (counts int64 array, flat_positions int64 array). Doc i's
    positions are flat[offset_i : offset_i + counts[i]] with
    offset = cumsum(counts) - counts — aligned with the doc order of the
    companion decode_postings_block."""
    b = np.frombuffer(data, dtype=np.uint8)
    vals = varint_decode(b)
    n_docs = int(vals[0])
    counts = vals[1 : 1 + n_docs].astype(np.int64)
    deltas = vals[1 + n_docs :].astype(np.int64)
    total = int(counts.sum())
    assert len(deltas) == total, (
        f"positions block holds {len(deltas)} deltas, expected {total}"
    )
    if total == 0:
        return counts, deltas
    glob = np.cumsum(deltas)
    ends = np.cumsum(counts)
    starts = ends - counts
    # undo the global cumsum across doc boundaries: within doc d,
    # flat[j] = glob[j] - (glob[start_d] - deltas[start_d])
    base = np.repeat(glob[starts] - deltas[starts], counts)
    return counts, glob - base
