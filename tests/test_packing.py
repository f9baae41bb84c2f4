"""Sequence packing: distributed prefix sum == serial layout, document
alignment, boundary straddling semantics."""

import pytest

from solrtexttagger_spark.ops.packing import pack_sequences


def test_pack_sequences_matches_serial_layout(spark):
    docs = [(i, " ".join(["w"] * ((i * 7) % 13 + 1))) for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(7)
    out = {
        r["doc_id"]: (r["n_tokens"], r["bin_id"], r["bin_offset"])
        for r in pack_sequences(df, max_tokens=32).collect()
    }
    cum = 0
    for i, text in docs:
        n = len(text.split(" "))
        assert out[i] == (n, cum // 32, cum % 32), f"doc {i}"
        cum += n
    # bins are contiguous from 0 and every bin starts where a doc starts
    bins = sorted({b for _, b, _ in out.values()})
    assert bins == list(range(bins[-1] + 1))


def test_pack_sequences_straddle_and_errors(spark):
    # a doc longer than max_tokens stays whole in the bin it starts in
    df = spark.createDataFrame(
        [(0, " ".join(["a"] * 5)), (1, " ".join(["b"] * 20)), (2, "c c")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["bin_id"], r["bin_offset"])
        for r in pack_sequences(df, max_tokens=8).collect()
    }
    assert got == {0: (0, 0), 1: (0, 5), 2: (3, 1)}  # 5+20=25 -> bin 3, off 1
    with pytest.raises(ValueError):
        pack_sequences(df, max_tokens=0)
