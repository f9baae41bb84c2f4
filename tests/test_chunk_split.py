"""Document chunking (overlapping token windows) + deterministic
train/val/test hash splits — round-6 training-pipeline additions."""

import pytest

from solrtexttagger_spark.ops.chunking import chunk_documents
from solrtexttagger_spark.ops.sampling import hash_split


def test_chunking_covers_all_tokens_with_overlap(spark):
    text = " ".join(f"t{i}" for i in range(25))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=10, overlap=3).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # stride 7; starts < max(25-3, 1)=22 -> 0,7,14,21
    assert [r["chunk_start"] for r in rows] == [0, 7, 14, 21]
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2, 3]
    assert [r["n_tokens"] for r in rows] == [10, 10, 10, 4]
    toks = text.split()
    for r in rows:
        s = r["chunk_start"]
        assert r["chunk_text"] == " ".join(toks[s:s + 10])
    # consecutive chunks share exactly `overlap` tokens (full windows)
    assert rows[0]["chunk_text"].split()[-3:] == rows[1]["chunk_text"].split()[:3]
    # every token covered
    covered = set()
    for r in rows:
        covered.update(range(r["chunk_start"], r["chunk_start"] + r["n_tokens"]))
    assert covered == set(range(25))


def test_chunking_short_and_exact_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, " ".join("x" * 1 for _ in range(10))), (3, "solo")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=10, overlap=2)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    # short doc -> exactly one chunk with all tokens
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_tokens"] == 3
    assert len(by_doc[3]) == 1 and by_doc[3][0]["chunk_text"] == "solo"
    # doc of exactly chunk_tokens -> one chunk (starts < max(10-2,1)=8)
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_tokens"] == 10
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=5, overlap=5)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)


def test_chunking_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = chunk_documents(df, chunk_tokens=3, overlap=1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow map-only pass


def test_hash_split_disjoint_stable_and_partition_invariant(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(2000)], "doc_id long, text string"
    )
    out = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}, key_cols=["doc_id"])
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert set(rows.values()) == {"train", "val", "test"}
    counts = {s: list(rows.values()).count(s) for s in ("train", "val", "test")}
    assert 1400 < counts["train"] < 1800  # ~0.8 of 2000
    # proportions sum to 1 -> no NULL split
    assert None not in rows.values()
    # partition-invariant: identical assignment after repartition
    rows2 = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            df.repartition(13), {"train": 0.8, "val": 0.1, "test": 0.1},
            key_cols=["doc_id"],
        ).collect()
    }
    assert rows2 == rows
    # partial coverage -> NULL for the remainder; order defines ranges
    part = hash_split(df, {"train": 0.5}, key_cols=["doc_id"])
    vals = {r["split"] for r in part.collect()}
    assert vals == {"train", None}
    # same key + salt -> same split across DIFFERENT tables (leakage-safe)
    other = spark.createDataFrame(
        [(i, i * 2) for i in range(2000)], "doc_id long, feat long"
    )
    rows3 = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            other, {"train": 0.8, "val": 0.1, "test": 0.1}, key_cols=["doc_id"]
        ).collect()
    }
    assert rows3 == rows
    with pytest.raises(ValueError):
        hash_split(df, {"a": 0.9, "b": 0.2}, key_cols=["doc_id"])
    with pytest.raises(ValueError):
        hash_split(df, {"a": -0.1}, key_cols=["doc_id"])


def test_chunking_analyzed_char_spans(spark):
    """Analyzer-grade chunking: char spans slice exactly out of the raw
    text (markup/multi-space safe), window rule identical to the
    whitespace path on clean text."""
    from solrtexttagger_spark.ops.chunking import chunk_documents_analyzed

    clean = " ".join(f"t{i}" for i in range(25))
    messy = "Hello,  world!   This   is  spaced.  " + " ".join(
        f"w{i}" for i in range(10)
    )
    df = spark.createDataFrame(
        [(1, clean), (2, messy), (3, "")], "doc_id long, text string"
    )
    rows = chunk_documents_analyzed(df, chunk_tokens=10, overlap=3).collect()
    by_doc = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    # clean text: same windows as the whitespace path
    ws = sorted(
        chunk_documents(df.where("doc_id = 1"), chunk_tokens=10, overlap=3).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [(r["chunk_start"], r["n_tokens"]) for r in by_doc[1]] == [
        (r["chunk_start"], r["n_tokens"]) for r in ws
    ]
    assert [r["chunk_text"] for r in by_doc[1]] == [r["chunk_text"] for r in ws]
    # char spans are exact substrings of the raw text, tokens included
    for r in by_doc[2]:
        assert messy[r["chunk_char_start"]:r["chunk_char_end"]] == r["chunk_text"]
        assert r["n_tokens"] > 0
    # windows cover all 15 analyzer tokens of the messy doc with overlap 3
    assert sum(r["n_tokens"] for r in by_doc[2]) >= 15
    # empty document -> exactly one empty chunk
    assert len(by_doc[3]) == 1 and by_doc[3][0]["chunk_text"] == "" \
        and by_doc[3][0]["n_tokens"] == 0


def test_chunking_null_text_one_empty_chunk(spark):
    df = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in chunk_documents(df, chunk_tokens=3, overlap=1).collect()}
    for d in (1, 2):
        assert rows[d]["chunk_idx"] == 0 and rows[d]["chunk_text"] == ""
        assert rows[d]["n_tokens"] == 1  # split('') = [''] — one empty token
