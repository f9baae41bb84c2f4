"""Phrase matching via positional postings vs a brute-force text oracle."""

import random

import pytest

from solrtexttagger_spark.index.build import build_index
from solrtexttagger_spark.search.phrase import phrase_match, phrase_terms


def brute_count(text: str, phrase: str) -> int:
    padded = " " + text + " "
    needle = " " + phrase + " "
    n, off = 0, 0
    while True:
        i = padded.find(needle, off)
        if i < 0:
            return n
        n += 1
        off = i + 1


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(5)
    words = [f"w{i}" for i in range(8)]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(3, 40))))
        for i in range(120)
    ]
    docs.append((999, "w0 w1 w0 w1 w0"))  # overlapping occurrences
    df = spark.createDataFrame(docs, "doc_id long, text string")
    idx = build_index(df, num_segments=4)
    idx.postings.persist().count()
    return docs, idx


@pytest.mark.parametrize("phrase", ["w0 w1", "w1 w0 w1", "w3", "w0 w0"])
def test_phrase_match_vs_brute_force(spark, corpus, phrase):
    docs, idx = corpus
    got = {r["doc_id"]: r["n_occurrences"] for r in phrase_match(idx, phrase).collect()}
    exp = {d: brute_count(t, phrase) for d, t in docs if brute_count(t, phrase) > 0}
    assert got == exp


def test_phrase_terms_analysis():
    assert phrase_terms("Hash  JOIN!") == ["hash", "join"]


def test_multi_phrase_match_compressed_identity(spark, corpus):
    """The compressed-path phrase matcher (pos_block decode + shared
    fold) returns EXACTLY the uncompressed matcher's rows, including
    under multi-block shard splitting; without positional blocks it
    raises."""
    import pytest

    from solrtexttagger_spark.index.compressed import compress_index
    from solrtexttagger_spark.search.phrase import (
        multi_phrase_match,
        multi_phrase_match_compressed,
    )

    _docs, index = corpus
    phrases = ["w0 w1", "w1 w0 w1", "w0 w0", "w2 w3"]
    want = sorted(tuple(r) for r in multi_phrase_match(index, phrases).collect())
    assert want, "test corpus should contain at least one phrase hit"
    for mbp in (None, 2):
        c = compress_index(index, max_block_postings=mbp, with_positions=True)
        got = sorted(
            tuple(r) for r in multi_phrase_match_compressed(c, phrases).collect()
        )
        assert got == want, f"mismatch at max_block_postings={mbp}"
    with pytest.raises(ValueError):
        multi_phrase_match_compressed(compress_index(index), phrases)
