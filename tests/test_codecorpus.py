"""End-to-end over the north-rule input shape: deterministic source-code
corpus -> content-hash doc ids -> index -> BM25 + WAND + tagging, with the
per-row sha256(content) lineage invariant (BASELINE.json input_hint)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from solrtexttagger_spark.index.build import build_index, with_doc_ids
from solrtexttagger_spark.index.compressed import compress_index
from solrtexttagger_spark.search.bm25 import bm25_topk
from solrtexttagger_spark.search.wand import wand_topk
from solrtexttagger_spark.sources.codecorpus import (
    PLANTED_PHRASES,
    synth_code_corpus,
    with_content_sha,
)

N = 400


@pytest.fixture(scope="module")
def corpus(spark):
    return synth_code_corpus(spark, N, seed=42).persist()


def test_deterministic_across_partitionings(spark, corpus):
    a = sorted(tuple(r) for r in corpus.collect())
    b = sorted(
        tuple(r) for r in synth_code_corpus(spark, N, seed=42, partitions=7).collect()
    )
    assert a == b
    assert len(a) == N


def test_content_sha_invariant(spark, corpus):
    """Engine lineage: sha256(content) computed Spark-side must equal the
    Python-side hash of the same rows (per-row invariant vs the source)."""
    rows = with_content_sha(corpus).select("repo", "path", "content", "content_sha256").collect()
    for r in rows:
        assert r["content_sha256"] == hashlib.sha256(r["content"].encode()).hexdigest()


def test_doc_ids_stable_and_unique(spark, corpus):
    ids1 = with_doc_ids(corpus, ["repo", "path", "commit"])
    ids2 = with_doc_ids(corpus.repartition(13), ["repo", "path", "commit"])
    a = {r["doc_id"] for r in ids1.collect()}
    b = {r["doc_id"] for r in ids2.collect()}
    assert a == b
    assert len(a) == N  # no collisions at this scale


def test_planted_phrases_findable(spark, corpus):
    docs = with_doc_ids(corpus, ["repo", "path", "commit"])
    idx = build_index(docs, text_col="content", num_segments=8)
    idx.postings.persist().count()

    # every planted phrase's words must be in the dictionary
    terms = {r["term"] for r in idx.term_stats.collect()}
    for phrase in PLANTED_PHRASES:
        for w in phrase.split():
            assert w in terms

    # BM25 and WAND agree on the planted-phrase queries over source code
    queries = [(i, p) for i, p in enumerate(PLANTED_PHRASES)]
    exact = bm25_topk(idx, queries, k=10, spark=spark)
    c = compress_index(idx)
    c.blocks.persist().count()
    approx = wand_topk(c, queries, k=10, spark=spark)

    def norm(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
        return {k: sorted(v) for k, v in out.items()}

    assert norm(exact) == norm(approx)

    # top hits actually contain the phrase words
    top = exact.where(F.col("rank") == 1).collect()
    texts = {r["doc_id"]: r["content"] for r in docs.select("doc_id", "content").collect()}
    for r in top:
        qwords = PLANTED_PHRASES[r["query_id"]].split()
        assert any(w in texts[r["doc_id"]].split() for w in qwords)


def test_tagger_finds_planted_phrases(spark, corpus):
    from solrtexttagger_spark.tagging.dictionary import build_tag_dictionary
    from solrtexttagger_spark.tagging.operator import tag, translate_ids

    docs = with_doc_ids(corpus, ["repo", "path", "commit"])
    names = spark.createDataFrame(
        [(str(i), p) for i, p in enumerate(PLANTED_PHRASES)], "id string, name string"
    )
    d = build_tag_dictionary(names)
    tags = tag(
        docs, d, text_col="content", id_col="doc_id",
        overlaps="LONGEST_DOMINANT_RIGHT", tags_limit=None, match_text=True,
    )
    rows = tags.collect()
    assert rows, "planted phrases must be tagged"
    # every match_text is exactly its dictionary phrase
    ids = translate_ids(tags, d)
    joined = {
        (r["qdoc_id"], r["start"], r["end"]): r["id"] for r in ids.collect()
    }
    for r in rows:
        pid = joined[(r["qdoc_id"], r["start"], r["end"])]
        assert r["match_text"] == PLANTED_PHRASES[int(pid)]
    # ~30% of files have a planted phrase
    n_tagged = len({r["qdoc_id"] for r in rows})
    assert N * 0.15 < n_tagged <= N * 0.45


def test_bursty_corpus_deterministic_and_skewed(spark):
    """burstiness>0 (round-3 selective-vocabulary bench): still a pure
    function of (i, seed, burstiness) under any partitioning, and it must
    actually produce the per-document tf skew the pruning bench relies on."""
    a = sorted(r["content"] for r in synth_code_corpus(spark, 200, seed=7, burstiness=0.02).collect())
    b = sorted(
        r["content"]
        for r in synth_code_corpus(spark, 200, seed=7, burstiness=0.02, partitions=5).collect()
    )
    assert a == b
    # skew: some document has a high-tf identifier (a burst), while the
    # default corpus's ident tf is ~1-2 everywhere
    def max_ident_tf(contents):
        best = 0
        for c in contents:
            counts = {}
            for w in c.split():
                if w.startswith("ident_"):
                    counts[w] = counts.get(w, 0) + 1
            if counts:
                best = max(best, max(counts.values()))
        return best

    assert max_ident_tf(a) >= 5
    plain = [r["content"] for r in synth_code_corpus(spark, 200, seed=7).collect()]
    assert max_ident_tf(plain) <= 4
