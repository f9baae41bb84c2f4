"""StatsComponent, QueryElevationComponent, unigram-LM quality."""

import math

import pytest

from solrtexttagger_spark.index.build import build_index
from solrtexttagger_spark.search.bm25 import bm25_topk
from solrtexttagger_spark.search.components import elevated_topk, stats_field


@pytest.fixture(scope="module")
def corpus(spark):
    docs = [
        (0, "alpha beta", "en", 10),
        (1, "alpha gamma", "en", None),  # NULL stats field
        (2, "beta beta delta", "de", 30),
        (3, "epsilon", "en", 40),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, n int")
    idx = build_index(df.select("doc_id", "text"), num_segments=2)
    idx.postings.persist().count()
    return df, idx


def test_stats_field_match_set(spark, corpus):
    df, idx = corpus
    r = stats_field(idx, df, "alpha beta", "n", spark=spark).collect()[0]
    # match set = docs 0,1,2; doc 1's n is NULL -> missing
    assert (r["n"], r["missing"]) == (2, 1)
    assert (r["min_v"], r["max_v"], r["sum_v"], r["mean_v"]) == (10.0, 30.0, 40.0, 20.0)
    assert r["stddev_v"] == pytest.approx(
        round(math.sqrt(((10 - 20) ** 2 + (30 - 20) ** 2) / 1), 4)
    )
    # fq shrinks the domain
    en = df.where("lang = 'en'").select("doc_id")
    r2 = stats_field(idx, df, "alpha beta", "n", allowed_docs=en, spark=spark).collect()[0]
    assert (r2["n"], r2["missing"], r2["sum_v"]) == (1, 1, 10.0)


def test_elevated_topk_pinning(spark, corpus):
    df, idx = corpus
    q = [(0, "alpha beta")]
    organic = [
        r["doc_id"]
        for r in sorted(
            bm25_topk(idx, q, k=10, spark=spark).collect(), key=lambda r: r["rank"]
        )
    ]
    out = sorted(
        elevated_topk(idx, q, {0: [2, 999]}, k=10, spark=spark).collect(),
        key=lambda r: r["rank"],
    )
    got = [(r["doc_id"], r["elevated"]) for r in out]
    # pinned head in GIVEN order (999 injected though it matches nothing),
    # then the organic order minus the elevated doc
    assert got[:2] == [(2, True), (999, True)]
    assert [d for d, _ in got[2:]] == [d for d in organic if d != 2]
    inj = next(r for r in out if r["doc_id"] == 999)
    assert inj["score"] == 0.0
    # elevated matching doc keeps its true score
    sc = {r["doc_id"]: r["score"] for r in bm25_topk(idx, q, k=10, spark=spark).collect()}
    assert next(r for r in out if r["doc_id"] == 2)["score"] == pytest.approx(sc[2])


def test_unigram_logppl_held_out_model(spark):
    from solrtexttagger_spark.ops.textqa import unigram_logppl

    df = spark.createDataFrame(
        [(0, "a a b"), (1, "b c"), (2, "z z")], "doc_id long, text string"
    )
    self_fit = {r["doc_id"]: r["cross_entropy"] for r in unigram_logppl(df).collect()}
    # common-word doc scores lower (more typical) than rare-word doc
    assert self_fit[0] < self_fit[1]
    # held-out model: unseen terms drop out of the sum
    model = spark.createDataFrame([("a", 8.0), ("b", 2.0)], "term string, cf double")
    held = {r["doc_id"]: (r["n_tokens"], r["cross_entropy"])
            for r in unigram_logppl(df, model_stats=model).collect()}
    # doc 2 ('z z') has no modeled terms at all -> no row
    assert set(held) == {0, 1}
    # doc 0: tf(a)=2, tf(b)=1 under p(a)=.8, p(b)=.2
    want0 = -(2 * math.log(0.8) + 1 * math.log(0.2)) / 3
    assert held[0][1] == pytest.approx(round(want0, 4))
