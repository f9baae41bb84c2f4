"""Solr function queries (search/functions.boosted_topk): bf= additive
and boost= multiplicative ranking functions over document fields,
folded into the score before the rank window."""

import math

import pytest


DOCS = [
    (0, "hash join scan", 1),
    (1, "hash join", 100),
    (2, "hash", 1000),
    (3, "merge sort", 50),
]


@pytest.fixture(scope="module")
def corpus(spark):
    from solrtexttagger_spark.index.build import build_index

    df = spark.createDataFrame(DOCS, "doc_id long, text string, views long")
    idx = build_index(df.select("doc_id", "text"), num_segments=2)
    idx.postings.persist().count()
    yield df, idx
    idx.postings.unpersist()


def _plain_scores(idx, spark, q="hash join"):
    from solrtexttagger_spark.search.bm25 import bm25_topk

    return {
        r["doc_id"]: r["score"]
        for r in bm25_topk(idx, [(0, q)], k=10, spark=spark).collect()
    }


def test_bf_additive(spark, corpus):
    from solrtexttagger_spark.search.functions import boosted_topk

    df, idx = corpus
    plain = _plain_scores(idx, spark)
    got = boosted_topk(
        idx, df, [(0, "hash join")], bf="log(1 + views)", k=10, spark=spark
    ).collect()
    views = {d: v for d, _t, v in DOCS}
    for r in got:
        expect = plain[r["doc_id"]] + math.log(1 + views[r["doc_id"]])
        assert r["score"] == pytest.approx(expect, rel=1e-9)
        assert r["bm25"] == pytest.approx(plain[r["doc_id"]], rel=1e-9)
    # the popularity signal reorders: doc 2 (1000 views, weakest text
    # match) must outrank doc 0 (1 view, strongest text match)
    ranks = {r["doc_id"]: r["rank"] for r in got}
    assert ranks[2] < ranks[0]
    # unboosted order is the opposite
    assert plain[0] > plain[2]


def test_boost_multiplicative_and_combined(spark, corpus):
    from solrtexttagger_spark.search.functions import boosted_topk

    df, idx = corpus
    plain = _plain_scores(idx, spark)
    views = {d: v for d, _t, v in DOCS}
    got = boosted_topk(
        idx, df, [(0, "hash join")], boost="sqrt(views)", k=10, spark=spark
    ).collect()
    for r in got:
        assert r["score"] == pytest.approx(
            plain[r["doc_id"]] * math.sqrt(views[r["doc_id"]]), rel=1e-9
        )
    # combined: (bm25 + bf) * boost
    got2 = boosted_topk(
        idx, df, [(0, "hash join")], bf="log(1 + views)",
        boost="sqrt(views)", k=10, spark=spark,
    ).collect()
    for r in got2:
        d = r["doc_id"]
        assert r["score"] == pytest.approx(
            (plain[d] + math.log(1 + views[d])) * math.sqrt(views[d]),
            rel=1e-9,
        )


def test_null_function_values_coalesce(spark, corpus):
    """NULL function source: bf -> +0, boost -> x1 (Solr missing-field
    numeric behavior), never NULL-ing the score."""
    from solrtexttagger_spark.index.build import build_index
    from solrtexttagger_spark.search.functions import boosted_topk

    df = spark.createDataFrame(
        [(0, "hash join", 10), (1, "hash join", None)],
        "doc_id long, text string, views long",
    )
    idx = build_index(df.select("doc_id", "text"), num_segments=2)
    got = {
        r["doc_id"]: r
        for r in boosted_topk(
            idx, df, [(0, "hash")], bf="log(1 + views)",
            boost="sqrt(views)", k=10, spark=spark,
        ).collect()
    }
    assert got[1]["score"] == pytest.approx(got[1]["bm25"], rel=1e-9)
    assert got[0]["score"] > got[0]["bm25"]


def test_fq_pagination_and_errors(spark, corpus):
    from solrtexttagger_spark.search.functions import boosted_topk

    df, idx = corpus
    en = df.where("views >= 50").select("doc_id")
    got = boosted_topk(
        idx, df, [(0, "hash join")], bf="log(1 + views)", k=10,
        allowed_docs=en, spark=spark,
    ).collect()
    assert {r["doc_id"] for r in got} == {1, 2}
    # start pages past rank 1
    page2 = boosted_topk(
        idx, df, [(0, "hash join")], bf="log(1 + views)", k=1, start=1,
        spark=spark,
    ).collect()
    assert len(page2) == 1 and page2[0]["rank"] == 2
    with pytest.raises(ValueError, match="bf= and/or boost="):
        boosted_topk(idx, df, [(0, "hash")], k=5, spark=spark)


def test_stays_jvm_side(spark, corpus):
    """The function expression must compile to Catalyst (no Python UDF
    in the plan) — Solr evaluates ValueSources JVM-side and so do we."""
    from solrtexttagger_spark.search.functions import boosted_topk

    df, idx = corpus
    out = boosted_topk(
        idx, df, [(0, "hash join")], bf="log(1 + views)", k=5, spark=spark
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_select_writer_bf_boost(spark, corpus):
    """bf/boost on the full /select request: the boosted ranking reaches
    the page, maxScore and pagination — still one job per request."""
    import json

    from pyspark.sql.classic.dataframe import DataFrame

    from solrtexttagger_spark.search.select import render_select_json

    df, idx = corpus
    render_select_json(idx, df, "hash", fl=[], k=1, spark=spark)  # warm

    calls = []
    orig = DataFrame.collect

    def counting(self):
        calls.append(1)
        return orig(self)

    try:
        DataFrame.collect = counting
        js = json.loads(render_select_json(
            idx, df, "hash join", fl=["views"], k=2,
            bf="log(1 + views)", spark=spark,
        ))
    finally:
        DataFrame.collect = orig
    assert len(calls) == 1  # boost rides the one page job
    docs = js["response"]["docs"]
    # popularity dominates: doc 2 (1000 views) first despite weakest text
    assert [d["id"] for d in docs] == [2, 1]
    # maxScore is the boosted maximum, matching the rank-1 score
    assert js["response"]["maxScore"] == docs[0]["score"]


def test_explain_scores_sums_to_bm25(spark, corpus):
    """debugQuery explain: per-term contributions sum bit-for-bit to the
    scorer's BM25 score; the read path is seg-pruned like /tvrh."""
    from solrtexttagger_spark.search.functions import explain_scores

    df, idx = corpus
    plain = _plain_scores(idx, spark)
    rows = explain_scores(idx, [(0, "hash join")], [0, 1, 2], spark=spark).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {0, 1, 2}
    for d, rs in by_doc.items():
        assert sum(x["contribution"] for x in rs) == pytest.approx(
            plain[d], rel=1e-12
        )
    # doc 2 matched only 'hash'; docs 0/1 matched both terms
    assert {r["term"] for r in by_doc[2]} == {"hash"}
    assert {r["term"] for r in by_doc[0]} == {"hash", "join"}
    # df is GLOBAL (hash in docs 0,1,2 -> 3) even though the read is
    # pruned to the requested docs' segments
    assert {r["df"] for r in rows if r["term"] == "hash"} == {3}
    plan = explain_scores(
        idx, [(0, "hash")], [0], spark=spark
    )._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    # round-7 verdict #1 fix: the doc-id filter is an array-literal
    # prefilter BELOW the Generate (explode input bounded by the
    # request's shard overlap, never segment size)
    opt = explain_scores(
        idx, [(0, "hash")], [0], spark=spark
    )._jdf.queryExecution().optimizedPlan().toString()
    g = opt.find("Generate explode")
    assert g != -1
    assert opt.find("array_contains", g) > g
    assert "size(filter(postings" in opt[g:]
    assert " IN " not in opt[:g] and ".doc_id IN" not in opt


def test_rerank_topk(spark, corpus):
    """Solr {!rerank}: only the top reRankDocs rescore (first + w*rq)
    and re-sort among themselves; the tail keeps first-pass positions."""
    from solrtexttagger_spark.search.bm25 import bm25_topk
    from solrtexttagger_spark.search.functions import rerank_topk

    df, idx = corpus
    first = bm25_topk(idx, [(0, "hash join")], k=10, spark=spark)
    plain = {r["doc_id"]: (r["rank"], r["score"]) for r in first.collect()}
    # first-pass BM25 order: doc 1 ("hash join", shortest) then doc 0
    # ("hash join scan") then doc 2 ("hash", one term)
    assert [d for d, (r, _s) in sorted(plain.items(), key=lambda t: t[1][0])] == [1, 0, 2]
    # rerank only the top 2 with an inverse-popularity signal: doc 0
    # (1 view, +50) overtakes doc 1 (100 views, +~1); doc 2 outside
    # reRankDocs keeps rank 3 even though its rq value (+99 at 1000
    # views... inverse: tiny) is irrelevant — it is never rescored
    out = rerank_topk(
        first, df, "100.0 / (1 + views)", rerank_docs=2, weight=1.0
    ).collect()
    got = {r["doc_id"]: (r["rank"], r["score"]) for r in out}
    assert got[0][0] == 1 and got[1][0] == 2
    assert got[2] == plain[2]  # untouched tail row
    assert got[0][1] == pytest.approx(plain[0][1] + 100.0 / 2, rel=1e-9)
    assert got[1][1] == pytest.approx(plain[1][1] + 100.0 / 101, rel=1e-9)


def test_local_searcher_boost_parity(spark, corpus):
    """Round-7 verdict #4: the warm serving path applies bf=/boost=
    function queries pre-top-k (prepare_boost doc->value map, Solr's
    in-memory docValues) — rank/doc/score parity with boosted_topk."""
    from solrtexttagger_spark.index.compressed import compress_index
    from solrtexttagger_spark.search.functions import boosted_topk
    from solrtexttagger_spark.search.wand import LocalSearcher

    df, idx = corpus
    ls = LocalSearcher(compress_index(idx))
    cases = [
        {"bf": "log(1 + views)"},
        {"boost": "1.0 + (doc_id % 3) * 0.5"},
        {"bf": "log(1 + views)", "boost": "1.0 + (doc_id % 3) * 0.5"},
    ]
    for kw in cases:
        prep = LocalSearcher.prepare_boost(df, **kw)
        dist = sorted(
            (r["rank"], r["doc_id"], round(r["score"], 9))
            for r in boosted_topk(
                idx, df, [(0, "hash join")], k=10, spark=spark, **kw
            ).collect()
        )
        local = [
            (r, d, round(s, 9))
            for r, d, s in ls.search("hash join", k=10, boost_values=prep)
        ]
        assert local == dist, kw
    # prepared once, reused across requests; composes with fq + paging
    prep = LocalSearcher.prepare_boost(df, bf="log(1 + views)")
    fq = LocalSearcher.prepare_filter([0, 2, 3])
    dist = sorted(
        (r["rank"], r["doc_id"], round(r["score"], 9))
        for r in boosted_topk(
            idx, df, [(0, "hash join")], bf="log(1 + views)", k=2, start=1,
            allowed_docs=df.where("doc_id != 1").select("doc_id"),
            spark=spark,
        ).collect()
    )
    local = [
        (r, d, round(s, 9))
        for r, d, s in ls.search(
            "hash join", k=2, start=1, allowed_docs=fq, boost_values=prep
        )
    ]
    assert local == dist
    with pytest.raises(ValueError, match="prepare_boost"):
        LocalSearcher.prepare_boost(df)
