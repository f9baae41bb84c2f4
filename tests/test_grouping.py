"""Solr result grouping / field sort / facet.pivot over the exploded
scoring relation — deterministic small-corpus semantics plus fq/paging."""

import pytest
from pyspark.sql import functions as F

from solrtexttagger_spark.index.build import build_index
from solrtexttagger_spark.search.bm25 import bm25_topk
from solrtexttagger_spark.search.grouping import (
    facet_pivot,
    grouped_topk,
    select_sorted,
)

DOCS = [
    (0, "alpha beta gamma", "en", "web", 10),
    (1, "alpha alpha delta", "en", "book", 20),
    (2, "beta delta", "de", "web", 30),
    (3, "alpha beta beta", "de", "book", 40),
    (4, "epsilon zeta", "en", "web", 50),
]


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string, n long"
    )
    idx = build_index(df.select("doc_id", "text"), num_segments=2)
    idx.postings.persist().count()
    return df, idx


def test_grouped_topk_field_collapsing(spark, corpus):
    df, idx = corpus
    out = grouped_topk(
        idx, df, [(0, "alpha beta")], "lang", group_limit=2, k_groups=10,
        round_to=4, spark=spark,
    ).collect()
    by_group = {}
    for r in sorted(out, key=lambda r: (r["group_rank"], r["rank_in_group"])):
        by_group.setdefault((r["group_rank"], r["group_value"]), []).append(
            (r["rank_in_group"], r["doc_id"])
        )
    # matched docs: 0,1,3 score on alpha+beta; 2 on beta only.
    # best doc overall is the group winner; groups = en, de
    ranked = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(idx, [(0, "alpha beta")], k=10, spark=spark).collect()
    }
    best_en = max(ranked[0], ranked[1])
    best_de = max(ranked[2], ranked[3])
    groups = sorted(by_group)
    assert [g[1] for g in groups] == (
        ["en", "de"] if best_en > best_de else ["de", "en"]
    )
    # every group's members are ordered by score desc within the group
    for (_, gv), members in by_group.items():
        assert [m[0] for m in members] == list(range(1, len(members) + 1))
    # group_limit caps members per group
    out2 = grouped_topk(
        idx, df, [(0, "alpha beta")], "lang", group_limit=1, round_to=4,
        spark=spark,
    ).collect()
    assert all(r["rank_in_group"] == 1 for r in out2)
    assert len(out2) == 2  # one representative per matched lang group
    # fq restricts both members and group ranking
    en_only = df.where("lang = 'en'").select("doc_id")
    out3 = grouped_topk(
        idx, df, [(0, "alpha beta")], "lang", allowed_docs=en_only,
        round_to=4, spark=spark,
    ).collect()
    assert {r["group_value"] for r in out3} == {"en"}


def test_select_sorted_by_stored_field(spark, corpus):
    df, idx = corpus
    out = select_sorted(
        idx, df, [(0, "alpha beta")], "n", ascending=False, k=10, spark=spark
    ).collect()
    # match set for alpha|beta = docs 0,1,2,3; ordered by n desc
    assert [(r["rank"], r["doc_id"], r["sort_value"]) for r in sorted(out, key=lambda r: r["rank"])] == [
        (1, 3, 40), (2, 2, 30), (3, 1, 20), (4, 0, 10)
    ]
    # score still carried and matches the relevance scorer's value
    ranked = {
        r["doc_id"]: round(r["score"], 4)
        for r in bm25_topk(idx, [(0, "alpha beta")], k=10, spark=spark).collect()
    }
    for r in out:
        assert round(r["score"], 4) == ranked[r["doc_id"]]
    # ascending + paging with absolute ranks
    page = select_sorted(
        idx, df, [(0, "alpha beta")], "n", ascending=True, k=2, start=1,
        spark=spark,
    ).collect()
    assert [(r["rank"], r["doc_id"]) for r in sorted(page, key=lambda r: r["rank"])] == [
        (2, 1), (3, 2)
    ]


def test_facet_pivot_rollup(spark, corpus):
    df, idx = corpus
    rows = facet_pivot(idx, df, "alpha beta", ["lang", "source"], spark=spark).collect()
    got = {(r["lang"], r["source"]): r["n"] for r in rows}
    # match set = docs 0,1,2,3 -> leaves, per-lang subtotals, grand total
    assert got == {
        ("en", "web"): 1, ("en", "book"): 1,
        ("de", "web"): 1, ("de", "book"): 1,
        ("en", None): 2, ("de", None): 2,
        (None, None): 4,
    }
    # the grouping bitmask separates subtotal NULLs from value NULLs
    # (round-5 advice): leaf=0, source rolled=1, both rolled=3
    levels = {(r["lang"], r["source"]): r["level"] for r in rows}
    assert levels == {
        ("en", "web"): 0, ("en", "book"): 0,
        ("de", "web"): 0, ("de", "book"): 0,
        ("en", None): 1, ("de", None): 1,
        (None, None): 3,
    }
    # fq-aware: only English matches counted
    en_only = df.where("lang = 'en'").select("doc_id")
    rows2 = facet_pivot(
        idx, df, "alpha beta", ["lang", "source"], allowed_docs=en_only,
        spark=spark,
    ).collect()
    got2 = {(r["lang"], r["source"]): r["n"] for r in rows2}
    assert got2 == {("en", "web"): 1, ("en", "book"): 1, ("en", None): 2, (None, None): 2}


def test_select_sorted_by_function(spark):
    """Solr function sorting (sort=<expr> desc): select_sorted takes any
    Catalyst expression over stored fields, not just a column."""
    from solrtexttagger_spark.index.build import build_index
    from solrtexttagger_spark.search.grouping import select_sorted

    df = spark.createDataFrame(
        [(0, "alpha x", 10, 2), (1, "alpha y", 9, 1), (2, "alpha z", 30, 10)],
        "doc_id long, text string, n long, m long",
    )
    idx = build_index(df.select("doc_id", "text"), num_segments=2)
    out = select_sorted(
        idx, df, [(0, "alpha")], "n / m", ascending=False, k=3, spark=spark
    ).collect()
    # n/m: doc 1 -> 9, doc 0 -> 5, doc 2 -> 3
    assert [(r["rank"], r["doc_id"]) for r in out] == [(1, 1), (2, 0), (3, 2)]
    assert [round(r["sort_value"], 4) for r in out] == [9.0, 5.0, 3.0]


def test_collapse_and_expand(spark):
    """Solr CollapsingQParser + ExpandComponent: flat collapsed page
    (best doc per group), expanded section with the next members of
    exactly the groups ON the page; nullPolicy ignore/expand/collapse."""
    from solrtexttagger_spark.index.build import build_index
    from solrtexttagger_spark.search.grouping import (
        collapse_topk,
        expand_collapsed,
    )

    rows = [
        (0, "alpha alpha alpha", "g1"),   # best of g1
        (1, "alpha alpha", "g1"),
        (2, "alpha", "g1"),
        (3, "alpha alpha", "g2"),         # best of g2
        (4, "alpha", "g2"),
        (5, "alpha", None),               # NULL group
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, cat string")
    idx = build_index(df.select("doc_id", "text"), num_segments=2)
    q = [(0, "alpha")]

    page = collapse_topk(idx, df, q, "cat", k=10, spark=spark).collect()
    # ignore (default): NULL-cat doc 5 drops; one head per group
    assert [(r["rank"], r["doc_id"], r["group_value"]) for r in page] == [
        (1, 0, "g1"), (2, 3, "g2"),
    ]
    # expand: doc 5 passes through as its own group
    p2 = collapse_topk(
        idx, df, q, "cat", k=10, null_policy="expand", spark=spark
    ).collect()
    assert {r["doc_id"] for r in p2} == {0, 3, 5}
    # collapse: all NULLs form one group (still one head)
    p3 = collapse_topk(
        idx, df, q, "cat", k=10, null_policy="collapse", spark=spark
    ).collect()
    assert {r["doc_id"] for r in p3} == {0, 3, 5}

    page_df = collapse_topk(idx, df, q, "cat", k=10, spark=spark)
    exp = expand_collapsed(
        idx, df, q, "cat", page_df, expand_rows=1, spark=spark
    ).collect()
    # next member per paged group, head excluded, capped at expand_rows
    assert sorted(
        (r["group_value"], r["member_rank"], r["doc_id"]) for r in exp
    ) == [("g1", 1, 1), ("g2", 1, 4)]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="null_policy"):
        collapse_topk(idx, df, q, "cat", null_policy="nope", spark=spark)

    # round-7 verdict #5: the per-group head is ONE max_by aggregate with
    # MAP-SIDE PARTIAL aggregation (skew-safe when one group dominates),
    # not a row_number window that must co-locate every group member;
    # the only remaining window is the absolute page rank, and being a
    # plain row_number <= k it now gets WindowGroupLimit pushdown too
    plan = page_df._jdf.queryExecution().executedPlan().toString()
    assert "partial_max_by" in plan
    assert "WindowGroupLimit" in plan
