"""Solr /suggest (search/suggest.py — AnalyzingInfixSuggester shape):
distributed path vs DuckDB mirror, warm LocalSuggester parity."""

import duckdb
import pytest

DICT = [
    # (name, popularity)
    ("New York", 100),
    ("New York City", 90),
    ("Newark", 40),
    ("York", 30),
    ("New Orleans", 80),
    ("Yorkshire Terrier", 20),
    ("new york", 95),   # case-folds to a duplicate analysis, distinct string
    (None, 10),         # NULL suggestion dropped
    ("--", 5),          # analyzes to zero tokens, dropped
]


@pytest.fixture(scope="module")
def sugg(spark):
    from solrtexttagger_spark.search.suggest import build_suggestions

    df = spark.createDataFrame(DICT, "name string, pop long")
    s = build_suggestions(df, text_col="name", weight_col="pop")
    s.persist().count()
    yield s
    s.unpersist()


def test_build_drops_null_and_empty(sugg):
    got = {r["suggestion"] for r in sugg.collect()}
    assert None not in got and "--" not in got
    assert len(got) == 7


def test_infix_prefix_match_and_ranking(spark, sugg):
    from solrtexttagger_spark.search.suggest import suggest

    got = [(r["suggestion"], r["weight"])
           for r in suggest(sugg, "new yor", count=10).collect()]
    # 'new' whole-token + 'yor' prefix on any token
    assert got == [("New York", 100.0), ("new york", 95.0),
                   ("New York City", 90.0)]
    # single-token prefix: every suggestion with a token starting 'new'
    got2 = {r["suggestion"] for r in suggest(sugg, "new", count=10).collect()}
    assert got2 == {"New York", "new york", "New York City", "Newark",
                    "New Orleans"}
    # count truncates after the (weight desc, suggestion asc) order
    got3 = [r["suggestion"] for r in suggest(sugg, "new", count=2).collect()]
    assert got3 == ["New York", "new york"]


def test_exact_last_token(spark, sugg):
    from solrtexttagger_spark.search.suggest import suggest

    got = {r["suggestion"]
           for r in suggest(sugg, "york", infix_prefix=False).collect()}
    # 'Yorkshire Terrier' needs the prefix mode; exact drops it
    assert got == {"New York", "new york", "New York City", "York"}


def test_duckdb_mirror(spark, sugg):
    from solrtexttagger_spark.search.suggest import suggest

    got = [(r["suggestion"], r["weight"])
           for r in suggest(sugg, "new yor", count=10).collect()]
    con = duckdb.connect()
    vals = ",".join(
        f"('{n}',{w})" for n, w in DICT if n is not None
    )
    oracle = con.sql(
        f"""
        WITH d AS (SELECT name, max(pop) AS pop FROM (VALUES {vals})
                   v(name, pop) GROUP BY name),
        toks AS (SELECT name, pop,
                 list_filter(string_split_regex(lower(name),
                             '[^a-z0-9]+'), t -> t <> '') AS tokens
                 FROM d)
        SELECT name, CAST(pop AS DOUBLE) FROM toks
        WHERE len(tokens) > 0
          AND list_contains(tokens, 'new')
          AND len(list_filter(tokens, t -> t LIKE 'yor%')) > 0
        ORDER BY pop DESC, name ASC LIMIT 10
        """
    ).fetchall()
    assert got == [(n, w) for n, w in oracle]


def test_local_suggester_parity(spark, sugg):
    from solrtexttagger_spark.search.suggest import LocalSuggester, suggest

    local = LocalSuggester(sugg)
    for q, infix in [("new yor", True), ("new", True), ("york", False),
                     ("yorkshire terr", True), ("nomatch", True)]:
        dist = [(r["suggestion"], r["weight"])
                for r in suggest(sugg, q, count=10,
                                 infix_prefix=infix).collect()]
        assert local.suggest(q, count=10, infix_prefix=infix) == dist, q


def test_render_suggest_json(spark, sugg):
    from solrtexttagger_spark.search.suggest import render_suggest_json

    out = render_suggest_json(sugg, "new yor", count=2, dictionary="cities")
    body = out["suggest"]["cities"]["new yor"]
    assert body["numFound"] == 2
    assert [s["term"] for s in body["suggestions"]] == [
        "<b>New</b> <b>Yor</b>k", "<b>new</b> <b>yor</b>k"
    ]
    assert body["suggestions"][0]["weight"] == 100.0
    plain = render_suggest_json(sugg, "new yor", count=2,
                                highlight=False)
    assert [s["term"] for s in
            plain["suggest"]["default"]["new yor"]["suggestions"]] == [
        "New York", "new york"
    ]
    # exact-mode highlight wraps the whole matched token
    ex = render_suggest_json(sugg, "york", count=10, infix_prefix=False)
    terms = {s["term"]
             for s in ex["suggest"]["default"]["york"]["suggestions"]}
    assert "New <b>York</b> City" in terms


def test_empty_query_raises(spark, sugg):
    from solrtexttagger_spark.search.suggest import LocalSuggester, suggest

    with pytest.raises(ValueError, match="zero tokens"):
        suggest(sugg, "--")
    with pytest.raises(ValueError, match="zero tokens"):
        LocalSuggester(sugg).suggest("  ")


def test_context_filtering(spark):
    """Solr suggester contextField + suggest.cfq: suggestions collect
    their context values at build; requests keep only suggestions
    carrying ANY requested context — distributed and warm twins agree."""
    from solrtexttagger_spark.search.suggest import (
        LocalSuggester, build_suggestions, suggest,
    )

    df = spark.createDataFrame(
        [("New York", 100, "us"), ("New York", 90, "travel"),
         ("Newark", 40, "us"), ("Newcastle", 30, "uk"),
         ("Newport", 20, None)],
        "name string, pop long, cat string",
    )
    s = build_suggestions(df, text_col="name", weight_col="pop",
                          context_col="cat")
    got = {r["suggestion"]
           for r in suggest(s, "new", contexts=["us"]).collect()}
    assert got == {"New York", "Newark"}
    # dedup keeps max weight and the UNION of contexts
    ny = {r["suggestion"]: (r["weight"], sorted(r["contexts"]))
          for r in s.collect()}["New York"]
    assert ny == (100.0, ["travel", "us"])
    # multi-context OR; NULL-context suggestion matches nothing
    got2 = {r["suggestion"]
            for r in suggest(s, "new", contexts=["uk", "travel"]).collect()}
    assert got2 == {"New York", "Newcastle"}
    local = LocalSuggester(s)
    for ctx in (["us"], ["uk", "travel"], ["nope"]):
        dist = [(r["suggestion"], r["weight"])
                for r in suggest(s, "new", contexts=ctx).collect()]
        assert local.suggest("new", contexts=ctx) == dist, ctx
    with pytest.raises(ValueError, match="context_col"):
        plain = build_suggestions(df, text_col="name")
        suggest(plain, "new", contexts=["us"])
    with pytest.raises(ValueError, match="context_col"):
        LocalSuggester(build_suggestions(df, text_col="name")).suggest(
            "new", contexts=["us"])
