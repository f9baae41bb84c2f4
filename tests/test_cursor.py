"""cursorMark deep paging: the Solr CursorMark protocol over Spark.

Oracle discipline: cursor sweeps compare against DuckDB's total order
(ORDER BY ... LIMIT/OFFSET over the same parquet) — cursor paging IS
offset paging under a total order, which is exactly Solr's documented
equivalence (and the reason the uniqueKey tiebreak is mandatory).
Scored cursor pages pin row-identity against the solr_select router at
the matching start offset, the same discipline test_request uses.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from solrtexttagger_spark.search.cursor import (
    START_MARK,
    after_cursor,
    cursor_page,
    decode_cursor,
    encode_cursor,
    solr_select_cursor,
)
from solrtexttagger_spark.search.request import solr_select


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')")
    return con


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    from solrtexttagger_spark.index.build import build_index

    df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .where(F.col("doc_id") < 400)
    )
    df = df.persist()
    df.count()
    idx = build_index(df.select("doc_id", "text"), num_segments=4)
    idx.postings.persist().count()
    yield df, idx
    idx.postings.unpersist()
    df.unpersist()


class TestToken:
    def test_roundtrip(self):
        for vals in (["en", 7], [3.5, None, "x"], [0]):
            assert decode_cursor(encode_cursor(vals)) == vals

    def test_star_is_start(self):
        assert decode_cursor(START_MARK) is None

    def test_garbage_raises(self):
        with pytest.raises(ValueError, match="cursorMark"):
            decode_cursor("not-a-token!!")

    def test_non_list_payload_raises(self):
        import base64
        bad = base64.urlsafe_b64encode(b'{"a":1}').decode()
        with pytest.raises(ValueError, match="list"):
            decode_cursor(bad)

    def test_arity_mismatch_raises(self, spark):
        with pytest.raises(ValueError, match="keys"):
            after_cursor([(F.col("a"), True)], ["x", "y"])


def sweep(rel, keys, rows):
    """Drain a relation through the cursor protocol; returns the
    concatenated pages (list of Rows) and the page count."""
    mark, out, pages = START_MARK, [], 0
    while True:
        page, nxt = cursor_page(rel, keys, rows=rows, cursor_mark=mark)
        got = page.collect()
        if nxt == mark:
            assert got == []
            return out, pages
        out.extend(got)
        pages += 1
        mark = nxt
        assert pages < 1000, "cursor failed to converge"


class TestCursorPage:
    def test_sweep_equals_total_order(self, docs, oracle):
        """Draining pages of 37 re-assembles DuckDB's full
        (lang, doc_id) order — no dups, no gaps, order preserved."""
        got, pages = sweep(docs, [("lang", True)], 37)
        exp = oracle.sql(
            "SELECT doc_id, lang FROM documents ORDER BY lang, doc_id"
        ).fetchall()
        assert [(r["doc_id"], r["lang"]) for r in got] == exp
        assert pages == (len(exp) + 36) // 37

    def test_desc_and_expr_keys(self, docs, oracle):
        """Mixed-direction sort with a computed key matches DuckDB."""
        got, _ = sweep(
            docs, [("n_chars % 100", False), ("source", True)], 53
        )
        exp = oracle.sql(
            "SELECT doc_id FROM documents "
            "ORDER BY n_chars % 100 DESC, source, doc_id"
        ).fetchall()
        assert [r["doc_id"] for r in got] == [r[0] for r in exp]

    def test_single_page_equals_offset(self, docs, oracle):
        """Page 3 of a cursor walk == OFFSET paging (Solr's documented
        equivalence)."""
        mark = START_MARK
        for _ in range(3):
            page, mark = cursor_page(
                docs, [("n_chars", False)], rows=29, cursor_mark=mark
            )
        got = [r["doc_id"] for r in page.collect()]
        exp = oracle.sql(
            "SELECT doc_id FROM documents ORDER BY n_chars DESC, doc_id "
            "LIMIT 29 OFFSET 58"
        ).fetchall()
        assert got == [r[0] for r in exp]

    def test_empty_page_returns_same_mark(self, docs):
        # a cursor past the last row: filter matches nothing
        page, mark = cursor_page(
            docs.where(F.col("doc_id") < 0), [("lang", True)], rows=5
        )
        assert page.collect() == []
        assert mark == START_MARK

    def test_rows_must_be_positive(self, docs):
        with pytest.raises(ValueError, match="rows"):
            cursor_page(docs, [("lang", True)], rows=0)


class TestScaleShape:
    def test_cursor_filter_reaches_scan_and_take_ordered(self, docs):
        """The deep-paging promise in the plan: the strictly-after
        predicate's leading-key comparison is PUSHED to the parquet
        scan (row groups before the cursor never decompress) and the
        page is TakeOrderedAndProject — page N costs what page 1
        costs, with no O(depth) funnel."""
        _, mark = cursor_page(docs, [("n_chars", True)], rows=10)
        page, _ = cursor_page(
            docs, [("n_chars", True)], rows=10, cursor_mark=mark
        )
        plan = page._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "PushedFilters: [" in plan
        assert "GreaterThan(n_chars" in plan, plan
        # the rank window is fine ONLY above the limit: it must consume
        # the <= rows TakeOrdered output, never the raw scan
        assert plan.index("Window") < plan.index("TakeOrderedAndProject")

    def test_first_page_no_cursor_filter(self, docs):
        page, _ = cursor_page(docs, [("n_chars", True)], rows=10)
        plan = page._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestSolrSelectCursor:
    def test_filter_path_pages_match_router(self, docs):
        """Cursor pages over {!term} + field sort == solr_select at the
        same offsets (row identity, fl included)."""
        params = {
            "q": "{!term f=lang}en", "sort": "n_chars desc",
            "rows": "11", "fl": "lang,n_chars",
        }
        mark = START_MARK
        for pageno in range(3):
            page, mark = solr_select_cursor(
                None, docs, {**params, "cursorMark": mark}
            )
            got = sorted(
                (r["doc_id"], r["lang"], r["n_chars"])
                for r in page.collect()
            )
            exp_df = solr_select(
                None, docs, {**params, "start": str(pageno * 11)}
            )
            exp = sorted(
                (r["doc_id"], r["lang"], r["n_chars"])
                for r in exp_df.collect()
            )
            assert got == exp, f"page {pageno}"

    def test_scored_path_pages_match_router(self, spark, corpus):
        """BM25-scored cursor pages == the router's start/rows pages
        (score ties broken by doc_id on both paths)."""
        df, idx = corpus
        params = {"q": "merge scan", "rows": "7", "fl": "lang"}
        mark = START_MARK
        for pageno in range(2):
            page, mark = solr_select_cursor(
                idx, df, {**params, "cursorMark": mark}, spark=spark
            )
            got = [
                (r["doc_id"], round(r["score"], 6))
                for r in page.orderBy(F.desc("score"), "doc_id").collect()
            ]
            exp_df = solr_select(
                idx, df, {**params, "start": str(pageno * 7)},
                spark=spark,
            )
            exp = [
                (r["doc_id"], round(r["score"], 6))
                for r in exp_df.orderBy("rank").collect()
            ]
            assert got == exp, f"page {pageno}"

    def test_start_raises(self, docs):
        with pytest.raises(ValueError, match="start"):
            solr_select_cursor(
                None, docs, {"q": "{!term f=lang}en", "start": "5"}
            )

    def test_rerank_raises(self, docs):
        with pytest.raises(ValueError, match="rerank"):
            solr_select_cursor(
                None, docs,
                {"q": "{!term f=lang}en", "rq": "{!rerank}"},
            )


class TestNullKeysAndRank:
    def test_null_sort_key_sweep_is_complete(self, spark, oracle, docs):
        """A nullable sort key must not strand the sweep: Spark places
        nulls FIRST under asc, so page 1 is null-keyed, the minted
        cursor carries [null, id], and the next page must step into the
        non-null region (col > NULL is SQL NULL — the naive predicate
        returns an empty page and the sweep dies)."""
        d = docs.withColumn(
            "lang",
            F.when(F.col("doc_id") % 3 == 0, F.lit(None)).otherwise(
                F.col("lang")
            ),
        )
        got, _ = sweep(d, [("lang", True)], 23)
        exp = oracle.sql("""
            SELECT doc_id FROM (
              SELECT doc_id,
                     CASE WHEN doc_id % 3 = 0 THEN NULL ELSE lang END
                       AS lang2
              FROM documents
            ) ORDER BY lang2 NULLS FIRST, doc_id
        """).fetchall()
        assert [r["doc_id"] for r in got] == [r[0] for r in exp]

    def test_null_sort_key_sweep_desc(self, spark, oracle, docs):
        """Desc: nulls sort LAST in Spark — after a non-null cursor
        value the null block must still be reachable."""
        d = docs.withColumn(
            "lang",
            F.when(F.col("doc_id") % 3 == 0, F.lit(None)).otherwise(
                F.col("lang")
            ),
        )
        got, _ = sweep(d, [("lang", False)], 23)
        exp = oracle.sql("""
            SELECT doc_id FROM (
              SELECT doc_id,
                     CASE WHEN doc_id % 3 = 0 THEN NULL ELSE lang END
                       AS lang2
              FROM documents
            ) ORDER BY lang2 DESC NULLS LAST, doc_id
        """).fetchall()
        assert [r["doc_id"] for r in got] == [r[0] for r in exp]

    def test_page_carries_rank(self, docs):
        page, _ = cursor_page(docs, [("n_chars", False)], rows=9)
        rows = page.orderBy("rank").collect()
        assert [r["rank"] for r in rows] == list(range(1, 10))
        chars = [r["n_chars"] for r in rows]
        assert chars == sorted(chars, reverse=True)

    def test_select_cursor_page_rank_order(self, docs):
        page, _ = solr_select_cursor(None, docs, {
            "q": "*:*", "sort": "n_chars desc", "rows": "8",
            "fl": "n_chars",
        })
        rows = page.orderBy("rank").collect()
        assert [r["rank"] for r in rows] == list(range(1, 9))
        chars = [r["n_chars"] for r in rows]
        assert chars == sorted(chars, reverse=True)


class TestWarmCursor:
    def test_warm_pages_match_start_rows(self, spark, corpus):
        """LocalRequestHandler.select_cursor == the same handler's
        start/rows pages, page for page, with the protocol's
        end-of-results signal."""
        from solrtexttagger_spark.index.compressed import compress_index
        from solrtexttagger_spark.search.request import (
            LocalRequestHandler,
        )
        from solrtexttagger_spark.search.wand import LocalSearcher

        df, idx = corpus
        cix = compress_index(idx)
        searcher = LocalSearcher(cix)
        h = LocalRequestHandler(searcher)
        params = {"q": "merge scan", "rows": "7"}
        mark, pages = START_MARK, []
        while True:
            page, nxt = h.select_cursor({**params, "cursorMark": mark})
            if nxt == mark:
                assert page == []
                break
            pages.append(page)
            mark = nxt
            assert len(pages) < 100
        flat = [r for p in pages for r in p]
        depth = 0
        for p in pages:
            exp = h.select({**params, "start": str(depth),
                            "rows": "7"})
            assert p == exp
            depth += len(p)
        # no dups, ranking monotone
        ids = [r[1] for r in flat]
        assert len(set(ids)) == len(ids)
        scores = [r[2] for r in flat]
        assert scores == sorted(scores, reverse=True)

    def test_warm_cursor_guards(self, spark, corpus):
        from solrtexttagger_spark.index.compressed import compress_index
        from solrtexttagger_spark.search.request import (
            LocalRequestHandler,
        )
        from solrtexttagger_spark.search.wand import LocalSearcher

        df, idx = corpus
        searcher = LocalSearcher(compress_index(idx))
        h = LocalRequestHandler(searcher)
        with pytest.raises(ValueError, match="sort"):
            h.select_cursor({"q": "merge", "sort": "n_chars desc"})
        with pytest.raises(ValueError, match="start"):
            h.select_cursor({"q": "merge", "start": "5"})
        with pytest.raises(ValueError, match="totem"):
            h.select_cursor({
                "q": "merge", "cursorMark": encode_cursor([1.0, 2]),
            })
        # a DISTRIBUTED 3-key mark must not be misread as the warm
        # [score, doc_id, depth] shape — the warm totem is tagged
        with pytest.raises(ValueError, match="totem"):
            h.select_cursor({
                "q": "merge",
                "cursorMark": encode_cursor([1.0, 2, 0]),
            })

    def test_stale_cursor_raises(self, spark, corpus):
        """A totem pointing at-or-before the served head means the
        index changed under the cursor — loud failure, no dup/skip."""
        from solrtexttagger_spark.index.compressed import compress_index
        from solrtexttagger_spark.search.request import (
            LocalRequestHandler,
        )
        from solrtexttagger_spark.search.wand import LocalSearcher

        df, idx = corpus
        searcher = LocalSearcher(compress_index(idx))
        h = LocalRequestHandler(searcher)
        page, _ = h.select_cursor({"q": "merge", "rows": "5"})
        # forge a totem claiming everything above a LOW score was
        # already served at depth 1 — the row actually at depth 1
        # scores far higher, i.e. sorts BEFORE the totem: the index
        # must have changed (or the totem lies), so the cursor is stale
        stale = encode_cursor(["warm", page[-1][2] - 100.0, 0, 1])
        with pytest.raises(ValueError, match="stale"):
            h.select_cursor({"q": "merge", "cursorMark": stale})
        # a CONSISTENT totem at depth 1 resumes fine
        ok = encode_cursor(["warm", page[0][2], page[0][1], 1])
        nxt, _ = h.select_cursor(
            {"q": "merge", "rows": "4", "cursorMark": ok})
        assert nxt == page[1:5]


class TestRenderCursorResponse:
    def test_json_shape(self, docs):
        from solrtexttagger_spark.search.cursor import (
            render_cursor_response,
        )
        import json

        page, mark = solr_select_cursor(None, docs, {
            "q": "*:*", "sort": "n_chars desc", "rows": "3",
            "fl": "lang",
        })
        out = json.loads(render_cursor_response(
            page, mark, num_found=500))
        assert out["nextCursorMark"] == mark
        assert out["response"]["numFound"] == 500
        assert len(out["response"]["docs"]) == 3
        assert all(
            set(d) == {"id", "score", "lang"}
            for d in out["response"]["docs"]
        )
