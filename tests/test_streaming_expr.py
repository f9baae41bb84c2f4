"""Solr Streaming Expressions (search/streaming_expr.py): the /stream
expression language compiled to DataFrame plans — parser, each stream
function vs a DuckDB mirror, composition."""

import duckdb
import pytest

LOGS = [(i, f"host{i % 3}", 200 if i % 4 else 500, (i * 13) % 50)
        for i in range(40)]
HOSTS = [("host0", "us"), ("host1", "eu"), ("host2", "us"),
         ("host9", "ap")]


@pytest.fixture(scope="module")
def tables(spark):
    return {
        "logs": spark.createDataFrame(
            LOGS, "id long, host string, status long, bytes long"
        ),
        "hosts": spark.createDataFrame(HOSTS, "host string, region string"),
    }


def _con():
    con = duckdb.connect()
    con.sql("CREATE TABLE logs AS SELECT * FROM (VALUES "
            + ",".join(f"({i},'{h}',{s},{b})" for i, h, s, b in LOGS)
            + ") v(id, host, status, bytes)")
    con.sql("CREATE TABLE hosts AS SELECT * FROM (VALUES "
            + ",".join(f"('{h}','{r}')" for h, r in HOSTS)
            + ") v(host, region)")
    return con


class TestParser:
    def test_nested_call_with_params(self):
        from solrtexttagger_spark.search.streaming_expr import (
            parse_expression,
        )

        e = parse_expression(
            'rollup(search(logs, q="*:*", fl="host,bytes"), '
            'over="host", sum(bytes), count(*))'
        )
        assert e.name == "rollup" and e.params["over"] == "host"
        assert [a.name for a in e.args] == ["search", "sum", "count"]
        assert e.args[0].params["fl"] == "host,bytes"

    def test_errors(self):
        from solrtexttagger_spark.search.streaming_expr import (
            parse_expression,
        )

        with pytest.raises(ValueError, match="expected"):
            parse_expression("rollup(search(logs)")
        with pytest.raises(ValueError, match="trailing"):
            parse_expression("a() b()")
        with pytest.raises(ValueError, match="bad token"):
            parse_expression('search(logs, q="x onequote)')


class TestStreams:
    def test_rollup_vs_duckdb(self, spark, tables):
        from solrtexttagger_spark.search.streaming_expr import stream

        got = sorted(
            tuple(r)
            for r in stream(
                'rollup(search(logs, q="*:*", fq="status = 200", '
                'fl="host,bytes", sort="host asc"), '
                'over="host", sum(bytes), count(*))',
                tables,
            ).collect()
        )
        con = _con()
        want = sorted(
            tuple(r)
            for r in con.sql(
                "SELECT host, CAST(sum(bytes) AS DOUBLE), count(*) "
                "FROM logs WHERE status = 200 GROUP BY host"
            ).fetchall()
        )
        assert got == want

    def test_join_select_top_composition(self, spark, tables):
        from solrtexttagger_spark.search.streaming_expr import stream

        got = [
            tuple(r)
            for r in stream(
                'top(n=2, sort="total desc", select('
                'innerJoin('
                'rollup(search(logs, q="*:*", fl="host,bytes"), '
                'over="host", sum(bytes)), '
                'search(hosts, q="*:*"), on="host"), '
                '"host", "region", "sum(bytes) as total"))',
                tables,
            ).collect()
        ]
        con = _con()
        want = [
            tuple(r)
            for r in con.sql(
                "SELECT l.host, h.region, CAST(sum(l.bytes) AS DOUBLE) "
                "AS total FROM logs l JOIN hosts h USING (host) "
                "GROUP BY l.host, h.region ORDER BY total DESC, l.host "
                "LIMIT 2"
            ).fetchall()
        ]
        # tie-break: DuckDB order pinned by host; Spark top has no
        # secondary key, so compare as sets of the same size
        assert sorted(got) == sorted(want)

    def test_unique_and_having(self, spark, tables):
        from solrtexttagger_spark.search.streaming_expr import stream

        uniq = stream(
            'unique(search(logs, q="*:*", fl="host,status"), over="host")',
            tables,
        ).collect()
        assert len(uniq) == 3  # one tuple per host, min-struct pick
        assert {r["host"] for r in uniq} == {"host0", "host1", "host2"}
        hav = stream(
            'having(rollup(search(logs, q="*:*", fl="host,bytes"), '
            'over="host", count(*)), expr="`count(*)` > 13")',
            tables,
        ).collect()
        con = _con()
        want = {r[0] for r in con.sql(
            "SELECT host FROM logs GROUP BY host HAVING count(*) > 13"
        ).fetchall()}
        assert {r["host"] for r in hav} == want

    def test_merge_and_stats(self, spark, tables):
        from solrtexttagger_spark.search.streaming_expr import stream

        m = stream(
            'merge(search(logs, q="*:*", fq="status = 500", fl="id,host"), '
            'search(logs, q="*:*", fq="status = 200", fl="id,host"), '
            'on="id asc")',
            tables,
        ).collect()
        assert [r["id"] for r in m] == list(range(40))
        st = stream(
            'stats(search(logs, q="*:*"), sum(bytes), avg(bytes), count(*))',
            tables,
        ).collect()[0]
        con = _con()
        s, a, c = con.sql(
            "SELECT CAST(sum(bytes) AS DOUBLE), avg(bytes), count(*) "
            "FROM logs"
        ).fetchone()
        assert (st["sum(bytes)"], st["count(*)"]) == (s, c)
        assert st["avg(bytes)"] == pytest.approx(a)

    def test_fetch_and_facet(self, spark, tables):
        from solrtexttagger_spark.search.streaming_expr import stream

        fetched = stream(
            'fetch(rollup(search(logs, q="*:*", fl="host,bytes"), '
            'over="host", sum(bytes)), hosts, on="host", fl="region")',
            tables,
        ).collect()
        con = _con()
        want = {
            (h, r): s
            for h, r, s in con.sql(
                "SELECT l.host, h.region, CAST(sum(l.bytes) AS DOUBLE) "
                "FROM logs l LEFT JOIN hosts h USING (host) "
                "GROUP BY 1, 2"
            ).fetchall()
        }
        assert {
            (r["host"], r["region"]): r["sum(bytes)"] for r in fetched
        } == want
        fac = sorted(
            tuple(r)
            for r in stream(
                'facet(logs, q="*:*", fq="status = 200", '
                'buckets="host", count(*), avg(bytes))',
                tables,
            ).collect()
        )
        wantf = sorted(
            (h, c, pytest.approx(a))
            for h, c, a in con.sql(
                "SELECT host, count(*), avg(bytes) FROM logs "
                "WHERE status = 200 GROUP BY host"
            ).fetchall()
        )
        assert [(h, c) for h, c, _a in fac] == [
            (h, c) for h, c, _a in wantf
        ]
        for got_row, want_row in zip(fac, wantf):
            assert got_row[2] == want_row[2]

    def test_unknown_collection_and_function(self, spark, tables):
        from solrtexttagger_spark.search.streaming_expr import stream

        with pytest.raises(ValueError, match="unknown collection"):
            stream('search(nope, q="*:*")', tables)
        with pytest.raises(ValueError, match="unknown stream function"):
            stream('frobnicate(search(logs, q="*:*"))', tables)
        with pytest.raises(ValueError, match="unknown metric"):
            stream('rollup(search(logs, q="*:*"), over="host", '
                   'median(bytes))', tables)

class TestPlans:
    def test_compiled_tree_is_fused(self, spark, tables):
        """The point of compiling /stream to Catalyst: the fq pushes
        into the scan as a data filter, the rollup aggregates with a
        map-side partial, and the select's projection prunes columns —
        none of which Solr's tuple-at-a-time decorators can do."""
        from tests.test_plans import plan_str

        from solrtexttagger_spark.search.streaming_expr import stream

        df = stream(
            'rollup(search(logs, q="*:*", fq="status = 200", '
            'fl="host,bytes"), over="host", sum(bytes))',
            tables,
        )
        plan = plan_str(df)
        assert "partial_sum" in plan          # map-side combine
        assert "status" in plan and "Filter" in plan
        # the scan's output is pruned to the fl + filter columns — the
        # unused id column never leaves the source
        assert "id#" not in plan.split("Exchange")[-1]


class TestTextQuery:
    """Round 9 (r8 verdict #7): search(q=<text>) compiles through the
    boolean match machinery — semi-join without score in fl, inner
    join carrying the rounded BM25 score with it."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        from solrtexttagger_spark.index.build import build_index

        rows = [
            (0, "spark join merge", "en"),
            (1, "merge sort stream", "en"),
            (2, "window scan", "de"),
            (3, "join join join", "de"),
            (4, "nothing relevant", "en"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        idx = build_index(docs, num_segments=2)
        idx.postings.persist().count()
        yield docs, idx, rows
        idx.postings.unpersist()

    def test_text_q_semijoin_vs_duckdb(self, spark, corpus):
        from solrtexttagger_spark.search.streaming_expr import stream

        docs, idx, rows = corpus
        out = stream(
            'rollup(search(docs, q="join merge", fl="doc_id,lang"), '
            'over="lang", count(*))',
            {"docs": docs}, indexes={"docs": idx},
        ).collect()
        got = {r["lang"]: r["count(*)"] for r in out}
        con = duckdb.connect()
        con.sql("CREATE TABLE d AS SELECT * FROM (VALUES "
                + ",".join(f"({i},'{t}','{lg}')" for i, t, lg in rows)
                + ") v(doc_id, text, lang)")
        want = dict(con.sql("""
            SELECT lang, count(*) FROM d
            WHERE doc_id IN (
              SELECT doc_id FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM d
              ) WHERE w IN ('join', 'merge'))
            GROUP BY lang""").fetchall())
        assert got == want

    def test_text_q_score_in_fl_matches_select(self, spark, corpus):
        """fl="...,score" inner-joins the match scores; ranks agree with
        the /select scorer on the same query."""
        from solrtexttagger_spark.search.boolean import (
            boolean_matched_scores,
        )
        from solrtexttagger_spark.search.streaming_expr import stream
        from pyspark.sql import functions as F

        docs, idx, _rows = corpus
        out = stream(
            'top(search(docs, q="join merge", fl="doc_id,score"), '
            'n=3, sort="score desc, doc_id asc")',
            {"docs": docs}, indexes={"docs": idx},
        ).select("doc_id", "score").collect()
        want = (
            boolean_matched_scores(idx, [(0, "join merge")], spark=spark)
            .select("doc_id", F.round("score", 4).alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(3)
            .collect()
        )
        assert [tuple(r) for r in out] == [tuple(r) for r in want]

    def test_text_q_without_index_raises(self, spark, corpus):
        from solrtexttagger_spark.search.streaming_expr import stream

        docs, _idx, _rows = corpus
        with pytest.raises(ValueError, match="need an InvertedIndex"):
            stream('search(docs, q="join")', {"docs": docs})


class TestRound9Functions:
    """intersect/complement/cartesianProduct/timeseries/parallel and
    evaluator operands in select — each vs its DuckDB mirror."""

    def test_intersect_and_complement(self, spark, tables):
        from solrtexttagger_spark.search.streaming_expr import stream

        both = stream(
            'intersect(search(logs, q="*:*", fl="id,host"), '
            'search(hosts, q="*:*", fl="host"), on="host")',
            tables,
        ).collect()
        neither = stream(
            'complement(search(hosts, q="*:*", fl="host"), '
            'search(logs, q="*:*", fl="host"), on="host")',
            tables,
        ).collect()
        con = _con()
        want_both = con.sql(
            "SELECT id, host FROM logs WHERE host IN (SELECT host FROM hosts)"
        ).fetchall()
        want_neither = con.sql(
            "SELECT host FROM hosts WHERE host NOT IN (SELECT host FROM logs)"
        ).fetchall()
        # Spark's join puts the on-keys first; compare by field name
        assert sorted((r["id"], r["host"]) for r in both) == sorted(want_both)
        assert sorted(tuple(r) for r in neither) == sorted(want_neither)

    def test_select_evaluators(self, spark, tables):
        from solrtexttagger_spark.search.streaming_expr import stream

        out = stream(
            'select(search(logs, q="*:*", fl="id,status,bytes"), '
            '"id", '
            '"if(eq(status, 500), 1, 0) as err", '
            '"replace(status, 500, withValue=0) as ok_status", '
            '"add(bytes, 10) as bumped")',
            tables,
        ).collect()
        con = _con()
        want = con.sql("""
            SELECT id, CASE WHEN status = 500 THEN 1 ELSE 0 END AS err,
                   CASE WHEN status = 500 THEN 0 ELSE status END AS ok_status,
                   bytes + 10 AS bumped
            FROM logs""").fetchall()
        assert sorted(tuple(r) for r in out) == sorted(want)

    def test_cartesian_product_explodes(self, spark):
        from solrtexttagger_spark.search.streaming_expr import stream

        df = spark.createDataFrame(
            [(1, ["a", "b"]), (2, ["c"])], "id long, tags array<string>"
        )
        out = stream(
            "cartesianProduct(search(t), tags)", {"t": df}
        ).collect()
        assert sorted((r["id"], r["tags"]) for r in out) == [
            (1, "a"), (1, "b"), (2, "c")
        ]

    def test_timeseries_window_rollup(self, spark):
        from solrtexttagger_spark.search.streaming_expr import stream

        rows = [(i, f"2024-01-01 0{i % 3}:15:00", float(i)) for i in range(9)]
        df = spark.createDataFrame(rows, "id long, ts string, v double")
        out = stream(
            'timeseries(t, field=ts, gap="+1HOUR", sum(v), count(*))',
            {"t": df},
        ).collect()
        got = {str(r["ts"]): (r["sum(v)"], r["count(*)"]) for r in out}
        con = duckdb.connect()
        con.sql("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ",".join(f"({i},'{ts}',{v})" for i, ts, v in rows)
                + ") x(id, ts, v)")
        want = {
            str(a): (b, c) for a, b, c in con.sql("""
                SELECT time_bucket(INTERVAL 1 HOUR, ts::TIMESTAMP),
                       sum(v), count(*) FROM t GROUP BY 1""").fetchall()
        }
        assert got == want

    def test_parallel_is_a_partitioning_hint(self, spark, tables):
        from solrtexttagger_spark.search.streaming_expr import stream

        out = stream(
            'parallel(workers=4, rollup(search(logs, q="*:*", '
            'fl="host,bytes"), over="host", sum(bytes)))',
            tables,
        )
        assert out.rdd.getNumPartitions() == 4
        base = stream(
            'rollup(search(logs, q="*:*", fl="host,bytes"), '
            'over="host", sum(bytes))', tables,
        ).collect()
        assert sorted(map(tuple, out.collect())) == sorted(map(tuple, base))


class TestGraphAndSignificance:
    """significantTerms (fg-vs-bg lift over the index) and nodes
    (gatherNodes one-hop walks), each vs a DuckDB mirror."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        from solrtexttagger_spark.index.build import build_index

        rows = [
            (0, "spark join merge plan", "alice", "bob"),
            (1, "merge sort stream plan", "bob", "carol"),
            (2, "window scan plan", "carol", "dave"),
            (3, "join merge window", "dave", None),
            (4, "scan scan scan", "erin", "alice"),
            (5, "plan plan join", "alice", "carol"),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, author string, reviewer string"
        )
        idx = build_index(docs.select("doc_id", "text"), num_segments=2)
        idx.postings.persist().count()
        yield docs, idx, rows
        idx.postings.unpersist()

    def test_significant_terms_vs_duckdb(self, spark, corpus):
        from solrtexttagger_spark.search.streaming_expr import stream

        docs, idx, rows = corpus
        out = stream(
            'significantTerms(d, q="merge", minDocFreq=1, maxDocFreq=1.0, '
            'limit=5)',
            {"d": docs}, indexes={"d": idx},
        ).collect()
        got = [(r["term"], r["foreground"], r["background"],
                r["score"]) for r in out]
        con = duckdb.connect()
        con.sql("CREATE TABLE d AS SELECT * FROM (VALUES "
                + ",".join(f"({i},'{t}')" for i, t, _a, _r in rows)
                + ") v(doc_id, text)")
        want = con.sql("""
WITH tok AS (
  SELECT DISTINCT doc_id, w AS term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM d)
),
bg AS (SELECT term, count(*)::BIGINT AS background FROM tok GROUP BY 1),
fgd AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'merge'),
fg AS (SELECT term, count(*)::BIGINT AS foreground
       FROM tok JOIN fgd USING (doc_id) GROUP BY 1),
n AS (SELECT (SELECT count(*) FROM d)::DOUBLE AS nbg,
             (SELECT count(*) FROM fgd)::DOUBLE AS nfg)
SELECT term, foreground, background,
       round((foreground / nfg) * ln(1 + (foreground / nfg) /
             (background / nbg)), 4) AS score
FROM fg JOIN bg USING (term), n
ORDER BY score DESC, term ASC LIMIT 5
""").fetchall()
        assert got == [tuple(r) for r in want]

    def test_nodes_one_hop_and_nested(self, spark, corpus):
        from solrtexttagger_spark.search.streaming_expr import stream

        docs, idx, rows = corpus
        # 1 hop: reviewers of alice's docs
        one = stream(
            'nodes(d, search(d, q="*:*", fq="author = \'alice\'", '
            'fl="doc_id,author,reviewer"), '
            'walk="reviewer->author", gather="author")',
            {"d": docs},
        ).collect()
        # alice reviews to bob (doc0), carol (doc5) -> docs authored by
        # bob/carol -> authors {bob, carol}
        assert sorted(r["node"] for r in one) == ["bob", "carol"]
        # nested: a second hop from those authors' reviewers
        two = stream(
            'nodes(d, nodes(d, search(d, q="*:*", fq="author = \'alice\'", '
            'fl="doc_id,author,reviewer"), '
            'walk="reviewer->author", gather="reviewer"), '
            'walk="node->author", gather="author")',
            {"d": docs},
        ).collect()
        # hop1 gathers reviewers of bob/carol docs: carol (doc1), dave
        # (doc2); hop2 walks node->author: docs authored by carol/dave
        # -> {carol, dave}
        assert sorted(r["node"] for r in two) == ["carol", "dave"]


EDGES = [("a", "b"), ("b", "c"), ("a", "d"), ("d", "c"), ("c", "e"),
         ("e", "a"), ("b", "e"), ("x", "y")]


class TestRound9Sources:
    """random / shortestPath / let-get / knnSearch / update — the
    round-9 second wave of stream sources, DuckDB-mirrored where the
    semantics are SQL-expressible."""

    @pytest.fixture(scope="class")
    def graph_tables(self, spark):
        return {
            "edges": spark.createDataFrame(EDGES, "src string, dst string"),
        }

    def test_random_deterministic_sample_vs_duckdb(self, spark, tables):
        from solrtexttagger_spark.search.streaming_expr import stream

        got = [
            tuple(r)
            for r in stream(
                'random(logs, q="*:*", fq="status = 200", rows=7, '
                'fl="id,host", seed="42")',
                tables,
            ).collect()
        ]
        con = _con()
        want = [
            tuple(r)
            for r in con.sql(
                "SELECT id, host FROM logs WHERE status = 200 "
                "ORDER BY md5(concat_ws(chr(31), '42', "
                "id::VARCHAR, host)) ASC LIMIT 7"
            ).fetchall()
        ]
        assert got == want
        # a different seed draws a different (still deterministic) set
        again = [
            tuple(r)
            for r in stream(
                'random(logs, q="*:*", fq="status = 200", rows=7, '
                'fl="id,host", seed="7")',
                tables,
            ).collect()
        ]
        assert again != got and len(again) == 7

    def test_shortest_path_all_paths_vs_duckdb_cte(self, spark,
                                                   graph_tables):
        from solrtexttagger_spark.search.streaming_expr import stream

        got = sorted(
            tuple(r["path"])
            for r in stream(
                'shortestPath(edges, from="a", to="c", edge="src=dst", '
                "maxDepth=4)",
                graph_tables,
            ).collect()
        )
        con = duckdb.connect()
        con.sql(
            "CREATE TABLE edges AS SELECT * FROM (VALUES "
            + ",".join(f"('{s}','{d}')" for s, d in EDGES)
            + ") v(src, dst)"
        )
        want = sorted(
            tuple(r[0])
            for r in con.sql("""
WITH RECURSIVE walk AS (
  SELECT 'a' AS node, ['a'] AS path, 0 AS depth
  UNION ALL
  SELECT e.dst, list_append(w.path, e.dst), w.depth + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.depth < 4 AND NOT list_contains(w.path, e.dst)
),
hits AS (SELECT path, depth FROM walk WHERE node = 'c')
SELECT path FROM hits WHERE depth = (SELECT min(depth) FROM hits)
""").fetchall()
        )
        # BOTH depth-2 paths survive: a->b->c and a->d->c (the
        # all-shortest-paths property — same-level frontier rows are
        # never pruned against each other)
        assert got == want == [("a", "b", "c"), ("a", "d", "c")]
        # unreachable and self cases
        assert stream(
            'shortestPath(edges, from="a", to="y", edge="src=dst", '
            "maxDepth=4)",
            graph_tables,
        ).count() == 0
        self_p = stream(
            'shortestPath(edges, from="c", to="c", edge="src=dst", '
            "maxDepth=4)",
            graph_tables,
        ).collect()
        assert [tuple(r["path"]) for r in self_p] == [("c",)]

    def test_let_get_scoped_bindings_vs_duckdb(self, spark, tables):
        from solrtexttagger_spark.search.streaming_expr import stream

        got = sorted(
            tuple(r)
            for r in stream(
                'let(a=search(logs, q="*:*", fq="status = 200", '
                'fl="host,bytes"), '
                'rollup(get(a), over="host", sum(bytes)))',
                tables,
            ).collect()
        )
        con = _con()
        want = sorted(
            tuple(r)
            for r in con.sql(
                "SELECT host, CAST(sum(bytes) AS DOUBLE) FROM logs "
                "WHERE status = 200 GROUP BY host"
            ).fetchall()
        )
        assert got == want
        # bindings are scoped: "a" is NOT registered after the call
        with pytest.raises(ValueError, match="unknown collection"):
            stream('search(a, q="*:*")', tables).collect()

    def test_evaluator_passthrough_functions(self, spark, tables):
        from solrtexttagger_spark.search.streaming_expr import stream

        out = stream(
            'select(search(logs, q="*:*", fq="id = 3", '
            'fl="id,host,bytes"), '
            '"pow(id, 2) as sq", "concat(host, upper(host)) as hh", '
            '"length(host) as lh")',
            tables,
        ).collect()
        assert [tuple(r) for r in out] == [(9.0, "host0HOST0", 5)]


class TestKnnAndUpdate:
    @pytest.fixture()
    def corpus(self, spark):
        from solrtexttagger_spark.index.build import build_index

        rows = [
            (0, "spark join merge plan"),
            (1, "merge sort stream plan"),
            (2, "window scan plan"),
            (3, "join merge window"),
            (4, "scan scan scan"),
            (5, "plan plan join"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        idx = build_index(docs, num_segments=2)
        return docs, idx

    def test_knn_search_matches_mlt(self, spark, corpus):
        from solrtexttagger_spark.search.mlt import more_like_this
        from solrtexttagger_spark.search.streaming_expr import stream
        from pyspark.sql import functions as F

        docs, idx = corpus
        got = [
            tuple(r)
            for r in stream(
                'knnSearch(d, id=0, qf="text", rows=3, fl="text")',
                {"d": docs}, indexes={"d": idx},
            ).collect()
        ]
        want = (
            more_like_this(idx, docs, [0], k=3)
            .join(docs, "doc_id")
            .orderBy("rank")
            .select("doc_id", "text", F.round("score", 4).alias("score"))
            .collect()
        )
        assert got == [tuple(r) for r in want]
        assert all(r[0] != 0 for r in got)  # self excluded
        assert len(got) == 3

    def test_update_sink_upserts_and_rebinds(self, spark, corpus):
        from solrtexttagger_spark.search.streaming_expr import stream

        docs, idx = corpus
        tables = {"d": docs,
                  "batch": spark.createDataFrame(
                      [(5, "tungsten codegen"), (6, "arrow batch")],
                      "doc_id long, text string")}
        indexes = {"d": idx}
        out = stream("update(d, search(batch, q=\"*:*\"))",
                     tables, indexes=indexes).collect()
        assert [tuple(r) for r in out] == [(2, 7)]  # 1 replace + 1 add
        # the registered collection and index both see the new state
        assert tables["d"].count() == 7
        assert tables["d"].where("doc_id = 5").collect()[0]["text"] == \
            "tungsten codegen"
        hits = stream('search(d, q="arrow", fl="doc_id")',
                      tables, indexes=indexes).collect()
        assert [r["doc_id"] for r in hits] == [6]


class TestLifecycleStreams:
    """topic (checkpointed pull), daemon (re-runner), nodes count(*) +
    scoreNodes — the Solr continuous-ingest and graph-relevance
    surface."""

    def test_nodes_count_and_score_nodes_vs_duckdb(self, spark):
        from solrtexttagger_spark.search.streaming_expr import stream

        rows = [(0, "alice", "bob"), (1, "alice", "carol"),
                (2, "bob", "carol"), (3, "carol", "bob"),
                (4, "alice", "bob"), (5, "dave", "erin")]
        tables = {"d": spark.createDataFrame(
            rows, "doc_id long, author string, reviewer string")}
        expr = ('scoreNodes(nodes(d, search(d, q="*:*", '
                'fq="author = \'alice\'", fl="doc_id,author,reviewer"), '
                'walk="reviewer->author", gather="author", count(*)), '
                'collection="d", field="author")')
        got = sorted(tuple(r) for r in stream(expr, tables).collect())
        con = duckdb.connect()
        con.sql("CREATE TABLE d AS SELECT * FROM (VALUES "
                + ",".join(f"({i},'{a}','{r}')" for i, a, r in rows)
                + ") v(doc_id, author, reviewer)")
        want = sorted(tuple(r) for r in con.sql("""
WITH fr AS (SELECT DISTINCT reviewer AS author FROM d
            WHERE author = 'alice'),
g AS (SELECT d.author AS node, count(*)::BIGINT AS cnt
      FROM d JOIN fr USING (author) GROUP BY 1),
df AS (SELECT author AS node, count(*)::BIGINT AS docFreq
       FROM d GROUP BY 1),
n AS (SELECT count(*)::DOUBLE AS nd FROM d)
SELECT g.node, g.cnt, df.docFreq,
       round(g.cnt * ln((n.nd + 1) / (df.docFreq + 1)), 4) AS score
FROM g JOIN df USING (node), n
""").fetchall())
        assert got == want and len(got) == 2  # bob, carol

    def test_topic_checkpointed_pull(self, spark):
        from solrtexttagger_spark.search.streaming_expr import stream

        tables = {"src": spark.createDataFrame(
            [(0, 10, "a"), (1, 20, "b"), (2, 30, "c")],
            "doc_id long, version long, text string")}
        first = stream('topic(ck, src, id="t1", version_field="version", '
                       'fl="doc_id,text")', tables).collect()
        assert sorted(r["doc_id"] for r in first) == [0, 1, 2]
        # drained: nothing above the advanced checkpoint
        assert stream('topic(ck, src, id="t1", '
                      'version_field="version")', tables).count() == 0
        # new rows arrive; only they come back
        tables["src"] = tables["src"].unionByName(
            spark.createDataFrame([(3, 40, "d")],
                                  "doc_id long, version long, text string"))
        third = stream('topic(ck, src, id="t1", version_field="version", '
                       'fl="doc_id,text")', tables).collect()
        assert [r["doc_id"] for r in third] == [3]
        # independent topic ids keep independent checkpoints
        other = stream('topic(ck, src, id="t2", '
                       'version_field="version")', tables)
        assert other.count() == 4

    def test_daemon_update_topic_ingest_loop(self, spark):
        from solrtexttagger_spark.index.build import build_index
        from solrtexttagger_spark.search.streaming_expr import (
            DAEMONS, stream,
        )

        docs = spark.createDataFrame(
            [(0, "spark join plan"), (1, "merge sort plan")],
            "doc_id long, text string")
        tables = {
            "d": docs,
            "src": spark.createDataFrame(
                [(2, 1, "tungsten codegen")],
                "doc_id long, version long, text string"),
        }
        indexes = {"d": build_index(docs, num_segments=2)}
        status = stream(
            'daemon(update(d, select(topic(ck, src, id="ing", '
            'version_field="version"), "doc_id", "text")), '
            'id="ing", runInterval=50)',
            tables, indexes=indexes,
        ).collect()
        assert [tuple(r) for r in status] == [("ing", "STOPPED", 50, 0)]
        d = DAEMONS["ing"]
        out1 = d.run_once()
        assert [tuple(r) for r in out1] == [(1, 3)]
        # drained second run: no-op upsert, totals unchanged
        out2 = d.run_once()
        assert [tuple(r) for r in out2] == [(0, 3)] and d.iterations == 2
        # feed one more row; the third run ingests exactly it
        tables["src"] = tables["src"].unionByName(
            spark.createDataFrame([(3, 2, "arrow batch")],
                                  "doc_id long, version long, text string"))
        out3 = d.run_once()
        assert [tuple(r) for r in out3] == [(1, 4)]
        hits = stream('search(d, q="arrow", fl="doc_id")',
                      tables, indexes=indexes).collect()
        assert [r["doc_id"] for r in hits] == [3]
        del DAEMONS["ing"]


class TestListPlistEcho:
    def test_list_plist_union_heterogeneous(self, spark, tables):
        from solrtexttagger_spark.search.streaming_expr import stream

        for fn in ("list", "plist"):
            out = stream(
                f'{fn}(search(logs, q="*:*", fq="id < 2", fl="id,host"), '
                f'search(hosts, q="*:*", fq="region = \'ap\'"))',
                tables,
            ).collect()
            # 2 log rows (null region) + 1 host row (null id)
            assert len(out) == 3
            assert {
                (r["id"], r["host"], r["region"]) for r in out
            } == {(0, "host0", None), (1, "host1", None),
                  (None, "host9", "ap")}

    def test_echo(self, spark, tables):
        from solrtexttagger_spark.search.streaming_expr import stream

        out = stream('echo("hello world")', tables).collect()
        assert [tuple(r) for r in out] == [("hello world",)]


class TestDaemonLifecycle:
    def test_start_stop_interval_thread(self, spark, tables):
        import time

        from solrtexttagger_spark.search.streaming_expr import (
            DAEMONS, stream,
        )

        stream(
            'daemon(stats(search(logs, q="*:*"), count(*)), '
            'id="ticker", runInterval=100)',
            tables,
        ).collect()
        d = DAEMONS["ticker"]
        assert d.state == "STOPPED" and d.iterations == 0
        d.start()
        assert d.state == "RUNNING"
        deadline = time.time() + 15
        while d.iterations < 1 and time.time() < deadline:
            time.sleep(0.1)
        d.stop()
        assert d.state == "STOPPED"
        assert d.iterations >= 1
        assert [tuple(r) for r in d.last_result] == [(40,)]
        ran = d.iterations
        time.sleep(0.3)  # no further runs after stop
        assert d.iterations == ran
        del DAEMONS["ticker"]


class TestParserProperty:
    def test_parse_repr_roundtrip(self):
        """Property: parse(expr) -> repr-ish serialization -> parse
        yields the identical tree, over generated nested expressions."""
        from solrtexttagger_spark.search.streaming_expr import (
            Expr, parse_expression,
        )

        def ser(e):
            if isinstance(e, str):
                return '"' + e.replace('"', '\\"') + '"'
            if not isinstance(e, Expr):
                return repr(e)
            inner = [ser(a) for a in e.args] + [
                f"{k}={ser(v)}" if isinstance(v, (Expr, str))
                else f"{k}={v}"
                for k, v in e.params.items()
            ]
            return f"{e.name}({', '.join(inner)})"

        def eq(a, b):
            if isinstance(a, Expr) and isinstance(b, Expr):
                return (a.name == b.name
                        and len(a.args) == len(b.args)
                        and all(eq(x, y) for x, y in zip(a.args, b.args))
                        and set(a.params) == set(b.params)
                        and all(eq(a.params[k], b.params[k])
                                for k in a.params))
            return a == b and type(a) is type(b)

        import random as _rnd
        rnd = _rnd.Random(9)
        names = ["search", "rollup", "top", "sel", "f1", "f2"]
        keys = ["q", "fq", "on", "over", "n", "walk"]

        def gen(depth):
            e = Expr(rnd.choice(names))
            for _ in range(rnd.randint(0, 2)):
                if depth > 0 and rnd.random() < 0.5:
                    e.args.append(gen(depth - 1))
                else:
                    e.args.append(rnd.choice(
                        ['a b"c', "plain", "x,y desc", "50"]))
            for _ in range(rnd.randint(0, 2)):
                k = rnd.choice(keys)
                if depth > 0 and rnd.random() < 0.3:
                    e.params[k] = gen(depth - 1)
                elif rnd.random() < 0.5:
                    e.params[k] = rnd.choice(["v 1", 'quo"te', "field asc"])
                else:
                    e.params[k] = rnd.choice([7, -3, 2.5])
            return e

        for _ in range(200):
            t = gen(3)
            s = ser(t)
            assert eq(parse_expression(s), t), s
