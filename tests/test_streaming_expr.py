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
