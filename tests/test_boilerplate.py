"""Cross-document boilerplate removal vs a DuckDB mirror (the C4
frequent-line criterion computed as plain SQL over split lines)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from solrtexttagger_spark.ops.boilerplate import (
    line_stats,
    remove_boilerplate,
)

DOCS = [
    (0, "Welcome!\ncookie policy\nreal content zero\nCookie  Policy"),
    (1, "cookie policy\nunique line one\nfooter text"),
    (2, "Cookie Policy\nreal content two\nfooter text"),
    (3, "footer text\nreal content three\ncookie policy"),
    (4, "all original here\nnothing shared"),
    (5, "cookie policy\nfooter text"),  # fully boilerplate
    (6, ""),                              # empty doc
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    con.sql("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", DOCS)
    con.sql("""
        CREATE VIEW lines AS
        SELECT doc_id, pos, raw,
               trim(regexp_replace(lower(raw), '\\s+', ' ', 'g')) AS key
        FROM (
          SELECT doc_id,
                 generate_subscripts(str_split(text, chr(10)), 1) AS pos,
                 unnest(str_split(text, chr(10))) AS raw
          FROM docs
        )
    """)
    return con


class TestLineStats:
    def test_matches_oracle(self, docs, oracle):
        got = sorted(
            tuple(r) for r in line_stats(docs).collect()
        )
        exp = sorted(oracle.sql("""
            SELECT key, count(DISTINCT doc_id)::BIGINT,
                   count(*)::BIGINT
            FROM lines WHERE length(key) >= 1 GROUP BY key
        """).fetchall())
        assert got == exp
        stats = {r[0]: (r[1], r[2]) for r in got}
        # 'cookie policy' normalizes across case/space variants:
        # docs 0 (twice), 1, 2, 3, 5
        assert stats["cookie policy"] == (5, 6)
        assert stats["footer text"] == (4, 4)


class TestRemoveBoilerplate:
    def test_matches_oracle(self, docs, oracle):
        out = remove_boilerplate(docs, min_docs=4)
        got = sorted(
            (r["doc_id"], r["text"], r["n_lines_removed"])
            for r in out.collect()
        )
        exp = sorted(oracle.sql("""
            WITH freq AS (
              SELECT key FROM lines WHERE length(key) >= 1
              GROUP BY key HAVING count(DISTINCT doc_id) >= 4
            ),
            kept AS (
              SELECT l.* FROM lines l
              WHERE NOT (length(l.key) >= 1
                         AND l.key IN (SELECT key FROM freq))
            )
            SELECT d.doc_id,
                   coalesce(string_agg(k.raw, chr(10) ORDER BY k.pos),
                            '') AS text,
                   (len(str_split(d.text, chr(10)))
                    - count(k.raw))::BIGINT AS n_lines_removed
            FROM docs d LEFT JOIN kept k USING (doc_id)
            GROUP BY d.doc_id, d.text
        """).fetchall())
        assert got == exp
        by_id = {r[0]: r for r in got}
        # doc 0 loses BOTH its cookie-policy variants, keeps order
        assert by_id[0][1] == "Welcome!\nreal content zero"
        assert by_id[0][2] == 2
        # fully-boilerplate doc comes back empty, not dropped
        assert by_id[5] == (5, "", 2)
        # untouched doc is byte-identical
        assert by_id[4] == (4, DOCS[4][1], 0)

    def test_precomputed_denylist(self, docs, spark):
        deny = spark.createDataFrame(
            [("footer text",)], "line string"
        )
        out = {
            r["doc_id"]: r["text"]
            for r in remove_boilerplate(
                docs, min_docs=4, frequent=deny
            ).collect()
        }
        assert "footer text" not in out[1]
        assert "cookie policy" in out[1]  # not in the denylist

    def test_min_docs_guard(self, docs):
        with pytest.raises(ValueError, match="min_docs"):
            remove_boilerplate(docs, min_docs=1)

    def test_broadcast_opt_out_identical(self, docs):
        a = sorted(
            tuple(r) for r in remove_boilerplate(docs, min_docs=4)
            .collect()
        )
        b = sorted(
            tuple(r) for r in remove_boilerplate(
                docs, min_docs=4, broadcast_frequent=False
            ).collect()
        )
        assert a == b
        logical = (
            remove_boilerplate(
                docs, min_docs=4, broadcast_frequent=False
            )._jdf.queryExecution().optimizedPlan().toString()
        )
        assert "ResolvedHint" not in logical

    def test_short_lines_never_boilerplate(self, spark):
        d = spark.createDataFrame(
            [(i, "x\nkeep me " + str(i)) for i in range(20)],
            "doc_id long, text string",
        )
        out = remove_boilerplate(d, min_docs=4, min_line_chars=2)
        rows = out.collect()
        assert all(r["text"].startswith("x\n") for r in rows)
        # with the guard relaxed, 'x' IS boilerplate
        out2 = remove_boilerplate(d, min_docs=4, min_line_chars=1)
        assert all(
            not r["text"].startswith("x") for r in out2.collect()
        )


class TestNullAndDelimiterSafety:
    def test_null_metadata_column_survives(self, spark):
        """A NULL in a passthrough column must not wipe the text (the
        reassembly keys on the id alone — equi-joins over metadata are
        null-unsafe)."""
        d = spark.createDataFrame(
            [(1, None, "keep one\nshared line"),
             (2, "u2", "shared line\nkeep two"),
             (3, "u3", "shared line\nkeep three"),
             (4, None, "shared line\nkeep four")],
            "doc_id long, url string, text string",
        )
        out = {
            r["doc_id"]: (r["url"], r["text"], r["n_lines_removed"])
            for r in remove_boilerplate(d, min_docs=3).collect()
        }
        assert out[1] == (None, "keep one", 1)
        assert out[4] == (None, "keep four", 1)
        assert out[2] == ("u2", "keep two", 1)

    def test_null_text_stays_null(self, spark):
        d = spark.createDataFrame(
            [(1, None), (2, "a\nb"), (3, "a\nc"), (4, "a\nd")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: (r["text"], r["n_lines_removed"])
            for r in remove_boilerplate(d, min_docs=3).collect()
        }
        assert out[1] == (None, 0)
        assert out[2] == ("b", 1)

    def test_regex_metachar_delimiter(self, spark):
        """delimiter='.' must split LITERALLY (F.split takes a regex;
        unescaped it splits on every character)."""
        d = spark.createDataFrame(
            [(1, "keep me.shared"), (2, "shared.two"),
             (3, "shared.three"), (4, "shared.four")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r["text"]
            for r in remove_boilerplate(
                d, min_docs=3, delimiter="."
            ).collect()
        }
        assert out[1] == "keep me"
        assert out[2] == "two"
