"""/admin/luke introspection vs DuckDB mirrors.

The index-level numbers mirror through a DuckDB re-tokenization (the
same regexp discipline test_index_bm25 uses for term_stats); field
stats mirror as plain COUNT/COUNT(DISTINCT) SQL.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from solrtexttagger_spark.index.build import build_index
from solrtexttagger_spark.index.luke import (
    luke_field_stats,
    luke_index_summary,
    luke_top_terms,
)

TOKENIZE_SQL = """
SELECT doc_id, w AS term
FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w
    FROM documents WHERE doc_id < 300
) WHERE w <> ''
"""


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") < 300)
    )


@pytest.fixture(scope="module")
def index(docs):
    idx = build_index(docs.select("doc_id", "text"), num_segments=4)
    idx.postings.persist().count()
    yield idx
    idx.postings.unpersist()


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')")
    return con


class TestIndexSummary:
    def test_matches_oracle(self, index, oracle):
        row = luke_index_summary(index).collect()[0]
        exp = oracle.sql(f"""
            SELECT count(DISTINCT doc_id) AS num_docs,
                   count(DISTINCT term) AS num_terms,
                   count(DISTINCT (doc_id, term)) AS total_postings,
                   count(*) AS total_tokens
            FROM ({TOKENIZE_SQL})
        """).fetchone()
        assert (row["num_docs"], row["num_terms"],
                row["total_postings"], row["total_tokens"]) == exp
        assert row["avgdl"] == pytest.approx(exp[3] / exp[0])
        assert row["num_segments"] == 4


class TestTopTerms:
    def test_matches_oracle(self, index, oracle):
        got = [
            (r["rank"], r["term"], r["df"], r["cf"])
            for r in luke_top_terms(index, top=15).collect()
        ]
        exp = oracle.sql(f"""
            SELECT row_number() OVER (ORDER BY df DESC, term) AS rank,
                   term, df, cf
            FROM (
                SELECT term, count(DISTINCT doc_id) AS df,
                       count(*) AS cf
                FROM ({TOKENIZE_SQL}) GROUP BY term
            ) ORDER BY df DESC, term LIMIT 15
        """).fetchall()
        assert got == [tuple(r) for r in exp]

    def test_take_ordered_plan(self, index):
        plan = (
            luke_top_terms(index, top=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan

    def test_bad_top_raises(self, index):
        with pytest.raises(ValueError, match="top"):
            luke_top_terms(index, top=0)


class TestFieldStats:
    def test_exact_matches_oracle(self, docs, oracle):
        got = sorted(
            tuple(r) for r in luke_field_stats(
                docs, ["lang", "source", "n_chars"], approx=False
            ).collect()
        )
        exp = sorted(
            [
                ("lang", "string") + oracle.sql(
                    "SELECT count(lang), count(DISTINCT lang) "
                    "FROM documents WHERE doc_id < 300").fetchone(),
                ("source", "string") + oracle.sql(
                    "SELECT count(source), count(DISTINCT source) "
                    "FROM documents WHERE doc_id < 300").fetchone(),
                ("n_chars", "bigint") + oracle.sql(
                    "SELECT count(n_chars), count(DISTINCT n_chars) "
                    "FROM documents WHERE doc_id < 300").fetchone(),
            ]
        )
        assert got == exp

    def test_approx_within_rsd(self, docs):
        exact = {
            r["field"]: r["distinct_values"]
            for r in luke_field_stats(docs, approx=False).collect()
        }
        approx = {
            r["field"]: r["distinct_values"]
            for r in luke_field_stats(docs).collect()
        }
        for f_, d in exact.items():
            assert abs(approx[f_] - d) <= max(2, 0.1 * d), f_

    def test_one_pass_plan(self, docs):
        """The whole multi-field report is ONE aggregate over one scan —
        no per-field jobs, no join of per-field results."""
        plan = (
            luke_field_stats(docs, ["lang", "source"], approx=True)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Scan parquet") == 1, plan
        assert "Join" not in plan

    def test_unknown_field_raises(self, docs):
        with pytest.raises(ValueError, match="absent"):
            luke_field_stats(docs, ["nope"])


def test_field_stats_rejects_non_identifier_names(docs):
    """The stack() SQL interpolation needs plain identifiers; a quoted/
    dotted/spaced field name must fail loudly, not with a downstream
    parse error (r10, from r9 ADVICE)."""
    from solrtexttagger_spark.index.luke import luke_field_stats

    renamed = docs.withColumnRenamed("lang", "la ng")
    with pytest.raises(ValueError, match="identifier"):
        luke_field_stats(renamed, ["la ng"])
