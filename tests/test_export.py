"""Solr /export handler (search/export.py): full sorted result sets —
semantics vs DuckDB, range-exchange plan pin, file-order guarantee."""

import duckdb
import pytest
from pyspark.sql import functions as F

DOCS = [(i, f"w{i % 5} common", f"src{i % 3}", (i * 37) % 11)
        for i in range(60)]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, source string, n long"
    )


def _con():
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ",".join(f"({i},'{t}','{s}',{n})" for i, t, s, n in DOCS)
        + ") v(doc_id, text, source, n)"
    )
    return con


def test_sorted_full_result_vs_duckdb(spark, docs):
    from solrtexttagger_spark.search.export import export_matches

    got = [
        tuple(r)
        for r in export_matches(
            docs, fl=["source", "n"], sort=[("n", "desc"), ("source", "asc")],
            fq="n >= 3",
        ).collect()
    ]
    con = _con()
    want = con.sql(
        "SELECT source, n, doc_id FROM d WHERE n >= 3 "
        "ORDER BY n DESC, source ASC, doc_id ASC"
    ).fetchall()
    assert got == [tuple(r) for r in want]
    assert len(got) > 40  # no rows cap — the whole match set exports


def test_allowed_docs_and_function_sort(spark, docs):
    from solrtexttagger_spark.search.export import export_matches

    allowed = docs.where(F.col("doc_id") % 2 == 0).select("doc_id")
    got = [
        r["doc_id"]
        for r in export_matches(
            docs, fl=["doc_id"], sort=[("n % 4", "asc")],
            allowed_docs=allowed,
        ).collect()
    ]
    con = _con()
    want = [
        r[0]
        for r in con.sql(
            "SELECT doc_id FROM d WHERE doc_id % 2 = 0 "
            "ORDER BY n % 4 ASC, doc_id ASC"
        ).fetchall()
    ]
    assert got == want


def test_requires_sort_and_validates_direction(spark, docs):
    from solrtexttagger_spark.search.export import export_matches

    with pytest.raises(ValueError, match="requires a sort"):
        export_matches(docs, fl=["doc_id"], sort=[])
    with pytest.raises(ValueError, match="asc|desc"):
        export_matches(docs, fl=["doc_id"], sort=[("n", "down")])


def test_plan_is_one_range_exchange_no_window(spark, docs):
    from tests.test_plans import plan_str

    from solrtexttagger_spark.search.export import export_matches

    plan = plan_str(
        export_matches(docs, fl=["doc_id", "n"], sort=[("n", "asc")],
                       fq="n > 1")
    )
    assert "rangepartitioning" in plan
    assert "Window" not in plan and "Limit" not in plan


def test_export_files_concatenate_in_order(spark, docs, tmp_path):
    from solrtexttagger_spark.search.export import (
        export_matches, export_to_parquet,
    )

    out = str(tmp_path / "exp")
    exported = export_matches(
        docs.repartition(7), fl=["doc_id", "n"], sort=[("n", "asc")]
    )
    n = export_to_parquet(exported, out)
    assert n == len(DOCS)
    # reading the part files in name order reproduces the global sort
    import glob

    rows = []
    for p in sorted(glob.glob(f"{out}/part-*.parquet")):
        rows += [
            (r["n"], r["doc_id"])
            for r in spark.read.parquet(p).collect()
        ]
    assert rows == sorted(rows)
