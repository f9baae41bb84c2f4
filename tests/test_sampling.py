"""Deterministic sampling operators: stability under repartitioning, plan
shape (narrow filter / TakeOrdered — no shuffle), stratified fractions,
salt independence, exact-k prefix stability."""

import pytest
from pyspark.sql import functions as F

from solrtexttagger_spark.ops.sampling import (
    hash_sample,
    hash_top_k,
    stratified_hash_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"text {i}", ["en", "de", "fr"][i % 3]) for i in range(3000)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_hash_sample_deterministic_and_sized(spark, docs):
    a = ids(hash_sample(docs, 0.1, key_cols=["doc_id"]))
    b = ids(hash_sample(docs.repartition(17), 0.1, key_cols=["doc_id"]))
    assert a == b  # partitioning-independent
    assert 0.06 < len(a) / 3000 < 0.14  # ~Bernoulli(0.1)
    # monotone: a larger fraction strictly contains a smaller one
    big = ids(hash_sample(docs, 0.3, key_cols=["doc_id"]))
    assert a <= big
    # different salt -> (near-)independent sample
    c = ids(hash_sample(docs, 0.1, key_cols=["doc_id"], salt="v2"))
    assert c != a
    # edge fractions
    assert ids(hash_sample(docs, 0.0, key_cols=["doc_id"])) == set()
    assert ids(hash_sample(docs, 1.0, key_cols=["doc_id"])) == ids(docs)
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5, key_cols=["doc_id"])


def test_hash_sample_plan_is_narrow(spark, docs):
    from solrtexttagger_spark.plans import plan_summary

    s = plan_summary(hash_sample(docs, 0.1, key_cols=["doc_id"]))
    assert s["exchanges"] == 0 and s["python_stages"] == 0


def test_stratified_fractions(spark, docs):
    out = stratified_hash_sample(
        docs,
        {"en": 0.02, "de": 0.5},
        strata_col="lang",
        key_cols=["doc_id"],
        default_fraction=0.2,
    )
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts.get("de", 0) > counts.get("fr", 0) > counts.get("en", 0)
    assert 0.35 < counts["de"] / 1000 < 0.65
    assert counts.get("en", 0) / 1000 < 0.06
    # a stratum's sample is the plain hash_sample at its fraction (same gate)
    en_only = ids(hash_sample(docs.where(F.col("lang") == "en"), 0.02, key_cols=["doc_id"]))
    assert {r["doc_id"] for r in out.where(F.col("lang") == "en").collect()} == en_only


def test_hash_top_k_exact_and_prefix_stable(spark, docs):
    k100 = ids(hash_top_k(docs, 100, key_cols=["doc_id"]))
    assert len(k100) == 100
    assert k100 == ids(hash_top_k(docs.repartition(13), 100, key_cols=["doc_id"]))
    # prefix property: top-50 is a subset of top-100
    assert ids(hash_top_k(docs, 50, key_cols=["doc_id"])) <= k100
    # growing the corpus only swaps by hash rank: the new top-100 over a
    # superset still comes from hash order (old members with small hashes stay)
    more = docs.unionByName(
        spark.createDataFrame([(10_000 + i, "x", "en") for i in range(100)],
                              "doc_id long, text string, lang string")
    )
    k100b = ids(hash_top_k(more, 100, key_cols=["doc_id"]))
    assert len(k100b) == 100 and len(k100 & k100b) > 80
    # plan: TakeOrdered, not a global sort exchange
    plan = ""
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        hash_top_k(docs, 100, key_cols=["doc_id"]).explain("formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan, plan
