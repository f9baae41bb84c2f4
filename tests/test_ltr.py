"""{!ltr} rerank + [features] extraction, vs a pure-Python model oracle
(the model dicts evaluate trivially in Python — the test recomputes
every feature and score on collected rows and pins rank identity)."""

import pytest
from pyspark.sql import functions as F

from solrtexttagger_spark.search.ltr import (
    extract_features,
    ltr_rerank,
    model_score_expr,
)

DOCS = [
    # doc_id, views, length, lang
    (0, 10.0, 100, "en"),
    (1, 50.0, 20, "en"),
    (2, 5.0, 300, "de"),
    (3, 80.0, 50, "fr"),
    (4, 30.0, 10, "en"),
    (5, 1.0, 999, "de"),
]

FEATURES = {
    "f_views": "log(views + 1)",
    "f_len": "length / 100.0",
    "f_en": "CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END",
    "f_orig": "originalScore",
}


@pytest.fixture(scope="module")
def rels(spark):
    docs = spark.createDataFrame(
        DOCS, "doc_id long, views double, length long, lang string"
    )
    ranked = spark.createDataFrame(
        [(0, i + 1, d, 10.0 - i) for i, d in enumerate([3, 1, 4, 0, 2, 5])],
        "query_id int, rank long, doc_id long, score double",
    )
    return docs, ranked


def py_features(doc, orig):
    import math

    d = dict(zip(["doc_id", "views", "length", "lang"], doc))
    return {
        "f_views": math.log(d["views"] + 1),
        "f_len": d["length"] / 100.0,
        "f_en": 1.0 if d["lang"] == "en" else 0.0,
        "f_orig": orig,
    }


class TestExtract:
    def test_feature_vector_matches_python(self, spark, rels):
        docs, ranked = rels
        out = extract_features(ranked, docs, FEATURES).collect()
        orig = {3: 10.0, 1: 9.0, 4: 8.0, 0: 7.0, 2: 6.0, 5: 5.0}
        by_id = {r["doc_id"]: r for r in out}
        for doc in DOCS:
            exp = py_features(doc, orig[doc[0]])
            for k, v in exp.items():
                assert by_id[doc[0]][k] == pytest.approx(v), (doc[0], k)

    def test_efi_substitution(self, spark, rels):
        docs, ranked = rels
        out = extract_features(
            ranked, docs, {"f_q": "CASE WHEN lang = efi.ql THEN efi.w "
                                   "ELSE 0.0 END"},
            efi={"ql": "de", "w": 2.5},
        ).collect()
        got = {r["doc_id"]: r["f_q"] for r in out}
        assert got[2] == 2.5 and got[5] == 2.5 and got[0] == 0.0

    def test_bad_efi_raises(self, spark, rels):
        docs, ranked = rels
        with pytest.raises(ValueError, match="efi"):
            extract_features(ranked, docs, {"f": "efi.x"},
                             efi={"x": [1, 2]})

    def test_empty_features_raise(self, spark, rels):
        docs, ranked = rels
        with pytest.raises(ValueError, match="features"):
            extract_features(ranked, docs, {})


LINEAR = {"type": "linear",
          "weights": {"f_views": 2.0, "f_len": -1.0, "f_en": 0.5,
                      "f_orig": 0.1}}

TREES = {
    "type": "trees",
    "trees": [
        {"weight": 1.0, "root": {
            "feature": "f_views", "threshold": 3.0,
            "left": {"value": 0.0}, "right": {"value": 5.0}}},
        {"weight": 2.0, "root": {
            "feature": "f_en", "threshold": 0.5,
            "left": {"feature": "f_len", "threshold": 1.0,
                     "left": {"value": 1.0}, "right": {"value": -1.0}},
            "right": {"value": 3.0}}},
    ],
}


def py_model(model, fv):
    if model["type"] == "linear":
        return sum(w * fv[f] for f, w in model["weights"].items())
    total = 0.0
    for t in model["trees"]:
        node = t["root"]
        while "value" not in node:
            node = (node["left"] if fv[node["feature"]]
                    <= node["threshold"] else node["right"])
        total += t.get("weight", 1.0) * node["value"]
    return total


class TestRerank:
    @pytest.mark.parametrize("model", [LINEAR, TREES],
                             ids=["linear", "trees"])
    def test_rank_identity_with_python_model(self, spark, rels, model):
        docs, ranked = rels
        out = ltr_rerank(
            ranked, docs, model, FEATURES, rerank_docs=4
        ).orderBy("rank").collect()
        # python oracle: rescore the top 4 by the model, reorder among
        # themselves; tail (ranks 5,6) keeps first-pass positions/scores
        orig = {3: 10.0, 1: 9.0, 4: 8.0, 0: 7.0, 2: 6.0, 5: 5.0}
        head_ids = [3, 1, 4, 0]
        rescored = sorted(
            (
                (-py_model(model, py_features(
                    next(d for d in DOCS if d[0] == i), orig[i])), i)
                for i in head_ids
            )
        )
        exp = [(-s, i) for s, i in rescored] + [
            (orig[2], 2), (orig[5], 5)
        ]
        got = [(r["score"], r["doc_id"]) for r in out]
        assert [i for _, i in got] == [i for _, i in exp]
        for (gs, _), (es, _) in zip(got, exp):
            assert gs == pytest.approx(es)

    def test_keep_features(self, spark, rels):
        docs, ranked = rels
        out = ltr_rerank(
            ranked, docs, LINEAR, FEATURES, rerank_docs=3,
            keep_features=True,
        )
        assert set(FEATURES).issubset(out.columns)
        assert out.count() == 3  # head only on the training-data path

    def test_model_validation(self):
        with pytest.raises(ValueError, match="unknown features"):
            model_score_expr(
                {"type": "linear", "weights": {"nope": 1.0}}, FEATURES)
        with pytest.raises(ValueError, match="model type"):
            model_score_expr({"type": "magic"}, FEATURES)
        with pytest.raises(ValueError, match="at least one"):
            model_score_expr({"type": "trees", "trees": []}, FEATURES)

    def test_single_projection_plan(self, spark, rels):
        """Scale pin: the whole model (features + trees) evaluates as
        codegen'd projections over ONE broadcast page join — no Python,
        no per-feature jobs."""
        docs, ranked = rels
        out = ltr_rerank(ranked, docs, TREES, FEATURES, rerank_docs=4)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "python" not in plan.lower()


class TestRouter:
    def test_routed_ltr_matches_standalone(self, spark, rels):
        """rq={!ltr} through solr_select == ltr_rerank over the same
        first pass (row identity on the page)."""
        from solrtexttagger_spark.search.request import solr_select

        docs, _ = rels
        params = {
            "q": "{!func}views",
            "rq": "{!ltr reRankDocs=4 efi.ql=en}",
            "ltr.model": LINEAR,
            "ltr.features": FEATURES,
            "rows": "6",
            "fl": "lang",
        }
        page = solr_select(None, docs, params).orderBy("rank").collect()
        # standalone: first pass = rank by views desc (the {!func} q)
        first = docs.selectExpr(
            "0 AS query_id", "doc_id",
            "CAST(views AS DOUBLE) AS score",
        ).withColumn(
            "rank",
            F.row_number().over(
                __import__("pyspark").sql.Window.orderBy(
                    F.col("score").desc(), F.col("doc_id").asc())
            ).cast("long"),
        )
        exp = ltr_rerank(
            first, docs, LINEAR, FEATURES, rerank_docs=4
        ).orderBy("rank").collect()
        assert [(r["rank"], r["doc_id"]) for r in page] == [
            (r["rank"], r["doc_id"]) for r in exp
        ]

    def test_missing_model_raises(self, spark, rels):
        from solrtexttagger_spark.search.request import solr_select

        docs, _ = rels
        with pytest.raises(ValueError, match="ltr.model"):
            solr_select(None, docs, {
                "q": "{!func}views", "rq": "{!ltr reRankDocs=3}",
            })


class TestEfiEdgeCases:
    def test_prefix_colliding_efi_names(self, spark, rels):
        """efi.l must not corrupt efi.lang (longest-first + word
        boundary substitution)."""
        docs, ranked = rels
        out = extract_features(
            ranked, docs,
            {"f": "CASE WHEN lang = efi.lang THEN length * efi.l "
                  "ELSE 0.0 END"},
            efi={"l": 2, "lang": "en"},
        ).collect()
        got = {r["doc_id"]: r["f"] for r in out}
        assert got[0] == 200.0 and got[1] == 40.0 and got[2] == 0.0

    def test_string_efi_quoting(self, spark, rels):
        docs, ranked = rels
        out = extract_features(
            ranked, docs,
            {"f": "CASE WHEN lang = efi.q THEN 1.0 ELSE 0.0 END"},
            efi={"q": "it's"},
        ).collect()
        assert all(r["f"] == 0.0 for r in out)
