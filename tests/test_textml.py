"""features()/train()/classify() — the TextLogitStream family — vs a
numpy oracle running the identical math on the collected matrix."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from solrtexttagger_spark.index.build import build_index
from solrtexttagger_spark.search.textml import (
    classify_docs,
    features_ig,
    train_logit,
)

POS_WORDS = ["great", "excellent", "love"]
NEG_WORDS = ["awful", "broken", "hate"]
NEUTRAL = ["the", "product", "box", "arrived", "today", "item"]


def _mk_docs():
    import random

    rng = random.Random(7)
    docs = []
    for i in range(200):
        y = i % 2
        words = [rng.choice(NEUTRAL) for _ in range(rng.randint(4, 10))]
        # planted signal with noise: class words appear mostly on
        # their side
        pool = POS_WORDS if y == 1 else NEG_WORDS
        for _ in range(rng.randint(1, 3)):
            words.insert(rng.randrange(len(words)), rng.choice(pool))
        if rng.random() < 0.1:  # label noise
            other = NEG_WORDS if y == 1 else POS_WORDS
            words.append(rng.choice(other))
        docs.append((i, " ".join(words), y))
    return docs


@pytest.fixture(scope="module")
def corpus(spark):
    docs = _mk_docs()
    df = spark.createDataFrame(
        docs, "doc_id long, text string, outcome int"
    )
    idx = build_index(df.select("doc_id", "text"), num_segments=4)
    idx.postings.persist().count()
    yield docs, df, idx
    idx.postings.unpersist()


def _py_ig(docs):
    n = len(docs)
    pos = sum(y for _, _, y in docs)
    import collections

    df_c = collections.Counter()
    pos_c = collections.Counter()
    for _, t, y in docs:
        for w in set(t.split()):
            df_c[w] += 1
            pos_c[w] += y

    def h(p):
        if p <= 0 or p >= 1:
            return 0.0
        return -(p * math.log2(p) + (1 - p) * math.log2(1 - p))

    hy = h(pos / n)
    out = {}
    for w, d in df_c.items():
        p_in = pos_c[w] / d
        p_out = (pos - pos_c[w]) / (n - d) if n != d else 0.0
        out[w] = hy - (d / n) * h(p_in) - ((n - d) / n) * (
            h(p_out) if n != d else 0.0
        )
    return out


class TestFeatures:
    def test_matches_python_ig(self, corpus):
        docs, df, idx = corpus
        got = features_ig(
            idx, df.select("doc_id", "outcome"), n_terms=6
        ).collect()
        exp = _py_ig(docs)
        ranked = sorted(
            exp.items(), key=lambda kv: (-round(kv[1], 9), kv[0])
        )[:6]
        assert [(r["rank"], r["term"]) for r in got] == [
            (i + 1, t) for i, (t, _) in enumerate(ranked)
        ]
        for r in got:
            assert r["ig"] == pytest.approx(exp[r["term"]], rel=1e-9)
        # the planted signal words dominate the selection
        top = {r["term"] for r in got}
        assert top <= set(POS_WORDS + NEG_WORDS)

    def test_single_class_raises(self, corpus):
        _, df, idx = corpus
        with pytest.raises(ValueError, match="both classes"):
            features_ig(
                idx, df.where("outcome = 1").select("doc_id", "outcome")
            )


def _py_train(docs, terms, iterations, lr):
    X = np.array(
        [[1.0 if t in d.split() else 0.0 for t in terms]
         for _, d, _ in docs]
    )
    y = np.array([float(yy) for _, _, yy in docs])
    w = np.zeros(len(terms))
    b = 0.0
    hist = []
    for _ in range(iterations):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        eps = 1e-12
        loss = float(
            -np.mean(y * np.log(np.maximum(p, eps))
                     + (1 - y) * np.log(np.maximum(1 - p, eps)))
        )
        hist.append((w.copy(), b, loss))
        err = p - y
        w = w - lr * (X.T @ err) / len(y)
        b = b - lr * float(err.sum()) / len(y)
    hist.append((w.copy(), b, hist[-1][2]))
    return hist


class TestTrain:
    def test_matches_numpy_gd(self, corpus):
        docs, df, idx = corpus
        terms = ["great", "awful", "love", "hate"]
        got = train_logit(
            idx, df.select("doc_id", "outcome"), terms,
            iterations=5, learning_rate=0.5,
        )
        exp = _py_train(docs, terms, 5, 0.5)
        assert len(got) == 6
        for g, (we, be, le) in zip(got, exp):
            assert g["weights"] == pytest.approx(list(we), abs=1e-9)
            assert g["bias"] == pytest.approx(be, abs=1e-9)
            assert g["error"] == pytest.approx(le, abs=1e-9)
        # loss decreases on the planted signal
        assert got[-1]["error"] < got[0]["error"]

    def test_guards(self, corpus):
        _, df, idx = corpus
        with pytest.raises(ValueError, match="term list"):
            train_logit(idx, df.select("doc_id", "outcome"), [])
        with pytest.raises(ValueError, match="iterations"):
            train_logit(
                idx, df.select("doc_id", "outcome"), ["great"],
                iterations=0,
            )


class TestClassify:
    def test_matches_numpy_sigmoid(self, corpus, spark):
        docs, df, idx = corpus
        model = {
            "terms": ["great", "awful"],
            "weights": [2.0, -3.0],
            "bias": 0.25,
        }
        got = {
            r["doc_id"]: (r["probability"], r["score"])
            for r in classify_docs(df, model).collect()
        }
        for i, t, _ in docs[:50]:
            toks = t.split()
            z = 0.25 + (2.0 if "great" in toks else 0.0) + (
                -3.0 if "awful" in toks else 0.0
            )
            assert got[i][1] == pytest.approx(z, abs=1e-12)
            assert got[i][0] == pytest.approx(
                1 / (1 + math.exp(-z)), abs=1e-12
            )

    def test_end_to_end_separates_classes(self, corpus):
        """train -> classify: the learned model orders the classes
        (mean probability of the positive class is clearly higher)."""
        docs, df, idx = corpus
        feats = features_ig(
            idx, df.select("doc_id", "outcome"), n_terms=6
        ).collect()
        model = train_logit(
            idx, df.select("doc_id", "outcome"),
            [r["term"] for r in feats],
            iterations=50, learning_rate=1.0,
        )[-1]
        scored = classify_docs(df, model).join(
            df.select("doc_id", "outcome"), "doc_id"
        )
        means = {
            r["outcome"]: r["m"]
            for r in scored.groupBy("outcome")
            .agg(F.avg("probability").alias("m")).collect()
        }
        assert means[1] > 0.7 and means[0] < 0.3

    def test_classify_is_map_only(self, corpus):
        _, df, idx = corpus
        model = {"terms": ["great"], "weights": [1.0], "bias": 0.0}
        plan = (
            classify_docs(df, model)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "python" not in plan.lower()


class TestStreamCompiler:
    def test_train_classify_expression(self, corpus, spark):
        """The full Solr idiom end-to-end:
        classify(train(col, features(col, ...), ...), search(col), ...)
        — compiled pieces match the standalone operators."""
        from solrtexttagger_spark.search.streaming_expr import (
            compile_stream, parse_expression,
        )

        docs, df, idx = corpus
        tables = {"reviews": df}
        indexes = {"reviews": idx}

        feats = compile_stream(
            parse_expression('features(reviews, outcome="outcome", '
                       'numTerms="4")'),
            tables, indexes,
        )
        exp_feats = features_ig(
            idx, df.select("doc_id", "outcome"), n_terms=4
        )
        assert [r["term"] for r in feats.collect()] == [
            r["term"] for r in exp_feats.collect()
        ]

        out = compile_stream(
            parse_expression(
                'classify('
                'train(reviews, features(reviews, outcome="outcome", '
                'numTerms="4"), outcome="outcome", '
                'maxIterations="20", alpha="1.0"), '
                'search(reviews, q="*:*"), field="text")'
            ),
            tables, indexes,
        )
        terms = [r["term"] for r in exp_feats.collect()]
        model = train_logit(
            idx, df.select("doc_id", "outcome"), terms,
            iterations=20, learning_rate=1.0,
        )[-1]
        exp = {
            r["doc_id"]: r["probability"]
            for r in classify_docs(df, model).collect()
        }
        got = {r["doc_id"]: r["probability"] for r in out.collect()}
        assert got.keys() == exp.keys()
        for k in got:
            assert got[k] == pytest.approx(exp[k], abs=1e-9)

    def test_train_emits_model_tuples(self, corpus):
        from solrtexttagger_spark.search.streaming_expr import (
            compile_stream, parse_expression,
        )

        docs, df, idx = corpus
        out = compile_stream(
            parse_expression(
                'train(reviews, features(reviews, outcome="outcome", '
                'numTerms="3"), outcome="outcome", maxIterations="4")'
            ),
            {"reviews": df}, {"reviews": idx},
        ).orderBy("iteration_i").collect()
        assert [r["iteration_i"] for r in out] == [1, 2, 3, 4, 5]
        errs = [r["error_d"] for r in out]
        assert errs[-1] <= errs[0]
        assert len(out[0]["weights_ds"]) == 3

    def test_missing_index_raises(self, corpus):
        from solrtexttagger_spark.search.streaming_expr import (
            compile_stream, parse_expression,
        )

        _, df, _ = corpus
        with pytest.raises(ValueError, match="InvertedIndex"):
            compile_stream(
                parse_expression('features(reviews, outcome="outcome")'),
                {"reviews": df}, {},
            )


class TestAnalyzerAndGuards:
    def test_classify_standard_analyzer_fires_on_punctuation(self, spark):
        """Train/serve analyzer parity: the index tokenizes \\w+ runs,
        so 'great!' carries the 'great' term — classify must too."""
        d = spark.createDataFrame(
            [(1, "This product is GREAT!"), (2, "meh, ok.")],
            "doc_id long, text string",
        )
        model = {"terms": ["great"], "weights": [2.0], "bias": 0.0}
        got = {
            r["doc_id"]: r["score"]
            for r in classify_docs(d, model).collect()
        }
        assert got[1] == pytest.approx(2.0)
        assert got[2] == pytest.approx(0.0)
        ws = {
            r["doc_id"]: r["score"]
            for r in classify_docs(
                d, model, analyzer="whitespace").collect()
        }
        assert ws[1] == pytest.approx(0.0)  # 'great!' != 'great'
        with pytest.raises(ValueError, match="analyzer"):
            classify_docs(d, model, analyzer="magic")

    def test_empty_labeled_set_raises(self, corpus):
        _, df, idx = corpus
        with pytest.raises(ValueError, match="no labeled docs"):
            train_logit(
                idx, df.where("doc_id < 0").select("doc_id", "outcome"),
                ["great"],
            )

    def test_compiler_arity_errors(self, corpus):
        from solrtexttagger_spark.search.streaming_expr import (
            compile_stream, parse_expression,
        )

        _, df, idx = corpus
        t, i = {"reviews": df}, {"reviews": idx}
        with pytest.raises(ValueError, match="collection"):
            compile_stream(parse_expression("features()"), t, i)
        with pytest.raises(ValueError, match="feature stream"):
            compile_stream(parse_expression("train(reviews)"), t, i)
        with pytest.raises(ValueError, match="both streams"):
            compile_stream(
                parse_expression(
                    'classify(train(reviews, features(reviews, '
                    'outcome="outcome"), outcome="outcome"))'
                ), t, i,
            )
