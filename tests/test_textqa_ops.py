"""Decontamination + PII ops: nonzero-signal oracles on synthetic dirty
text (the driver-gate corpus is clean, so its pii counts are trivially
zero — these pins exercise the classifiers)."""

from solrtexttagger_spark.ops.textqa import ngram_contamination, pii_stats


def test_pii_stats_dirty_text(spark):
    docs = spark.createDataFrame(
        [
            (0, "contact bob@example.com or http://x.io now"),
            (1, "visit www.site.org room 404 code 7"),
            (2, "clean words only"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_email_like"], r["n_url_like"], r["n_digit_tokens"])
           for r in pii_stats(docs).collect()}
    assert got[0] == (1, 1, 0)
    assert got[1] == (0, 1, 2)   # www.site.org; 404 and 7
    assert got[2] == (0, 0, 0)
    assert got[3] == (0, 0, 0)


def test_ngram_contamination_edges(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps"),   # contains probe trigram
            (1, "totally unrelated words here"),
            (2, "quick brown"),                 # shorter than n -> 0 grams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_contamination(
        docs, ["the quick brown fox"], n=3).collect()}
    assert out[0]["n_grams"] == 3 and out[0]["n_contaminated"] == 2
    assert out[0]["contamination"] == round(2 / 3, 4)
    assert out[1]["n_contaminated"] == 0
    assert out[2]["n_grams"] == 0 and out[2]["contamination"] == 0.0


def test_repetition_stats_pins(spark):
    docs = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam"),      # 4 bigrams, all identical
            (1, "all distinct words here now"),
            (2, "one"),                           # shorter than n
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: tuple(r)[1:] for r in
           __import__("solrtexttagger_spark.ops.textqa", fromlist=["repetition_stats"])
           .repetition_stats(docs, n=2).collect()}
    assert got[0] == (4, 3, 0.75, 1.0)
    assert got[1] == (4, 0, 0.0, 0.25)
    assert got[2] == (0, 0, 0.0, 0.0)
