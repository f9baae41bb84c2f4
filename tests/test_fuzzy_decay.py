"""Similarity-decayed fuzzy boosts (round-6 verdict #7).

Lucene's FuzzyQuery weights each rewritten term by FuzzyTermsEnum's
boost ``1 - d / min(|member|, |base|)`` (BoostAttribute, prefix length
0); this engine's DOCUMENTED DEFAULT is the simpler flat clause-weight
model (oracle-mirrorable — the `bool_fuzzy` driver entry pins it), with
the Lucene decay available opt-in via ``fuzzy_decay=True`` on both
boolean paths. These tests pin all three contracts: the flat default is
unchanged, the decay formula matches Lucene's, and the distributed and
serving paths agree under decay.

Reference: Lucene FuzzyTermsEnum boost computation (FuzzyQuery's
TopTermsBlendedFreqScoringRewrite consumes it); PrefixQuery's
constant-score rewrite carries no per-term boost, so prefix members
stay at weight 1 even under fuzzy_decay.
"""

import pytest


DOCS = [
    (0, "scan scan scatter merge"),
    (1, "scan sort merge merge"),
    (2, "scatter shuffle sort"),
    (3, "merge join fast"),
    (4, "join join fast scan"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    from solrtexttagger_spark.index.build import build_index

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = build_index(df, num_segments=2)
    idx.postings.persist().count()
    yield df, idx
    idx.postings.unpersist()


def _rows(df):
    return sorted(
        (r["rank"], r["doc_id"], round(r["score"], 9)) for r in df.collect()
    )


def _raw(df):
    return sorted((r["rank"], r["doc_id"], r["score"]) for r in df.collect())


class TestFuzzyMemberWeights:
    def test_lucene_formula(self):
        from solrtexttagger_spark.search.boolean import fuzzy_member_weights

        got = fuzzy_member_weights(
            {"scann~1": ["scan"], "jorn~2": ["join", "sort"]}
        )
        # scan is distance 1 from scann: 1 - 1/min(4,5) = 0.75
        assert got[("scann~1", "scan")] == pytest.approx(0.75)
        # join d=1, sort d=2 from jorn (len 4): 0.75 and 0.5
        assert got[("jorn~2", "join")] == pytest.approx(0.75)
        assert got[("jorn~2", "sort")] == pytest.approx(0.5)

    def test_exact_member_keeps_weight_one(self):
        from solrtexttagger_spark.search.boolean import fuzzy_member_weights

        got = fuzzy_member_weights({"scan~1": ["scan", "scans"]})
        assert got[("scan~1", "scan")] == pytest.approx(1.0)
        assert got[("scan~1", "scans")] == pytest.approx(0.75)

    def test_prefix_markers_are_constant_score(self):
        from solrtexttagger_spark.search.boolean import fuzzy_member_weights

        # PrefixQuery's constant-score rewrite has no per-term boost
        assert fuzzy_member_weights({"sc*": ["scan", "scatter"]}) == {}

    def test_floor_at_zero(self):
        from solrtexttagger_spark.search.boolean import fuzzy_member_weights

        # min length 1, distance 1 -> 1 - 1/1 = 0.0 (never negative)
        got = fuzzy_member_weights({"a~1": ["ab"]})
        assert got[("a~1", "ab")] == pytest.approx(0.0)


class TestFlatDefault:
    def test_flat_default_is_score_identical(self, spark, corpus):
        """The documented default: members score AT the clause weight,
        so +scann~1 (single member scan) is score-identical to +scan.
        This is the pin the expand_vocab_markers docstring references."""
        from solrtexttagger_spark.search.boolean import boolean_bm25_topk

        _, idx = corpus
        want = _rows(boolean_bm25_topk(idx, [(0, "+scan")], k=10, spark=spark))
        got = _rows(
            boolean_bm25_topk(idx, [(0, "+scann~1")], k=10, spark=spark)
        )
        assert got == want


class TestDecayedScoring:
    def test_decay_scales_single_member_scores(self, spark, corpus):
        """+scann~1 -> {scan} at weight 0.75: every BM25 score is exactly
        0.75x the flat score; the MATCH SET is identical (decay scales
        scoring, never matching)."""
        from solrtexttagger_spark.search.boolean import boolean_bm25_topk

        _, idx = corpus
        flat = _raw(
            boolean_bm25_topk(idx, [(0, "+scann~1")], k=10, spark=spark)
        )
        dec = _raw(
            boolean_bm25_topk(
                idx, [(0, "+scann~1")], k=10, fuzzy_decay=True, spark=spark
            )
        )
        assert [(r, d) for r, d, _ in dec] == [(r, d) for r, d, _ in flat]
        for (r1, d1, s_flat), (r2, d2, s_dec) in zip(flat, dec):
            assert s_dec == pytest.approx(0.75 * s_flat, rel=1e-9)

    def test_decay_differentiates_members(self, spark, corpus):
        """+jorn~2 expands to join (w 0.75) and sort (w 0.5): under flat
        scoring both members weigh 1, under decay the sort-only docs
        (1, 2) lose more score than the join docs (3, 4)."""
        from solrtexttagger_spark.search.boolean import boolean_bm25_topk

        _, idx = corpus
        q = [(0, "+jorn~2")]
        flat = {
            d: s
            for _r, d, s in _raw(
                boolean_bm25_topk(idx, q, k=10, spark=spark)
            )
        }
        dec = {
            d: s
            for _r, d, s in _raw(
                boolean_bm25_topk(idx, q, k=10, fuzzy_decay=True, spark=spark)
            )
        }
        assert set(dec) == set(flat) == {1, 2, 3, 4}
        # join docs decay by 0.75, sort docs by 0.5 (doc 4: join only;
        # doc 2: sort only)
        assert dec[4] == pytest.approx(0.75 * flat[4], rel=1e-9)
        assert dec[2] == pytest.approx(0.5 * flat[2], rel=1e-9)

    def test_prefix_members_unaffected_by_decay(self, spark, corpus):
        from solrtexttagger_spark.search.boolean import boolean_bm25_topk

        _, idx = corpus
        q = [(0, "+sc*")]
        flat = _rows(boolean_bm25_topk(idx, q, k=10, spark=spark))
        dec = _rows(
            boolean_bm25_topk(idx, q, k=10, fuzzy_decay=True, spark=spark)
        )
        assert dec == flat

    def test_serving_path_parity_under_decay(self, spark, corpus):
        from solrtexttagger_spark.index.compressed import compress_index
        from solrtexttagger_spark.search.boolean import boolean_bm25_topk
        from solrtexttagger_spark.search.terms import LocalSpeller
        from solrtexttagger_spark.search.wand import LocalSearcher

        _, idx = corpus
        cix = compress_index(idx)
        ls = LocalSearcher(cix)
        sp = LocalSpeller(idx, max_dist=2)
        for q in ("+scann~1", "+jorn~2", "+sc* jorn~1", "+merge -sc*"):
            dist = _rows(
                boolean_bm25_topk(
                    idx, [(0, q)], k=10, fuzzy_decay=True, spark=spark
                )
            )
            local = [
                (r, d, round(sc, 9))
                for r, d, sc in ls.search_boolean(
                    q, k=10, speller=sp, fuzzy_decay=True
                )
            ]
            assert local == dist, q
