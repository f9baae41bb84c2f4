"""BM25 top-k keyword search — Spark-native replacement for the reference's
delegated Solr ``/select`` SearchHandler (SURVEY.md §2.4 D1; solrconfig.xml:52).

Physical shape, deliberately all JVM-side (whole-stage codegen, no Python in
the scoring path):

  postings (BIG)  JOIN  broadcast(query terms, tiny)   <- broadcast hash join,
    -> explode(postings)                                  no shuffle of postings
    -> per-(query,term,doc) contribution (built-in exprs)
    -> groupBy(query_id, doc_id).sum                    <- the one shuffle,
    -> row_number() window per query_id, <= k              partial agg map-side

Scoring: Lucene-classic BM25 (k1=1.2, b=0.75),
  idf  = ln(1 + (N - df + 0.5)/(df + 0.5))
  w    = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) * qtf
Deterministic tie-break (score desc, doc_id asc) for rank-identical output.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

from solrtexttagger_spark.analysis.core import tokenize
from solrtexttagger_spark.index.build import InvertedIndex

K1 = 1.2
B = 0.75

# Per-index memo of global df per term. A COLD batch never pays a
# driver job wave for df (round-5 verdict #5): the segmented scorer
# broadcast-joins per-term df into the scoring job itself, so the whole
# batch is ONE action end-to-end. The memo is for serving cadence —
# warm it explicitly with ``warm_df_cache`` (or any wand/LocalSearcher
# path that already collected stats) and fully-cached vocabularies skip
# the df-join stage entirely. Same policy as the WAND metadata cache
# (search/wand.py): bounded, whole-reset at the cap with the in-flight
# terms re-fetched, assumes the InvertedIndex is immutable once queried
# (search/wand.reset_query_caches clears it).
BM25_DF_CACHE_MAX_TERMS = 500_000

_SCORE_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def analyze_query_terms(query: str, lowercase: bool = True) -> dict[str, int]:
    """Query analysis chain (same tokenizer as the index chain) -> term bag."""
    words = [w for w in tokenize(query) if w is not None]
    return Counter((w.lower() if lowercase else w) for w, _s, _e in words)


def expand_synonyms(
    bag: dict[str, int], synonyms: dict[str, list[str]]
) -> dict[str, int]:
    """Query-time synonym expansion — Lucene SynonymGraphFilter's
    query-analyzer semantics flattened onto the BM25 bag model: every
    occurrence of a term also contributes each of its synonyms at the
    same weight, so the expanded clause scores like Solr's
    (term OR synonym) at equal boost. One-directional (map key ->
    expansions), index-side text untouched — exactly Solr's recommended
    query-time-only synonym deployment.

    MULTI-WORD expansions ("ny" -> "new york") are analyzed with the
    query tokenizer and contribute each constituent term at the clause
    weight — the classic flattened ("sausagized") SynonymFilter
    behavior. This helper is the LEGACY flatten; every scorer now routes
    through expand_synonyms_graph, which upgrades multi-word expansions
    to TRUE graph semantics (constituents score only where the words are
    contiguous — Lucene SynonymGraphFilter)."""
    out = dict(bag)
    for t, qtf in bag.items():
        for s in synonyms.get(t, ()):
            for w, _s, _e in (tok for tok in tokenize(s) if tok is not None):
                w = w.lower()
                out[w] = out.get(w, 0) + qtf
    return out


def expand_synonyms_graph(
    bag: dict[str, int], synonyms: dict[str, list[str]]
) -> tuple[dict[str, int], dict[tuple[str, ...], int]]:
    """Query-time synonym expansion with Lucene SynonymGraphFilter
    semantics on the bag model (round-6 verdict #5). Returns
    ``(expanded_bag, phrase_bags)``:

    - ``expanded_bag``: the original terms plus every SINGLE-word
      expansion at the source term's weight (identical to
      expand_synonyms when no mapping is multi-word);
    - ``phrase_bags``: {constituent-token tuple: weight} for each
      MULTI-word expansion — "ny" -> "new york" becomes the graph clause
      (ny OR "new york"): the phrase member contributes its
      constituents' BM25 scores ONLY for documents containing the words
      CONTIGUOUSLY (resolved through the same positional machinery as
      explicit phrase clauses — search/phrase.multi_phrase_match_scored)
      and matches such documents even when no bag term does. Weights sum
      when several source occurrences expand to the same phrase."""
    out = dict(bag)
    phrases: dict[tuple[str, ...], int] = {}
    for t, qtf in bag.items():
        for s in synonyms.get(t, ()):
            toks = tuple(
                w.lower()
                for w, _s, _e in (tok for tok in tokenize(s) if tok is not None)
            )
            if not toks:
                continue
            if len(toks) == 1:
                out[toks[0]] = out.get(toks[0], 0) + qtf
            else:
                phrases[toks] = phrases.get(toks, 0) + qtf
    return out, phrases


def synonym_phrase_bonus(
    index: InvertedIndex,
    qphrases: dict[int, dict[tuple[str, ...], int]],
    *,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """The phrase-gated score relation for multi-word synonym graph
    semantics: (query_id, doc_id, extra) where ``extra`` > 0 is the sum,
    over the query's multi-word expansions whose words appear
    CONTIGUOUSLY in the doc, of the constituents' full BM25
    contributions at the expansion's clause weight. ONE postings pass
    for all phrases across all queries (the scored contiguity fold),
    then a broadcast join against the tiny (query, phrase, weight) map.
    qphrases: {query_id: {constituent-token tuple: weight}}."""
    from solrtexttagger_spark.search.phrase import multi_phrase_match_scored

    spark = index.postings.sparkSession
    phrase_list = sorted({toks for d in qphrases.values() for toks in d})
    pid_of = {toks: i for i, toks in enumerate(phrase_list)}
    # NO implicit cache warm here: the synonym-graph batch is pinned
    # action-free (test_plans.test_bm25_synonym_graph_plan_action_free…
    # — the bonus relation must build lazily); the scored phrase pass
    # takes the windowless literal-df path only when the cache already
    # covers the constituents, else its in-DAG df window
    pm = multi_phrase_match_scored(
        index, [" ".join(t) for t in phrase_list], k1=k1, b=b
    )
    qp_rows = [
        (int(qid), pid_of[toks], float(w))
        for qid, d in sorted(qphrases.items())
        for toks, w in sorted(d.items())
    ]
    qpdf = spark.createDataFrame(qp_rows, "query_id long, phrase_id int, w double")
    return (
        pm.join(F.broadcast(qpdf), "phrase_id")
        .select(
            "query_id",
            "doc_id",
            (F.col("w") * F.col("unit_score")).alias("extra"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("extra").alias("extra"))
    )


def queries_to_df(
    spark: SparkSession,
    queries: list[tuple[int, str]],
    synonyms: dict[str, list[str]] | None = None,
) -> DataFrame:
    """(query_id, term, qtf) relation from analyzed query texts. A flat
    term relation cannot carry the contiguity structure multi-word
    synonym graph semantics need, so such a mapping raises here — pass
    ``synonyms=`` to bm25_topk/wand_topk instead (they resolve the
    phrase members through the positional index)."""
    rows = []
    for qid, q in queries:
        bag = analyze_query_terms(q)
        if synonyms:
            bag, phrases = expand_synonyms_graph(bag, synonyms)
            if phrases:
                raise ValueError(
                    "multi-word synonym expansions cannot be flattened "
                    f"into a term relation ({sorted(phrases)}); pass "
                    "synonyms= to the scorer instead"
                )
        for term, qtf in sorted(bag.items()):
            rows.append((int(qid), term, int(qtf)))
    qdf = spark.createDataFrame(rows, "query_id long, term string, qtf int")
    # the analyzed vocabulary is driver-known here; carry it on the
    # DataFrame object so exploded_scores can use the index's df cache
    # instead of a per-call df window (callers passing their OWN qdf
    # relation keep the in-DAG df recovery)
    qdf._stt_terms = sorted({t for _q, t, _f in rows})
    return qdf


def warm_df_cache(index: InvertedIndex, terms) -> dict[str, int | None]:
    """Explicitly memoize global df for ``terms`` on the index (one
    collect; negative entries recorded so absent terms are never
    re-fetched). Serving paths call this once per vocabulary burst; the
    segmented scorer then skips its in-job df stage for fully-cached
    batches. Cold batches NEVER call this implicitly — their df joins
    inside the scoring job itself (round-5 verdict #5)."""
    cache = getattr(index, "_bm25_df", None)
    if cache is None:
        cache = {}
        index._bm25_df = cache
    missing = sorted({t for t in terms if t not in cache})
    if missing:
        if len(cache) + len(missing) > BM25_DF_CACHE_MAX_TERMS:
            cache.clear()
            missing = sorted(set(terms))  # reset dropped this batch's terms
        got = {
            r["term"]: r["df"]
            for r in index.postings.where(F.col("term").isin(missing))
            .groupBy("term")
            .agg(F.sum("df_seg").alias("df"))
            .collect()
        }
        for t in missing:
            cache[t] = got.get(t)
    return {t: cache[t] for t in terms}


def bm25_topk(
    index: InvertedIndex,
    queries,
    *,
    k: int = 10,
    k1: float = K1,
    b: float = B,
    spark: SparkSession | None = None,
    strategy: str = "segmented",
    allowed_docs: DataFrame | None = None,
    start: int = 0,
    synonyms: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Top-k BM25 per query. ``queries`` is a list[(query_id, text)] or a
    DataFrame(query_id, term, qtf). Returns
    (query_id, rank, doc_id, score double).

    strategy='segmented' (default): segment-aligned scorer — the filtered
    postings shuffle ONCE on seg (tiny: |query terms| x segments array
    rows), each segment scores all queries vectorized in numpy, emitting
    only per-segment top-k(+ties); the final window sees O(k x segments)
    rows. Docs are hash-assigned to exactly one segment, so per-segment
    top-k is exact.
    strategy='exploded': the pure-JVM whole-stage-codegen path — explode
    postings, one groupBy(query_id, doc_id) shuffle. Simple and entirely
    JVM-side, but the shuffle key set is near-unique (~one row per
    (query, matching doc)), which caps scaling on large corpora; prefer
    'segmented' for batch workloads at scale.

    ``allowed_docs`` (a relation with a doc_id column) is Solr's `fq`:
    results are restricted to the allowed set, but idf/avgdl stay
    CORPUS-WIDE (Solr filter queries never change scoring stats).
    Catalyst pushes whatever predicate produced ``allowed_docs`` into its
    own scan. In the segmented strategy the allowed ids are co-partitioned
    with the scoring segments (same pmod(xxhash64, S)) and applied inside
    the kernel between accumulation and per-segment top-k — distributed,
    no broadcast; in the exploded strategy it is a post-aggregation
    semi-join before the rank window.

    ``start`` is Solr's result-page offset: rows with
    start < rank <= start + k are returned, rank staying the ABSOLUTE
    position (Solr start/rows pagination; the candidate window widens to
    start + k so the page is exact in every strategy).

    ``synonyms`` ({term: [expansion, ...]}) applies query-time synonym
    expansion to every query's term bag before scoring, both strategies,
    with GRAPH semantics for multi-word expansions
    (expand_synonyms_graph): constituents of "ny" -> "new york" score
    only in documents containing the contiguous phrase, which also
    matches documents no bag term reaches.
    """
    if start:
        out = bm25_topk(
            index, queries, k=start + k, k1=k1, b=b, spark=spark,
            strategy=strategy, allowed_docs=allowed_docs, synonyms=synonyms,
        )
        return out.where(F.col("rank") > start)
    qphrases: dict[int, dict[tuple[str, ...], int]] = {}
    qbags: dict[int, dict[str, int]] | None = None
    if synonyms or strategy == "segmented":
        if isinstance(queries, DataFrame):
            # the query table is tiny by contract (it broadcasts in the
            # exploded plan) — collect it into pre-analyzed term bags
            qbags = {}
            for r in queries.collect():
                qbags.setdefault(int(r["query_id"]), {})[r["term"]] = int(r["qtf"])
        else:
            qbags = {int(qid): analyze_query_terms(q) for qid, q in queries}
        if synonyms:
            for qid in list(qbags):
                qbags[qid], ph = expand_synonyms_graph(qbags[qid], synonyms)
                if ph:
                    qphrases[qid] = ph
    bonus = (
        synonym_phrase_bonus(index, qphrases, k1=k1, b=b) if qphrases else None
    )
    if strategy == "segmented":
        return _bm25_topk_segmented(
            index, qbags, k=k, k1=k1, b=b, spark=spark,
            allowed_docs=allowed_docs, phrase_bonus=bonus,
        )
    if qbags is not None:
        sp = spark or index.postings.sparkSession
        rows = [
            (qid, term, int(qtf))
            for qid, bag in sorted(qbags.items())
            for term, qtf in sorted(bag.items())
        ]
        qdf = sp.createDataFrame(rows, "query_id long, term string, qtf int")
        qdf._stt_terms = sorted({t for _q, t, _f in rows})
        # top-level batch scorer: warm the df cache here (one tiny
        # collect for unseen terms only) so exploded_scores skips its
        # df window; NOT done inside exploded_scores itself, which must
        # stay action-free for the /select one-job writer contract
        warm_df_cache(index, qdf._stt_terms)
    else:
        qdf = (
            queries
            if isinstance(queries, DataFrame)
            else queries_to_df(spark or index.postings.sparkSession, queries)
        )
        if getattr(qdf, "_stt_terms", None):
            warm_df_cache(index, qdf._stt_terms)  # see comment above
    if bonus is None:
        scores = exploded_scores(index, qdf, k1=k1, b=b, allowed_docs=allowed_docs)
    else:
        # merge the phrase-gated bonus BEFORE ranking; full outer because
        # a doc can match only through the contiguous expansion
        base = exploded_scores(index, qdf, k1=k1, b=b)
        scores = base.join(bonus, ["query_id", "doc_id"], "full_outer").select(
            "query_id",
            "doc_id",
            (
                F.coalesce(F.col("score"), F.lit(0.0))
                + F.coalesce(F.col("extra"), F.lit(0.0))
            ).alias("score"),
        )
        if allowed_docs is not None:
            scores = scores.join(
                allowed_docs.select("doc_id").distinct(), "doc_id", "left_semi"
            )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        # rank cast to long so both strategies ('exploded' here, 'segmented'
        # at _bm25_topk_segmented) share one output schema — toggling the
        # default must not break schema-sensitive consumers (unions, appends)
        scores.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def exploded_scores(
    index: InvertedIndex,
    qdf: DataFrame,
    *,
    k1: float = K1,
    b: float = B,
    allowed_docs: DataFrame | None = None,
) -> DataFrame:
    """Per-(query, matched doc) total BM25 score — the pure-JVM exploded
    scoring relation BEFORE any top-k filter: one broadcast hash join of
    the query terms + one groupBy(query_id, doc_id) shuffle. Its per-query
    row count IS Solr's numFound (docs matching >= 1 term, under fq), so
    /select writers derive numFound + maxScore from this relation in the
    SAME job as the page (search/select.py) instead of a second corpus
    pass. qdf: (query_id, term, qtf)."""
    n = float(index.doc_count)
    avgdl = float(index.avgdl) if index.avgdl else 1.0

    # One pass over postings: broadcast-join the query terms, then recover
    # the GLOBAL df per term. When the analyzed vocabulary is
    # driver-known (queries_to_df tags it on the relation), df comes
    # from the index's bounded driver-side cache (warm_df_cache — one
    # tiny collect for unseen terms only) and ships as a literal column,
    # removing the per-call distinct-qterms broadcast + window exchange.
    # Otherwise the df window runs in-DAG as before: a window over that
    # term's segment rows (tiny group count = |query terms|). Using
    # index.term_stats here instead would re-derive the whole index when
    # it isn't persisted — a second full scan+shuffle for a handful of
    # numbers. (The window joins DISTINCT terms first: it must see each
    # (term, seg) row exactly once, or terms shared by several queries
    # inflate df.)
    known_terms = getattr(qdf, "_stt_terms", None)
    cache = getattr(index, "_bm25_df", None)
    if (
        known_terms is not None
        and cache is not None
        and all(t in cache for t in known_terms)
    ):
        # cache-warm ONLY: exploded_scores itself never adds a job, so
        # the one-action /select writer contract
        # (test_response_format.test_select_single_job_and_max_score)
        # holds on cold vocabularies; batch scorers warm the cache
        # explicitly before calling (bm25_topk exploded strategy).
        dfrel = index.postings.sparkSession.createDataFrame(
            [
                (t, float(cache[t]))
                for t in known_terms
                if cache[t] is not None
            ],
            "term string, df double",
        )
        qpost = index.postings.join(F.broadcast(dfrel), "term")
    else:
        qterms = qdf.select("term").distinct()
        qpost = index.postings.join(F.broadcast(qterms), "term").withColumn(
            "df", F.sum("df_seg").over(Window.partitionBy("term"))
        )
    joined = qpost.join(F.broadcast(qdf), "term")
    ex = joined.select(
        "query_id",
        "qtf",
        F.log(F.lit(1.0) + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5)).alias(
            "idf"
        ),
        F.explode("postings").alias("p"),
    )
    tf = F.col("p.tf").cast("double")
    dl = F.col("p.dl").cast("double")
    contrib = (
        F.col("idf")
        * (tf * (k1 + 1.0))
        / (tf + k1 * (1.0 - b + b * dl / avgdl))
        * F.col("qtf").cast("double")
    )
    scores = (
        ex.select("query_id", F.col("p.doc_id").alias("doc_id"), contrib.alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("score"))
    )
    if allowed_docs is not None:
        scores = scores.join(
            allowed_docs.select("doc_id").distinct(), "doc_id", "left_semi"
        )
    return scores


def _local_topk_with_ties(uniq: np.ndarray, scores: np.ndarray, k: int):
    """Deterministic per-segment top-k keeping everything tied with the
    k-th score (ties must reach the final doc_id-asc window)."""
    if len(uniq) > k:
        kth = np.partition(scores, len(scores) - k)[len(scores) - k]
        keep = np.nonzero(scores >= kth)[0]
        order = keep[np.lexsort((uniq[keep], -scores[keep]))]
    else:
        order = np.lexsort((uniq, -scores))
    return uniq[order], scores[order]


def _bm25_topk_segmented(
    index: InvertedIndex,
    qbags: dict[int, dict[str, int]],
    *,
    k: int = 10,
    k1: float = K1,
    b: float = B,
    spark: SparkSession | None = None,
    allowed_docs: DataFrame | None = None,
    phrase_bonus: DataFrame | None = None,
) -> DataFrame:
    """Exhaustive BM25, segment-aligned (block-max WAND minus the pruning):
    one shuffle of the query-term-filtered postings on seg, vectorized numpy
    scoring per segment, per-segment top-k(+ties), global window. Exact
    because a document's postings live entirely in one segment
    (seg = hash(doc_id) % num_segments, index/build.py).
    qbags: {query_id: {term: qtf}} (pre-analyzed).

    ``allowed_docs`` (Solr fq) stays distributed: the allowed ids are
    CO-PARTITIONED with the scoring unit (seg = the same
    pmod(xxhash64(doc_id), S) the index uses) and meet each segment's
    kernel through a cogroup — no driver collect, no broadcast of a
    potentially corpus-sized filter. Membership is applied between score
    accumulation and the per-segment top-k, so ranks are exact within the
    allowed set while idf/avgdl stay corpus-wide (Solr semantics).

    ``phrase_bonus`` ((query_id, doc_id, extra) — synonym_phrase_bonus)
    rides the SAME cogroup as the fq ids, co-partitioned on the index's
    own seg hash, and is added to each doc's accumulated score BEFORE the
    fq mask and the per-segment top-k — so multi-word synonym graph
    scoring keeps per-segment truncation exact (a doc whose bonus lifts
    it into the top-k is never dropped), the whole batch staying ONE
    action."""
    spark = spark or index.postings.sparkSession
    terms = sorted({t for bag in qbags.values() for t in bag})
    if not terms and phrase_bonus is None:
        return spark.createDataFrame(
            [], "query_id long, rank long, doc_id long, score double"
        )
    n = float(index.doc_count)
    avgdl = float(index.avgdl) if index.avgdl else 1.0
    cache = getattr(index, "_bm25_df", None)
    if cache is None:
        cache = {}
        index._bm25_df = cache
    missing = [t for t in terms if t not in cache]
    if missing:
        # COLD vocabulary: df rides the scoring job as a broadcast-joined
        # column (round-5 verdict #5) — the whole batch is ONE action, no
        # serial df-collect wave ahead of it (the Amdahl floor that
        # capped 1->4 batch scaling at 0.41). The kernel computes idf
        # from the per-row df; qterm weights ship as plain qtf.
        qterm_list = {
            qid: [(t, float(qtf)) for t, qtf in sorted(bag.items())]
            for qid, bag in qbags.items()
        }
        df_in_dag = True
    else:
        # WARM (explicitly via warm_df_cache, or a prior wand path):
        # precompute idf*qtf driver-side, skip the df-join stage
        df_map = {t: cache[t] for t in terms if cache[t] is not None}
        qterm_list = {}
        for qid, bag in qbags.items():
            lst = []
            for t in sorted(bag):
                df = df_map.get(t)
                if df is not None:
                    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                    lst.append((t, idf * bag[t]))
            if lst:
                qterm_list[qid] = lst
        df_in_dag = False
    has_fq = allowed_docs is not None
    bc = spark.sparkContext.broadcast(
        (qterm_list, k, k1, b, avgdl, df_in_dag, n, has_fq)
    )

    def _score_pdf(
        pdf: pd.DataFrame,
        allowed: "np.ndarray | None",
        bonus_by_q: "dict | None" = None,
    ) -> pd.DataFrame:
        qterms_, k_, k1_, b_, avgdl_, df_in_dag_, n_, _hf = bc.value
        bonus_by_q = bonus_by_q or {}
        term_arrays: dict[str, tuple] = {}
        if df_in_dag_ and "df" in pdf.columns:
            dfs = dict(zip(pdf["term"], pdf["df"]))
        for term, postings in zip(pdf["term"], pdf["postings"]):
            m = len(postings)
            docs = np.fromiter((p["doc_id"] for p in postings), np.int64, m)
            tf = np.fromiter((p["tf"] for p in postings), np.float64, m)
            dl = np.fromiter((p["dl"] for p in postings), np.float64, m)
            term_arrays[term] = (docs, tf, dl)
        out_q, out_d, out_s = [], [], []
        for qid in sorted(set(qterms_) | set(bonus_by_q)):
            all_docs, all_contrib = [], []
            for t, w in qterms_.get(qid, ()):
                e = term_arrays.get(t)
                if e is None:
                    continue
                if df_in_dag_:
                    # w is the raw qtf; df is GLOBAL (joined pre-shuffle)
                    df_t = float(dfs[t])
                    w = w * math.log(1.0 + (n_ - df_t + 0.5) / (df_t + 0.5))
                docs, tf, dl = e
                contrib = (
                    w * tf * (k1_ + 1.0) / (tf + k1_ * (1.0 - b_ + b_ * dl / avgdl_))
                )
                all_docs.append(docs)
                all_contrib.append(contrib)
            # phrase-gated synonym bonus for this query's docs in this
            # segment: merged into the accumulation BEFORE fq/top-k —
            # includes docs no bag term matched (graph semantics)
            bo = bonus_by_q.get(qid)
            if bo is not None:
                all_docs.append(bo[0])
                all_contrib.append(bo[1])
            if not all_docs:
                continue
            docs = np.concatenate(all_docs)
            contrib = np.concatenate(all_contrib)
            uniq, inv = np.unique(docs, return_inverse=True)
            scores = np.bincount(inv, weights=contrib, minlength=len(uniq))
            if allowed is not None:
                # fq membership AFTER accumulation (scores are corpus-true)
                # and BEFORE top-k (ranks exact within the allowed set)
                idx = np.searchsorted(allowed, uniq)
                mask = (idx < len(allowed)) & (
                    np.take(allowed, np.minimum(idx, len(allowed) - 1)) == uniq
                ) if len(allowed) else np.zeros(len(uniq), dtype=bool)
                uniq, scores = uniq[mask], scores[mask]
                if not len(uniq):
                    continue
            top_d, top_s = _local_topk_with_ties(uniq, scores, k_)
            out_q.extend([qid] * len(top_d))
            out_d.extend(top_d.tolist())
            out_s.extend(top_s.tolist())
        return pd.DataFrame(
            {
                "query_id": pd.Series(out_q, dtype="int64"),
                "doc_id": pd.Series(out_d, dtype="int64"),
                "score": pd.Series(out_s, dtype="float64"),
            }
        )

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return _score_pdf(pdf, None)

    def fn_mixed(key, pdf: pd.DataFrame, apdf: pd.DataFrame) -> pd.DataFrame:
        # right side carries fq rows (is_fq) and/or bonus rows, split here
        *_rest, _hf = bc.value
        fq_rows = apdf[apdf["is_fq"]]
        allowed = (
            np.sort(fq_rows["doc_id"].to_numpy(dtype=np.int64)) if _hf else None
        )
        brows = apdf[~apdf["is_fq"]]
        bonus_by_q: dict = {}
        if len(brows):
            for qid, grp in brows.groupby("query_id"):
                bonus_by_q[int(qid)] = (
                    grp["doc_id"].to_numpy(dtype=np.int64),
                    grp["extra"].to_numpy(dtype=np.float64),
                )
        return _score_pdf(pdf, allowed, bonus_by_q)

    # positions are projected AWAY before the shuffle — BM25 never reads
    # them, and they dominate the postings payload
    term_filter = F.col("term").isin(terms) if terms else F.lit(False)
    narrowed = index.postings.where(term_filter).select(
        "seg",
        "term",
        F.transform(
            "postings",
            lambda p: F.struct(
                p["doc_id"].alias("doc_id"), p["tf"].alias("tf"), p["dl"].alias("dl")
            ),
        ).alias("postings"),
    )
    if df_in_dag and terms:
        # GLOBAL df per query term from a narrow projected re-scan
        # (term + df_seg only — no postings payload), broadcast-joined
        # onto every (term, seg) row: an extra parallel stage inside the
        # same job, replacing the serial driver collect
        df_rel = (
            index.postings.where(term_filter)
            .groupBy("term")
            .agg(F.sum("df_seg").cast("double").alias("df"))
        )
        narrowed = narrowed.join(F.broadcast(df_rel), "term")
    if allowed_docs is None and phrase_bonus is None:
        scored = narrowed.groupBy("seg").applyInPandas(fn, schema=_SCORE_SCHEMA)
    else:
        # the cogroup right side unions the fq ids and the phrase bonus,
        # both co-partitioned on the index's own seg hash
        seg_of = F.pmod(F.xxhash64("doc_id"), F.lit(index.num_segments)).cast(
            "int"
        )
        parts = []
        if allowed_docs is not None:
            parts.append(
                allowed_docs.select(F.col("doc_id").cast("long").alias("doc_id"))
                .distinct()
                .select(
                    seg_of.alias("seg"),
                    "doc_id",
                    F.lit(-1).cast("long").alias("query_id"),
                    F.lit(0.0).alias("extra"),
                    F.lit(True).alias("is_fq"),
                )
            )
        if phrase_bonus is not None:
            parts.append(
                phrase_bonus.select(
                    seg_of.alias("seg"),
                    "doc_id",
                    F.col("query_id").cast("long").alias("query_id"),
                    F.col("extra").cast("double").alias("extra"),
                    F.lit(False).alias("is_fq"),
                )
            )
        right = parts[0]
        for p in parts[1:]:
            right = right.unionAll(p)
        scored = (
            narrowed.groupBy("seg")
            .cogroup(right.groupBy("seg"))
            .applyInPandas(fn_mixed, schema=_SCORE_SCHEMA)
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score")
    )
