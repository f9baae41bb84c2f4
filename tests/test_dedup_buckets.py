"""Oversized-bucket policy for LSH/ngram candidate generation (round-2
ADVICE): a dup cluster larger than max_bucket_size makes EVERY bucket it
touches oversized, so dropping those buckets silently zeroes recall exactly
where near-dups concentrate. Oversized buckets must emit linear STAR pairs
against the deterministic representative (min id) instead."""

from pyspark.sql import functions as F

from solrtexttagger_spark.ops.dedup import (
    bucket_pairs,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
)
from solrtexttagger_spark.ops.similarity import cosine_dup_pairs


def _pairs_of(df, a="a_doc_id", b="b_doc_id"):
    return {(r[a], r[b]) for r in df.collect()}


def test_bucket_pairs_small_exhaustive_big_star(spark):
    buckets = spark.createDataFrame(
        [([1, 2, 3],), ([10, 11, 12, 13, 14],)], "ids array<long>"
    )
    got = {
        (r["p"]["a"], r["p"]["b"])
        for r in bucket_pairs(buckets, max_bucket_size=3).collect()
    }
    assert got == {
        (1, 2), (1, 3), (2, 3),  # small bucket: all pairs
        (10, 11), (10, 12), (10, 13), (10, 14),  # big bucket: star on min id
    }


def test_lsh_giant_cluster_not_dropped(spark):
    """A 6-doc exact-dup cluster with max_bucket_size=3: every band bucket is
    oversized, so pre-fix output was EMPTY. Star pairs keep one edge per
    member and connected components recover the cluster."""
    docs = spark.createDataFrame(
        [(i, "the same boilerplate license text repeated here") for i in range(6)]
        + [(100, "something completely different entirely unrelated words")],
        "doc_id long, text string",
    )
    got = _pairs_of(lsh_candidate_pairs(docs, max_bucket_size=3))
    assert got == {(0, j) for j in range(1, 6)}  # star on min doc_id
    # every cluster member participates in >=1 candidate edge
    members = {a for a, _ in got} | {b for _, b in got}
    assert members == set(range(6))


def test_ngram_jaccard_giant_cluster_not_dropped(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(5)],
        "doc_id long, text string",
    )
    out = ngram_jaccard_pairs(docs, max_bucket_size=2, threshold=0.5)
    got = {(r["a_doc_id"], r["b_doc_id"], r["jaccard"]) for r in out.collect()}
    assert got == {(0, j, 1.0) for j in range(1, 5)}


def test_cosine_dup_giant_cluster_star(spark):
    """Near-identical embedding cluster larger than max_bucket_size: pairs
    against the min-id representative survive, exact-rescored."""
    base = [1.0, 0.5, -0.25, 2.0]
    rows = [(i, [x + i * 1e-6 for x in base]) for i in range(8)]
    rows.append((50, [-1.0, 2.0, 0.5, -0.1]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cosine_dup_pairs(
        emb, threshold=0.99, dim=4, bands=4, band_planes=3, max_bucket_size=4
    )
    got = {(r["a_vec_id"], r["b_vec_id"]) for r in out.collect()}
    assert got == {(0, j) for j in range(1, 8)}
    for r in out.collect():
        assert r["cos"] >= 0.99


def test_connected_components_chain_and_forest(spark):
    """Min-label propagation + pointer jumping: a 200-node path (worst-case
    diameter) must converge within the iteration cap, labels = component
    min; disjoint components stay separate."""
    from solrtexttagger_spark.ops.dedup import connected_components

    edges = [(i, i + 1) for i in range(199)]          # path 0..199
    edges += [(1000, 1001), (1001, 1002), (1000, 1002)]  # triangle
    df = spark.createDataFrame(edges, "a_doc_id long, b_doc_id long")
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert all(got[i] == 0 for i in range(200))
    assert all(got[i] == 1000 for i in (1000, 1001, 1002))


def test_dup_clusters_end_to_end(spark):
    """dup_clusters: exact-dup groups cluster together, keeper = min id,
    singletons keep their own id."""
    from solrtexttagger_spark.ops.dedup import dup_clusters

    boiler = "the same boilerplate license text repeated here again"
    docs = [(i, boiler) for i in (3, 7, 11)]
    docs += [(20, "completely different words about apples and oranges today"),
             (21, "another unrelated doc speaking of ships and sealing wax")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(df).collect()}
    assert got == {3: 3, 7: 3, 11: 3, 20: 20, 21: 21}


def test_span_dup_stats(spark):
    """Duplicate-span fractions: full dups share every window, partial
    overlap shares some, unique docs share none, short docs get 0/0."""
    from solrtexttagger_spark.ops.dedup import span_dup_stats

    a = "w1 w2 w3 w4 w5 w6 w7 w8"           # 8 tokens
    docs = [
        (1, a),                               # duplicated verbatim in doc 2
        (2, a),
        (3, "x0 x1 w1 w2 w3 w4 w5 w6 w7 w8"),  # contains a's spans shifted
        (4, "u1 u2 u3 u4 u5 u6 u7 u8"),       # unique
        (5, "short doc"),                     # < span tokens
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_dup_stats(df, span=4).collect()}
    # doc1/doc2: 5 windows each, all shared
    assert out[1]["n_spans"] == 5 and out[1]["n_dup_spans"] == 5
    assert out[1]["dup_span_fraction"] == 1.0
    assert out[2]["dup_span_fraction"] == 1.0
    # doc3: 7 windows, the 5 pure-a windows are shared, 2 boundary ones not
    assert out[3]["n_spans"] == 7 and out[3]["n_dup_spans"] == 5
    assert abs(out[3]["dup_span_fraction"] - round(5 / 7, 4)) < 1e-9
    assert out[4]["n_dup_spans"] == 0 and out[4]["dup_span_fraction"] == 0.0
    assert out[5]["n_spans"] == 0 and out[5]["dup_span_fraction"] == 0.0
    # stride trades granularity for cost but keeps full-dup detection
    out2 = {r["doc_id"]: r for r in span_dup_stats(df, span=4, stride=2).collect()}
    assert out2[1]["n_spans"] == 3 and out2[1]["dup_span_fraction"] == 1.0


def test_remove_dup_spans_keep_first(spark):
    """Exact-substring trim, keep-first rule: the canonical occurrence
    (min doc_id, then min position) survives verbatim; every later
    occurrence — cross-doc AND within-doc — is spliced out."""
    from solrtexttagger_spark.ops.dedup import remove_dup_spans

    docs = [
        (0, "a b c d e x y z"),          # canonical "a b c d" etc.
        (1, "p q a b c d e r"),          # dup region a..e trimmed
        (2, "short text"),               # < span, untouched
        (3, "a b c d a b c d m n"),      # within-doc repeat trimmed whole
        (4, "u1 u2 u3 u4 u5"),           # unique, untouched
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in remove_dup_spans(df, span=4).collect()}
    assert out[0]["text_kept"] == "a b c d e x y z" and out[0]["n_removed"] == 0
    assert out[1]["text_kept"] == "p q r" and out[1]["n_removed"] == 5
    assert out[2]["text_kept"] == "short text" and out[2]["n_removed"] == 0
    # doc3: windows at pos 0 and 4 are dups of doc0's canonical; the two
    # coverage intervals merge to [0,8) -> only the unique tail survives
    assert out[3]["text_kept"] == "m n" and out[3]["n_removed"] == 8
    assert out[3]["dup_removed_fraction"] == 0.8
    assert out[4]["text_kept"] == "u1 u2 u3 u4 u5"
    # n_tokens always the ORIGINAL length
    assert out[1]["n_tokens"] == 8 and out[3]["n_tokens"] == 10


def test_minhash_signatures_duckdb_pin(spark):
    """The former minhash_signatures driver entry as a pytest pin
    (round-8 surface consolidation): the Spark signatures equal the
    DuckDB md5-slice mirror row for row at sf0.001. The signature
    arithmetic additionally stays oracle-pinned through the lsh_pairs /
    dup_clusters / dedup_keep driver entries, whose SQL recomputes the
    sigs."""
    import duckdb

    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r) for r in em.q_minhash_signatures(spark, sf).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    mirror = f"""
WITH {em._SHINGLE_CTE}
SELECT doc_id, {em._minhash_sig_exprs()}
FROM sh GROUP BY doc_id
"""
    want = sorted(tuple(r) for r in con.sql(mirror).fetchall())
    assert got == want
