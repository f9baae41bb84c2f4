"""Product-quantization ANN path: deterministic codebooks, ADC + exact
rerank subset property, and recall on clustered data. Like IVF, not
SQL-expressible (iterative k-means training) -> pytest-pinned, no
oracle_sql entry."""

import numpy as np
import pytest

from solrtexttagger_spark.ops.similarity import (
    cosine_topk,
    pq_cosine_topk,
    pq_encode,
    pq_fit_codebooks,
)


@pytest.fixture(scope="module")
def clustered(spark):
    # 8 well-separated deterministic cluster centers, 40 members each
    rows = []
    dim = 16
    for c in range(8):
        center = np.zeros(dim)
        center[2 * c] = 1.0
        center[2 * c + 1] = 0.5
        for i in range(40):
            jit = np.array([((c * 40 + i) * 37 + d * 11) % 7 - 3 for d in range(dim)]) * 0.02
            v = center + jit
            rows.append((c * 40 + i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_encode_shape_and_determinism(spark, clustered):
    books = pq_fit_codebooks(clustered, m=4, ksub=8)
    assert len(books) == 4 and all(len(b) == 8 for b in books)
    assert all(len(c) == 4 for b in books for c in b)  # dsub = 16/4
    # training is sample-deterministic: identical second fit
    assert books == pq_fit_codebooks(clustered, m=4, ksub=8)
    enc = pq_encode(clustered, books)
    rows = {r["vec_id"]: r for r in enc.collect()}
    assert len(rows) == 320
    assert all(len(r["codes"]) == 4 for r in rows.values())
    assert all(0 <= c < 8 for r in rows.values() for c in r["codes"])
    # norms are TRUE norms (not quantized)
    v0 = clustered.where("vec_id = 0").collect()[0]["embedding"]
    assert abs(rows[0]["norm"] - float(np.linalg.norm(v0))) < 1e-9


def test_pq_subset_property(spark, clustered):
    """Every returned cos is the EXACT cosine (rerank stage rescores the
    ADC candidates against full vectors)."""
    probes = [0, 45, 170]
    books = pq_fit_codebooks(clustered, m=4, ksub=8)
    out = sorted(
        tuple(r)
        for r in pq_cosine_topk(clustered, probes, k=5, codebooks=books).collect()
    )
    assert out == sorted(
        tuple(r)
        for r in pq_cosine_topk(clustered, probes, k=5, codebooks=books).collect()
    )
    exact = {
        (r["probe_id"], r["vec_id"]): r["cos"]
        for r in cosine_topk(clustered, probes, k=320).collect()
    }
    for pid, rank, vid, cos in out:
        assert exact[(pid, vid)] == cos


def test_pq_recall_on_clustered_data(spark, clustered):
    """ADC over 16-way subspace codebooks + 4x exact rerank recovers the
    exact top-10 on clustered vectors."""
    probes = [0, 45, 90, 170, 250]
    ex = {}
    for r in cosine_topk(clustered, probes, k=10).collect():
        ex.setdefault(r["probe_id"], set()).add(r["vec_id"])
    got = {}
    for r in pq_cosine_topk(clustered, probes, k=10, m=4, ksub=16).collect():
        got.setdefault(r["probe_id"], set()).add(r["vec_id"])
    hits = sum(len(got.get(p, set()) & ex[p]) for p in ex)
    recall = hits / sum(len(v) for v in ex.values())
    assert recall >= 0.9, recall


def test_pq_query_path_is_jvm_only(spark, clustered):
    """The ADC scan + rerank contain NO Python stages — the only pandas
    UDF is the one-time encode, which callers amortize via encoded=.
    Proven by handing the query a plain (vec_id, codes, norm) relation:
    the resulting physical plan must be Python-free end to end."""
    books = pq_fit_codebooks(clustered, m=4, ksub=8)
    enc_rows = [
        (r["vec_id"], r["cid"], r["codes"], r["norm"])
        for r in pq_encode(clustered, books).collect()
    ]
    enc = spark.createDataFrame(
        enc_rows, "vec_id long, cid int, codes array<int>, norm double"
    )
    out = pq_cosine_topk(clustered, [0, 45], k=5, codebooks=books, encoded=enc)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan
    # and the static-relation path returns the same rows as the live one
    live = pq_cosine_topk(clustered, [0, 45], k=5, codebooks=books)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, live.collect()))


def test_pq_residual_pruned_recall(spark, clustered):
    """Residual (IVF-PQ) config: coarse cells prune the ADC scan to
    n_probe/n_coarse of the codes; residual codebooks + exact rerank
    recover the exact top-10."""
    probes = [0, 45, 90, 170, 250]
    ex = {}
    for r in cosine_topk(clustered, probes, k=10).collect():
        ex.setdefault(r["probe_id"], set()).add(r["vec_id"])
    got = {}
    out = pq_cosine_topk(
        clustered, probes, k=10, m=4, ksub=16,
        n_coarse=8, n_probe=2, rerank_factor=10,
    )
    for r in out.collect():
        got.setdefault(r["probe_id"], set()).add(r["vec_id"])
    hits = sum(len(got.get(p, set()) & ex[p]) for p in ex)
    recall = hits / sum(len(v) for v in ex.values())
    assert recall >= 0.9, recall


def test_pq_artifacts_amortize(spark, clustered):
    """centroids/codebooks/encoded passed back in reproduce the live-path
    results exactly (the fit-once-per-index-build production shape)."""
    from solrtexttagger_spark.ops.similarity import pq_fit_coarse

    cents = pq_fit_coarse(clustered, n_coarse=8)
    books = pq_fit_codebooks(clustered, m=4, ksub=16, centroids=cents)
    enc = pq_encode(clustered, books, centroids=cents)
    a = pq_cosine_topk(
        clustered, [0, 45], k=5, n_coarse=8, n_probe=2,
        centroids=cents, codebooks=books, encoded=enc,
    ).collect()
    b = pq_cosine_topk(
        clustered, [0, 45], k=5, m=4, ksub=16, n_coarse=8, n_probe=2,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and len(a) == 10


def test_pq_save_load_roundtrip(spark, clustered, tmp_path):
    """Persisted PQ index answers queries identically to the in-memory
    artifacts (fit once per index build, reload per query batch)."""
    from solrtexttagger_spark.ops.similarity import pq_fit_coarse, pq_load, pq_save

    cents = pq_fit_coarse(clustered, n_coarse=8)
    books = pq_fit_codebooks(clustered, m=4, ksub=16, centroids=cents)
    enc = pq_encode(clustered, books, centroids=cents)
    path = str(tmp_path / "pq")
    pq_save(enc, books, path, centroids=cents)
    enc2, books2, cents2 = pq_load(spark, path)
    assert books2 == books and cents2 == cents
    a = pq_cosine_topk(
        clustered, [0, 45], k=5, n_coarse=8, n_probe=2,
        centroids=cents, codebooks=books, encoded=enc,
    ).collect()
    b = pq_cosine_topk(
        clustered, [0, 45], k=5, n_coarse=8, n_probe=2,
        centroids=cents2, codebooks=books2, encoded=enc2,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and len(b) == 10
