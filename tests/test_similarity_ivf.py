"""IVF (k-means coarse quantization) ANN path: deterministic training,
exact-subset property, and recall on clustered data (the regime IVF is
for). Not SQL-expressible (iterative centroids) -> pytest-pinned, no
oracle_sql entry."""

import numpy as np
import pytest

from solrtexttagger_spark.ops.similarity import (
    cosine_topk,
    ivf_cosine_topk,
    ivf_fit_centroids,
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


def test_ivf_deterministic_and_subset(spark, clustered):
    probes = [0, 45, 170]
    cents = ivf_fit_centroids(clustered, n_centroids=8, iters=3)
    a = sorted(tuple(r) for r in ivf_cosine_topk(
        clustered, probes, k=5, centroids=cents).collect())
    b = sorted(tuple(r) for r in ivf_cosine_topk(
        clustered, probes, k=5, centroids=cents).collect())
    assert a == b  # deterministic
    # candidates come from real cells: every reported cos matches exact
    exact = {
        (r["probe_id"], r["vec_id"]): r["cos"]
        for r in cosine_topk(clustered, probes, k=320).collect()
    }
    for pid, rank, vid, cos in a:
        assert exact[(pid, vid)] == cos


def test_ivf_recall_on_clustered_data(spark, clustered):
    """With cells following the data distribution, probing 2/8 cells
    recovers essentially the whole exact top-10 on clustered vectors."""
    probes = [0, 45, 90, 170, 250]
    ex = {}
    for r in cosine_topk(clustered, probes, k=10).collect():
        ex.setdefault(r["probe_id"], set()).add(r["vec_id"])
    got = {}
    out = ivf_cosine_topk(clustered, probes, k=10, n_centroids=8, n_probe=2, iters=3)
    for r in out.collect():
        got.setdefault(r["probe_id"], set()).add(r["vec_id"])
    hits = sum(len(got.get(p, set()) & ex[p]) for p in ex)
    recall = hits / sum(len(v) for v in ex.values())
    assert recall >= 0.9, recall
