"""Round-10 optimization instrumentation (guide §1): per-sub-step timing
for the heavy bench composites, separate from the FROZEN bench.py.

Usage: SPARK_GRAFT_SF_DIR=... python bench_extra.py [group ...]
Groups: q7b q7c q2g q2j wand q5 q2p q2q q2r q8e misc
Prints one line per sub-step: <group>.<step> <seconds>.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    groups = sys.argv[1:] or ["q7b", "q7c", "q2g", "q2j", "wand", "q5"]

    from solrtexttagger_spark.session import get_spark

    import __spark_entry__ as em

    spark = get_spark(app_name="bench_extra")
    spark.sparkContext.setLogLevel("ERROR")

    times: dict[str, float] = {}

    def t(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        out = fn()
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"{name:45s} {times[name]:7.3f}", flush=True)
        spark.sparkContext.setJobDescription(None)
        return out

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    if "q7b" in groups or "q7c" in groups:
        import hashlib

        import numpy as np

        from solrtexttagger_spark.ops.similarity import (
            cosine_dup_pairs,
            cosine_topk,
            ivf_cosine_topk,
            lsh_cosine_topk,
            pq_cosine_topk,
        )

    if "q7b" in groups:
        rows = t("q7b.limit60_collect", lambda: emb.limit(60).collect())
        base_vecs = {
            r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows
        }

        def dnoise(i, d):
            out = np.empty(d)
            for j in range(d):
                h = int(hashlib.md5(f"pn{i}#{j}".encode()).hexdigest()[:15], 16)
                out[j] = (h / float(1 << 60)) * 2 - 1
            return out

        planted = []
        src_ids = sorted(base_vecs)[:50]
        for i, vid in enumerate(src_ids):
            v = base_vecs[vid]
            nv = v + 0.35 * np.linalg.norm(v) / 8.0 * dnoise(i, len(v))
            planted.append((10_000_000 + vid, [float(x) for x in nv]))
        pl = spark.createDataFrame(planted, "vec_id long, embedding array<double>")
        allv = emb.select("vec_id", "embedding").unionAll(pl)
        probes = [p for p, _ in planted]
        for radius in (0, 1, 2):
            t(
                f"q7b.lsh_planted_radius{radius}",
                lambda r=radius: lsh_cosine_topk(
                    allv, probes, k=10, multi_probe=r
                ).collect(),
            )
        noise_probes = list(range(5))
        t("q7b.exact_noise5", lambda: cosine_topk(emb, noise_probes, k=10).collect())
        t(
            "q7b.lsh_noise5_r1",
            lambda: lsh_cosine_topk(emb, noise_probes, k=10, multi_probe=1).collect(),
        )
        from pyspark.sql import functions as SF

        sub = emb.where(SF.col("vec_id") % 4 == 0)
        t(
            "q7b.dup_pairs_lsh_sub4",
            lambda: cosine_dup_pairs(
                sub, threshold=em.EMBED_DUP_THRESHOLD,
                bands=em.EMBED_BANDS, band_planes=em.EMBED_BAND_PLANES,
                dim=em.EMBED_DIM, max_bucket_size=em.EMBED_MAX_BUCKET,
            ).collect(),
        )
        t(
            "q7b.dup_pairs_exact_sub4",
            lambda: cosine_dup_pairs(
                sub, threshold=em.EMBED_DUP_THRESHOLD, method="exact"
            ).collect(),
        )
        pl_pairs = []
        for i, vid in enumerate(src_ids):
            v = base_vecs[vid]
            nv = v + 0.25 * np.linalg.norm(v) / 8.0 * dnoise(i, len(v))
            cos = float(v @ nv / (np.linalg.norm(v) * np.linalg.norm(nv)))
            if cos >= 0.9:
                pl_pairs.append((vid, 20_000_000 + vid, [float(x) for x in nv]))
        pl9 = spark.createDataFrame(
            [(pid, vec) for _, pid, vec in pl_pairs],
            "vec_id long, embedding array<double>",
        )
        corpus9 = emb.select("vec_id", "embedding").unionAll(pl9)
        t(
            "q7b.dup_pairs_planted09",
            lambda: cosine_dup_pairs(
                corpus9, threshold=0.9, dim=em.EMBED_DIM
            ).collect(),
        )

    if "q7c" in groups:
        dim, n_clusters, per = 64, 20, 100

        def dvec(tag, d):
            outv = np.empty(d)
            for j in range(d):
                h = int(hashlib.md5(f"{tag}#{j}".encode()).hexdigest()[:15], 16)
                outv[j] = (h / float(1 << 60)) * 2 - 1
            return outv

        rows = []
        for cidx_ in range(n_clusters):
            center = dvec(f"c{cidx_}", dim)
            for m in range(per):
                v = center + 0.25 * dvec(f"c{cidx_}m{m}", dim)
                rows.append((cidx_ * per + m, [float(x) for x in v]))
        cemb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        probes = [c * per for c in range(n_clusters)]
        t("q7c.exact20", lambda: cosine_topk(cemb, probes, k=10).collect())
        t(
            "q7c.lsh_r2",
            lambda: lsh_cosine_topk(cemb, probes, k=10, multi_probe=2).collect(),
        )
        t(
            "q7c.ivf",
            lambda: ivf_cosine_topk(
                cemb, probes, k=10, n_centroids=32, n_probe=4, iters=2
            ).collect(),
        )
        t(
            "q7c.pq",
            lambda: pq_cosine_topk(
                cemb, probes, k=10, m=8, ksub=16,
                n_coarse=32, n_probe=4, rerank_factor=10,
            ).collect(),
        )

    if "q2g" in groups:
        for name in (
            "q_bool_search", "q_bool_phrase", "q_snippets", "q_facets",
            "q_facet_range", "q_bm25_fq", "q_more_like_this",
        ):
            t(f"q2g.{name}", lambda n=name: getattr(em, n)(spark, sf_dir).count())
        # second pass: warm index cache
        for name in (
            "q_bool_search", "q_bool_phrase", "q_snippets", "q_facets",
            "q_facet_range", "q_bm25_fq", "q_more_like_this",
        ):
            t(f"q2g2.{name}", lambda n=name: getattr(em, n)(spark, sf_dir).count())

    if "q2j" in groups:
        for name in (
            "q_terms_prefix", "q_spellcheck", "q_spellcheck_collate",
            "q_bm25_synonyms", "q_stats_field", "q_elevated",
            "q_bm25_after_delete",
        ):
            t(f"q2j.{name}", lambda n=name: getattr(em, n)(spark, sf_dir).count())

    if "q2i" in groups:
        for name in ("q_group_topk", "q_select_sorted", "q_facet_pivot"):
            t(f"q2i.{name}", lambda n=name: getattr(em, n)(spark, sf_dir).count())
            t(f"q2i2.{name}", lambda n=name: getattr(em, n)(spark, sf_dir).count())

    if "wand" in groups:
        from solrtexttagger_spark.index.build import build_index
        from solrtexttagger_spark.index.compressed import compress_index
        from solrtexttagger_spark.search.wand import (
            reset_query_caches, wand_topk,
        )

        vocab = [
            "join", "hash", "row", "batch", "scan", "customer", "column",
            "filter", "small", "slow", "merge", "order", "vector", "line",
            "table", "fast", "key", "sort", "part", "window", "group",
            "query", "data", "spark", "stream", "agg", "value",
        ]
        queries = [
            (i, f"{vocab[i % len(vocab)]} {vocab[(i * 7 + 3) % len(vocab)]} "
                f"{vocab[(i * 13 + 5) % len(vocab)]}")
            for i in range(40)
        ]
        idx = build_index(docs, use_split=True)
        idx.postings.persist().count()
        cix = compress_index(idx, max_block_postings=32)
        cix.blocks.persist().count()
        reset_query_caches(cix)
        t("wand.single_q0_cold", lambda: wand_topk(
            cix, [queries[0]], k=10, spark=spark,
            local_threshold_postings=0).collect())
        t("wand.single_q0_warm", lambda: wand_topk(
            cix, [queries[0]], k=10, spark=spark,
            local_threshold_postings=0).collect())
        t("wand.single_q1_warmmeta", lambda: wand_topk(
            cix, [queries[1]], k=10, spark=spark,
            local_threshold_postings=0).collect())
        t("wand.batch10_warm", lambda: wand_topk(
            cix, queries[:10], k=10, spark=spark,
            local_threshold_postings=0).collect())

    if "q5" in groups:
        t("q5.lsh_pairs", lambda: em.q_lsh_pairs(spark, sf_dir).count())
        t("q5.dup_clusters", lambda: em.q_dup_clusters(spark, sf_dir).count())
        t("q5.embed_dup_pairs", lambda: em.q_embed_dup_pairs(spark, sf_dir).count())
        t("q5.remove_dup_spans", lambda: em.q_remove_dup_spans(spark, sf_dir).count())

    if "q2p" in groups:
        t("q2p.graph_closure", lambda: em.q_graph_closure(spark, sf_dir).count())
        t("q2p.export_sorted", lambda: em.q_export_sorted(spark, sf_dir).count())
        t("q2p.stream_rollup", lambda: em.q_stream_rollup(spark, sf_dir).count())

    if "q2q" in groups:
        from solrtexttagger_spark.search.request import solr_select

        idx = em._index(spark, sf_dir)
        t("q2q.frange_sort_fl", lambda: solr_select(None, docs, {
            "q": "{!frange l=2}log(n_chars)",
            "fq": "lang:(en fr)",
            "q.op": "OR",
            "sort": "div(n_chars, sum(doc_id, 1)) desc",
            "fl": "ratio:div(n_chars, 100),lang",
            "rows": "20",
        }).count())
        t("q2q.scored_bf", lambda: solr_select(idx, docs, {
            "q": "merge scan", "fq": "lang:en",
            "bf": "log(sum(n_chars, 1))", "rows": "20",
        }, spark=spark).count())
        t("q2q.join_route", lambda: solr_select(idx, docs, {
            "q": "{!join from=source to=source score=max}merge",
            "rows": "20",
        }, spark=spark).count())

    if "q2r" in groups:
        from solrtexttagger_spark.search.cursor import solr_select_cursor
        from solrtexttagger_spark.search.request import solr_select

        idx = em._index(spark, sf_dir)
        params = {
            "q": "*:*", "sort": "n_chars desc",
            "rows": "200", "fl": "lang,n_chars",
        }

        def pages():
            mark, n = "*", 0
            for _ in range(5):
                page, mark = solr_select_cursor(
                    None, docs, {**params, "cursorMark": mark}
                )
                n += page.count()
            return n

        t("q2r.cursor_5pages", pages)
        t("q2r.rtg_atomic", lambda: em.q_rtg_atomic(spark, sf_dir).count())
        t("q2r.luke_report", lambda: em.q_luke_report(spark, sf_dir).count())
        t("q2r.complexphrase", lambda: solr_select(idx, docs, {
            "q": '{!complexphrase}"merge sc*"', "rows": "20",
        }, spark=spark).count())
        t("q2r.ltr", lambda: solr_select(None, docs, {
            "q": "{!func}n_chars",
            "rq": "{!ltr reRankDocs=100 efi.l=en}",
            "ltr.model": {
                "type": "linear",
                "weights": {"f_len": -0.5, "f_en": 2.0, "f_orig": 0.01},
            },
            "ltr.features": {
                "f_len": "n_chars / 100.0",
                "f_en": "CASE WHEN lang = efi.l THEN 1.0 ELSE 0.0 END",
                "f_orig": "originalScore",
            },
            "rows": "20",
        }).count())

    if "q8e" in groups:
        from pyspark.sql import functions as F

        from solrtexttagger_spark.search.textml import (
            classify_docs, features_ig, train_logit,
        )

        idx = em._index(spark, sf_dir)
        lab = docs.select(
            "doc_id", (F.col("lang") == "en").cast("int").alias("outcome")
        )
        feats = t("q8e.features_ig", lambda: features_ig(idx, lab, n_terms=5).collect())
        model = t("q8e.train_logit_10", lambda: train_logit(
            idx, lab, [r["term"] for r in feats],
            iterations=10, learning_rate=0.5,
        )[-1])
        t("q8e.classify", lambda: classify_docs(docs, model).count())

    total = round(sum(times.values()), 3)
    print(f"{'TOTAL':45s} {total:7.3f}")


if __name__ == "__main__":
    main()
