"""spark-submit entry point: build (or resume) the inverted index from a
source-code table and optionally serve a query batch.

Cluster usage (north rule: spark-submit --py-files on multi-executor):

  zip -r engine.zip solrtexttagger_spark/
  spark-submit --py-files engine.zip jobs/build_index_job.py \
      --input  <parquet/iceberg path with (repo,path,commit,lang,content)> \
      --output <index dir> \
      [--format parquet|iceberg] [--num-segments 64] \
      [--query "block max wand" --k 10]

Iceberg note: this environment ships no iceberg-spark-runtime jar, so
--format iceberg requires the catalog jars on the cluster; the code path is
identical (`spark.read.format(fmt)`), parquet is the tested stand-in.

Local smoke: python jobs/build_index_job.py --demo
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input")
    ap.add_argument("--output")
    ap.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--key-cols", default="repo,path,commit")
    ap.add_argument("--num-segments", type=int, default=None)
    ap.add_argument("--query", action="append", default=[])
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--demo", action="store_true", help="synthesize a corpus")
    args = ap.parse_args(argv)

    from solrtexttagger_spark.index.build import build_index, with_doc_ids
    from solrtexttagger_spark.index.segments import build_or_resume
    from solrtexttagger_spark.search.bm25 import bm25_topk
    from solrtexttagger_spark.session import get_spark

    spark = get_spark(app_name="build_index_job")
    spark.sparkContext.setLogLevel("WARN")

    if args.demo:
        from solrtexttagger_spark.sources.codecorpus import synth_code_corpus

        src = synth_code_corpus(spark, 2000)
        args.output = args.output or "/tmp/spark_text_index_demo"
    else:
        if not args.input or not args.output:
            ap.error("--input and --output required (or --demo)")
        src = spark.read.format(args.format).load(args.input)

    key_cols = args.key_cols.split(",")
    docs = with_doc_ids(src, key_cols)

    t0 = time.perf_counter()
    fingerprint = f"{args.input or 'demo'}:{src.count()}"
    index = build_or_resume(
        spark,
        lambda: build_index(
            docs, text_col=args.text_col, num_segments=args.num_segments
        ),
        args.output,
        source_fingerprint=fingerprint,
    )
    build_s = round(time.perf_counter() - t0, 3)

    result = {
        "doc_count": index.doc_count,
        "num_segments": index.num_segments,
        "build_or_resume_seconds": build_s,
        "index_dir": args.output,
    }
    if args.query:
        queries = list(enumerate(args.query))
        rows = bm25_topk(index, queries, k=args.k, spark=spark).collect()
        result["queries"] = {
            q: [
                {"rank": r["rank"], "doc_id": r["doc_id"], "score": round(r["score"], 4)}
                for r in rows
                if r["query_id"] == qid
            ]
            for qid, q in queries
        }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
