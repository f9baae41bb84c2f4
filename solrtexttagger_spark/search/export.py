"""Solr /export handler — full sorted result-set export (the streaming
backbone under Solr's streaming expressions / SQL).

Reference surface: ``/export?q=...&fq=...&fl=...&sort=...`` streams
EVERY matching document in sort order — no ``rows`` cap, no paging, no
scoring. Solr requires docValues on every exported/sorted field and
iterates the sort in docValue order; it exists precisely because a
top-k handler cannot ship a 100M-row result. Users drive analytics,
joins and reindexing off it.

Spark-first shape — this is the one handler whose semantics ARE a
Spark primitive:

- the match set (any query: a Catalyst ``fq`` predicate pushed to the
  scan, and/or a text query's doc-id relation semi-joined) projects to
  ``fl`` BEFORE the sort — the exchange carries exactly the exported
  columns;
- the global order is ``orderBy`` = ONE range-partitioning exchange
  (sampled bounds, every partition a contiguous key range) — no
  window, no LIMIT, no driver materialization;
- the export itself stays distributed: ``write.parquet`` preserves
  intra-partition order and partition numbering (part-00000 <
  part-00001 < ...), so the files concatenate into the global order —
  the cluster-honest analogue of Solr's single-node sorted stream;
  ``toLocalIterator`` offers the driver-side streaming view at one
  partition of memory.

Every sort field doubles as Solr's tie-breaker chain; an explicit
trailing unique key keeps the export deterministic (Solr's docValue
iteration is equally tie-stable only per segment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def export_matches(
    docs_df: DataFrame,
    *,
    fl: list[str],
    sort: list[tuple[str, str]],
    fq: str | None = None,
    allowed_docs: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """The /export relation: every matching doc, ``fl``-projected,
    globally ordered by ``sort`` = [(expr, 'asc'|'desc'), ...] (each
    expr any Catalyst expression — Solr's docValues fields or function
    sorts). ``fq`` pushes to the scan; ``allowed_docs`` semi-joins a
    text query's doc-id relation (the tagger/BM25 match set). The plan
    is projection -> filter -> ONE range exchange; no window, no limit,
    nothing driver-side."""
    if not sort:
        raise ValueError("/export requires a sort (Solr returns 400)")
    out = docs_df
    if fq is not None:
        out = out.where(F.expr(fq))
    if allowed_docs is not None:
        out = out.join(allowed_docs.select(id_col), id_col, "left_semi")
    order = []
    for expr, direction in sort:
        c = F.expr(expr)
        if direction.lower() not in ("asc", "desc"):
            raise ValueError(f"sort direction must be asc|desc: {direction!r}")
        order.append(c.desc() if direction.lower() == "desc" else c.asc())
    # deterministic tie-break on the unique key, like a trailing
    # sort=id asc in the request
    order.append(F.col(id_col).asc())
    # sort BEFORE the fl projection: Solr /export sorts by docValues
    # fields that need not be exported, so a sort expr over a non-fl
    # column must still resolve. Catalyst pushes the narrower Project
    # under the Sort when the sort only uses fl columns — same single
    # range exchange either way (plan-pinned in test_export.py).
    out = out.orderBy(*order)
    cols = list(fl)
    if id_col not in cols:
        cols = cols + [id_col]
    return out.select(*[F.col(c) for c in cols])


def export_to_parquet(exported: DataFrame, path: str) -> int:
    """Materialize the export: parquet part files whose numbering
    follows the global order (range partitioning guarantees partition
    i's keys precede partition i+1's). Returns the exported row
    count."""
    exported.write.mode("overwrite").parquet(path)
    return exported.sparkSession.read.parquet(path).count()
