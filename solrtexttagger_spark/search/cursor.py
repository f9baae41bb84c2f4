"""cursorMark deep paging — Solr's CursorMark protocol, Spark-first.

Reference surface: Solr's deep-paging API (CursorMarkParams, used by
/export-style full sweeps through /select): a request carries
``cursorMark=*`` plus a ``sort`` that MUST end in the uniqueKey (so the
order is total), the response carries ``nextCursorMark`` — an opaque
token encoding the LAST returned doc's sort values — and the next
request resumes strictly after it. Solr added this because
``start+rows`` deep paging is O(depth): page N funnels ``N*rows`` docs
through the ranker on every shard. The cursor makes every page O(page).

The Spark translation is exactly the same asymptotics, visible in the
plan: the cursor becomes a lexicographic strictly-after PREDICATE over
the sort keys — for plain stored-field sorts it reaches the parquet
scan as a pushed filter (leading-key range pruning, row groups before
the cursor never decompress) — and the page is ``orderBy().limit(rows)``
= TakeOrderedAndProject (per-partition partial top-k + merge). No
global sort, no window, no O(depth) funnel; page 10 000 costs the same
scan-and-take as page 1. That is the 100 TB shape: a full corpus sweep
via cursors is a sequence of pruned scans, where start+rows would tip
over at ``start+rows`` driver-merged rows.

Token format: base64(JSON list of the last row's sort-key values) —
opaque to callers, inspectable in tests, stable across sessions (Solr's
token is likewise a base64 of the sort values). The uniqueKey tiebreak
is appended automatically when the caller's sort omits it, mirroring
Solr's hard requirement rather than 400-ing.

End-of-results contract is Solr's: when a page comes back EMPTY the
returned nextCursorMark equals the request's cursorMark — clients loop
until ``next == current``.
"""

from __future__ import annotations

import base64
import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from solrtexttagger_spark.index.build import InvertedIndex
from solrtexttagger_spark.search.bm25 import B, K1
from solrtexttagger_spark.search.request import (
    _request_match_set,
    parse_fl,
    parse_sort,
    _IDENT,
)

START_MARK = "*"


def encode_cursor(values: list) -> str:
    """Opaque token for a row's sort-key values (base64 JSON — same
    construction as Solr's CursorMark.getSerializedTotem)."""
    return base64.urlsafe_b64encode(
        json.dumps(values, separators=(",", ":")).encode()
    ).decode()


def decode_cursor(mark: str) -> list | None:
    """Inverse of encode_cursor; ``*`` (the start totem) -> None."""
    if mark == START_MARK:
        return None
    try:
        vals = json.loads(base64.urlsafe_b64decode(mark.encode()))
    except Exception as e:
        raise ValueError(f"unparseable cursorMark {mark!r}") from e
    if not isinstance(vals, list):
        raise ValueError(f"cursorMark payload must be a list, got {vals!r}")
    return vals


def after_cursor(keys: list[tuple], values: list):
    """The strictly-after predicate: ``keys`` is [(Column, asc)], and a
    row qualifies iff its key tuple sorts AFTER ``values`` under the
    mixed asc/desc order — the standard lexicographic expansion
    ``(k0 > v0) OR (k0 = v0 AND k1 > v1) OR ...`` with ``>`` flipped on
    descending keys. The LEADING disjunct is a plain range comparison on
    the first sort key, which is what parquet row-group pruning keys on
    when that key is a stored column."""
    if len(keys) != len(values):
        raise ValueError(
            f"cursorMark carries {len(values)} values but the sort has "
            f"{len(keys)} keys — cursor and sort must travel together"
        )
    pred = F.lit(False)
    for i in range(len(keys) - 1, -1, -1):
        col, asc = keys[i]
        v = F.lit(values[i])
        strict = col > v if asc else col < v
        pred = strict | (col.eqNullSafe(v) & pred)
    return pred


def cursor_page(
    rel: DataFrame,
    sort_keys: list[tuple[str, bool]],
    *,
    rows: int,
    cursor_mark: str = START_MARK,
    id_col: str = "doc_id",
) -> tuple[DataFrame, str]:
    """One cursor page over an arbitrary relation.

    ``sort_keys``: [(sql_expr_or_column, ascending)] — ``id_col`` asc is
    appended when absent (the uniqueKey tiebreak Solr requires). Returns
    (page, next_mark): ``page`` is the ≤``rows``-row DataFrame (sorted,
    with the original columns), ``next_mark`` the token for the next
    request (== ``cursor_mark`` when the page is empty — Solr's
    end-of-results signal).

    Cost shape: the cursor filter applies BEFORE ``orderBy().limit``,
    so the plan is Filter → TakeOrderedAndProject; computing next_mark
    collects only the page's key values (≤ rows scalars, one bounded
    job — the same materialization Solr does to mint the totem)."""
    if rows <= 0:
        raise ValueError("rows must be positive")
    keys = list(sort_keys)
    if not any(e == id_col for e, _ in keys):
        keys.append((id_col, True))
    kcols = [
        (F.col(e) if _IDENT.match(e) and e in rel.columns else F.expr(e))
        for e, _ in keys
    ]
    # materialize the key expressions once so the filter, the order,
    # and the minted token all read the SAME computed values
    work = rel
    knames = []
    for i, c in enumerate(kcols):
        knames.append(f"__ck{i}")
        work = work.withColumn(f"__ck{i}", c)
    vals = decode_cursor(cursor_mark)
    if vals is not None:
        work = work.where(
            after_cursor(
                [(F.col(n), asc) for n, (_, asc) in zip(knames, keys)],
                vals,
            )
        )
    order = [
        F.col(n).asc() if asc else F.col(n).desc()
        for n, (_, asc) in zip(knames, keys)
    ]
    page = work.orderBy(*order).limit(rows)
    tail = page.select(*knames).collect()
    if not tail:
        return page.drop(*knames), cursor_mark
    next_mark = encode_cursor(list(tail[-1]))
    return page.drop(*knames), next_mark


def solr_select_cursor(
    index: InvertedIndex | None,
    docs_df: DataFrame,
    params: dict,
    *,
    synonyms: dict[str, list[str]] | None = None,
    k1: float = K1,
    b: float = B,
    id_col: str = "doc_id",
    spark: SparkSession | None = None,
) -> tuple[DataFrame, str]:
    """solr_select with Solr's cursor protocol: the same param dict plus
    ``cursorMark`` (default ``*``); returns (page, nextCursorMark).

    Solr's own restrictions apply: ``start`` must be absent/0 (a cursor
    IS the offset) and grouping/rerank don't compose with cursors —
    both raise here as they 400 in Solr. q/fq/bf/boost/{!collapse} all
    route exactly as in solr_select (the shared _request_match_set);
    the page carries (doc_id, score, *fl) in page order plus the mint
    for the next request."""
    if int(params.get("start", 0)) != 0:
        raise ValueError(
            "cursorMark does not compose with start (Solr 400s this: "
            "the cursor replaces the offset)"
        )
    if "rq" in params:
        raise ValueError("cursorMark does not compose with rq={!rerank}")
    spark = spark or docs_df.sparkSession
    rows = int(params.get("rows", 10))
    matched = _request_match_set(
        index, docs_df, params,
        synonyms=synonyms, k1=k1, b=b, id_col=id_col, spark=spark,
    )
    sort_keys = (
        parse_sort(params["sort"]) if "sort" in params
        else [("score", False)]
    )
    needs_fields = any(
        e != "score" and e != id_col for e, _ in sort_keys
    )
    rel = matched
    if needs_fields:
        rel = matched.join(
            docs_df.withColumnRenamed(id_col, "doc_id"), "doc_id", "left"
        )
    keys = [
        (("score" if e == "score" else e), asc) for e, asc in sort_keys
    ]
    page, next_mark = cursor_page(
        rel, keys, rows=rows, cursor_mark=params.get("cursorMark", "*"),
        id_col="doc_id",
    )

    # fl projection — page is ≤ rows, broadcast into the corpus join
    fl_entries = parse_fl(params.get("fl"))
    stored = [f for f in docs_df.columns if f != id_col]
    proj, seen = [], set()
    for alias, payload in fl_entries:
        if payload == "*":
            for f_ in stored:
                if f_ not in seen:
                    seen.add(f_)
                    proj.append(F.col(f_))
        elif payload == "score" or alias in ("doc_id", id_col):
            continue
        elif alias not in seen:
            seen.add(alias)
            if _IDENT.match(payload) and payload in docs_df.columns:
                proj.append(F.col(payload).alias(alias))
            else:
                proj.append(F.expr(payload).alias(alias))
    base = page.select("query_id", "doc_id", "score")
    if not proj:
        return base, next_mark
    fields = docs_df.withColumnRenamed(id_col, "doc_id")
    return (
        fields.join(F.broadcast(base), "doc_id")
        .select("query_id", "doc_id", "score", *proj),
        next_mark,
    )
