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
    _IDENT,
    _request_match_set,
    parse_sort,
    project_fl,
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
    when that key is a stored column.

    NULL keys follow Spark's sort placement (asc: nulls FIRST, desc:
    nulls LAST — Solr's sortMissingFirst/Last analogue), and the cursor
    value is known Python-side, so each strict comparison branches on
    it: after a NULL value under asc means "any non-null key" (with the
    tie-break recursing through the null group); after a non-null value
    under desc additionally admits null keys (they sort at the end).
    Without this, ``col > lit(None)`` is SQL NULL and a null-keyed
    cursor would silently strand the rest of the sweep."""
    if len(keys) != len(values):
        raise ValueError(
            f"cursorMark carries {len(values)} values but the sort has "
            f"{len(keys)} keys — cursor and sort must travel together"
        )
    pred = F.lit(False)
    for i in range(len(keys) - 1, -1, -1):
        col, asc = keys[i]
        v = values[i]
        if v is None:
            # asc: nulls first -> everything non-null is after;
            # desc: nulls last -> nothing is after a null
            strict = col.isNotNull() if asc else F.lit(False)
        elif asc:
            # nulls sort before every value: never after v
            strict = col > F.lit(v)
        else:
            # nulls sort after every value under desc
            strict = col.isNull() | (col < F.lit(v))
        pred = strict | (col.eqNullSafe(F.lit(v)) & pred)
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
    (page, next_mark): ``page`` is the ≤``rows``-row DataFrame carrying
    the original columns plus ``rank`` (1-based position WITHIN the
    page — the response order a Solr client relies on, recoverable
    however the caller's downstream joins shuffle rows); ``next_mark``
    is the token for the next request (== ``cursor_mark`` when the page
    is empty — Solr's end-of-results signal).

    Cost shape: the cursor filter applies BEFORE ``orderBy().limit``,
    so the plan is Filter → TakeOrderedAndProject; computing next_mark
    collects only the page's key values (≤ rows scalars, one bounded
    job — the same materialization Solr does to mint the totem). The
    returned page stays LAZY: the caller's own action re-executes the
    pruned scan-and-take (the standard price of returning a composable
    DataFrame rather than collected rows)."""
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
    # rank = position within the page (1-based): the window runs over
    # the <= rows survivors of the limit, one tiny partition
    from pyspark.sql import Window

    page = page.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order)).cast("long")
    )
    tail = page.select("rank", *knames).orderBy("rank").collect()
    if not tail:
        return page.drop(*knames), cursor_mark
    next_mark = encode_cursor(list(tail[-1])[1:])
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
    # the shared fl projection (request.project_fl); rank = 1-based
    # position within THIS page, so clients recover response order
    # however the broadcast join shuffles rows
    return (
        project_fl(
            page, docs_df, params.get("fl"), id_col=id_col,
            lead_cols=("query_id", "rank", "doc_id", "score"),
        ),
        next_mark,
    )


def render_cursor_response(
    page: DataFrame,
    next_mark: str,
    *,
    num_found: int | None = None,
) -> str:
    """The HTTP shape of a cursor page: Solr's wt=json response with
    the top-level ``nextCursorMark`` key clients loop on. ``page`` is a
    solr_select_cursor/cursor_page output (bounded — the collect here
    is <= rows, the same materialization any writer does); rows render
    in rank order with doc_id as ``id``, score rounded to 4 (the golden
    writers' convention). ``num_found`` is optional because computing
    it is a separate count over the match set — Solr returns it with
    every cursor page, a caller that wants parity passes the count in
    (compute once per sweep: the match set is cursor-invariant)."""
    import json as _json

    rows = page.orderBy("rank").collect()
    has_score = "score" in page.columns
    fields = [
        c for c in page.columns
        if c not in ("query_id", "rank", "doc_id", "score")
    ]
    docs = []
    for r in rows:
        d = {"id": r["doc_id"]}
        if has_score:
            # score rounded to 4 — the golden writers' convention
            # (select.render_select_json)
            d["score"] = round(r["score"], 4)
        for c in fields:
            d[c] = r[c]
        docs.append(d)
    payload = {
        "response": {
            "numFound": num_found if num_found is not None else len(docs),
            "start": 0,
            "docs": docs,
        },
        "nextCursorMark": next_mark,
    }
    return _json.dumps(payload, separators=(",", ":"), sort_keys=True)
