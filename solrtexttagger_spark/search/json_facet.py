"""Solr JSON Facet API (the modern facet module) — nested facets with
per-bucket statistics, re-expressed Spark-first.

Reference surface: Solr's ``json.facet`` request parameter (the engine
behind faceting in the reference's delegated /select stack — see
SURVEY.md §2.4 D1; the classic facet.field/facet.range/facet.query
params in search/facets.py are its legacy twins). Supported subset:

  {"langs": {"type": "terms", "field": "lang", "limit": 5,
             "sort": "count",            # count | index | "<stat> desc"
             "mincount": 1, "offset": 0, "prefix": "e",
             "missing": True,            # NULL bucket, Solr missing:true
             "numBuckets": True,         # pre-limit bucket cardinality
             "facet": {"avg_n": "avg(n_chars)",       # per-bucket stats
                        "srcs": {"type": "terms", ...}}},  # sub-facet
   "hist":  {"type": "range", "field": "n_chars",
             "start": 0, "end": 400, "gap": 50,       # zero-filled
             "facet": {...}},
   "special": {"type": "query", "q": "+merge -sort",  # boolean syntax
               "facet": {"tot": "sum(n_chars)"}},     # stats only
   "total_chars": "sum(n_chars)"}                     # root-level stat

Stats: sum / avg / min / max / unique (exact distinct) / hll
(HyperLogLog++ approximate distinct — Solr's hll stat). Out of scope
(documented): allBuckets, sorting by a SUB-facet's stat, sub-facets
under ``missing`` buckets or under query facets (stats there are fine),
percentiles, and domain changes (excludeTags/domain:{...}) — the domain
is always the base query's match set restricted by ``allowed_docs``.

Execution shape (the point of this module):

- The ENTIRE terms/range tree — every nesting level, every per-bucket
  stat — is ONE ``groupingSets`` aggregate over the match-set join:
  each tree node contributes the grouping set (ancestor cols..., own
  col); ``grouping_id()`` tags which node a result row belongs to; a
  range node's grouping column is its bucket arithmetic. Catalyst
  expands the sets in a single Aggregate — one shuffle for the whole
  tree, not one job per facet like Solr's per-field accumulators.
- Per-node ordering/limits run as window functions over the already
  AGGREGATED relation (rows = buckets, not documents), partitioned by
  the ancestor columns — no second pass over data.
- All ``query`` facets batch through ONE boolean_matched_scores pass
  (shared postings scan), then one count/stats aggregate.
- The driver collects only the post-limit bucket rows (bounded by the
  product of per-level limits plus range spines), then assembles the
  nested response dict — exactly the rows Solr would serialize.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from solrtexttagger_spark.index.build import InvertedIndex
from solrtexttagger_spark.search.bm25 import analyze_query_terms

_STAT_RE = re.compile(r"^(sum|avg|min|max|unique|hll)\((\w+)\)$")
_STAT_FN = {
    "sum": lambda c: F.sum(c).cast("double"),
    "avg": lambda c: F.avg(c).cast("double"),
    "min": lambda c: F.min(c).cast("double"),
    "max": lambda c: F.max(c).cast("double"),
    "unique": lambda c: F.countDistinct(c).cast("long"),
    # Solr's hll stat: approximate distinct — HyperLogLog++ here, which
    # unlike countDistinct needs no distinct-expand, the petabyte choice
    "hll": lambda c: F.approx_count_distinct(c).cast("long"),
}


class _Node:
    """One facet node of the spec tree (terms | range | query)."""

    def __init__(self, name, spec, path, idx):
        self.name, self.path, self.idx = name, path, idx
        self.type = spec["type"]
        self.spec = spec
        self.children: list[_Node] = []
        self.stats: dict[str, tuple[str, str]] = {}  # name -> (fn, col)
        self.gcol = f"__g{idx}"  # this node's grouping column alias

    @property
    def limit(self):
        return self.spec.get("limit", 10)

    @property
    def mincount(self):
        # Solr JSON API defaults: terms mincount=1, range mincount=0
        return self.spec.get("mincount", 1 if self.type == "terms" else 0)


def _parse_tree(spec: dict, path: tuple, counter: list) -> tuple[list, dict]:
    """-> (child nodes, stats at this level). Validates the subset."""
    nodes, stats = [], {}
    for name, val in spec.items():
        if isinstance(val, str):
            m = _STAT_RE.match(val)
            if not m:
                raise ValueError(
                    f"unsupported stat {val!r} (sum/avg/min/max/unique)"
                )
            stats[name] = (m.group(1), m.group(2))
            continue
        if not isinstance(val, dict) or "type" not in val:
            raise ValueError(f"facet {name!r}: need a stat string or a "
                             "dict with 'type'")
        if val["type"] not in ("terms", "range", "query"):
            raise ValueError(f"facet {name!r}: unsupported type {val['type']!r}")
        node = _Node(name, val, path, counter[0])
        counter[0] += 1
        sub = val.get("facet", {})
        node.children, node.stats = _parse_tree(sub, path + (name,), counter)
        if node.type == "query" and node.children:
            raise ValueError(
                f"query facet {name!r}: sub-facets under a query facet are "
                "out of scope (stats are supported)"
            )
        nodes.append(node)
    return nodes, stats


def _empty_bucket(node, val) -> dict:
    """A zero-filled range bucket with the SAME shape as a populated one
    (Solr emits the stat and sub-facet entries for zero buckets too):
    count-like stats (sum/unique/hll) default to 0, value stats
    (avg/min/max) to None, each sub-facet to an empty bucket list."""
    b = {"val": val, "count": 0}
    for sname, (fn, _col) in node.stats.items():
        b[sname] = 0 if fn in ("sum", "unique", "hll") else None
    for ch in node.children:
        b[ch.name] = {"buckets": []}
    return b


def _walk(nodes):
    for n in nodes:
        yield n
        yield from _walk(n.children)


def _sort_exprs(node, cnt_col, stat_cols):
    """Window ordering for a node per its Solr sort spec."""
    srt = node.spec.get("sort", "count")
    if isinstance(srt, dict):  # {"statname": "desc"}
        (key, direction), = srt.items()
    else:
        parts = str(srt).split()
        key = parts[0]
        direction = parts[1] if len(parts) > 1 else (
            "asc" if key == "index" else "desc"
        )
    val = F.col(node.gcol)
    if key == "count":
        lead = F.col(cnt_col)
    elif key == "index":
        lead = val
    elif key in node.stats:
        lead = F.col(stat_cols[(node.idx, key)])
    else:
        raise ValueError(
            f"facet {node.name!r}: sort key {key!r} is not count/index/"
            "a stat of this node (sorting by a sub-facet stat is out of "
            "scope)"
        )
    lead = lead.desc() if direction == "desc" else lead.asc()
    # value asc tie-break keeps every ordering total and deterministic
    return [lead, val.asc()]


def json_facet(
    index: InvertedIndex,
    docs_df: DataFrame,
    query: str,
    spec: dict,
    *,
    id_col: str = "doc_id",
    allowed_docs: DataFrame | None = None,
    field: str | None = None,
    spark: SparkSession | None = None,
) -> dict:
    """Evaluate a Solr ``json.facet`` spec over the documents matching
    ``query`` (bag semantics, like search/facets.facet_counts;
    ``allowed_docs`` = fq restricting the domain). Returns the nested
    Solr response shape: ``{"count": N, <facet name>: {"buckets":
    [{"val": v, "count": n, <stat>: x, <subfacet>: {...}}, ...],
    ["numBuckets": m,] ["missing": {"count": n}]}, <stat name>: x}``.

    One grouping-sets aggregate for the whole terms/range tree + one
    batched boolean pass for all query facets — see module docstring."""
    spark = spark or docs_df.sparkSession
    counter = [0]
    roots, root_stats = _parse_tree(spec, (), counter)
    tree_nodes = [n for n in _walk(roots) if n.type != "query"]
    query_nodes = [n for n in _walk(roots) if n.type == "query"]
    for n in query_nodes:
        if n.path:  # nested under another facet: domain would differ
            raise ValueError(
                f"query facet {n.name!r}: only top-level query facets are "
                "supported (nested query domains are out of scope)"
            )

    # --- domain: bag match of the base query, fq-restricted ---
    terms = sorted(analyze_query_terms(query))
    if not terms:
        raise ValueError("json_facet needs a non-empty base query")
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    matched = (
        index.postings.join(F.broadcast(tdf), "term")
        .select(F.explode("postings.doc_id").alias(id_col))
        .distinct()
    )
    if allowed_docs is not None:
        matched = matched.join(
            allowed_docs.select(F.col("doc_id").alias(id_col)).distinct(),
            id_col, "left_semi",
        )
    dom = docs_df.join(matched, id_col)

    # --- grouping columns: field per terms node, bucket arithmetic per
    # range node (computed BEFORE the aggregate so it can be grouped) ---
    proj = dom
    for n in tree_nodes:
        if n.type == "terms":
            proj = proj.withColumn(n.gcol, F.col(n.spec["field"]))
        else:  # range
            c = F.col(n.spec["field"])
            lo, hi, gap = n.spec["start"], n.spec["end"], n.spec["gap"]
            if gap <= 0 or hi <= lo:
                raise ValueError(f"range facet {n.name!r}: need gap > 0 "
                                 "and end > start")
            # float start/end/gap keep a DOUBLE bucket key (Solr range
            # facets take float gaps); the driver-side zero-fill spine
            # mirrors the same lo + k*gap arithmetic bit-for-bit
            key = F.floor((c - lo) / gap) * gap + lo
            key = (
                key.cast("double")
                if any(isinstance(x, float) for x in (lo, hi, gap))
                else key.cast("long")
            )
            proj = proj.withColumn(
                n.gcol, F.when((c >= lo) & (c < hi), key)
            )

    gcols = [n.gcol for n in tree_nodes]
    sets = [tuple()] + [
        tuple(a.gcol for a in _ancestors(n, tree_nodes)) + (n.gcol,)
        for n in tree_nodes
    ]
    # stats: every node's stats plus root stats, all in the ONE agg
    stat_cols: dict[tuple[int, str], str] = {}
    aggs = [F.count("*").alias("__cnt")]
    for n in tree_nodes:
        for sname, (fn, col) in n.stats.items():
            alias = f"__s{n.idx}_{sname}"
            stat_cols[(n.idx, sname)] = alias
            aggs.append(_STAT_FN[fn](col).alias(alias))
    for sname, (fn, col) in root_stats.items():
        alias = f"__sroot_{sname}"
        stat_cols[(-1, sname)] = alias
        aggs.append(_STAT_FN[fn](col).alias(alias))

    if gcols:
        agg = proj.groupingSets(
            [tuple(s) for s in sets], *[F.col(c) for c in gcols]
        ).agg(*aggs, F.grouping_id(*[F.col(c) for c in gcols]).alias("__gid"))
    else:
        agg = proj.agg(*aggs, F.lit(0).alias("__gid"))
    # PERSIST the aggregated relation (rows = buckets, tiny) before the
    # per-node slices: each node's filter+window+union branch would
    # otherwise re-execute the whole corpus-join + Expand + aggregate
    # subtree — the union's N branches all read this one cached
    # computation instead (verified in the executed plan: one Expand
    # under InMemoryRelation vs one per branch uncached)
    agg = agg.persist()

    # gid for a node: bits of the EXCLUDED grouping columns set to 1
    def _mask(included: set[str]) -> int:
        m = 0
        for i, c in enumerate(gcols):
            if c not in included:
                m |= 1 << (len(gcols) - 1 - i)
        return m

    pieces = []
    root_mask = _mask(set())
    pieces.append(agg.where(F.col("__gid") == F.lit(root_mask)))
    for n in tree_nodes:
        anc = [a.gcol for a in _ancestors(n, tree_nodes)]
        mask = _mask(set(anc) | {n.gcol})
        rows = agg.where(F.col("__gid") == F.lit(mask))
        # drop buckets under a NULL ancestor (sub-facets under missing
        # buckets are out of scope, documented)
        for a in anc:
            rows = rows.where(F.col(a).isNotNull())
        keep_null = bool(n.spec.get("missing")) if n.type == "terms" else False
        nn = rows.where(F.col(n.gcol).isNotNull())
        if n.type == "terms":
            if n.spec.get("prefix") is not None:
                nn = nn.where(
                    F.col(n.gcol).cast("string").startswith(n.spec["prefix"])
                )
            if n.mincount > 0:
                nn = nn.where(F.col("__cnt") >= n.mincount)
            # window over the AGGREGATED relation: rows are buckets, so a
            # top-level node's empty partitionBy single-partitions its
            # bucket list (field cardinality), never the documents —
            # same bounded shape as terms_component's rank window
            w = Window.partitionBy(*[F.col(a) for a in anc]) if anc else (
                Window.partitionBy()
            )
            order = _sort_exprs(n, "__cnt", stat_cols)
            wo = w.orderBy(*order)
            nn = nn.withColumn("__rn", F.row_number().over(wo)).withColumn(
                "__nb", F.count("*").over(w)
            )
            off = n.spec.get("offset", 0)
            if n.limit is not None and n.limit >= 0:
                nn = nn.where(
                    (F.col("__rn") > off) & (F.col("__rn") <= off + n.limit)
                )
            elif off:
                nn = nn.where(F.col("__rn") > off)
            nn = nn.drop("__rn")
        else:  # range: mincount filter only; zero-fill happens driver-side
            if n.mincount > 0:
                nn = nn.where(F.col("__cnt") >= n.mincount)
            nn = nn.withColumn("__nb", F.lit(None).cast("long"))
        if keep_null:
            miss = rows.where(F.col(n.gcol).isNull()).withColumn(
                "__nb", F.lit(None).cast("long")
            )
            nn = nn.unionByName(miss)
        pieces.append(nn)

    uni = pieces[0].withColumn("__nb", F.lit(None).cast("long"))
    for p in pieces[1:]:
        uni = uni.unionByName(p)
    try:
        collected = uni.collect()  # ONE action for the whole tree
    finally:
        agg.unpersist()

    by_mask: dict[int, list] = {}
    for r in collected:
        by_mask.setdefault(r["__gid"], []).append(r)

    # --- query facets: one batched boolean pass + one stats agg ---
    query_results: dict[str, dict] = {}
    if query_nodes:
        from solrtexttagger_spark.search.boolean import boolean_matched_scores

        qlist = [(i, n.spec["q"]) for i, n in enumerate(query_nodes)]
        qm = boolean_matched_scores(
            index, qlist, field=field, spark=spark
        ).select("query_id", F.col("doc_id").alias(id_col))
        qm = qm.join(dom.select(id_col), id_col, "left_semi")
        q_aggs = [F.count("*").alias("__cnt")]
        for i, n in enumerate(query_nodes):
            for sname, (fn, col) in n.stats.items():
                q_aggs.append(_STAT_FN[fn](col).alias(f"__q{i}_{sname}"))
        q_rows = (
            qm.join(docs_df, id_col)
            .groupBy("query_id")
            .agg(*q_aggs)
            .collect()
        )
        got = {int(r["query_id"]): r for r in q_rows}
        for i, n in enumerate(query_nodes):
            r = got.get(i)
            res = {"count": int(r["__cnt"]) if r else 0}
            for sname in n.stats:
                res[sname] = r[f"__q{i}_{sname}"] if r else None
            query_results[n.name] = res

    # --- assemble the nested response ---
    def _assemble(node, parent_filter):
        mask = _mask(
            {a.gcol for a in _ancestors(node, tree_nodes)} | {node.gcol}
        )
        rows = [
            r for r in by_mask.get(mask, [])
            if all(r[a] == v for a, v in parent_filter.items())
        ]
        regular = [r for r in rows if r[node.gcol] is not None]
        if node.type == "terms":
            # window already ordered/limited; re-sort locally for output
            # order by re-deriving the sort key from the row
            regular = _resort(node, regular)
        buckets = []
        for r in regular:
            b = {"val": r[node.gcol], "count": int(r["__cnt"])}
            for sname in node.stats:
                b[sname] = r[stat_cols[(node.idx, sname)]]
            for ch in node.children:
                b[ch.name] = _assemble(
                    ch, {**parent_filter, node.gcol: r[node.gcol]}
                )
            buckets.append(b)
        if node.type == "range":
            lo, hi, gap = (
                node.spec["start"], node.spec["end"], node.spec["gap"]
            )
            have = {b["val"]: b for b in buckets}
            if node.mincount <= 0:
                # arithmetic spine (not range(): float gaps are legal) —
                # lo + i*gap is the SAME expression the bucket-key column
                # computes (floor * gap + lo), so float vals line up
                spine, i = [], 0
                while lo + i * gap < hi:
                    spine.append(lo + i * gap)
                    i += 1
                buckets = [
                    have.get(v, _empty_bucket(node, v)) for v in spine
                ]
            else:
                buckets = [b for _, b in sorted(have.items())]
        out = {"buckets": buckets}
        if node.type == "terms" and node.spec.get("numBuckets"):
            out["numBuckets"] = int(regular[0]["__nb"]) if regular else 0
        if node.type == "terms" and node.spec.get("missing"):
            miss = [r for r in rows if r[node.gcol] is None]
            m = {"count": int(miss[0]["__cnt"]) if miss else 0}
            out["missing"] = m
        return out

    def _resort(node, rows):
        srt = node.spec.get("sort", "count")
        if isinstance(srt, dict):
            (key, direction), = srt.items()
        else:
            parts = str(srt).split()
            key = parts[0]
            direction = parts[1] if len(parts) > 1 else (
                "asc" if key == "index" else "desc"
            )
        rev = direction == "desc"

        def kf(r):
            if key == "count":
                lead = r["__cnt"]
            elif key == "index":
                lead = r[node.gcol]
            else:
                lead = r[stat_cols[(node.idx, key)]]
                if lead is None:  # all-NULL stat bucket: sorts last
                    lead = float("-inf") if rev else float("inf")
            return lead

        # two-pass stable sort: value asc tie-break, then lead key
        rows = sorted(rows, key=lambda r: (r[node.gcol] is None, r[node.gcol]))
        return sorted(rows, key=kf, reverse=rev)

    root_rows = by_mask.get(root_mask, [])
    out: dict = {"count": int(root_rows[0]["__cnt"]) if root_rows else 0}
    for sname in root_stats:
        out[sname] = (
            root_rows[0][stat_cols[(-1, sname)]] if root_rows else None
        )
    for n in roots:
        if n.type == "query":
            out[n.name] = query_results[n.name]
        else:
            out[n.name] = _assemble(n, {})
    return out


def _ancestors(node, tree_nodes):
    """Terms/range ancestors of ``node`` along its spec path."""
    by_path = {n.path + (n.name,): n for n in tree_nodes}
    out = []
    for i in range(1, len(node.path) + 1):
        a = by_path.get(node.path[:i])
        if a is not None:
            out.append(a)
    return out
