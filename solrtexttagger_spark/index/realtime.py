"""Realtime get + atomic updates — Solr's update-log (tlog) surface.

Reference surface: Solr's ``/get`` handler (RealTimeGetComponent) serves
a document BY ID at its latest UNCOMMITTED state: the update log is
consulted first (an in-flight add/atomic-update/delete wins over the
index), falling back to the committed index. Atomic updates
(AtomicUpdateDocumentMerger) are the field-modifier dialect —
``{"id": X, "field": {"set"|"inc"|"add"|"add-distinct"|"remove"|
"removeregex": v}}`` — applied against the CURRENT version of the doc
(tlog-ahead view), producing a full replacement document that re-enters
the tlog. Optimistic concurrency rides ``_version_``: a positive
version in the command must equal the doc's current version or the
update is rejected (Solr 409).

Spark-first shape — the tlog is a TABLE, not a log replayer:

- ``tlog`` relation: the base table's columns plus ``_version_`` long
  and ``op`` in ('add', 'delete'). An 'add' row carries the full doc;
  a 'delete' carries only the id. Appends are blind writes (no read
  path in the hot loop — the same discipline as
  streaming/upsert_stream's owners table).
- :func:`realtime_get` — the /get view for a bounded id set: both
  sides filter to ``id IN (...)`` literals FIRST (parquet pushdown —
  the scan reads only row groups containing probed ids), the tlog
  resolves per-id by ONE max_by aggregate, and the base fills ids the
  tlog never touched via a left anti join over the probe-sized
  relations. Cost tracks len(ids), never table size.
- :func:`apply_tlog` — commit: last-write-wins merge of the whole
  tlog into the base (deletes vanish). One aggregate over the tlog +
  one left-anti join keyed on the TOUCHED id set; untouched base rows
  stream through unshuffled when the touched set broadcasts.
- :func:`atomic_update` — the field-modifier merge as pure Catalyst
  column algebra (set/inc via coalesce-fold, add/add-distinct/remove/
  removeregex via array functions and HOF lambdas — no Python UDF);
  emits full replacement docs ready for ``upsert_docs`` or a tlog
  append, plus Solr's version check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Solr's atomic-update modifiers (AtomicUpdateDocumentMerger.doc ops).
ATOMIC_OPS = ("set", "inc", "add", "add-distinct", "remove", "removeregex")


def _latest_tlog(tlog: DataFrame, id_col: str, version_col: str,
                 cols: list[str]) -> DataFrame:
    """Per-id winner: ONE max_by aggregate keyed on the version (the
    tlog is append-only, versions strictly increase per id — Solr's
    VersionInfo invariant). Output: (id, op, *cols) at latest version."""
    payload = F.struct(
        F.col("op").alias("op"),
        F.col(version_col).alias("v"),
        *[F.col(c).alias(c) for c in cols],
    )
    return (
        tlog.groupBy(F.col(id_col))
        .agg(F.max_by(payload, F.col(version_col)).alias("__w"))
        .select(
            id_col,
            F.col("__w.op").alias("op"),
            F.col("__w.v").alias(version_col),
            *[F.col(f"__w.{c}").alias(c) for c in cols],
        )
    )


def realtime_get(
    base_docs: DataFrame,
    tlog: DataFrame | None,
    ids: list,
    *,
    id_col: str = "doc_id",
    version_col: str = "_version_",
) -> DataFrame:
    """Solr ``/get``: the latest state of each requested id, tlog-ahead
    of the committed base. Returns base columns + ``_version_`` (0 for
    rows served straight from the base, Solr's "from the index" case);
    deleted and never-existing ids are simply absent.

    Both scans filter on the literal id list BEFORE anything else, so
    parquet row-group pruning applies and every downstream relation is
    probe-sized; the tlog-vs-base reconciliation is one left anti join
    between two <= len(ids)-row relations."""
    if not ids:
        raise ValueError("realtime_get needs a non-empty id list")
    cols = [c for c in base_docs.columns if c != id_col]
    probe = F.col(id_col).isin(list(ids))
    base = base_docs.where(probe).select(
        id_col, F.lit(0).cast("long").alias(version_col), *cols
    )
    if tlog is None:
        return base
    latest = _latest_tlog(tlog.where(probe), id_col, version_col, cols)
    from_log = latest.where(F.col("op") == "add").select(
        id_col, version_col, *cols
    )
    untouched = base.join(
        latest.select(id_col), id_col, "left_anti"
    )
    return from_log.unionByName(untouched)


def apply_tlog(
    base_docs: DataFrame,
    tlog: DataFrame,
    *,
    id_col: str = "doc_id",
    version_col: str = "_version_",
) -> DataFrame:
    """Commit: fold the whole tlog into the base (last write per id
    wins, deletes vanish) and return the new base table — same columns
    as ``base_docs``. The anti join keys on the tlog's TOUCHED id set
    (small between commits), so untouched base rows never shuffle —
    the same delta-driven discipline as maintenance.upsert_docs."""
    cols = [c for c in base_docs.columns if c != id_col]
    latest = _latest_tlog(tlog, id_col, version_col, cols)
    survivors = latest.where(F.col("op") == "add").select(id_col, *cols)
    untouched = base_docs.join(
        latest.select(id_col), id_col, "left_anti"
    )
    return untouched.unionByName(survivors.select(*base_docs.columns))


def solr_get(
    base_docs: DataFrame,
    tlog: DataFrame | None,
    params: dict,
    *,
    id_col: str = "doc_id",
    version_col: str = "_version_",
) -> DataFrame:
    """The /get handler's param surface: ``ids`` (comma list or list)
    or ``id``, plus ``fl`` (field projection; ``*`` default). A thin
    dict-front over :func:`realtime_get`, matching the /select router's
    convention (search/request.solr_select) so a Solr client's
    ``/get?ids=1,2,3&fl=title`` maps 1:1."""
    raw = params.get("ids", params.get("id"))
    if raw is None:
        raise ValueError("/get needs ids= (or id=)")
    if isinstance(raw, str):
        parts = [p.strip() for p in raw.split(",") if p.strip()]
    else:
        parts = list(raw)
    id_type = dict(base_docs.dtypes).get(id_col, "string")
    ids = [
        int(p) if id_type in ("bigint", "int", "long", "smallint") else p
        for p in parts
    ]
    out = realtime_get(
        base_docs, tlog, ids, id_col=id_col, version_col=version_col
    )
    fl = params.get("fl", "*")
    if fl == "*":
        return out
    keep = [f.strip() for f in fl.split(",") if f.strip()]
    bad = [f for f in keep if f not in out.columns]
    if bad:
        raise ValueError(f"fl names unknown fields: {bad}")
    cols = [id_col] + [f for f in keep if f != id_col]
    return out.select(*cols)


def atomic_update_tlog(
    base_docs: DataFrame,
    tlog: DataFrame,
    cmds: DataFrame,
    ops: dict[str, str],
    *,
    id_col: str = "doc_id",
    version_col: str = "_version_",
    new_version: int | None = None,
    broadcast_cmds: bool = True,
) -> DataFrame:
    """Solr's ACTUAL atomic-update flow: the merger reads the doc's
    latest UNCOMMITTED state (tlog-ahead — RealTimeGetComponent inside
    DistributedUpdateProcessor), applies the modifiers, and the full
    replacement document re-enters the tlog as an 'add' at a NEW
    version. Returns the new tlog rows (same schema as ``tlog``), ready
    to append: ``tlog.unionByName(atomic_update_tlog(...))`` — so
    back-to-back atomic batches compose exactly like Solr's update
    chain, each seeing its predecessor through the log.

    ``new_version`` pins the minted version (defaults to
    max(current tlog version) + 1, one tiny aggregate — pass it
    explicitly in loops to avoid the extra job). DOCUMENTED DEVIATION
    (r9 ADVICE): every doc in one batch shares this single minted
    version, whereas Solr's update processor assigns a distinct
    monotonically increasing version per document — same-batch docs are
    indistinguishable by version here; order across BATCHES is still
    strict. The current state is
    probe-bounded: only ids present in ``cmds`` are resolved (the same
    id-probe discipline as realtime_get, via a semi-join on the command
    ids rather than literals — the batch may be a relation, not a
    list)."""
    cols = [c for c in base_docs.columns if c != id_col]
    probe_ids = cmds.select(F.col(id_col))
    if broadcast_cmds:
        probe_ids = F.broadcast(probe_ids)
    base = base_docs.join(probe_ids, id_col, "left_semi").select(
        id_col, F.lit(0).cast("long").alias(version_col), *cols
    )
    latest = _latest_tlog(
        tlog.join(probe_ids, id_col, "left_semi"),
        id_col, version_col, cols,
    )
    current = (
        latest.where(F.col("op") == "add")
        .select(id_col, version_col, *cols)
        .unionByName(
            base.join(latest.select(id_col), id_col, "left_anti")
        )
    )
    if new_version is None:
        new_version = int(
            (tlog.agg(F.max(version_col)).collect()[0][0] or 0) + 1
        )
    updated = atomic_update(
        current, cmds, ops,
        id_col=id_col, version_col=version_col,
        broadcast_cmds=broadcast_cmds,
    )
    return updated.select(
        F.col(id_col),
        F.lit("add").alias("op"),
        F.lit(new_version).cast("long").alias(version_col),
        *[F.col(c) for c in cols],
    ).select(*tlog.columns)


def atomic_update(
    current: DataFrame,
    cmds: DataFrame,
    ops: dict[str, str],
    *,
    id_col: str = "doc_id",
    version_col: str = "_version_",
    broadcast_cmds: bool = True,
    keep_conflicts: bool = False,
) -> DataFrame:
    """Solr atomic updates: apply field modifiers to the current doc
    state and return FULL replacement documents for the commanded ids
    (ready for upsert_docs / a tlog 'add' append — Solr's merger does
    exactly this read-modify-replace).

    ``ops`` maps field -> modifier; ``cmds`` carries ``id_col`` plus one
    column per modified field (the operand: new value for ``set``,
    numeric delta for ``inc``, value array for ``add``/``add-distinct``/
    ``remove``, regex string for ``removeregex``). A NULL operand is a
    no-op for that field on that row — one cmds relation batches
    heterogeneous update requests, Solr's JSON-array-of-commands shape.

    Optimistic concurrency: when ``cmds`` carries ``version_col`` and
    ``current`` has it, rows whose positive command version differs
    from the doc's current version are REJECTED (Solr's 409): dropped
    by default, or kept flagged ``_conflict_`` when ``keep_conflicts``
    (the caller's dead-letter path). Command version <= 0 or NULL skips
    the check, as in Solr.

    ``broadcast_cmds`` hints the probe side (an update batch is
    normally tiny next to the corpus); pass False for bulk backfills
    and let AQE pick the join — the hint is NEVER demoted, so an
    unbounded batch must opt out (the blockjoin.children_of pattern).

    Docs without a command pass through unchanged is NOT this
    function's job — it returns only commanded rows (join inner on the
    id), mirroring Solr where each command touches exactly one doc;
    compose with apply_tlog/upsert_docs for the table-level merge.
    Commands for ids absent from ``current`` vanish (Solr rejects
    atomic updates on missing docs)."""
    bad = {f: o for f, o in ops.items() if o not in ATOMIC_OPS}
    if bad:
        raise ValueError(f"unknown atomic ops {bad}; valid: {ATOMIC_OPS}")
    missing = [f for f in ops if f not in current.columns]
    if missing:
        raise ValueError(f"ops name fields absent from current: {missing}")
    check_version = (
        version_col in cmds.columns and version_col in current.columns
    )
    rename = {f: f"__cmd_{f}" for f in ops}
    probe = cmds
    for f, r in rename.items():
        if f not in cmds.columns:
            raise ValueError(f"cmds is missing operand column {f!r}")
        probe = probe.withColumnRenamed(f, r)
    if check_version:
        probe = probe.withColumnRenamed(version_col, "__cmd_v")
    if broadcast_cmds:
        probe = F.broadcast(probe)
    j = current.join(probe, id_col)

    out_cols = []
    for c in current.columns:
        if c == id_col or c not in ops:
            out_cols.append(F.col(c))
            continue
        op, cmd, cur = ops[c], F.col(rename[c]), F.col(c)
        if op == "set":
            expr = F.coalesce(cmd, cur)
        elif op == "inc":
            expr = F.when(
                cmd.isNotNull(), F.coalesce(cur, F.lit(0)) + cmd
            ).otherwise(cur)
        elif op == "add":
            # Solr add APPENDS, duplicates allowed; a null current
            # array takes the operand alone (typed by cmd — no untyped
            # empty-array literal to fight the analyzer over)
            expr = (
                F.when(cmd.isNull(), cur)
                .when(cur.isNull(), cmd)
                .otherwise(F.concat(cur, cmd))
            )
        elif op == "add-distinct":
            expr = (
                F.when(cmd.isNull(), cur)
                .when(cur.isNull(), F.array_distinct(cmd))
                .otherwise(F.array_union(cur, cmd))
            )
        elif op == "remove":
            # removes ALL occurrences of the listed values, keeps
            # duplicates of everything else (array_except would dedup)
            expr = F.when(
                cmd.isNotNull(),
                F.filter(cur, lambda x: ~F.array_contains(cmd, x)),
            ).otherwise(cur)
        else:  # removeregex
            expr = F.when(
                cmd.isNotNull(),
                F.filter(cur, lambda x: ~F.regexp_like(x, cmd)),
            ).otherwise(cur)
        out_cols.append(expr.alias(c))

    if check_version:
        conflict = (
            F.col("__cmd_v").isNotNull()
            & (F.col("__cmd_v") > 0)
            & (F.col("__cmd_v") != F.col(version_col))
        )
        if keep_conflicts:
            # conflicted rows keep their CURRENT field values (the
            # update did not apply), flagged for the dead-letter path
            out_cols = [
                F.when(conflict, F.col(c)).otherwise(e).alias(c)
                if c in ops else e
                for e, c in zip(out_cols, current.columns)
            ]
            return j.select(*out_cols, conflict.alias("_conflict_"))
        j = j.where(~conflict)
    return j.select(*out_cols)
