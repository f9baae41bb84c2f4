"""{!ltr} — Solr's Learning-To-Rank rerank + feature extraction.

Reference surface: the Solr LTR contrib (`rq={!ltr model=m
reRankDocs=N efi.k=v}` + `fl=[features]`): a feature STORE declares
named features (field values, function queries, the original query
score), a MODEL (LinearModel, or MultipleAdditiveTreesModel for GBDT
ensembles) maps the feature vector to a new score, and the reranker
rescores only the top-N of the first pass — the head is REORDERED BY
THE MODEL SCORE ALONE (unlike {!rerank}, which adds a weighted second
signal to the first-pass score). ``[features]`` returns the extracted
vector per doc for offline training.

Spark-first shape: a feature is a Catalyst SQL expression over the doc
columns plus the pseudo-column ``originalScore`` (Solr's
OriginalScoreFeature) and external feature inputs (``efi.*`` — here
plain Python values substituted into the expressions by the caller or
bound via the ``efi`` mapping). Extraction is ONE broadcast page join —
the corpus scan prunes to exactly the referenced columns; a LINEAR
model folds into a single expression (no per-feature jobs), and a tree
ensemble evaluates as a nested CASE expression per tree, summed —
still one whole-stage-codegen projection, no Python in the loop.
Models are plain dicts (the JSON Solr uploads to its model store,
minus the Java class names).

Model dict shapes:
  {"type": "linear", "weights": {feat: w, ...}}
  {"type": "trees",  "trees": [{"weight": w, "root": node}, ...]}
    node = {"feature": f, "threshold": t, "left": node, "right": node}
         | {"value": v}
(MultipleAdditiveTreesModel semantics: go LEFT when feature <=
threshold, Solr's convention.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

ORIGINAL_SCORE = "originalScore"


def _feature_exprs(
    features: dict[str, str], efi: dict | None
) -> dict[str, str]:
    """Substitute ``efi.<name>`` external feature inputs (Solr's
    request-time parameters) as SQL literals. Values are numbers or
    strings (quoted); anything else raises."""
    import re

    if not features:
        raise ValueError("features must name at least one expression")
    out = {}
    for name, expr in features.items():
        s = expr
        # longest name first + word boundary, so efi.l never corrupts
        # efi.lang (plain replace would)
        for k in sorted(efi or {}, key=len, reverse=True):
            v = (efi or {})[k]
            if isinstance(v, bool) or not isinstance(v, (int, float, str)):
                raise ValueError(f"efi.{k} must be a number or string")
            lit = repr(float(v)) if isinstance(v, (int, float)) else (
                "'" + v.replace("'", "''") + "'"
            )
            s = re.sub(rf"efi\.{re.escape(k)}\b", lit.replace("\\", r"\\"), s)
        out[name] = s
    return out


def extract_features(
    page: DataFrame,
    docs_df: DataFrame,
    features: dict[str, str],
    *,
    efi: dict | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """``fl=[features]`` — the per-doc feature vector for a result page:
    returns ``page``'s columns plus one column per feature (its name).
    ``page`` must carry (doc_id, score); ``originalScore`` in a feature
    expression reads the page score. One broadcast join, features
    evaluate Catalyst-side on the joined relation (the offline-training
    extraction path: run it over labeled pages, write parquet, train)."""
    exprs = _feature_exprs(features, efi)
    joined = docs_df.withColumnRenamed(id_col, "doc_id").join(
        F.broadcast(page), "doc_id"
    ).withColumn(ORIGINAL_SCORE, F.col("score"))
    out = joined
    for name, expr in exprs.items():
        out = out.withColumn(name, F.expr(expr).cast("double"))
    return out.select(*page.columns, *exprs.keys())


def _tree_expr(node: dict, feat_col) -> str:
    """One regression tree as a nested CASE expression (SQL string);
    features referenced through the already-materialized columns."""
    if "value" in node:
        return repr(float(node["value"]))
    f, t = node["feature"], float(node["threshold"])
    left = _tree_expr(node["left"], feat_col)
    right = _tree_expr(node["right"], feat_col)
    return (
        f"CASE WHEN coalesce(`{f}`, 0.0D) <= {t!r} "
        f"THEN {left} ELSE {right} END"
    )


def model_score_expr(model: dict, features: dict[str, str]) -> str:
    """The model as ONE SQL expression over the feature COLUMNS (which
    extract_features materializes) — linear fold or summed trees."""
    mtype = model.get("type")
    if mtype == "linear":
        weights = model["weights"]
        unknown = [f for f in weights if f not in features]
        if unknown:
            raise ValueError(f"model weights name unknown features: {unknown}")
        if not weights:
            raise ValueError("linear model needs at least one weight")
        return " + ".join(
            f"({w!r} * coalesce(`{f}`, 0.0D))"
            for f, w in sorted(weights.items())
        )
    if mtype == "trees":
        trees = model.get("trees") or []
        if not trees:
            raise ValueError("trees model needs at least one tree")
        parts = []
        for t in trees:
            w = float(t.get("weight", 1.0))
            parts.append(f"({w!r} * ({_tree_expr(t['root'], None)}))")
        return " + ".join(parts)
    raise ValueError(f"unknown LTR model type {mtype!r}")


def ltr_rerank(
    ranked: DataFrame,
    docs_df: DataFrame,
    model: dict,
    features: dict[str, str],
    *,
    rerank_docs: int = 200,
    efi: dict | None = None,
    id_col: str = "doc_id",
    keep_features: bool = False,
) -> DataFrame:
    """``rq={!ltr model=... reRankDocs=N efi.*=...}``: rescore the
    first-pass top-N with the model and reorder the head BY THE MODEL
    SCORE (Solr LTR replaces the score; {!rerank}'s additive fold is
    functions.rerank_topk). Docs beyond ``rerank_docs`` keep their
    first-pass order and positions, exactly like Solr's reranker.

    ``ranked``: (query_id, rank, doc_id, score). Returns the same shape
    by default. ``keep_features=True`` (the debugging/training-data
    path) returns the RERANKED HEAD ONLY, with one column per feature:
    tail docs have no feature values to carry, so they are dropped
    rather than padded with nulls (r9 ADVICE — the shape change is
    deliberate and documented here). One broadcast page join + one
    window over <= N rows per query; the corpus is never rescanned and
    the model is a single codegen'd projection."""
    head = ranked.where(F.col("rank") <= rerank_docs)
    feats = extract_features(
        head, docs_df, features, efi=efi, id_col=id_col
    )
    scored = feats.withColumn(
        "score",
        F.expr(model_score_expr(model, features)).cast("double"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    scored = scored.withColumn("rank", F.row_number().over(w).cast("long"))
    tail = ranked.where(F.col("rank") > rerank_docs)
    base = ["query_id", "rank", "doc_id", "score"]
    if keep_features:
        return scored.select(*base, *features.keys())
    return scored.select(*base).unionByName(tail.select(*base))
