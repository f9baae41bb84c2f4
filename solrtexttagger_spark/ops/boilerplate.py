"""Cross-document boilerplate removal — the C4/CCNet line-dedup filter.

The training-data op the within-doc span tools (ops/dedup.span_dup_stats
/ remove_dup_spans) don't cover: web corpora repeat the SAME line across
thousands of pages (nav menus, cookie banners, license footers), and the
standard fix (C4's "discard any line appearing >= N times in the
corpus"; CCNet dedups on normalized line hashes) is a CORPUS-WIDE
frequency question, not a per-doc one.

Spark shape, two operators:

- :func:`line_stats` — ONE aggregation over the exploded (doc, line)
  relation: per normalized line, how many distinct docs carry it
  (two-phase count_distinct — the exchange carries partial aggregate
  states keyed on the line) and how often it occurs.
- :func:`remove_boilerplate` — rebuild each doc without the lines whose
  doc-frequency reaches ``min_docs``. The frequent-line relation is
  SMALL BY CONSTRUCTION (|corpus lines| / min_docs is its hard upper
  bound — at min_docs=100 over 1e10 lines that is <= 1e8 rows, and real
  boilerplate sets are tiny), so it broadcasts into a line-level anti
  join by default; ``broadcast_frequent=False`` keeps the opt-out for a
  pathological threshold (the blockjoin.children_of discipline — an
  explicit hint is never demoted by AQE, so unbounded builds must be
  able to opt out). Reassembly keeps original line ORDER and the doc's
  non-boilerplate duplicates (posexplode -> anti join -> sort_array by
  position -> concat_ws), all JVM-side.

Normalization (CCNet's): lowercase + whitespace-collapse for the MATCH
key only; removal operates on the RAW line, so output text is original
bytes minus dropped lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _norm(col):
    """CCNet-style match key: lowercase, collapse internal whitespace,
    strip — so 'Cookie  Policy ' and 'cookie policy' dedup together."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def _split_pat(delimiter: str) -> str:
    """F.split takes a Java REGEX while concat_ws re-inserts the
    delimiter LITERALLY — escape it so split/rejoin stay symmetric for
    metachar delimiters ('.', '||', ...)."""
    import re

    return re.escape(delimiter)


def line_stats(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
    min_line_chars: int = 1,
) -> DataFrame:
    """Corpus-wide line frequencies: (line, n_docs, n_occurrences) per
    NORMALIZED line of at least ``min_line_chars`` characters. n_docs
    counts distinct documents (the C4 criterion) via one
    groupBy(line) count_distinct — Spark's two-phase aggregate, whose
    exchange carries per-partition partial states keyed on the line,
    not raw rows; n_occurrences rides the same aggregate. NULL text
    contributes nothing."""
    per_doc = docs.select(
        F.col(id_col),
        F.filter(
            F.transform(
                F.split(F.col(text_col), _split_pat(delimiter)),
                lambda x: _norm(x),
            ),
            lambda x: F.length(x) >= min_line_chars,
        ).alias("__lines"),
    )
    exploded = per_doc.select(
        id_col,
        F.explode("__lines").alias("line"),
    )
    return (
        exploded.groupBy(F.col("line"))
        .agg(
            F.count_distinct(F.col(id_col)).alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
    )


def remove_boilerplate(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
    min_docs: int = 10,
    min_line_chars: int = 1,
    broadcast_frequent: bool = True,
    frequent: DataFrame | None = None,
) -> DataFrame:
    """Drop every line whose normalized form appears in >= ``min_docs``
    distinct documents (C4's boilerplate criterion). Returns the doc
    relation with ``text_col`` REBUILT (original lines, original order,
    boilerplate lines removed — including repeats within one doc) plus
    ``n_lines_removed``. Docs whose every line is boilerplate come back
    with empty text, not dropped — the caller's length filter decides.

    ``frequent`` lets a precomputed/persisted line_stats output (or a
    curated denylist with a ``line`` column) replace the corpus pass —
    the two-job production shape: compute stats once, reuse across
    shards. Lines shorter than ``min_line_chars`` (after normalization)
    are never considered boilerplate (C4 applies its rule to real
    lines, and an empty-string key would dedup blank separators)."""
    if min_docs < 2:
        raise ValueError("min_docs < 2 would remove every line")
    if frequent is None:
        frequent = line_stats(
            docs, id_col=id_col, text_col=text_col, delimiter=delimiter,
            min_line_chars=min_line_chars,
        ).where(F.col("n_docs") >= min_docs)
    freq = frequent.select(F.col("line").alias("__fline")).distinct()
    if broadcast_frequent:
        freq = F.broadcast(freq)

    # explode/rebuild keys on id_col ALONE (an equi-join over metadata
    # columns would drop any doc carrying a NULL there — null-unsafe —
    # and shuffle wider keys for nothing); other columns re-attach
    # from the original relation at the end
    pat = _split_pat(delimiter)
    pos = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), pat)).alias(
            "__pos", "__raw"
        ),
    ).withColumn("__key", _norm(F.col("__raw")))
    kept = pos.join(
        freq,
        (F.col("__key") == F.col("__fline"))
        & (F.length("__key") >= min_line_chars),
        "left_anti",
    )
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.concat_ws(
                delimiter,
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__raw"))
                    ),
                    lambda s: s["__raw"],
                ),
            ).alias("__clean"),
            F.count("*").alias("__n_kept"),
        )
    )
    base = docs.withColumn(
        "__n_total",
        F.coalesce(
            F.size(F.split(F.col(text_col), pat)), F.lit(0)
        ),
    )
    out_cols = [
        # NULL text stays NULL (a doc with no text is not "fully
        # boilerplate"); otherwise the rebuilt text, '' when every
        # line was dropped
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        .otherwise(F.coalesce(F.col("__clean"), F.lit("")))
        .alias(text_col)
        if c == text_col else F.col(c)
        for c in docs.columns
    ]
    return base.join(rebuilt, id_col, "left").select(
        *out_cols,
        (F.col("__n_total") - F.coalesce(F.col("__n_kept"), F.lit(0)))
        .cast("long").alias("n_lines_removed"),
    )
