"""Deduplication operators for web-scale training-data pipelines.

All hot paths are pure built-in Spark SQL expressions (JVM, whole-stage
codegen, no Python). Hashing is the *portable* md5-prefix scheme —
``conv(substr(md5(x),1,15),16,10)`` — which produces bit-identical 60-bit
values in Spark and DuckDB, so every operator here is oracle-checkable.

Scale notes:
  - exact_dedup: one groupBy on a 128-bit content hash; AQE handles skew
    (dup clusters are the skewed keys).
  - MinHash-LSH: signatures are computed per-row (narrow, no shuffle);
    the only shuffle is the band-bucket groupBy, whose fan-in is bounded
    by band width; banding keeps the pair blow-up local to real near-dups.
  - SimHash: one narrow projection per row (bit arithmetic over term
    hashes), then any Hamming-style bucketing downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# --- portable 60-bit hash (identical in Spark and DuckDB) ---


def _phash(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _words(text_col: str):
    return F.split(F.col(text_col), " ")


def _shingles(words_col, n: int):
    """All n-token shingles (space-joined) of an array<string> column."""
    return F.when(
        F.size(words_col) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words_col) - n),
            lambda i: F.concat_ws(" ", F.slice(words_col, i + 1, n)),
        ),
    ).otherwise(F.array())


def exact_dedup(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: (text_md5, keep_doc_id = min id, dup_count)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(
            F.min(id_col).alias("keep_doc_id"),
            F.count("*").alias("dup_count"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_size: int = 3,
) -> DataFrame:
    """MinHash signature per document over token shingles.

    The ``num_hashes`` independent hash functions are 28-bit slices of a few
    md5 digests per shingle (md5(s), md5('x'||s), md5('y'||s)): each 32-hex
    digest yields 4 non-overlapping 7-char slices, so H<=4 costs one digest,
    H<=8 two, H<=12 three — and the scheme stays bit-identical in DuckDB.
    Output: (doc_id, sig_0 .. sig_{H-1}); docs with no shingle get NULL sigs.
    """
    assert num_hashes <= 12, "slice scheme supports up to 12 hashes (3 digests x 4 slices)"
    sh = _shingles(_words(text_col), shingle_size)
    # one pass: per shingle, only the digests this H actually needs
    fields = {"m1": lambda s: F.md5(s)}
    if num_hashes > 4:
        fields["m2"] = lambda s: F.md5(F.concat(F.lit("x"), s))
    if num_hashes > 8:
        fields["m3"] = lambda s: F.md5(F.concat(F.lit("y"), s))
    digests = F.transform(
        sh,
        lambda s: F.struct(*[fn(s).alias(name) for name, fn in fields.items()]),
    )
    base = df.select(F.col(id_col), digests.alias("__hs"))
    def _slicer(field: str, off: int):
        # factory keeps the lambda UNARY (transform passes the index to
        # binary lambdas)
        return lambda h: F.conv(F.substring(h[field], off, 7), 16, 10).cast("long")

    cols = [F.col(id_col)]
    for i in range(num_hashes):
        field = ("m1", "m2", "m3")[i // 4]
        off = 1 + 7 * (i % 4)
        hi = F.array_min(F.transform(F.col("__hs"), _slicer(field, off)))
        cols.append(hi.alias(f"sig_{i}"))
    return base.select(*cols)


def lsh_candidate_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_size: int = 3,
    max_bucket_size: int = 200,
) -> DataFrame:
    """LSH banding: docs sharing any band of the MinHash signature.
    Output: distinct (a_doc_id, b_doc_id), a < b.

    max_bucket_size: buckets larger than this switch from exhaustive
    O(bucket^2) pairing to linear STAR pairing against the bucket's min id
    (see ``bucket_pairs``) — a giant dup cluster still yields one candidate
    edge per member instead of vanishing."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(
        df,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        shingle_size=shingle_size,
    ).where(F.col("sig_0").isNotNull())
    # One pass: explode the per-row band keys (signatures computed once),
    # then bucket-group and emit in-bucket pairs — one shuffle, no
    # self-join, bucket fan-out bounded by real near-dup cluster sizes.
    band_structs = []
    for b in range(bands):
        key = _phash(
            F.concat_ws(
                "_", *[F.col(f"sig_{b * r + j}").cast("string") for j in range(r)]
            )
        )
        band_structs.append(
            F.struct(F.lit(b).alias("band"), key.alias("band_key"))
        )
    band_rows = sigs.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    buckets = (
        band_rows.groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    return (
        bucket_pairs(buckets, max_bucket_size=max_bucket_size)
        .select(F.col("p.a").alias("a_doc_id"), F.col("p.b").alias("b_doc_id"))
        .distinct()
    )


def simhash(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """SimHash over term frequencies: bit_j = sign of sum over terms of
    tf * (+1 if bit j of portable_hash(term) else -1). Output
    (doc_id, simhash bigint)."""
    words = _words(text_col)
    terms = (
        df.select(F.col(id_col), F.explode(words).alias("term"))
        .where(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", _phash(F.col("term")))
    )
    aggs = []
    for j in range(bits):
        bit_on = F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1
        aggs.append(
            F.sum(F.when(bit_on, F.col("tf")).otherwise(-F.col("tf"))).alias(f"s_{j}")
        )
    per_doc = terms.groupBy(id_col).agg(*aggs)
    sim = None
    for j in range(bits):
        term = F.when(F.col(f"s_{j}") > 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else (sim + term)
    return per_doc.select(F.col(id_col), sim.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 3,
    candidate_shingle_size: int = 5,
    threshold: float = 0.2,
    max_bucket_size: int = 200,
) -> DataFrame:
    """n-gram Jaccard near-dup pairs.

    Candidates = docs sharing >=1 ``candidate_shingle_size``-gram (bounded
    blow-up; at scale, buckets of wide 5-grams are tiny; grams shared by
    more than ``max_bucket_size`` docs emit linear star candidates instead
    of quadratic — same policy as LSH banding, see ``bucket_pairs``; false
    candidates are removed by the exact Jaccard rescore below, so the cap
    only bounds work, never correctness). For each candidate pair, Jaccard over the
    distinct ``shingle_size``-gram sets; keep pairs with jaccard >=
    threshold. Output (a_doc_id, b_doc_id, jaccard round 4).
    """
    words = _words(text_col)
    base = df.select(
        F.col(id_col),
        F.array_distinct(_shingles(words, shingle_size)).alias("sh"),
        F.array_distinct(_shingles(words, candidate_shingle_size)).alias("csh"),
    )
    gram_buckets = (
        base.select(F.col(id_col), F.explode("csh").alias("c"))
        .groupBy("c")
        .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    cand = (
        bucket_pairs(gram_buckets, max_bucket_size=max_bucket_size)
        .select(F.col("p.a").alias("a_doc_id"), F.col("p.b").alias("b_doc_id"))
        .distinct()
    )
    left = base.select(F.col(id_col).alias("a_doc_id"), F.col("sh").alias("sh_a"))
    right = base.select(F.col(id_col).alias("b_doc_id"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.join(left, "a_doc_id")
        .join(right, "b_doc_id")
        .withColumn("jaccard", F.round(inter / union, 4))
        .where(F.col("jaccard") >= threshold)
        .select("a_doc_id", "b_doc_id", "jaccard")
    )


def span_dup_stats(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 20,
    stride: int = 1,
) -> DataFrame:
    """Cross-document duplicate-span statistics — the doc-level signal of
    exact substring dedup (a la "Deduplicating Training Data Makes Language
    Models Better": long token spans appearing in more than one document).

    For every document: n_spans = its ``span``-token windows (every
    ``stride``-th position), n_dup_spans = how many of those windows also
    occur in ANOTHER document, dup_span_fraction = ratio (round 4; 0.0 when
    the doc is shorter than ``span``). Filter on the fraction to drop
    documents dominated by boilerplate shared text.

    Scale shape: spans are 60-bit portable hashes (not strings), so the two
    shuffles — gram frequency groupBy and the join back on the gram key —
    move narrow (hash, id) rows; total gram volume is tokens/stride, the
    honest cost of substring-level dedup. ``stride`` > 1 trades detection
    granularity (a duplicated region is still caught, its boundary resolves
    to the stride) for a proportional cost cut.
    """
    words = _words(text_col)
    positions = F.filter(
        F.sequence(F.lit(0), F.size(words) - span), lambda i: i % stride == 0
    )
    grams = F.transform(
        positions, lambda i: _phash(F.concat_ws(" ", F.slice(words, i + 1, span)))
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.size(words) >= span, grams).otherwise(F.array()).alias("grams"),
    )
    exploded = base.select("doc_id", F.explode("grams").alias("g"))
    gram_docs = exploded.groupBy("g").agg(
        F.count_distinct("doc_id").alias("gdf")
    )
    per_doc = (
        exploded.join(gram_docs, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.when(F.col("gdf") >= 2, 1).otherwise(0)).alias("n_dup_spans"),
        )
    )
    return (
        base.select("doc_id").join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.round(
                F.coalesce(
                    F.col("n_dup_spans") / F.nullif(F.col("n_spans"), F.lit(0)),
                    F.lit(0.0),
                ),
                4,
            ).alias("dup_span_fraction"),
        )
    )


def remove_dup_spans(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 20,
) -> DataFrame:
    """Exact-substring dedup REMEDIATION (the removal step span_dup_stats
    only measures): keep the FIRST occurrence of every duplicated
    ``span``-token window corpus-wide, trim every other occurrence out of
    its document ("Deduplicating Training Data Makes Language Models
    Better" exact-substring policy).

    Keep-first determinism rule: occurrences of a window are ordered by
    (doc_id ASC, token position ASC); the minimum is canonical and is
    never trimmed, all later occurrences are. A token is removed iff it is
    covered by at least one non-canonical window occurrence, so a
    duplicated region longer than ``span`` is trimmed as a whole while its
    first corpus appearance survives verbatim.

    Returns (doc_id, n_tokens, n_removed, dup_removed_fraction,
    text_kept) — text_kept is the document with removed tokens spliced
    out (space-joined survivors).

    Scale shape: windows are 60-bit portable hashes, stride 1 (the honest
    cost of exact-substring dedup: one narrow (g, doc, pos) row per
    token). The canonical pick is row_number over (g | doc_id, pos) —
    ONE exchange on the gram hash, no join-back pass over the window
    rows. Per-doc trim state is the sorted dup-start list, merged into disjoint
    intervals JVM-side before the per-token coverage test — coverage cost
    is O(tokens x distinct dup REGIONS), not O(tokens x dup windows)
    (stride-1 duplicate runs collapse into one interval).
    """
    words = _words(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("toks") - span),
        lambda i: _phash(F.concat_ws(" ", F.slice(F.col("toks"), i + 1, span))),
    )
    base = df.select(F.col(id_col).alias("doc_id"), words.alias("toks"))
    wins = base.where(F.size("toks") >= span).select(
        "doc_id", F.posexplode(grams).alias("pos", "g")
    )
    # canonical = rank 1 per gram under (doc_id, pos): ONE exchange on g
    # (a groupBy-min + join-back would shuffle the window rows twice)
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("g").orderBy(F.col("doc_id"), F.col("pos"))
    )
    dups = (
        wins.withColumn("rn", rn).where(F.col("rn") > 1).select("doc_id", "pos")
    )
    starts = dups.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("pos")).alias("starts")
    )

    # merge sorted starts into disjoint [s, e) intervals (e exclusive)
    st = F.coalesce(F.col("starts"), F.array().cast("array<int>"))
    last = F.element_at  # readability below
    iv = F.aggregate(
        st,
        F.array().cast("array<struct<s:int,e:int>>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (s <= last(acc, -1)["e"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        last(acc, -1)["s"].alias("s"),
                        F.greatest(last(acc, -1)["e"], s + span).alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(acc, F.array(F.struct(s.alias("s"), (s + span).alias("e"))))
        ),
    )
    joined = base.join(starts, "doc_id", "left").select("doc_id", "toks", iv.alias("iv"))
    kept = F.filter(
        F.zip_with(
            "toks",
            F.sequence(F.lit(0), F.size("toks") - 1),
            lambda t, i: F.struct(t.alias("t"), i.alias("i")),
        ),
        lambda x: ~F.exists(
            F.col("iv"), lambda v: (v["s"] <= x["i"]) & (x["i"] < v["e"])
        ),
    )
    n = F.size("toks")
    n_removed = (n - F.size(kept)).cast("long")
    # portable round-half-up (floor(x*1e4+0.5)/1e4): engine round()
    # builtins disagree on exact .xxxx5 ties (see ops/textqa.quality_score)
    frac = F.floor(n_removed / n * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)
    return joined.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        n_removed.alias("n_removed"),
        frac.alias("dup_removed_fraction"),
        F.concat_ws(" ", F.transform(kept, lambda x: x["t"])).alias("text_kept"),
    )


def connected_components(
    edges: DataFrame,
    *,
    src: str = "a_doc_id",
    dst: str = "b_doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Distributed connected components: (node, comp) for every node in
    ``edges``, comp = min node id of the component. Deterministic.

    Spark-first iterative shape: min-label propagation along edges plus a
    pointer-jumping hop (comp <- comp[comp]) per round, so convergence is
    O(log diameter) joins instead of O(diameter). Each round localCheckpoints
    to cut lineage growth (the standard hazard of iterative DataFrame
    algorithms), and the driver loop exits on a converged round (zero
    changed labels) — near-dup graphs from LSH banding have tiny diameters
    (star edges from bucket_pairs give <= 2 per bucket), so 2-4 rounds is
    typical even at 1e9 edges.
    """
    und = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # Materialize the symmetrized edge set ONCE: every propagate join and
    # pointer-jump hop below re-reads it, and without this checkpoint each
    # round's join re-derives the full upstream lineage (for dup_clusters
    # that is the entire MinHash/LSH/bucket-pairs pipeline) — the dominant
    # cost of the loop at scale.
    und = und.union(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct().localCheckpoint()
    comp = (
        und.groupBy("u")
        .agg(F.min("v").alias("nmin"))
        .select("u", F.least(F.col("u"), F.col("nmin")).alias("comp"))
        .localCheckpoint()
    )

    # convergence = unchanged label sum: labels only ever DECREASE
    # (least(...) everywhere), so any change strictly lowers the sum — a
    # narrow decimal aggregate per round instead of a join-and-compare.
    def label_sum(df: DataFrame):
        return df.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]

    prev_sum = label_sum(comp)
    for _ in range(max_iter):
        # propagate: comp'(u) = min(comp(u), min over neighbors of comp(v))
        nbr = (
            und.join(
                comp.select(F.col("u").alias("v"), F.col("comp").alias("ncomp")),
                "v",
            )
            .groupBy("u")
            .agg(F.min("ncomp").alias("m"))
        )
        new = comp.join(nbr, "u", "left").select(
            "u",
            F.least(F.col("comp"), F.coalesce(F.col("m"), F.col("comp"))).alias(
                "comp"
            ),
        )
        # pointer jumping: comp''(u) = comp'(comp'(u)) — halves tree height
        hop = new.select(F.col("u").alias("c"), F.col("comp").alias("cc"))
        new = (
            new.join(hop, new["comp"] == hop["c"], "left")
            .select("u", F.least(F.col("comp"), F.coalesce("cc", F.col("comp"))).alias("comp"))
            .localCheckpoint()
        )
        new_sum = label_sum(new)
        comp = new
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return comp.select(F.col("u").alias("node"), F.col("comp").alias("comp"))


def dup_clusters(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_size: int = 3,
    max_bucket_size: int = 200,
) -> DataFrame:
    """End-to-end near-dup clustering: MinHash-LSH candidate pairs ->
    connected components -> (doc_id, cluster_id) for EVERY document
    (singletons cluster with themselves). cluster_id = min doc_id of the
    cluster, so ``doc_id == cluster_id`` selects the canonical keeper — the
    standard keep-one-per-cluster dedup policy of training pipelines."""
    pairs = lsh_candidate_pairs(
        df,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_size=shingle_size,
        max_bucket_size=max_bucket_size,
    )
    comp = connected_components(pairs)
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("comp"), F.col("doc_id")).alias("cluster_id"),
        )
    )


def _pairs(ids_col):
    """All ordered pairs (a<b) from a sorted array column."""
    return F.flatten(
        F.transform(
            ids_col,
            lambda a, i: F.transform(
                F.slice(ids_col, i + 2, F.size(ids_col)),
                lambda b: F.struct(a.alias("a"), b.alias("b")),
            ),
        )
    )


def bucket_pairs(buckets: DataFrame, *, ids_col: str = "ids", max_bucket_size: int) -> DataFrame:
    """Pair explosion for candidate buckets with a bounded-output policy.

    ``buckets`` must carry a sorted-ascending id array column ``ids_col`` with
    >=2 members. Buckets up to ``max_bucket_size`` pair exhaustively
    (quadratic in the bucket — local to real near-dup cluster sizes).
    OVERSIZED buckets are not dropped (a giant dup cluster makes every bucket
    it touches oversized, so dropping them zeroes recall exactly where dups
    concentrate — round-2 ADVICE): they emit STAR pairs against the bucket's
    deterministic representative (min id), output linear in bucket size;
    connected components over the star edges still recover the full cluster.
    Returns one column ``p`` = struct(a, b) with a < b, NOT deduplicated.

    Single-pass: the small/large policies are two branches of ONE row-level
    expression (when/otherwise), not a union of two filters — a union would
    re-execute the upstream bucket aggregation twice.
    """
    ids = F.col(ids_col)
    star = F.transform(
        F.slice(ids, 2, F.size(ids) - 1),
        lambda x: F.struct(F.element_at(ids, 1).alias("a"), x.alias("b")),
    )
    pairs = F.when(F.size(ids) <= max_bucket_size, _pairs(ids)).otherwise(star)
    return buckets.select(F.explode(pairs).alias("p"))
