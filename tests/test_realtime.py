"""Realtime get / tlog commit / atomic updates vs DuckDB mirrors.

The tlog is synthesized DETERMINISTICALLY from the documents table in
both engines (id-modulus slices — the oracle-mirroring discipline every
other suite uses), so Spark and DuckDB resolve the identical update
history with no fixture files:

- doc_id % 7 == 0  -> 'add' rewriting text, version id*10+1
- doc_id % 11 == 0 -> 'delete', version id*10+2 (wins at id % 77)
- doc_id % 13 == 0 -> 'add' of a BRAND-NEW id (1_000_000 + id)
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from solrtexttagger_spark.index import realtime as solr_get_mod
from solrtexttagger_spark.index.realtime import (
    apply_tlog,
    atomic_update,
    realtime_get,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')")
    con.sql("""
        CREATE VIEW tlog AS
        SELECT doc_id, 'add' AS op, doc_id * 10 + 1 AS _version_,
               upper(lang) || ':' || source AS text, lang, source,
               n_chars + 1 AS n_chars
        FROM documents WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id, 'delete', doc_id * 10 + 2,
               NULL, NULL, NULL, NULL
        FROM documents WHERE doc_id % 11 = 0
        UNION ALL
        SELECT 1000000 + doc_id, 'add', doc_id * 10 + 3,
               'new ' || lang, lang, source, n_chars
        FROM documents WHERE doc_id % 13 = 0
    """)
    return con


@pytest.fixture(scope="module")
def tlog(docs):
    adds = docs.where(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.lit("add").alias("op"),
        (F.col("doc_id") * 10 + 1).alias("_version_"),
        F.concat(F.upper("lang"), F.lit(":"), F.col("source"))
        .alias("text"),
        "lang", "source",
        (F.col("n_chars") + 1).alias("n_chars"),
    )
    dels = docs.where(F.col("doc_id") % 11 == 0).select(
        "doc_id", F.lit("delete").alias("op"),
        (F.col("doc_id") * 10 + 2).alias("_version_"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("source"),
        F.lit(None).cast("long").alias("n_chars"),
    )
    news = docs.where(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.lit("add").alias("op"),
        (F.col("doc_id") * 10 + 3).alias("_version_"),
        F.concat(F.lit("new "), F.col("lang")).alias("text"),
        "lang", "source", "n_chars",
    )
    return adds.unionByName(dels).unionByName(news)


# the probed ids: touched (7s, 11s, 77s), untouched, new, and missing
IDS = [0, 7, 11, 14, 21, 22, 33, 77, 154, 3, 5, 19,
       1000000, 1000013, 1000026, 999999999]

RESOLVE_SQL = """
WITH latest AS (
    SELECT doc_id, arg_max(op, _version_) AS op,
           max(_version_) AS _version_,
           arg_max(text, _version_) AS text,
           arg_max(lang, _version_) AS lang,
           arg_max(source, _version_) AS source,
           arg_max(n_chars, _version_) AS n_chars
    FROM tlog GROUP BY doc_id
)
SELECT doc_id, _version_, text, lang, source, n_chars
FROM latest WHERE op = 'add'
UNION ALL
SELECT d.doc_id, 0 AS _version_, d.text, d.lang, d.source, d.n_chars
FROM documents d WHERE d.doc_id NOT IN (SELECT doc_id FROM latest)
"""


class TestRealtimeGet:
    def test_matches_oracle(self, docs, tlog, oracle):
        got = sorted(
            tuple(r) for r in realtime_get(docs, tlog, IDS)
            .select("doc_id", "_version_", "text", "lang", "source",
                    "n_chars").collect()
        )
        ph = ", ".join(str(i) for i in IDS)
        exp = sorted(oracle.sql(
            f"SELECT * FROM ({RESOLVE_SQL}) WHERE doc_id IN ({ph})"
        ).fetchall())
        assert got == exp
        # sanity on the probe mix: updated, deleted, untouched, new
        by_id = {r[0]: r for r in got}
        assert by_id[7][1] == 71 and by_id[7][2].endswith(":" + by_id[7][4])
        assert 11 not in by_id and 77 not in by_id  # deletes win
        assert by_id[3][1] == 0                      # straight from base
        assert 1000013 in by_id and 999999999 not in by_id

    def test_no_tlog_serves_base(self, docs):
        got = realtime_get(docs, None, [3, 5]).collect()
        assert sorted(r["doc_id"] for r in got) == [3, 5]
        assert all(r["_version_"] == 0 for r in got)

    def test_empty_ids_raise(self, docs, tlog):
        with pytest.raises(ValueError, match="id list"):
            realtime_get(docs, tlog, [])

    def test_probe_filter_pushed_to_scan(self, docs):
        """The /get promise: both scans prune on the literal id set —
        In(doc_id, ...) reaches the parquet reader, so cost tracks
        len(ids), not corpus size."""
        plan = (
            realtime_get(docs, None, [3, 5, 7])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PushedFilters: [In(doc_id" in plan, plan


class TestApplyTlog:
    def test_commit_matches_oracle(self, docs, tlog, oracle):
        got = sorted(
            tuple(r) for r in apply_tlog(docs, tlog)
            .select("doc_id", "text", "lang", "source", "n_chars")
            .collect()
        )
        exp = sorted(oracle.sql(
            f"SELECT doc_id, text, lang, source, n_chars "
            f"FROM ({RESOLVE_SQL})"
        ).fetchall())
        assert got == exp

    def test_get_after_commit_equals_get_before(self, docs, tlog):
        """The RTG invariant Solr documents: /get sees the same doc
        state before and after the commit that folds the tlog in."""
        before = sorted(
            tuple(r) for r in realtime_get(docs, tlog, IDS)
            .drop("_version_").collect()
        )
        committed = apply_tlog(docs, tlog)
        after = sorted(
            tuple(r) for r in realtime_get(committed, None, IDS)
            .drop("_version_").collect()
        )
        assert before == after


@pytest.fixture(scope="module")
def current(docs):
    """documents dressed with an array field, a counter, and versions —
    the atomic-update playground."""
    return docs.select(
        "doc_id",
        "lang",
        F.split(F.concat("lang", F.lit("-"), "source"), "-")
        .alias("tags"),
        F.col("n_chars").alias("views"),
        (F.col("doc_id") + 100).alias("_version_"),
    )


CURRENT_SQL = """
SELECT doc_id, lang, str_split(lang || '-' || source, '-') AS tags,
       n_chars AS views, doc_id + 100 AS _version_
FROM documents
"""


class TestAtomicUpdate:
    def test_set_inc_matches_oracle(self, spark, current, oracle):
        cmds = current.where(F.col("doc_id") % 5 == 0).select(
            "doc_id",
            F.when(F.col("doc_id") % 10 == 0, F.lit("xx"))
            .alias("lang"),                      # null on half: no-op
            F.lit(7).cast("long").alias("views"),
        )
        got = sorted(
            tuple(r) for r in atomic_update(
                current, cmds, {"lang": "set", "views": "inc"}
            ).select("doc_id", "lang", "views").collect()
        )
        exp = sorted(oracle.sql(f"""
            SELECT doc_id,
                   CASE WHEN doc_id % 10 = 0 THEN 'xx' ELSE lang END,
                   views + 7
            FROM ({CURRENT_SQL}) WHERE doc_id % 5 = 0
        """).fetchall())
        assert got == exp

    def test_array_ops_match_oracle(self, current, oracle):
        cmds = current.where(F.col("doc_id") % 3 == 0).select(
            "doc_id",
            F.array(F.lit("extra"), F.col("lang")).alias("tags"),
        )
        got = sorted(
            (r["doc_id"], tuple(r["tags"]))
            for r in atomic_update(current, cmds, {"tags": "add"})
            .collect()
        )
        exp = sorted(
            (r[0], tuple(r[1]))
            for r in oracle.sql(f"""
                SELECT doc_id, list_concat(tags, ['extra', lang])
                FROM ({CURRENT_SQL}) WHERE doc_id % 3 = 0
            """).fetchall()
        )
        assert got == exp

    def test_add_distinct_and_remove(self, current, oracle):
        cmds = current.where(F.col("doc_id") % 4 == 0).select(
            "doc_id",
            F.array(F.col("lang"), F.lit("zz")).alias("tags"),
            F.array(F.col("lang")).alias("drop_tags"),
        )
        upd = atomic_update(
            current.withColumn("drop_tags", F.col("tags")),
            cmds, {"tags": "add-distinct", "drop_tags": "remove"},
        )
        got = sorted(
            (r["doc_id"], tuple(sorted(r["tags"])),
             tuple(r["drop_tags"]))
            for r in upd.collect()
        )
        exp = sorted(
            (r[0], tuple(sorted(r[1])), tuple(r[2]))
            for r in oracle.sql(f"""
                SELECT doc_id,
                       list_distinct(list_concat(tags, [lang, 'zz'])),
                       list_filter(tags, x -> x != lang)
                FROM ({CURRENT_SQL}) WHERE doc_id % 4 = 0
            """).fetchall()
        )
        assert got == exp

    def test_removeregex(self, current, oracle):
        cmds = current.where(F.col("doc_id") % 6 == 0).select(
            "doc_id", F.lit("^w").alias("tags"),
        )
        got = sorted(
            (r["doc_id"], tuple(r["tags"]))
            for r in atomic_update(
                current, cmds, {"tags": "removeregex"}
            ).collect()
        )
        exp = sorted(
            (r[0], tuple(r[1]))
            for r in oracle.sql(f"""
                SELECT doc_id,
                       list_filter(tags, x -> NOT regexp_matches(x, '^w'))
                FROM ({CURRENT_SQL}) WHERE doc_id % 6 = 0
            """).fetchall()
        )
        assert got == exp

    def test_version_conflict_drops_or_flags(self, current):
        cmds = current.where(F.col("doc_id") < 20).select(
            "doc_id",
            F.lit("yy").alias("lang"),
            # even ids carry the RIGHT version, odd ids a stale one
            F.when(F.col("doc_id") % 2 == 0, F.col("doc_id") + 100)
            .otherwise(F.lit(1)).alias("_version_"),
        )
        upd = atomic_update(current, cmds, {"lang": "set"})
        ids = sorted(r["doc_id"] for r in upd.collect())
        assert ids == [i for i in range(0, 20, 2)]

        flagged = atomic_update(
            current, cmds, {"lang": "set"}, keep_conflicts=True
        ).collect()
        assert sorted(r["doc_id"] for r in flagged) == list(range(20))
        for r in flagged:
            if r["_conflict_"]:
                assert r["doc_id"] % 2 == 1 and r["lang"] != "yy"
            else:
                assert r["lang"] == "yy"

    def test_zero_version_skips_check(self, current):
        cmds = current.where(F.col("doc_id") < 6).select(
            "doc_id", F.lit("yy").alias("lang"),
            F.lit(0).cast("long").alias("_version_"),
        )
        upd = atomic_update(current, cmds, {"lang": "set"})
        assert sorted(r["doc_id"] for r in upd.collect()) == list(range(6))

    def test_missing_doc_commands_vanish(self, current):
        cmds = current.sparkSession.createDataFrame(
            [(999999999, "yy")], "doc_id long, lang string"
        )
        assert atomic_update(current, cmds, {"lang": "set"}).count() == 0

    def test_bad_op_raises(self, current, spark):
        cmds = spark.createDataFrame([(1, "x")], "doc_id long, lang string")
        with pytest.raises(ValueError, match="unknown atomic ops"):
            atomic_update(current, cmds, {"lang": "frobnicate"})

    def test_missing_field_raises(self, current, spark):
        cmds = spark.createDataFrame([(1, "x")], "doc_id long, nope string")
        with pytest.raises(ValueError, match="absent"):
            atomic_update(current, cmds, {"nope": "set"})

    def test_missing_operand_column_raises(self, current, spark):
        cmds = spark.createDataFrame([(1,)], "doc_id long")
        with pytest.raises(ValueError, match="operand"):
            atomic_update(current, cmds, {"lang": "set"})

    def test_broadcast_opt_out(self, current, spark):
        """broadcast_cmds=False must leave NO BroadcastExchange from
        the hint (AQE may still pick one on its own at this size — the
        pin is on the LOGICAL plan carrying no ResolvedHint)."""
        cmds = current.where(F.col("doc_id") < 5).select(
            "doc_id", F.lit("yy").alias("lang"))
        upd = atomic_update(
            current, cmds, {"lang": "set"}, broadcast_cmds=False
        )
        logical = upd._jdf.queryExecution().optimizedPlan().toString()
        assert "ResolvedHint" not in logical
        hinted = atomic_update(current, cmds, {"lang": "set"})
        assert upd.count() == hinted.count() == 5


class TestSolrGet:
    def test_param_dict_matches_realtime_get(self, docs, tlog):
        got = sorted(
            tuple(r) for r in solr_get_mod.solr_get(
                docs, tlog, {"ids": "0, 7, 11, 3"}
            ).collect()
        )
        exp = sorted(
            tuple(r) for r in solr_get_mod.realtime_get(
                docs, tlog, [0, 7, 11, 3]
            ).collect()
        )
        assert got == exp

    def test_fl_projection(self, docs, tlog):
        out = solr_get_mod.solr_get(
            docs, tlog, {"ids": "3,7", "fl": "lang,n_chars"})
        assert out.columns == ["doc_id", "lang", "n_chars"]
        assert out.count() == 2

    def test_single_id_and_errors(self, docs, tlog):
        assert solr_get_mod.solr_get(
            docs, tlog, {"id": "3"}).count() == 1
        with pytest.raises(ValueError, match="ids"):
            solr_get_mod.solr_get(docs, tlog, {})
        with pytest.raises(ValueError, match="unknown fields"):
            solr_get_mod.solr_get(
                docs, tlog, {"ids": "3", "fl": "nope"})


class TestAtomicUpdateTlog:
    def test_solr_update_chain_composes(self, docs, tlog):
        """Two back-to-back atomic batches, each appended to the tlog:
        the second sees the first through the log (Solr's
        DistributedUpdateProcessor flow), and /get reflects both."""
        from solrtexttagger_spark.index.realtime import (
            atomic_update_tlog, realtime_get,
        )

        cmds1 = docs.where(F.col("doc_id").isin([3, 7])).select(
            "doc_id", F.lit(100).cast("long").alias("n_chars"))
        add1 = atomic_update_tlog(
            docs, tlog, cmds1, {"n_chars": "inc"}, new_version=10_000)
        log1 = tlog.unionByName(add1)

        cmds2 = docs.where(F.col("doc_id").isin([3, 7])).select(
            "doc_id", F.lit(1).cast("long").alias("n_chars"))
        add2 = atomic_update_tlog(
            docs, log1, cmds2, {"n_chars": "inc"}, new_version=10_001)
        log2 = log1.unionByName(add2)

        got = {
            r["doc_id"]: (r["n_chars"], r["_version_"])
            for r in realtime_get(docs, log2, [3, 7]).collect()
        }
        base = {
            r["doc_id"]: r["n_chars"]
            for r in docs.where(F.col("doc_id").isin([3, 7])).collect()
        }
        # doc 3 is untouched by the %7 adds: base + 100 + 1
        assert got[3] == (base[3] + 101, 10_001)
        # doc 7 was rewritten by the tlog add (n_chars + 1) first
        assert got[7] == (base[7] + 1 + 101, 10_001)

    def test_minted_version_defaults_to_max_plus_one(self, docs, tlog):
        from solrtexttagger_spark.index.realtime import atomic_update_tlog

        cmds = docs.where(F.col("doc_id") == 3).select(
            "doc_id", F.lit(5).cast("long").alias("n_chars"))
        add = atomic_update_tlog(docs, tlog, cmds, {"n_chars": "inc"})
        vmax = tlog.agg(F.max("_version_")).collect()[0][0]
        assert add.collect()[0]["_version_"] == vmax + 1
