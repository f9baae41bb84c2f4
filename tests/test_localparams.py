"""Solr local-params + filter-side QParser family vs DuckDB mirrors.

Every predicate test filters the documents parquet through
``apply_solr_fq`` and compares the surviving doc_id set against a
hand-written DuckDB WHERE clause over the identical file — the same
engine-vs-oracle discipline the driver gate uses.
"""

import duckdb
import pytest

from solrtexttagger_spark.search.localparams import (
    apply_solr_fq, parse_local_params, solr_fq_column, solr_func_to_sql,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')")
    return con


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def _oracle_ids(con, where):
    return sorted(r[0] for r in con.sql(
        f"SELECT doc_id FROM documents WHERE {where}").fetchall())


class TestParseLocalParams:
    def test_no_local_params(self):
        assert parse_local_params("lang:en") == (None, {}, "lang:en")

    def test_type_shorthand_and_params(self):
        t, p, rest = parse_local_params("{!join from=id to=ref score=max}x:1")
        assert t == "join"
        assert p == {"from": "id", "to": "ref", "score": "max"}
        assert rest == "x:1"

    def test_quoted_values_with_escapes(self):
        t, p, rest = parse_local_params(
            "{!term f=lang v='say \\'hi\\''}ignored trailing")
        assert t == "term" and p == {"f": "lang"}
        assert rest == "say 'hi'"  # v= wins over trailing text

    def test_double_quoted(self):
        _, p, rest = parse_local_params('{!bool must="a:1 AND b:2"}')
        assert p == {"must": "a:1 AND b:2"} and rest == ""

    def test_param_refs(self):
        t, p, rest = parse_local_params(
            "{!frange l=$lo u=$hi}n_chars", refs={"lo": 1, "hi": 9})
        assert (t, p, rest) == ("frange", {"l": "1", "u": "9"}, "n_chars")
        with pytest.raises(ValueError, match=r"unresolved param reference"):
            parse_local_params("{!frange l=$lo}n_chars")

    def test_repeated_keys_become_list(self):
        _, p, _ = parse_local_params("{!bool must=a:1 must=b:2 must_not=c:3}")
        assert p["must"] == ["a:1", "b:2"] and p["must_not"] == "c:3"

    def test_unterminated_raises(self):
        with pytest.raises(ValueError, match="unterminated"):
            parse_local_params("{!term f=lang")
        with pytest.raises(ValueError, match="unterminated"):
            parse_local_params("{!term f='lang")

    def test_bare_type_only(self):
        assert parse_local_params("{!lucene}a:1") == ("lucene", {}, "a:1")


class TestFuncToSql:
    @pytest.mark.parametrize("solr,sql", [
        ("sum(a, b, 2)", "(a + b + 2)"),
        ("sub(a, b)", "(a - b)"),
        ("product(a, b, c)", "(a * b * c)"),
        ("div(a, b)", "(a / b)"),
        ("log(n)", "log10(n)"),
        ("ln(n)", "ln(n)"),
        ("recip(x, 1, 1000, 1000)", "(1000 / (1 * x + 1000))"),
        ("min(a, 5)", "least(a, 5)"),
        ("max(a, 5)", "greatest(a, 5)"),
        ("if(exists(a), a, 0)",
         "(case when (a is not null) then a else 0 end)"),
        ("def(a, 9)", "coalesce(a, 9)"),
        ("map(x, 0, 10, 1, 0)",
         "(case when x >= 0 and x <= 10 then 1 else 0 end)"),
        ("field(popularity)", "popularity"),
        ("pow(x, 2)", "power(x, 2)"),
        ("sqrt(sum(a, 1))", "sqrt((a + 1))"),
    ])
    def test_translations(self, solr, sql):
        assert solr_func_to_sql(solr) == sql

    def test_unknown_function_raises(self):
        with pytest.raises(ValueError, match="unknown Solr function"):
            solr_func_to_sql("strdist(a, b, jw)")

    def test_div_arity(self):
        with pytest.raises(ValueError, match="div"):
            solr_func_to_sql("div(a, b, c)")


class TestLuceneFilterSyntax:
    @pytest.mark.parametrize("fq,where", [
        ("lang:en", "lang = 'en'"),
        ('lang:"en"', "lang = 'en'"),
        ("lang:en AND n_chars:[200 TO 400]",
         "lang = 'en' AND n_chars BETWEEN 200 AND 400"),
        ("n_chars:{200 TO 400}", "n_chars > 200 AND n_chars < 400"),
        ("n_chars:[400 TO *]", "n_chars >= 400"),
        ("n_chars:[* TO 100]", "n_chars <= 100"),
        ("lang:en OR lang:fr", "lang IN ('en', 'fr')"),
        ("-lang:en", "lang <> 'en'"),
        ("NOT lang:en", "lang <> 'en'"),
        ("lang:en NOT source:src1", "lang = 'en' AND source <> 'src1'"),
        ("source:src1*", "source LIKE 'src1%'"),
        ("source:src?", "source ~ '^src.$'"),
        ("(lang:en OR lang:fr) AND n_chars:[300 TO *]",
         "lang IN ('en', 'fr') AND n_chars >= 300"),
        ("lang:en source:src3", "lang = 'en' AND source = 'src3'"),
    ])
    def test_vs_duckdb(self, docs, oracle, fq, where):
        got = _ids(apply_solr_fq(docs, fq))
        assert got == _oracle_ids(oracle, where), fq
        assert got  # non-vacuous: every case must select something

    def test_field_value_list_or(self, docs, oracle):
        got = _ids(apply_solr_fq(docs, "lang:(en fr)", q_op="OR"))
        assert got == _oracle_ids(oracle, "lang IN ('en', 'fr')")

    def test_default_or_operator(self, docs, oracle):
        got = _ids(apply_solr_fq(docs, "lang:en lang:fr", q_op="OR"))
        assert got == _oracle_ids(oracle, "lang IN ('en', 'fr')")

    def test_bare_value_without_field_raises(self, docs):
        with pytest.raises(ValueError, match="bare value"):
            solr_fq_column(docs, "justaword")

    def test_unknown_field_raises(self, docs):
        with pytest.raises(ValueError, match="unknown field"):
            solr_fq_column(docs, "nope:1")


class TestQParsers:
    def test_term(self, docs, oracle):
        got = _ids(apply_solr_fq(docs, "{!term f=lang}en"))
        assert got == _oracle_ids(oracle, "lang = 'en'")

    def test_term_numeric_cast(self, docs, oracle):
        got = _ids(apply_solr_fq(docs, "{!term f=n_chars}300"))
        assert got == _oracle_ids(oracle, "n_chars = 300")

    def test_terms(self, docs, oracle):
        got = _ids(apply_solr_fq(docs, "{!terms f=lang}en,fr,zh"))
        assert got == _oracle_ids(oracle, "lang IN ('en','fr','zh')")

    def test_terms_separator(self, docs, oracle):
        got = _ids(apply_solr_fq(docs, "{!terms f=lang separator=;}en;de"))
        assert got == _oracle_ids(oracle, "lang IN ('en','de')")

    def test_prefix(self, docs, oracle):
        got = _ids(apply_solr_fq(docs, "{!prefix f=source}src1"))
        # src1 src10..src19
        assert got == _oracle_ids(oracle, "source LIKE 'src1%'")

    def test_frange_both_bounds(self, docs, oracle):
        got = _ids(apply_solr_fq(docs, "{!frange l=2 u=2.5}log(n_chars)"))
        assert got == _oracle_ids(
            oracle, "log10(n_chars) >= 2 AND log10(n_chars) <= 2.5")
        assert got

    def test_frange_exclusive(self, docs, oracle):
        got = _ids(apply_solr_fq(
            docs, "{!frange l=100 incl=false}sum(n_chars, 1)"))
        assert got == _oracle_ids(oracle, "n_chars + 1 > 100")

    def test_frange_recip(self, docs, oracle):
        got = _ids(apply_solr_fq(
            docs, "{!frange u=0.8}recip(n_chars, 1, 200, 50)"))
        assert got == _oracle_ids(oracle, "200.0 / (n_chars + 50) <= 0.8")
        assert got

    def test_bool_composition(self, docs, oracle):
        fq = ("{!bool must='lang:en' must_not='{!prefix f=source}src1' "
              "filter='n_chars:[200 TO *]'}")
        got = _ids(apply_solr_fq(docs, fq))
        assert got == _oracle_ids(
            oracle,
            "lang = 'en' AND source NOT LIKE 'src1%' AND n_chars >= 200")
        assert got

    def test_bool_should_required_without_must(self, docs, oracle):
        fq = "{!bool should='lang:en' should='lang:fr'}"
        got = _ids(apply_solr_fq(docs, fq))
        assert got == _oracle_ids(oracle, "lang IN ('en','fr')")

    def test_bool_should_optional_with_must(self, docs, oracle):
        # with a must clause, should no longer constrains the match set
        fq = "{!bool must='n_chars:[300 TO *]' should='lang:en'}"
        got = _ids(apply_solr_fq(docs, fq))
        assert got == _oracle_ids(oracle, "n_chars >= 300")

    def test_param_ref_through_fq(self, docs, oracle):
        got = _ids(apply_solr_fq(docs, "{!term f=lang v=$l}",
                                 refs={"l": "fr"}))
        assert got == _oracle_ids(oracle, "lang = 'fr'")

    def test_fq_list_and_semantics(self, docs, oracle):
        got = _ids(apply_solr_fq(
            docs, ["lang:en", "{!frange l=300}field(n_chars)"]))
        assert got == _oracle_ids(oracle, "lang = 'en' AND n_chars >= 300")

    def test_unknown_qparser_raises(self, docs):
        with pytest.raises(ValueError, match="unknown qparser"):
            solr_fq_column(docs, "{!mystery}x")


class TestPushdown:
    def test_fq_reaches_the_scan(self, spark, sf_dir):
        """The compiled predicate must appear as a pushed filter on the
        parquet scan — the whole point of staying Catalyst-side."""
        df = spark.read.parquet(f"{sf_dir}/documents.parquet")
        plan = apply_solr_fq(
            df, "lang:en AND n_chars:[200 TO 400]"
        )._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan
        # the equality literal itself pushes (range casts may not)
        assert "EqualTo(lang,en)" in plan
