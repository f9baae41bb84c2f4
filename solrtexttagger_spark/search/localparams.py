"""Solr local-params syntax and the filter-side QParser family.

Reference surface: Solr's QParser plugin framework. Every ``q``/``fq``
string a Solr client sends may open with local params —
``{!type param=value ...}remainder`` — selecting a query parser and
configuring it; the reference's own handler takes ``fq`` strings this
way (TaggerRequestHandler.java:333-351 builds its doc bitset from
request filter queries via Solr's QParser). This module gives the
engine the same front door: a Solr-syntax string in, a Catalyst
predicate out.

Parsers implemented (the filter-building family):

- ``{!term f=field}value`` — raw single-term filter (TermQParserPlugin)
- ``{!terms f=field}v1,v2,...`` — set membership (TermsQParserPlugin)
- ``{!prefix f=field}pre`` — prefix match (PrefixQParserPlugin)
- ``{!frange l=.. u=.. incl=.. incu=..}func`` — function range
  (FunctionRangeQParserPlugin); ``func`` is a Solr function query,
  translated by :func:`solr_func_to_sql`
- ``{!bool must=.. should=.. must_not=.. filter=..}`` — boolean
  composition of sub-queries (BoolQParserPlugin); keys repeat
- ``{!lucene}`` / no local params — the standard syntax subset below

Standard-syntax subset (LuceneQParser as used in filter queries):
fielded clauses ``field:value``, quoted values, trailing-``*`` /
``?``-wildcards, ranges ``field:[a TO b]`` / ``{a TO b}`` with mixed
brackets and ``*`` open ends, grouping parentheses, ``AND`` / ``OR`` /
``NOT`` / leading ``-``, and ``field:(v1 v2 ...)`` value lists.

Spark-first shape: everything compiles to ONE Catalyst ``Column``
predicate — no UDFs, no driver materialization — so a filter query
pushes into the parquet scan exactly like a hand-written
``df.filter(...)`` (PushedFilters in the explain output). Literals are
cast to the column's type (``F.lit(v).cast(dtype)``) so comparisons
stay type-correct instead of relying on implicit coercion.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

# ---------------------------------------------------------------------------
# local-params scanner:  {!type k=v k2='v 2' v=$ref}remainder
# ---------------------------------------------------------------------------


def parse_local_params(s, refs=None):
    """Split a Solr query string into (qtype, params, remainder).

    ``params`` maps keys to strings; a key given more than once (the
    ``{!bool must=.. must=..}`` idiom) maps to a LIST of strings.
    ``$name`` values resolve through ``refs`` (Solr's parameter
    dereferencing); an unresolvable ref raises. If a ``v`` param is
    present it becomes the remainder (Solr's inline-query form) and any
    text after ``}`` is ignored, matching Solr. A string that does not
    open with ``{!`` returns (None, {}, s) — the caller's default
    parser applies.
    """
    refs = refs or {}
    if not s.startswith("{!"):
        return None, {}, s
    pos = 2
    params: dict = {}

    def _resolve(v: str) -> str:
        if v.startswith("$"):
            name = v[1:]
            if name not in refs:
                raise ValueError(f"unresolved param reference ${name}")
            return str(refs[name])
        return v

    def _put(k: str, v: str) -> None:
        v = _resolve(v)
        if k in params:
            cur = params[k]
            params[k] = (cur if isinstance(cur, list) else [cur]) + [v]
        else:
            params[k] = v

    n = len(s)
    while pos < n and s[pos] != "}":
        if s[pos].isspace():
            pos += 1
            continue
        # key (or bare type shorthand)
        m = re.match(r"[A-Za-z_][\w.\-]*", s[pos:])
        if not m:
            raise ValueError(f"bad local-params at {s[pos:pos + 20]!r}")
        key = m.group(0)
        pos += m.end()
        if pos < n and s[pos] == "=":
            pos += 1
            if pos < n and s[pos] in "'\"":
                quote = s[pos]
                pos += 1
                buf = []
                while pos < n and s[pos] != quote:
                    if s[pos] == "\\" and pos + 1 < n:
                        pos += 1
                    buf.append(s[pos])
                    pos += 1
                if pos >= n:
                    raise ValueError("unterminated quoted local-param value")
                pos += 1  # closing quote
                _put(key, "".join(buf))
            else:
                m = re.match(r"[^\s}]*", s[pos:])
                _put(key, m.group(0))
                pos += m.end()
        else:
            # bare token: the type shorthand {!join ...}
            _put("type", key)
    if pos >= n:
        raise ValueError("unterminated local params (missing '}')")
    rest = s[pos + 1:]
    if "v" in params:
        rest = params.pop("v")
    else:
        rest = rest.lstrip()
    qtype = params.pop("type", None)
    if isinstance(qtype, list):
        raise ValueError("type given more than once in local params")
    return qtype, params, rest


# ---------------------------------------------------------------------------
# Solr function-query dialect -> Spark SQL expression string
# ---------------------------------------------------------------------------

# simple 1:1 renames (Solr name -> Spark SQL function)
_FUNC_RENAME = {
    "ln": "ln", "sqrt": "sqrt", "abs": "abs", "pow": "power",
    "exists": "__exists", "not": "not",
    "ceil": "ceil", "floor": "floor",
}
_VARIADIC = {"sum": " + ", "sub": " - ", "product": " * ", "div": " / "}

_FTOKEN = re.compile(
    r"""\s*(?:
        (?P<num>-?\d+(?:\.\d+)?)
      | (?P<name>[A-Za-z_][\w.]*)
      | (?P<str>"(?:[^"\\]|\\.)*")
      | (?P<punct>[(),])
    )""",
    re.X,
)


def solr_func_to_sql(s: str) -> str:
    """Translate a Solr function-query string to a Spark SQL expression.

    Covers the arithmetic/utility family Solr function queries are
    built from (FunctionQParser sources): ``sum sub product div min max
    log ln sqrt abs pow recip ms if exists not def map field`` plus
    numeric literals and bare field names. Notes on the non-obvious
    ones:

    - ``log`` is base-10 in Solr -> ``log10``
    - ``recip(x, m, a, b)`` -> ``a / (m * x + b)``
    - ``ms(a, b)`` -> millisecond difference of two timestamp
      expressions (``ms(NOW, date)`` needs the caller to substitute a
      literal for NOW — pass ``refs`` at a higher layer or write
      ``current_timestamp()``; determinism-minded pipelines pass a
      pinned literal)
    - ``def(f, d)`` -> ``coalesce``; ``exists(f)`` -> ``isnotnull``
    - ``map(x, min, max, target[, default])`` -> CASE WHEN x in
      [min, max] THEN target ELSE default-or-x END
    - ``field(f)`` -> the bare column

    Unknown function names raise — better a parse-time error than a
    silently different ranking.
    """
    toks = []
    pos = 0
    while pos < len(s):
        m = _FTOKEN.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"bad function-query token at {s[pos:pos+20]!r}")
        pos = m.end()
        toks.append((m.lastgroup, m.group(m.lastgroup)))
    toks.append(("end", ""))
    idx = [0]

    def peek():
        return toks[idx[0]]

    def eat(kind=None, text=None):
        k, t = toks[idx[0]]
        if (kind and k != kind) or (text and t != text):
            raise ValueError(f"expected {text or kind}, got {t!r}")
        idx[0] += 1
        return t

    def expr() -> str:
        k, t = peek()
        if k == "num":
            eat("num")
            return t
        if k == "str":
            eat("str")
            return "'" + t[1:-1].replace("\\\"", "\"").replace("'", "\\'") + "'"
        if k != "name":
            raise ValueError(f"unexpected {t!r} in function query")
        eat("name")
        if peek() != ("punct", "("):
            return f"`{t}`" if not t.replace("_", "").isalnum() else t
        eat("punct", "(")
        args = []
        while peek() != ("punct", ")"):
            args.append(expr())
            if peek() == ("punct", ","):
                eat("punct", ",")
        eat("punct", ")")
        name = t
        if name in _VARIADIC:
            if not args:
                raise ValueError(f"{name}() needs arguments")
            if name == "div" and len(args) != 2:
                raise ValueError("div() takes exactly 2 arguments")
            return "(" + _VARIADIC[name].join(args) + ")"
        if name in ("min", "max"):
            fn = "least" if name == "min" else "greatest"
            return f"{fn}({', '.join(args)})"
        if name == "log":
            (x,) = args
            return f"log10({x})"
        if name == "recip":
            x, m_, a, b = args
            return f"({a} / ({m_} * {x} + {b}))"
        if name == "ms":
            if len(args) == 1:
                return f"(unix_millis(cast({args[0]} as timestamp)))"
            a, b = args
            return (f"(unix_millis(cast({a} as timestamp)) - "
                    f"unix_millis(cast({b} as timestamp)))")
        if name == "if":
            c, tv, fv = args
            return f"(case when {c} then {tv} else {fv} end)"
        if name == "exists":
            (x,) = args
            return f"({x} is not null)"
        if name == "not":
            (x,) = args
            return f"(not ({x}))"
        if name == "def":
            x, d = args
            return f"coalesce({x}, {d})"
        if name == "map":
            if len(args) == 4:
                x, lo, hi, tgt = args
                els = x
            elif len(args) == 5:
                x, lo, hi, tgt, els = args
            else:
                raise ValueError("map() takes 4 or 5 arguments")
            return (f"(case when {x} >= {lo} and {x} <= {hi} "
                    f"then {tgt} else {els} end)")
        if name == "field":
            (x,) = args
            return x
        if name in _FUNC_RENAME:
            fn = _FUNC_RENAME[name]
            if fn == "__exists":
                return f"({args[0]} is not null)"
            return f"{fn}({', '.join(args)})"
        raise ValueError(f"unknown Solr function {name!r}")

    out = expr()
    if peek()[0] != "end":
        raise ValueError(f"trailing input in function query: {peek()[1]!r}")
    return out


# ---------------------------------------------------------------------------
# standard (lucene) filter syntax -> Column
# ---------------------------------------------------------------------------

_QTOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<and>AND\b|&&)
      | (?P<or>OR\b|\|\|)
      | (?P<not>NOT\b)
      | (?P<minus>-)
      | (?P<plus>\+)
      | (?P<range>[\[{][^\]}]*(?:\bTO\b)[^\]}]*[\]}])
      | (?P<quoted>"(?:[^"\\]|\\.)*")
      | (?P<atom>[^\s()":]+)
      | (?P<colon>:)
    )""",
    re.X,
)


def _typed_lit(value: str, dtype: str):
    if value == "*":
        return None
    return F.lit(value).cast(dtype)


def _clause_column(field: str, tok_kind: str, value: str,
                   dtypes: dict) -> Column:
    if field not in dtypes:
        raise ValueError(f"unknown field {field!r}")
    dtype = dtypes[field]
    col = F.col(field)
    if tok_kind == "range":
        inc_lo, inc_hi = value[0] == "[", value[-1] == "]"
        body = value[1:-1]
        m = re.match(r'\s*(".*?"|\S+)\s+TO\s+(".*?"|\S+)\s*$', body)
        if not m:
            raise ValueError(f"bad range {value!r}")
        lo, hi = (v.strip('"') for v in m.groups())
        conds = []
        llo, lhi = _typed_lit(lo, dtype), _typed_lit(hi, dtype)
        if llo is not None:
            conds.append(col >= llo if inc_lo else col > llo)
        if lhi is not None:
            conds.append(col <= lhi if inc_hi else col < lhi)
        if not conds:
            return col.isNotNull()
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out
    if tok_kind == "quoted":
        return col == _typed_lit(value[1:-1].replace('\\"', '"'), dtype)
    # bare atom: wildcard-aware
    if value == "*":
        return col.isNotNull()
    if "*" in value or "?" in value:
        from solrtexttagger_spark.search.boolean import _wildcard_regex
        return col.rlike(_wildcard_regex(value))
    return col == _typed_lit(value, dtype)


def _parse_lucene(s: str, dtypes: dict, q_op: str) -> Column:
    toks = []
    pos = 0
    while pos < len(s):
        m = _QTOKEN.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"bad filter token at {s[pos:pos + 20]!r}")
        pos = m.end()
        toks.append((m.lastgroup, m.group(0).strip()))
    toks.append(("end", ""))
    idx = [0]

    def peek():
        return toks[idx[0]]

    def eat():
        t = toks[idx[0]]
        idx[0] += 1
        return t

    def primary(field: str | None) -> Column:
        kind, text = peek()
        if kind in ("not", "minus"):
            eat()
            return ~primary(field)
        if kind == "plus":
            eat()
            return primary(field)
        if kind == "lparen":
            eat()
            inner = disjunction(field)
            if peek()[0] != "rparen":
                raise ValueError("missing ')'")
            eat()
            return inner
        if kind == "atom" and toks[idx[0] + 1][0] == "colon":
            f = eat()[1]
            eat()  # colon
            vkind, vtext = peek()
            if f == "*" and vkind == "atom" and vtext == "*":
                eat()  # Solr match-all *:*
                return F.lit(True)
            if vkind == "lparen":
                # field:(v1 v2 ...) value list under one field
                eat()
                inner = disjunction(f)
                if peek()[0] != "rparen":
                    raise ValueError("missing ')'")
                eat()
                return inner
            if vkind in ("atom", "quoted", "range"):
                eat()
                return _clause_column(f, vkind, vtext, dtypes)
            raise ValueError(f"bad value after {f}:")
        if kind in ("atom", "quoted", "range"):
            eat()
            if field is None:
                raise ValueError(
                    f"bare value {text!r} without a field (no default field "
                    "in filter queries)")
            return _clause_column(field, kind, text, dtypes)
        raise ValueError(f"unexpected {text!r}")

    def conjunction(field):
        left = primary(field)
        while True:
            kind, _ = peek()
            if kind == "and":
                eat()
                left = left & primary(field)
            elif kind == "not":
                # implicit AND NOT (Lucene "a NOT b")
                eat()
                left = left & ~primary(field)
            elif q_op == "AND" and kind in ("atom", "quoted", "range",
                                            "lparen", "minus", "plus"):
                left = left & primary(field)
            else:
                return left

    def disjunction(field):
        left = conjunction(field)
        while True:
            kind, _ = peek()
            if kind == "or":
                eat()
                left = left | conjunction(field)
            elif q_op == "OR" and kind in ("atom", "quoted", "range",
                                           "lparen", "minus", "plus"):
                left = left | conjunction(field)
            else:
                return left

    out = disjunction(None)
    if peek()[0] != "end":
        raise ValueError(f"trailing filter input: {peek()[1]!r}")
    return out


# ---------------------------------------------------------------------------
# qparser dispatch
# ---------------------------------------------------------------------------


def _as_list(v) -> list:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def solr_fq_column(df: DataFrame, fq: str, *, refs=None,
                   q_op: str = "AND") -> Column:
    """Compile ONE Solr filter-query string to a Catalyst predicate over
    ``df``'s columns. Dispatches on local params; without them the
    standard-syntax subset applies. ``q_op`` is Solr's default operator
    between bare clauses (Solr ships ``OR``; filter-heavy deployments
    set ``AND`` — both supported, default AND for least surprise in
    filters)."""
    refs = refs or {}
    dtypes = dict(df.dtypes)
    qtype, params, rest = parse_local_params(fq, refs)
    if qtype in (None, "lucene", "query"):
        return _parse_lucene(rest, dtypes, q_op)
    if qtype == "term":
        f = params["f"]
        if f not in dtypes:
            raise ValueError(f"unknown field {f!r}")
        return F.col(f) == F.lit(rest).cast(dtypes[f])
    if qtype == "terms":
        f = params["f"]
        if f not in dtypes:
            raise ValueError(f"unknown field {f!r}")
        sep = params.get("separator", ",")
        vals = [F.lit(v).cast(dtypes[f]) for v in rest.split(sep)]
        return F.col(f).isin(*vals)
    if qtype == "prefix":
        f = params["f"]
        if f not in dtypes:
            raise ValueError(f"unknown field {f!r}")
        return F.col(f).startswith(rest)
    if qtype == "frange":
        fx = F.expr(solr_func_to_sql(rest))
        conds = []
        if "l" in params:
            lo = F.lit(float(params["l"]))
            conds.append(fx >= lo if params.get("incl", "true") == "true"
                         else fx > lo)
        if "u" in params:
            hi = F.lit(float(params["u"]))
            conds.append(fx <= hi if params.get("incu", "true") == "true"
                         else fx < hi)
        if not conds:
            raise ValueError("frange needs l= and/or u=")
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out
    if qtype == "bool":
        must = [solr_fq_column(df, q, refs=refs, q_op=q_op)
                for q in _as_list(params.get("must"))]
        filt = [solr_fq_column(df, q, refs=refs, q_op=q_op)
                for q in _as_list(params.get("filter"))]
        mnot = [solr_fq_column(df, q, refs=refs, q_op=q_op)
                for q in _as_list(params.get("must_not"))]
        should = [solr_fq_column(df, q, refs=refs, q_op=q_op)
                  for q in _as_list(params.get("should"))]
        conds = must + filt + [~c for c in mnot]
        # Lucene BooleanQuery: should clauses are REQUIRED (>=1) only
        # when no must/filter clause anchors the query
        if should and not (must or filt):
            acc = should[0]
            for c in should[1:]:
                acc = acc | c
            conds.append(acc)
        if not conds:
            raise ValueError("bool qparser needs at least one clause")
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out
    raise ValueError(f"unknown qparser type {qtype!r} for a filter query "
                     "(routed q-types like {!join} take the full-query "
                     "dispatch, not the fq path)")


def apply_solr_fq(df: DataFrame, fq, *, refs=None,
                  q_op: str = "AND") -> DataFrame:
    """Filter ``df`` by one Solr fq string or a list of them (AND
    semantics across the list, like Solr's repeated fq params). Pure
    Catalyst: each fq is one predicate, so pushdown/pruning apply."""
    fqs = [fq] if isinstance(fq, str) else list(fq)
    for q in fqs:
        df = df.filter(solr_fq_column(df, q, refs=refs, q_op=q_op))
    return df
