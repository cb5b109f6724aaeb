"""Property tests for the SPARQL text front-end: random path ASTs
serialize to SPARQL 1.1 path syntax and parse back to the identical
AST (round-trip = the grammar's precedence and tokenization are right
for every shape, not just the hand-picked cases)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from rdfa_streaming_parser_js_spark.operators import paths as P
from rdfa_streaming_parser_js_spark.operators.sparql import parse_sparql

IRIS = [f"http://example.org/p{i}" for i in range(4)]


def _leaf():
    return st.one_of(
        st.sampled_from(IRIS).map(P.link),
        st.lists(st.sampled_from(IRIS), min_size=1, max_size=3,
                 unique=True).map(lambda ps: P.nps(*ps)),
    )


def _extend(children):
    return st.one_of(
        children.map(P.inv),
        children.map(P.plus),
        children.map(P.star),
        children.map(P.opt),
        st.lists(children, min_size=2, max_size=3).map(
            lambda ps: P.Seq(tuple(ps))),
        st.lists(children, min_size=2, max_size=3).map(
            lambda ps: P.Alt(tuple(ps))),
    )


path_exprs = st.recursive(_leaf(), _extend, max_leaves=8)


def _render(p) -> str:
    """Serialize a PathExpr to SPARQL path syntax (fully parenthesized
    so the parse must reproduce the exact construction)."""
    if isinstance(p, P.Link):
        return f"<{p.pred}>"
    if isinstance(p, P.Nps):
        return "!(" + "|".join(f"<{x}>" for x in p.preds) + ")"
    if isinstance(p, P.Inv):
        return f"^({_render(p.inner)})"
    if isinstance(p, P.Plus):
        return f"({_render(p.inner)})+"
    if isinstance(p, P.Star):
        return f"({_render(p.inner)})*"
    if isinstance(p, P.Opt):
        return f"({_render(p.inner)})?"
    if isinstance(p, P.Seq):
        return "(" + "/".join(f"({_render(x)})" for x in p.parts) + ")"
    if isinstance(p, P.Alt):
        return "(" + "|".join(f"({_render(x)})" for x in p.parts) + ")"
    raise AssertionError(p)


@settings(max_examples=300, deadline=None)
@given(path_exprs)
def test_path_roundtrip(p):
    text = f"SELECT * WHERE {{ ?s {_render(p)} ?o }}"
    q = parse_sparql(text)
    (_, parsed, _), = q.where.patterns
    if isinstance(p, P.Link):
        # a bare link compiles to the plain-predicate fast path
        assert parsed == p.pred
    else:
        assert parsed == p


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 99), st.integers(0, 99), st.booleans(),
       st.sampled_from(["?a", "?b"]), st.booleans())
def test_modifier_roundtrip(limit, offset, distinct, key, asc):
    text = (
        "SELECT {d}?a ?b WHERE {{ ?a <http://example.org/p0> ?b }} "
        "ORDER BY {o} LIMIT {l} OFFSET {f}"
    ).format(d="DISTINCT " if distinct else "",
             o=key if asc else f"DESC({key})", l=limit, f=offset)
    q = parse_sparql(text)
    assert q.limit == limit and q.offset == offset
    assert q.distinct is distinct
    assert q.order_by == [(key[1:], asc)]


# --------------------------------------------------------------------
# VALUES entries (incl. tagged/typed literal constants) round-trip
# --------------------------------------------------------------------

from rdfa_streaming_parser_js_spark.operators.bgp import Lit  # noqa: E402
from rdfa_streaming_parser_js_spark.operators.sparql import (  # noqa: E402
    parse_update)

_XSD = "http://www.w3.org/2001/XMLSchema#"
_LEX = st.text(alphabet="abxyz09", min_size=1, max_size=6)


def _values_entry():
    return st.one_of(
        st.none(),                                   # UNDEF
        _LEX,                                        # bare lexical
        st.tuples(_LEX, st.sampled_from(["en", "en-GB", "de"])).map(
            lambda t: Lit(t[0], lang=t[1].lower())),
        st.tuples(_LEX, st.sampled_from(
            [f"{_XSD}integer", f"{_XSD}date"])).map(
            lambda t: Lit(t[0], datatype=t[1])),
    )


def _render_entry(v) -> str:
    if v is None:
        return "UNDEF"
    if isinstance(v, Lit):
        if v.lang:
            return f'"{v.lex}"@{v.lang}'
        return f'"{v.lex}"^^<{v.datatype}>'
    return f'"{v}"'


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(_values_entry(), _values_entry()),
                min_size=1, max_size=4))
def test_values_entries_roundtrip(rows):
    block = " ".join(
        "(" + " ".join(_render_entry(v) for v in r) + ")" for r in rows)
    q = parse_sparql(
        "SELECT * WHERE { ?u ?v <http://example.org/o> . "
        f"VALUES (?u ?v) {{ {block} }} }}")
    got = q.where.values
    expect = [{"u": r[0], "v": r[1]} for r in rows]
    assert got == expect
    for r in rows:
        for var, val in zip(("u", "v"), r):
            if isinstance(val, Lit):
                assert var in q.meta_vars


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(_values_entry(), _values_entry()),
                min_size=1, max_size=4))
def test_trailing_values_equals_in_group(rows):
    """The query-final ValuesClause compiles onto the in-group VALUES
    machinery — for any data block the parsed group is identical to
    writing the block inside WHERE (the documented provable-commute
    compilation)."""
    block = " ".join(
        "(" + " ".join(_render_entry(v) for v in r) + ")" for r in rows)
    inner = parse_sparql(
        "SELECT * WHERE { ?u ?v <http://example.org/o> . "
        f"VALUES (?u ?v) {{ {block} }} }}")
    trailing = parse_sparql(
        "SELECT * WHERE { ?u ?v <http://example.org/o> } "
        f"VALUES (?u ?v) {{ {block} }}")
    assert trailing.where.values == inner.where.values
    assert trailing.where.patterns == inner.where.patterns


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from(["opt_a", "opt_b", "bind_req",
                                 "bind_a", "bind_chain"]),
                min_size=1, max_size=5))
def test_bind_routing_property(members):
    """§18.2.2.6 routing invariant: a BIND lands in ``late_binds``
    iff, at its syntax position, its expression references a variable
    introduced by a PRECEDING optional or by an earlier late bind;
    required-pattern-only BINDs stay early.  Relative order within
    each list is syntax order."""
    body = ["?s <http://example.org/p> ?x ."]
    opt_seen = set()
    late_names = set()
    expect_early, expect_late = [], []
    n = 0
    for m in members:
        if m == "opt_a":
            body.append("OPTIONAL { ?s <http://example.org/a> ?a . }")
            opt_seen.add("a")
        elif m == "opt_b":
            body.append("OPTIONAL { ?s <http://example.org/b> ?b . }")
            opt_seen.add("b")
        elif m == "bind_req":
            v = f"v{n}"; n += 1
            body.append(f"BIND(CONCAT(?x, \"!\") AS ?{v})")
            expect_early.append(v)
        elif m == "bind_a":
            v = f"v{n}"; n += 1
            body.append(f"BIND(COALESCE(?a, ?x) AS ?{v})")
            # 'a' may be bound by a preceding optional or not at all;
            # routing keys on what is OPTIONAL-introduced so far
            (expect_late if "a" in opt_seen else expect_early).append(v)
            if "a" in opt_seen:
                late_names.add(v)
        elif m == "bind_chain":
            v = f"v{n}"; n += 1
            ref = sorted(late_names)[0] if late_names else "x"
            body.append(f"BIND(CONCAT(?{ref}, \"?\") AS ?{v})")
            (expect_late if ref in late_names else expect_early).append(v)
            if ref in late_names:
                late_names.add(v)
    q = parse_sparql("SELECT * WHERE { " + " ".join(body) + " }")
    assert [v for v, _ in q.where.binds] == expect_early
    assert [v for v, _ in q.where.late_binds] == expect_late


# --------------------------------------------------------------------
# quad templates (GRAPH wrappers in DELETE/INSERT) round-trip
# --------------------------------------------------------------------

_TERM = st.sampled_from(["?x", "?n", "<http://example.org/s>",
                         "<http://example.org/o>"])
_PRED = st.sampled_from(["<http://example.org/p>",
                         "<http://example.org/q>"])
_GRAPH = st.one_of(st.none(), st.sampled_from(
    ["?g", "<http://example.org/g1>", "<http://example.org/g2>"]))


def _strip(t):
    return t[1:-1] if t.startswith("<") else t


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(_TERM, _PRED, _TERM, _GRAPH),
                min_size=1, max_size=4))
def test_update_quad_template_roundtrip(trips):
    parts = []
    for s, p, o, g in trips:
        body = f"{s} {p} {o} ."
        parts.append(f"GRAPH {g} {{ {body} }}" if g else body)
    text = ("DELETE { " + " ".join(parts)
            + " } WHERE { ?x <http://example.org/p> ?n }")
    u = parse_update(text)
    expect = []
    for s, p, o, g in trips:
        pat = (_strip(s), _strip(p), _strip(o))
        expect.append(pat + (_strip(g),) if g else pat)
    assert u.delete == expect


# --------------------------------------------------------------------
# §18.2 sub-SELECT composed with OPTIONAL/MINUS in one group: the
# compiled Join(LeftJoin(P,O),S) plan must agree — bag semantics,
# multiplicities included — with a naive evaluator of the commuting
# algebra over random small graphs (the guard admits exactly the
# shapes where the two join orders agree, so ONE naive order is the
# full reference).
# --------------------------------------------------------------------

_N = ["n0", "n1", "n2", "n3"]


@st.composite
def _subsel_case(draw):
    triples = draw(st.lists(
        st.tuples(st.sampled_from(_N),
                  st.sampled_from(["p0", "p1", "p2"]),
                  st.sampled_from(_N)),
        min_size=1, max_size=16))
    kind = draw(st.sampled_from(["optional", "minus"]))
    const = draw(st.sampled_from(_N))
    return triples, kind, const


def _naive_subsel(triples, kind, const):
    from collections import Counter
    base = [(s, o) for s, p, o in triples if p == "p0"]
    counts = Counter()
    for s, p, o in triples:
        if p == "p1":
            counts[o] += 1
    rows = []
    for x, y in base:
        if x not in counts:
            continue  # inner join with the sub-SELECT
        n = counts[x]
        if kind == "optional":
            ws = [o for s, p, o in triples if s == x and p == "p2"]
            rows.extend((x, y, n, w) for w in ws or [None])
        else:  # MINUS { ?x <p2> <const> }
            if not any(s == x and o == const
                       for s, p, o in triples if p == "p2"):
                rows.append((x, y, n))
    return Counter(rows)


@settings(max_examples=12, deadline=None)
@given(_subsel_case())
def test_subselect_composition_agrees_with_naive(spark, case):
    from collections import Counter
    from rdfa_streaming_parser_js_spark.operators.sparql import (
        sparql_query)
    triples, kind, const = case
    df = spark.createDataFrame(
        triples or [("zz", "p9", "zz")],
        "subj string, pred string, obj_value string")
    block = ("OPTIONAL { ?x <p2> ?w }" if kind == "optional"
             else f"MINUS {{ ?x <p2> <{const}> }}")
    proj = "?x ?y ?cnt ?w" if kind == "optional" else "?x ?y ?cnt"
    got = sparql_query(df, f"""
        SELECT {proj} WHERE {{
            ?x <p0> ?y .
            {{ SELECT ?x (COUNT(?z) AS ?cnt)
               WHERE {{ ?z <p1> ?x }} GROUP BY ?x }}
            {block}
        }}""")
    assert Counter(tuple(r) for r in got.collect()) == \
        _naive_subsel(triples, kind, const)


# --------------------------------------------------------------------
# §18.3-exact sub-SELECT Join: a sub-SELECT projecting a maybe-unbound
# variable (inner OPTIONAL) shared with the outer patterns must join
# with SPARQL compatibility semantics — an unbound sub row matches any
# outer value and takes it.  Reference: a naive bag evaluator of the
# §18.3 algebra over random small graphs.  Same for the sub-SELECT
# inside an OPTIONAL body (the round-5 nested-group extension).
# --------------------------------------------------------------------


@st.composite
def _compat_sub_case(draw):
    triples = draw(st.lists(
        st.tuples(st.sampled_from(_N),
                  st.sampled_from(["p0", "p1", "p2", "p3"]),
                  st.sampled_from(_N)),
        min_size=1, max_size=18))
    return triples


def _sub_rows(triples):
    """Naive sub-SELECT bag: SELECT ?x ?w WHERE { ?x <p1> ?z
    OPTIONAL { ?x <p2> ?w } } — one row per (p1 edge, p2 edge-or-none)."""
    rows = []
    for s, p, o in triples:
        if p != "p1":
            continue
        ws = [w for s2, p2, w in triples if s2 == s and p2 == "p2"]
        rows.extend((s, w) for w in (ws or [None]))
    return rows


@settings(max_examples=12, deadline=None)
@given(_compat_sub_case())
def test_subselect_maybe_unbound_join_agrees_with_naive(spark, case):
    from collections import Counter
    from rdfa_streaming_parser_js_spark.operators.sparql import (
        sparql_query)
    triples = case
    df = spark.createDataFrame(
        triples, "subj string, pred string, obj_value string")
    got = sparql_query(df, """
        SELECT ?x ?y ?w WHERE {
            ?x <p0> ?y . ?x <p3> ?w .
            { SELECT ?x ?w WHERE {
                ?x <p1> ?z OPTIONAL { ?x <p2> ?w } } }
        }""")
    want = Counter()
    outer = [(s, y) for s, p, y in triples if p == "p0"]
    ws = [(s, w) for s, p, w in triples if p == "p3"]
    subs = _sub_rows(triples)
    for x, y in outer:
        for x2, w in ws:
            if x2 != x:
                continue
            for sx, sw in subs:
                # shared {x, w}: compatible iff equal-or-unbound; the
                # merged solution takes the outer (bound) value
                if sx == x and (sw is None or sw == w):
                    want[(x, y, w)] += 1
    assert Counter(tuple(r) for r in got.collect()) == want


@settings(max_examples=12, deadline=None)
@given(_compat_sub_case())
def test_subselect_inside_optional_agrees_with_naive(spark, case):
    from collections import Counter
    from rdfa_streaming_parser_js_spark.operators.sparql import (
        sparql_query)
    triples = case
    df = spark.createDataFrame(
        triples, "subj string, pred string, obj_value string")
    got = sparql_query(df, """
        SELECT ?x ?y ?v ?w WHERE {
            ?x <p0> ?y .
            OPTIONAL { ?x <p3> ?v .
                       { SELECT ?x ?w WHERE {
                           ?x <p1> ?z OPTIONAL { ?x <p2> ?w } } } }
        }""")
    want = Counter()
    subs = _sub_rows(triples)
    for x, y in [(s, y) for s, p, y in triples if p == "p0"]:
        grp = [(v, sw) for s, p, v in triples if s == x and p == "p3"
               for sx, sw in subs if sx == x]
        if grp:
            for v, sw in grp:
                want[(x, y, v, sw)] += 1
        else:
            want[(x, y, None, None)] += 1
    assert Counter(tuple(r) for r in got.collect()) == want


# ---------------------------------------------------------------------
# zero-arg BNODE(): §17.4.2.9 freshness + deterministic multiset
# ---------------------------------------------------------------------

@given(st.lists(
    st.tuples(st.sampled_from(["s0", "s1", "s2"]),
              st.sampled_from(["p0", "p1"]),
              st.sampled_from(["o0", "o1", "o2"])),
    min_size=1, max_size=12))
@settings(max_examples=10, deadline=None)
def test_bnode_fresh_labels_property(spark, triples):
    """On ANY graph (duplicate triples included): one distinct _:fr
    label per solution row, multiplicity preserved, and the (row,
    label) multiset reproduces exactly on re-evaluation."""
    from collections import Counter
    from rdfa_streaming_parser_js_spark.operators.sparql import (
        sparql_query)
    df = spark.createDataFrame(
        triples, "subj string, pred string, obj_value string")
    q = """SELECT ?s ?o ?b WHERE {
             ?s <p0> ?o . BIND(BNODE() AS ?b)
             FILTER(isBlank(?b)) }"""
    rows = sparql_query(df, q).collect()
    n_expected = sum(1 for _, p, _ in triples if p == "p0")
    assert len(rows) == n_expected
    assert len({r.b for r in rows}) == n_expected
    assert all(r.b.startswith("_:fr") for r in rows)
    # solution multiset (ignoring labels) matches the plain BGP
    assert (Counter((r.s, r.o) for r in rows)
            == Counter((s, o) for s, p, o in triples if p == "p0"))
    # deterministic multiset across a full re-evaluation
    again = Counter((r.s, r.o, r.b)
                    for r in sparql_query(df, q).collect())
    assert again == Counter((r.s, r.o, r.b) for r in rows)
