"""Property-based path-engine validation: path_pairs (branch-normalized
DataFrame plans + semi-naive closures) must agree with a naive set
evaluator on random small graphs and random path expressions."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from rdfa_streaming_parser_js_spark.operators.paths import (
    Alt, Inv, Link, Nps, Opt, Plus, Seq, Star, path_pairs)

NODES = ["n0", "n1", "n2", "n3"]
PREDS = ["p0", "p1", "p2"]


@st.composite
def path_expr(draw, depth=0):
    opts = ["link", "nps", "inv"]
    if depth < 2:
        opts += ["seq", "alt", "plus", "star", "opt"]
    kind = draw(st.sampled_from(opts))
    if kind == "link":
        return Link(draw(st.sampled_from(PREDS)))
    if kind == "nps":
        preds = draw(st.lists(st.sampled_from(PREDS), min_size=1,
                              max_size=2, unique=True))
        return Nps(tuple(preds))
    if kind == "inv":
        return Inv(draw(path_expr(depth + 1)))
    if kind in ("plus", "star", "opt"):
        inner = draw(path_expr(depth + 1))
        return {"plus": Plus, "star": Star, "opt": Opt}[kind](inner)
    parts = tuple(draw(path_expr(depth + 1))
                  for _ in range(draw(st.integers(2, 3))))
    return Seq(parts) if kind == "seq" else Alt(parts)


@st.composite
def graph_and_path(draw):
    triples = draw(st.lists(
        st.tuples(st.sampled_from(NODES), st.sampled_from(PREDS),
                  st.sampled_from(NODES)),
        min_size=1, max_size=10))
    return triples, draw(path_expr())


def _compose(r, s):
    return {(a, c) for a, b in r for b2, c in s if b == b2}


def _closure(r):
    total = set(r)
    while True:
        grown = total | _compose(total, r)
        if grown == total:
            return total
        total = grown


def naive_pairs(triples, path):
    terms = ({s for s, _, _ in triples} | {o for _, _, o in triples})
    def ev(p):
        if isinstance(p, Link):
            return {(s, o) for s, pr, o in triples if pr == p.pred}
        if isinstance(p, Nps):
            return {(s, o) for s, pr, o in triples if pr not in p.preds}
        if isinstance(p, Inv):
            return {(b, a) for a, b in ev(p.inner)}
        if isinstance(p, Seq):
            out = ev(p.parts[0])
            for part in p.parts[1:]:
                out = _compose(out, ev(part))
            return out
        if isinstance(p, Alt):
            out = set()
            for part in p.parts:
                out |= ev(part)
            return out
        if isinstance(p, Plus):
            return _closure(ev(p.inner))
        if isinstance(p, Star):
            return _closure(ev(p.inner)) | {(t, t) for t in terms}
        if isinstance(p, Opt):
            return ev(p.inner) | {(t, t) for t in terms}
        raise TypeError(p)
    return ev(path)


@given(graph_and_path())
@settings(max_examples=15, deadline=None)
def test_path_pairs_agrees_with_naive_evaluator(spark, case):
    triples, path = case
    df = spark.createDataFrame(
        triples, "subj string, pred string, obj_value string")
    got = {(r.a, r.b) for r in path_pairs(df, path).collect()}
    assert got == naive_pairs(triples, path), path
