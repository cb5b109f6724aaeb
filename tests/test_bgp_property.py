"""Property-based BGP compiler validation: bgp_match (Catalyst join
plans) must agree — in SPARQL bag semantics, multiplicities included —
with a naive nested-loop evaluator over random small graphs and random
basic graph patterns."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from rdfa_streaming_parser_js_spark.operators.bgp import bgp_match

SUBJECTS = ["s0", "s1", "s2", "s3"]
PREDS = ["p0", "p1", "p2"]
OBJECTS = SUBJECTS + ["lit-a", "lit-b"]
VARS = ["?a", "?b", "?c"]


@st.composite
def graph_and_bgp(draw):
    triples = draw(st.lists(
        st.tuples(st.sampled_from(SUBJECTS), st.sampled_from(PREDS),
                  st.sampled_from(OBJECTS)),
        min_size=1, max_size=14))
    n_patterns = draw(st.integers(1, 3))
    patterns = []
    for _ in range(n_patterns):
        s = draw(st.sampled_from(VARS + SUBJECTS))
        p = draw(st.sampled_from(VARS + PREDS))
        o = draw(st.sampled_from(VARS + OBJECTS))
        if not any(t.startswith("?") for t in (s, p, o)):
            s = draw(st.sampled_from(VARS))  # each pattern binds a var
        patterns.append((s, p, o))
    return triples, patterns


def naive_bgp(triples, patterns):
    """Reference evaluator: per-pattern bindings with multiplicity,
    nested-loop natural join — SPARQL §18.3 bag semantics."""
    solutions = [dict()]
    for s, p, o in patterns:
        new = []
        for sol in solutions:
            for ts, tp, to in triples:
                binding = dict(sol)
                ok = True
                for term, val in ((s, ts), (p, tp), (o, to)):
                    if term.startswith("?"):
                        name = term[1:]
                        if name in binding and binding[name] != val:
                            ok = False
                            break
                        binding[name] = val
                    elif term != val:
                        ok = False
                        break
                if ok:
                    new.append(binding)
        solutions = new
    return solutions


@given(graph_and_bgp())
@settings(max_examples=25, deadline=None)
def test_bgp_match_agrees_with_naive_evaluator(spark, case):
    triples, patterns = case
    df = spark.createDataFrame(
        triples, "subj string, pred string, obj_value string")
    got_rows = bgp_match(df, patterns).collect()
    want = naive_bgp(triples, patterns)
    var_names = sorted({t[1:] for pat in patterns for t in pat
                        if t.startswith("?")})
    got = Counter(tuple(getattr(r, v) for v in var_names)
                  for r in got_rows)
    expect = Counter(tuple(sol[v] for v in var_names) for sol in want)
    assert got == expect
