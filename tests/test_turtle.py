"""Turtle serialization sink (functions/turtle.py): prefix compaction,
'a' shorthand, escaping — Spark vs the DuckDB SQL mirror."""

from __future__ import annotations

import duckdb

from rdfa_streaming_parser_js_spark.functions.turtle import (
    RDF_TYPE, turtle_header, turtle_lines, turtle_lines_sql)

S = "http://schema.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
PFX = {"schema": S, "xsd": XSD, "rdf": RDF}

COLS = ("subj string, subj_kind string, pred string, obj_value string,"
        " obj_kind string, obj_datatype string, obj_lang string")

ROWS = [
    ("http://ex.org/d1", "iri", RDF_TYPE, f"{S}Article", "iri",
     None, None),
    ("http://ex.org/d1", "iri", f"{S}name", 'al"pha\n', "literal",
     None, "en"),
    ("http://ex.org/d1", "iri", f"{S}wordCount", "120", "literal",
     f"{XSD}integer", None),
    ("http://ex.org/d1", "iri", f"{S}author", "_:b0", "bnode",
     None, None),
    ("_:b0", "bnode", f"{S}name", "carol", "literal", None, None),
    # local part with a slash — must NOT compact
    ("http://ex.org/d1", "iri", f"{S}isPartOf", f"{S}a/b", "iri",
     None, None),
    # trailing dot local — must NOT compact
    ("http://ex.org/d1", "iri", f"{S}sameAs", f"{S}v1.", "iri",
     None, None),
]


def _lines(spark):
    df = spark.createDataFrame(ROWS, COLS)
    return sorted(r.line for r in turtle_lines(df, PFX).collect())


def test_turtle_compaction_and_shorthand(spark):
    lines = _lines(spark)
    assert "<http://ex.org/d1> a schema:Article ." in lines
    assert ('<http://ex.org/d1> schema:name "al\\"pha\\n"@en .'
            in lines)
    assert ("<http://ex.org/d1> schema:wordCount "
            '"120"^^xsd:integer .' in lines)
    assert "<http://ex.org/d1> schema:author _:b0 ." in lines
    assert '_:b0 schema:name "carol" .' in lines
    # unsafe locals keep the full IRI form
    assert ("<http://ex.org/d1> schema:isPartOf "
            f"<{S}a/b> ." in lines)
    assert ("<http://ex.org/d1> schema:sameAs "
            f"<{S}v1.> ." in lines)


def test_turtle_header_sorted():
    hdr = turtle_header(PFX)
    assert hdr.splitlines() == [
        f"@prefix rdf: <{RDF}> .",
        f"@prefix schema: <{S}> .",
        f"@prefix xsd: <{XSD}> .",
    ]


def test_turtle_sql_mirror_matches(spark):
    got = _lines(spark)
    con = duckdb.connect()
    vals = ", ".join(
        "(" + ", ".join("NULL" if v is None
                        else "'" + v.replace("'", "''") + "'"
                        for v in row) + ")" for row in ROWS)
    cte = (f"SELECT * FROM (VALUES {vals}) AS t(subj, subj_kind, pred,"
           f" obj_value, obj_kind, obj_datatype, obj_lang)")
    want = sorted(r[0] for r in
                  con.sql(turtle_lines_sql(cte, PFX)).fetchall())
    assert got == want


def test_turtle_roundtrip_identity(spark):
    from pyspark.sql import functions as F

    from rdfa_streaming_parser_js_spark.functions.turtle import (
        parse_turtle_lines)
    df = spark.createDataFrame(ROWS, COLS)
    back = parse_turtle_lines(turtle_lines(df, PFX), PFX)
    want = sorted(tuple(r) for r in df.collect())
    got = sorted(tuple(r) for r in back.select(*df.columns).collect())
    assert got == want
    # non-triple lines (headers, comments, blanks) are dropped
    noise = spark.createDataFrame(
        [(turtle_header(PFX).splitlines()[0],), ("# comment",), ("",)],
        "line string")
    assert parse_turtle_lines(noise, PFX).count() == 0
    # unknown prefixes stay un-expanded only if they match the grammar;
    # a pname with a declared prefix expands, '<>'-form passes through
    one = spark.createDataFrame(
        [("schema:a schema:b schema:c .",)], "line string")
    row = parse_turtle_lines(one, PFX).collect()[0]
    assert row.subj == f"{S}a" and row.pred == f"{S}b"
    assert row.obj_value == f"{S}c" and row.obj_kind == "iri"


def test_turtle_file_roundtrip(spark, tmp_path):
    from rdfa_streaming_parser_js_spark.functions.turtle import (
        read_turtle, write_turtle)
    df = spark.createDataFrame(ROWS, COLS)
    write_turtle(df, PFX, str(tmp_path / "g.ttl"))
    back = read_turtle(spark, str(tmp_path / "g.ttl"))
    want = sorted(tuple(r) for r in df.collect())
    got = sorted(tuple(r) for r in back.select(*df.columns).collect())
    assert got == want


def test_turtle_longest_namespace_wins(spark):
    pfx = {"s": "http://ex.org/", "sv": "http://ex.org/vocab/"}
    df = spark.createDataFrame(
        [("http://ex.org/vocab/x", "iri", "http://ex.org/p",
          "plain", "literal", None, None)], COLS)
    line = turtle_lines(df, pfx).collect()[0].line
    assert line == 'sv:x s:p "plain" .'


def test_turtle_space_iri_roundtrip(spark):
    """IRIs containing spaces (real-web unencoded hrefs) must
    round-trip — the term extraction prefers the bracketed form, so a
    naive space-split cannot shear them (review-found)."""
    rows = [
        ("http://ex.org/a b", "iri", "http://ex.org/p q",
         "http://ex.org/c  d", "iri", None, None),
        ("http://ex.org/a b", "iri", f"{S}name", "x y", "literal",
         "http://ex.org/dt with space", None),
    ]
    from rdfa_streaming_parser_js_spark.functions.turtle import (
        parse_turtle_lines)
    df = spark.createDataFrame(rows, COLS)
    back = parse_turtle_lines(turtle_lines(df, PFX), PFX)
    canon = lambda rs: sorted(  # noqa: E731
        tuple("" if v is None else v for v in r) for r in rs)
    assert canon(back.select(*df.columns).collect()) == canon(rows)


def test_turtle_roundtrip_fuzz(spark):
    """Seeded slice of the 20k-row campaign: random nasty literals
    (quotes/backslashes/control bytes/unicode/grammar-lookalike text),
    IRIs restricted to valid IRI characters (the extractor's
    isValidIri guard upstream), mixed kinds — serialize → parse must
    be the identity."""
    import random

    from rdfa_streaming_parser_js_spark.functions.turtle import (
        parse_turtle_lines)
    rng = random.Random(1234)
    nasty = ['"', "\\", "\n", "\r", "\t", "\x01", "\x7f", "é", "中",
             " ", ".", "@", "^^", "<", ">", "_:", "a ", " .", '\\"',
             "schema:", "@en", "x", "y z"]

    def lit():
        return "".join(rng.choice(nasty)
                       for _ in range(rng.randint(0, 8)))

    def iri():
        frag = "".join(rng.choice("abz09._-~%/#?=&+,;:!*'()")
                       for _ in range(rng.randint(0, 10)))
        return rng.choice([S, XSD, "http://ex.org/ns/", "urn:x:"]) + frag

    rows = []
    for i in range(400):
        sk = rng.choice(["iri", "bnode"])
        subj = iri() if sk == "iri" else f"_:b{i}"
        ok = rng.choice(["iri", "bnode", "literal", "literal"])
        if ok == "literal":
            dt = iri() if rng.random() < 0.4 else None
            lang = None if dt else rng.choice(["en-US", None])
            ov = lit()
        else:
            dt = lang = None
            ov = iri() if ok == "iri" else f"_:o{i}"
        rows.append((subj, sk, RDF_TYPE if i % 10 == 0 else iri(),
                     ov, ok, dt, lang))
    df = spark.createDataFrame(rows, COLS)
    back = parse_turtle_lines(turtle_lines(df, PFX), PFX)
    canon = lambda rs: sorted(  # noqa: E731
        tuple("" if v is None else v for v in r) for r in rs)
    assert canon(back.select(*df.columns).collect()) == \
        canon(df.collect())
