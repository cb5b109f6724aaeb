"""N-Quads interchange (functions/nquads.py)."""

import duckdb
from pyspark.sql import functions as F

from rdfa_streaming_parser_js_spark.functions.nquads import (
    nquads_lines, parse_nquads_lines, parse_nquads_sql)

S = "http://schema.org/"

COLS = ("url string, subj string, subj_kind string, pred string, "
        "obj_value string, obj_kind string, obj_datatype string, "
        "obj_lang string")


def _kg(spark):
    rows = [
        ("http://g/1", "http://d/1", "iri", f"{S}name",
         'say "hi"\tand\nbye\\now', "literal", None, "en"),
        ("http://g/1", "http://d/1", "iri", f"{S}wordCount", "7",
         "literal", "http://www.w3.org/2001/XMLSchema#integer", None),
        ("http://g/2", "_:b0", "bnode", f"{S}author", "_:b1", "bnode",
         None, None),
        ("http://g/2", "http://d/2", "iri", f"{S}isPartOf",
         "http://src/a", "iri", None, None),
    ]
    return spark.createDataFrame(rows, COLS)


def test_serialize_shapes(spark):
    lines = {r.line for r in nquads_lines(_kg(spark)).collect()}
    assert ('<http://d/1> <http://schema.org/name> '
            '"say \\"hi\\"\\tand\\nbye\\\\now"@en <http://g/1> .'
            in lines)
    assert ('_:b0 <http://schema.org/author> _:b1 <http://g/2> .'
            in lines)
    assert ('<http://d/1> <http://schema.org/wordCount> '
            '"7"^^<http://www.w3.org/2001/XMLSchema#integer> '
            '<http://g/1> .' in lines)


def test_roundtrip_identity(spark):
    kg = _kg(spark)
    back = parse_nquads_lines(nquads_lines(kg))
    got = {(r.graph, r.subj, r.subj_kind, r.pred, r.obj_value,
            r.obj_kind, r.obj_datatype, r.obj_lang, r.graph_kind)
           for r in back.collect()}
    want = {(r.url, r.subj, r.subj_kind, r.pred, r.obj_value,
             r.obj_kind, r.obj_datatype, r.obj_lang, "iri")
            for r in kg.collect()}
    assert got == want


def test_default_graph_and_garbage_lines(spark):
    lines = spark.createDataFrame(
        [("<http://d/1> <http://p> \"v\" .",),
         ("# a comment",), ("",),
         ("<http://d/2> <http://p> <http://o> _:g9 .",)], ["line"])
    got = parse_nquads_lines(lines).collect()
    by_subj = {r.subj: r for r in got}
    assert len(got) == 2
    assert by_subj["http://d/1"].graph is None
    assert by_subj["http://d/1"].graph_kind == "default"
    assert by_subj["http://d/2"].graph == "_:g9"
    assert by_subj["http://d/2"].graph_kind == "bnode"


def test_sql_mirror_matches_spark(spark):
    lines_df = nquads_lines(_kg(spark)).select("line")
    rows = sorted(r.line for r in lines_df.collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE lines(line VARCHAR)")
    con.executemany("INSERT INTO lines VALUES (?)",
                    [(l,) for l in rows])
    frag = parse_nquads_sql("line")
    oracle = con.execute(
        f"SELECT {frag} FROM lines ORDER BY subj, pred, obj_value"
    ).fetchall()
    spark_rows = sorted(
        (tuple(r) for r in parse_nquads_lines(lines_df)
         .select("subj", "subj_kind", "pred", "obj_value", "obj_kind",
                 "obj_datatype", "obj_lang", "graph", "graph_kind")
         .collect()))
    assert [tuple(r) for r in spark_rows] == [tuple(r) for r in oracle]


def test_raw_control_chars_roundtrip(spark):
    """Fuzz-found: ECHAR leaves bytes like 0x01 RAW on the wire, so a
    sentinel-based unescape corrupts literals containing them; the
    sentinel-free split/join unescape must round-trip any byte."""
    nasty = ["\x01", "\x01\x01_:", "a\\\x01b", "<<\\^<\n..^",
             "\\u0001", "tail\\"]
    kg = spark.createDataFrame(
        [("http://g/1", f"http://d/{i}", "iri", "http://p", v,
          "literal", None, None) for i, v in enumerate(nasty)], COLS)
    back = parse_nquads_lines(nquads_lines(kg).select("line"))
    got = {r.obj_value for r in back.collect()}
    assert got == set(nasty)
