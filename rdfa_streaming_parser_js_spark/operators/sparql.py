"""SPARQL query-text front-end: parse a SPARQL 1.1 subset and compile
it onto the engine's BGP/path algebra.

The reference parser (rubensworks/rdfa-streaming-parser.js) feeds its
quad stream into RDF/JS stores that consumers then query with SPARQL
(its README pipes into ``rdf-store-stream``; /root/reference/README.md:
37-57).  ``operators/bgp.py`` and ``operators/paths.py`` already give
that query layer Spark-native semantics; this module closes the last
usability gap by accepting the *query text itself*, so a user of the
reference stack can bring their SPARQL strings as-is:

    >>> sparql_query(triples, '''
    ...     PREFIX schema: <http://schema.org/>
    ...     SELECT DISTINCT ?doc ?name WHERE {
    ...         ?doc a schema:Article ; schema:name ?name .
    ...         FILTER(STRLEN(?name) > 3)
    ...     } ORDER BY ?doc LIMIT 10''')

Everything compiles to the existing operators — the parser adds ZERO
execution code, so every scale property of the algebra (predicate
pushdown per pattern, equi-joins on shared variables, frontier-seeded
closures, anti-join MINUS) carries over unchanged.

Supported grammar (SPARQL 1.1 subset, keywords case-insensitive):

- ``PREFIX`` / ``BASE`` prologue; ``a`` for rdf:type.
- ``SELECT [DISTINCT|REDUCED] (?v... | * | (expr AS ?v)...)``,
  ``ASK``, ``CONSTRUCT { template } WHERE``, and ``DESCRIBE`` (IRIs
  and/or variables bound by an optional WHERE clause; Concise Bounded
  Description via :func:`operators.bgp.describe`).
- Triples blocks with ``;`` predicate and ``,`` object lists; the
  predicate position takes an IRI, a ``?variable``, or a property
  path.
- Property paths in the predicate position: ``^`` inverse, ``/``
  sequence, ``|`` alternative, ``+`` ``*`` ``?`` closures,
  ``!(p1|^p2|...)`` negated property sets, parentheses.
- ``FILTER`` (expression or ``[NOT] EXISTS {...}``), ``OPTIONAL``,
  ``MINUS``, ``BIND (expr AS ?v)``, ``VALUES`` (in-group, and the
  query-final trailing ValuesClause — the parameterized-query idiom —
  compiled onto the in-group machinery when every VALUES variable is
  bound by the required patterns of each UNION branch, the condition
  under which the §18.2 outer join provably commutes inward; grouped
  queries and unbound-variable constraints raise), ``{...} UNION
  {...}`` as the entire group body, and mid-group ``{ SELECT ... }``
  sub-queries (§18.2) joined into the group on their shared
  variables — at the top level AND inside OPTIONAL / MINUS / EXISTS
  bodies (compiled as lazy GroupSpec relations; a body may even be a
  sub-SELECT alone, ``OPTIONAL { { SELECT ... } }``).  The join is
  §18.3-exact: a shared variable that is maybe-unbound on either
  side (an OPTIONAL/BIND projection of the sub-query, or an
  OPTIONAL/BIND/VALUES variable of the group) routes through the
  bound-mask compatibility machinery instead of a plain equi join.
  ``BIND`` / ``VALUES`` also work INSIDE an OPTIONAL /
  MINUS / EXISTS group (applied after the group's patterns, before
  its filters).  A BIND whose expression references a variable
  introduced by a PRECEDING OPTIONAL (or by such a bind) applies
  after the left joins, per §18.2.2.6 syntax order — the ``OPTIONAL
  {...} BIND(COALESCE(?x, "default") AS ?y)`` idiom works at the top
  level and inside nested groups; a BIND referencing a variable that
  only a LATER-written OPTIONAL binds keeps the engine's
  patterns-then-binds order and fails analysis rather than silently
  reading the later binding — write the OPTIONAL first.  Those groups
  NEST: ``OPTIONAL { P1 OPTIONAL
  { P2 } }``, ``OPTIONAL { {A} UNION {B} }``, ``MINUS { P FILTER
  NOT EXISTS {...} }`` — any depth, evaluated bottom-up (§18.5).
- Language-tagged and datatyped literal CONSTANTS in pattern object
  position (``?s schema:name "chat"@fr`` / ``?s schema:wordCount
  "5"^^xsd:integer``): exact SPARQL term equality — lexical form AND
  kind/language/datatype — compiled as pushed metadata-column scan
  filters (``bgp.Lit``).  Requires the full term schema.
- Term constructors as the entire BIND expression: ``BIND(IRI(expr)
  AS ?v)`` (scheme-less values resolve against ``BASE`` by
  concatenation), ``BIND(STRDT(expr, <dt>) AS ?v)``,
  ``BIND(STRLANG(expr, "tag") AS ?v)``, ``BIND(BNODE(expr) AS ?v)``
  (deterministic skolem-style labels — see deviations) — the
  constructed term's metadata is minted as companion columns, so
  LANG / DATATYPE / isIRI / isBlank / SAMETERM and metadata-faithful
  templates see it.
- ``GRAPH ?g {...}`` / ``GRAPH <iri> {...}`` (§13) over a QUADS table
  (a ``graph`` column, e.g. extraction output with ``url`` aliased to
  ``graph``): the graph term becomes a 4th match position on each
  contained pattern — a constant graph is a pushed scan filter, a
  shared ``?g`` an equi-join.  Patterns outside GRAPH match across all
  graphs (union default graph) with the table's own multiplicity.
  GRAPH blocks hold triple patterns, property paths, plain FILTERs,
  and NESTED GRAPH blocks (§13.3 — the inner block re-scopes its own
  patterns to its graph term; an outer GRAPH variable left with
  NOTHING to scope — every contained pattern re-scoped by a nested
  block — ranges over every graph name per the algebra, compiled as a
  broadcast join with the distinct graph-name dimension; top-level
  WHERE only).  A path under a VARIABLE graph evaluates once over
  graph-prefixed node ids (paths cannot cross graphs, so the prefix
  partitions the closure per graph) and binds the variable from the
  prefix.
- Solution modifiers: ``GROUP BY`` + aggregates (COUNT / SUM / MIN /
  MAX / AVG / SAMPLE / GROUP_CONCAT), ``HAVING`` (one or more
  conditions; each may reference a SELECT aggregate alias OR contain
  aggregate calls directly — the latter compile as hidden aggregate
  columns inside the same grouping), ``ORDER BY [ASC|DESC]``,
  ``LIMIT`` / ``OFFSET``.  ``GROUP BY`` / ``HAVING`` also work on
  CONSTRUCT (§16.2 + §11: grouping acts on the solution sequence
  before template instantiation — every template variable must be a
  group key since templates cannot project aggregates; a grouped
  key's term-metadata companions are carried as one co-observed
  struct so a copied literal stays the same literal).

- SPARQL 1.1 Update, one operation per call (:func:`sparql_update` —
  returns the NEW graph, nothing mutates): ``INSERT DATA`` / ``DELETE
  DATA`` (ground triples; typed/tagged literal constants accepted),
  ``DELETE WHERE``, and ``DELETE {} INSERT {} WHERE {}`` — compiled
  onto :mod:`operators.update` (lexical-identity deletes,
  metadata-preserving inserts, set-semantics result).  All four forms
  are QUADS-aware: ``GRAPH <g> { ... }`` wrappers in DATA blocks
  (§3.1.1 QuadData, ground graph IRIs only) and ``GRAPH ?g/<iri>
  { ... }`` wrappers in DELETE/INSERT templates (§3.1.3 QuadPattern)
  scope their triples to a named graph over a quads table — bare
  triples target the default graph (NULL); plus the §3.2
  graph-management operations over a QUADS table — ``CLEAR`` / ``DROP``
  (``GRAPH <g>`` / ``DEFAULT`` / ``NAMED`` / ``ALL``), ``ADD`` /
  ``MOVE`` / ``COPY`` (``TO``-pairs of graph-or-DEFAULT), and
  ``CREATE`` (identity — a quads table records no empty graphs);
  ``SILENT`` accepted and ignored.
- Term-introspection builtins — ``LANG``, ``DATATYPE``, ``isIRI`` /
  ``isURI``, ``isBlank``, ``isLiteral``, ``isNumeric``, ``SAMETERM``
  (variable arguments), plus ``LANGMATCHES`` — compiled onto
  term-metadata companion columns (``bgp_match(meta_vars=...)``);
  requires the full term schema (``obj_kind`` / ``obj_lang`` /
  ``obj_datatype``) when the variable binds in object position.
- Scalar builtins over the lexical form: the string family (``STR``,
  ``STRLEN``, ``UCASE``/``LCASE``, ``CONTAINS``, ``STRSTARTS`` /
  ``STRENDS``, ``STRBEFORE`` / ``STRAFTER``, ``SUBSTR``, ``CONCAT``,
  ``REPLACE``, ``REGEX``, ``ENCODE_FOR_URI``), numerics (``ABS`` /
  ``CEIL`` / ``FLOOR`` / ``ROUND``), hashes (``MD5`` / ``SHA1`` /
  ``SHA256`` / ``SHA384`` / ``SHA512``), conditionals (``BOUND``,
  ``COALESCE``, ``IF``, ``IN`` / ``NOT IN``), and the datetime
  accessors (``YEAR`` … ``SECONDS``, ``TZ``) — the last computed
  lexically on the xsd:dateTime string so components stay in the
  literal's own timezone.

Documented deviations (each raises or is noted, never silent):

- Term-introspection builtins take a plain variable or a
  ``COALESCE(?a, ?b, ...)`` of plain variables (§17.4.1.5: the result
  is the first BOUND argument's term, compiled as a dispatch-on-
  boundness CASE onto each variable's own metadata companions —
  ``LANG(COALESCE(?n, ?alt))`` over OPTIONAL-bound variables works);
  any other nested argument raises.  Each variable must be bound by a
  plain triple pattern in scope (property-path endpoints carry no
  metadata) or by a constructor BIND.
- Plain STRING constants in patterns match the LEXICAL value (the
  engine-wide identity documented on bgp_match) — only tagged/typed
  constants get strict term equality.  Tagged/typed literals in
  VALUES are term-exact too (they join on the variable's metadata
  companion columns) and can only CONSTRAIN a variable the group
  binds — a Lit entry for an unbound variable raises (extend with
  the bare lexical form instead).
- Term constructors are only valid as the entire BIND expression;
  STRDT's datatype and STRLANG's tag must be constants; nested
  anywhere else they raise.  ``BNODE(expr)`` mints a deterministic
  skolem-style label (sha2 of the argument, ``_:fn…``) — the same
  argument yields the SAME bnode in every solution, deviating from
  §17.4.2.9's per-solution freshness (the deterministic distributed
  choice, same convention as GROUP_CONCAT/SAMPLE below).  Zero-arg
  ``BNODE()`` IS §17.4.2.9-fresh: one ``_:fr…`` label per solution
  row (hash of the whole row + an index among identical rows,
  ``bgp._apply_bind``) — distinct across rows, duplicates included,
  and deterministic as a multiset under distributed re-evaluation;
  costs one Exchange on the full row key.
- ``GROUP_CONCAT`` concatenates in sorted value order (SPARQL leaves
  the order undefined; sorted is the only deterministic distributed
  choice) and ``SAMPLE`` returns the minimum.
- Comparing a bare variable against a numeric literal casts the
  variable to DOUBLE (SPARQL's numeric-comparison semantics over this
  engine's lexical columns).
- With ``DISTINCT``, ``ORDER BY`` keys must be projected variables
  (ordering applies after de-duplication).
- ``ORDER BY`` compares the LEXICAL form (binary UTF-8 — the engine's
  solution columns are lexical strings), not SPARQL §15.1's typed
  value order; numeric keys order numerically by wrapping the key in
  an explicit numeric context at the query site (e.g. ``ORDER BY``
  a ``BIND(... AS ?k)`` of a cast) — the deterministic distributed
  choice, matching the GROUP_CONCAT convention.
- Nested groups (OPTIONAL / MINUS / EXISTS / UNION *inside* an
  OPTIONAL / MINUS / EXISTS group, to any depth) evaluate bottom-up
  via :class:`bgp.GroupSpec`.  A shared variable bound only under a
  nested OPTIONAL, in some UNION branches, or by BIND/VALUES — i.e.
  maybe-UNBOUND, whether in the group, in the enclosing solution, or
  BOTH — gets exact SPARQL §18.3 compatibility (unbound matches
  anything; an unbound side takes the other side's value) via
  bound-mask-pair decomposition into equi/anti joins.  EXISTS /
  NOT EXISTS correlation through a maybe-unbound ENCLOSING variable
  is exact §8.1.1 substitution semantics (a row that binds the
  variable correlates on it; a row that leaves it unbound leaves it
  FREE in the group, constraining nothing for that row) via the same
  bound-mask decomposition.  It raises only beyond the 2^4 fan-out
  cap, and for a shared variable maybe-unbound in the EXISTS group's
  OWN solutions (substitution and §18.3 compatibility genuinely
  diverge there — bind it in the group's required patterns).  An
  enclosing variable that occurs ONLY inside an EXISTS group's nested
  OPTIONAL / MINUS / NOT EXISTS bodies (never in the group's required
  patterns) does not correlate: nested members evaluate bottom-up
  with group-local scope rather than substituting the outer binding
  into negation — the area covered by the SPARQL-EXISTS errata
  (sparql-exists CG), where conformant engines legitimately differ.
  A group (top-level or nested) may contain BOTH a sub-SELECT and
  OPTIONAL/MINUS/EXISTS when the join orders provably commute —
  every variable those blocks touch that also appears in the
  sub-SELECT's projection must be certain (bound by the group's own
  triple patterns); a maybe-unbound shared variable makes §18.2's
  left-to-right order semantically significant, and the compiler
  raises rather than pick one (compose at the DataFrame level).  A
  group combining a sub-SELECT with BIND/VALUES/OPTIONAL/MINUS/
  EXISTS must keep at least one triple pattern of its own to anchor
  the order.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfa_streaming_parser_js_spark.operators import paths as P
from rdfa_streaming_parser_js_spark.operators.bgp import (
    BNODE_FRESH_SENTINEL, META_SUFFIXES, GroupSpec, Lit,
    _certain_vars, bgp_construct, bgp_match, bgp_union, describe,
    join_relation)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


class SparqlSyntaxError(ValueError):
    """Raised on text the supported SPARQL subset cannot parse."""


# --------------------------------------------------------------------
# tokenizer
# --------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
      (?P<WS>\s+|\#[^\n]*)
    | (?P<IRIREF><[^<>"{}|^`\\\s]*>)
    | (?P<VAR>\?[A-Za-z_]\w*)
    | (?P<STRING>"(?:[^"\\\n]|\\.)*")
    | (?P<LANGTAG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
    | (?P<NUMBER>(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
    | (?P<BNODE>_:\w+)
    | (?P<PNAME>(?:[A-Za-z_][\w.-]*)?:[A-Za-z0-9_](?:[\w.-]*[\w-])?)
    | (?P<COLON>(?:[A-Za-z_][\w.-]*)?:)
    | (?P<NAME>[A-Za-z_]\w*)
    | (?P<DHAT>\^\^)
    | (?P<OP>&&|\|\||!=|<=|>=|[{}().;,|/^*+?!=<>-])
    """,
    re.X,
)


@dataclass(frozen=True)
class _Tok:
    kind: str
    text: str
    pos: int


def _tokenize(text: str) -> list[_Tok]:
    toks, i = [], 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if m is None:
            raise SparqlSyntaxError(
                f"unrecognized input at offset {i}: {text[i:i + 20]!r}")
        if m.lastgroup != "WS":
            toks.append(_Tok(m.lastgroup, m.group(), i))
        i = m.end()
    toks.append(_Tok("EOF", "", len(text)))
    return toks


# --------------------------------------------------------------------
# parsed-query model
# --------------------------------------------------------------------

@dataclass
class Group:
    """One ``{...}`` group graph pattern, flattened to bgp_match args."""
    patterns: list = field(default_factory=list)
    filters: list = field(default_factory=list)
    optionals: list = field(default_factory=list)
    minus: list = field(default_factory=list)
    values: list = field(default_factory=list)
    binds: list = field(default_factory=list)
    #: BINDs referencing OPTIONAL-introduced variables (or earlier
    #: late binds): compiled to bgp's ``late_binds`` — applied after
    #: the optionals join, per §18.2.2.6 syntax order
    late_binds: list = field(default_factory=list)
    exists: list = field(default_factory=list)
    not_exists: list = field(default_factory=list)
    union: list = field(default_factory=list)  # list[Group] if UNION
    subselects: list = field(default_factory=list)  # list[ParsedQuery]
    # outer GRAPH variables left with NOTHING to scope (every contained
    # pattern re-scoped by a nested GRAPH block): the algebra still
    # ranges them over every graph name (§13.3) — compiled as a join /
    # broadcast cross-join with the distinct graph-name dimension
    graph_ranges: list = field(default_factory=list)


def _relation_entry(sq: "ParsedQuery"):
    """A nested sub-SELECT → the ``(thunk, certain, cols)`` relation
    entry :class:`bgp.GroupSpec` evaluates lazily.  The thunk defers
    to :func:`_execute_select` at evaluation time, when the triples
    DataFrame exists and meta-variable stamping has completed."""
    return (lambda triples, _sq=sq: _execute_select(triples, _sq),
            _certain_out_vars(sq), tuple(sorted(_projected_vars(sq))))


def _group_to_spec(sub: Group) -> GroupSpec:
    """A nested OPTIONAL/MINUS/EXISTS group that itself nests further
    groups → the recursive :class:`bgp.GroupSpec` the algebra evaluates
    bottom-up.  Entries in sub.optionals/minus/exists/not_exists were
    already converted (tuple or GroupSpec) as they were parsed; UNION
    branches are parser Groups and convert here; sub-SELECT blocks
    become lazy relation entries, guarded by the same §18.2
    commutation check as the top level."""
    if sub.graph_ranges:
        raise SparqlSyntaxError(
            "a GRAPH variable with nothing to scope (every pattern "
            "re-scoped by nested GRAPH blocks) is only supported at "
            "the top level of WHERE")
    if sub.union:
        if sub.patterns or sub.filters or sub.subselects:
            raise SparqlSyntaxError("UNION must be the entire group body")
        return GroupSpec(union=[
            b if isinstance(b, GroupSpec) else _group_to_spec(b)
            for b in sub.union])
    relations = None
    if sub.subselects:
        _check_subselect_commutes(
            sub, [_projected_vars(sq) for sq in sub.subselects])
        if not sub.patterns and (sub.binds or sub.late_binds
                                 or sub.values):
            raise SparqlSyntaxError(
                "VALUES/BIND in a group whose only relation is a "
                "sub-SELECT is not supported — add a triple pattern "
                "or compose at the DataFrame level")
        relations = [_relation_entry(sq) for sq in sub.subselects]
    if not sub.patterns and not relations:
        raise SparqlSyntaxError("empty group pattern")
    return GroupSpec(
        patterns=sub.patterns or None, filters=sub.filters or None,
        binds=sub.binds or None,
        late_binds=sub.late_binds or None,
        values=sub.values or None,
        optionals=sub.optionals or None, minus=sub.minus or None,
        exists=sub.exists or None, not_exists=sub.not_exists or None,
        relations=relations)


@dataclass
class SelectItem:
    var: str                # output column name
    sql: str | None = None  # None = plain variable
    is_agg: bool = False


@dataclass
class ParsedQuery:
    form: str                      # "select" | "ask" | "construct"
    where: Group
    select: list[SelectItem] | None = None   # None = SELECT *
    distinct: bool = False
    group_by: list[str] = field(default_factory=list)
    # (sql, contains_aggregate) per HAVING condition
    having: list[tuple[str, bool]] = field(default_factory=list)
    order_by: list[tuple[str, bool]] = field(default_factory=list)
    limit: int | None = None
    offset: int | None = None
    template: list | None = None   # CONSTRUCT triples
    describe_targets: list = field(default_factory=list)  # IRIs/?vars
    meta_vars: frozenset = frozenset()  # vars needing term metadata
    template_literals: dict = field(default_factory=dict)  # lex→(dt,lang)


# --------------------------------------------------------------------
# parser
# --------------------------------------------------------------------

_AGG_FNS = {"count", "sum", "min", "max", "avg", "sample", "group_concat"}

# scalar builtins → Spark SQL (callable renders the arg list)
_SCALAR_FNS = {
    "str": lambda a: f"CAST({a[0]} AS STRING)",
    "strlen": lambda a: f"length({a[0]})",
    "ucase": lambda a: f"upper({a[0]})",
    "lcase": lambda a: f"lower({a[0]})",
    "contains": lambda a: f"contains({a[0]}, {a[1]})",
    "strstarts": lambda a: f"startswith({a[0]}, {a[1]})",
    "strends": lambda a: f"endswith({a[0]}, {a[1]})",
    "substr": lambda a: f"substring({', '.join(a)})",
    "concat": lambda a: f"concat({', '.join(a)})",
    "replace": lambda a: f"regexp_replace({', '.join(a)})",
    "regex": lambda a: f"({a[0]} RLIKE {a[1]})",
    "bound": lambda a: f"({a[0]} IS NOT NULL)",
    "coalesce": lambda a: f"coalesce({', '.join(a)})",
    "if": lambda a: f"if({', '.join(a)})",
    "abs": lambda a: f"abs({a[0]})",
    "ceil": lambda a: f"ceil({a[0]})",
    "floor": lambda a: f"floor({a[0]})",
    "round": lambda a: f"round({a[0]})",
    # §17.4.3.4/5: prefix/suffix around the FIRST occurrence; no match
    # → ''.  instr('', any) and instr(x, '') both behave per spec
    # (empty needle: STRBEFORE → '', STRAFTER → the whole string).
    "strbefore": lambda a: (
        f"(CASE WHEN instr({a[0]}, {a[1]}) > 0 THEN "
        f"substring({a[0]}, 1, instr({a[0]}, {a[1]}) - 1) "
        f"ELSE '' END)"),
    "strafter": lambda a: (
        f"(CASE WHEN instr({a[0]}, {a[1]}) > 0 THEN "
        f"substring({a[0]}, instr({a[0]}, {a[1]}) + length({a[1]})) "
        f"ELSE '' END)"),
    # §17.4.2.8 ENCODE_FOR_URI: RFC 3986 unreserved set.  Spark's
    # url_encode is form-encoding (space → '+', '*' kept, '~' → %7E);
    # three fix-ups make it exact.
    "encode_for_uri": lambda a: (
        f"replace(replace(replace(url_encode({a[0]}), "
        f"'+', '%20'), '*', '%2A'), '%7E', '~')"),
    # §17.4.4.4–4.6 hash functions (lowercase hex, per spec examples)
    "md5": lambda a: f"md5({a[0]})",
    "sha1": lambda a: f"sha1({a[0]})",
    "sha256": lambda a: f"sha2({a[0]}, 256)",
    "sha384": lambda a: f"sha2({a[0]}, 384)",
    "sha512": lambda a: f"sha2({a[0]}, 512)",
    # §17.4.5 datetime accessors — computed LEXICALLY on the
    # xsd:dateTime string, so each component is in the literal's OWN
    # timezone (a CAST to TIMESTAMP would shift into the session zone)
    # and a malformed value yields NULL (dropped by FILTER, per the
    # type-error rule).  SECONDS returns the decimal seconds; TZ the
    # 'Z' / '±HH:MM' designator or '' when absent (§17.4.5.8).
    "year": lambda a: (
        f"CAST(nullif(regexp_extract({a[0]}, "
        f"'^(-?\\\\d{{4,}})-', 1), '') AS INT)"),
    "month": lambda a: (
        f"CAST(nullif(regexp_extract({a[0]}, "
        f"'^-?\\\\d{{4,}}-(\\\\d{{2}})-', 1), '') AS INT)"),
    "day": lambda a: (
        f"CAST(nullif(regexp_extract({a[0]}, "
        f"'^-?\\\\d{{4,}}-\\\\d{{2}}-(\\\\d{{2}})', 1), '') AS INT)"),
    "hours": lambda a: (
        f"CAST(nullif(regexp_extract({a[0]}, "
        f"'T(\\\\d{{2}}):', 1), '') AS INT)"),
    "minutes": lambda a: (
        f"CAST(nullif(regexp_extract({a[0]}, "
        f"'T\\\\d{{2}}:(\\\\d{{2}})', 1), '') AS INT)"),
    "seconds": lambda a: (
        f"CAST(nullif(regexp_extract({a[0]}, "
        f"'T\\\\d{{2}}:\\\\d{{2}}:(\\\\d{{2}}(?:\\\\.\\\\d+)?)', 1), "
        f"'') AS DOUBLE)"),
    "tz": lambda a: (
        f"regexp_extract({a[0]}, '(Z|[+-]\\\\d{{2}}:\\\\d{{2}})$', 1)"),
    # SPARQL §17.4.3.20: '*' matches any non-empty tag, otherwise
    # case-insensitive exact or '-'-boundary prefix match.  A NULL
    # language (LANG of a non-literal = type error) stays NULL, so the
    # enclosing FILTER drops the row, per SPARQL error semantics.
    "langmatches": lambda a: (
        f"(CASE WHEN {a[1]} = '*' THEN coalesce({a[0]}, '') <> '' "
        f"ELSE lower({a[0]}) = lower({a[1]}) OR "
        f"startswith(lower({a[0]}), concat(lower({a[1]}), '-')) END)"),
}

_XSD = "http://www.w3.org/2001/XMLSchema#"
_RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
#: the XSD numeric type tree (SPARQL §17.4.2.4 operand types)
_XSD_NUMERIC = tuple(
    _XSD + t for t in (
        "integer", "decimal", "float", "double", "nonPositiveInteger",
        "negativeInteger", "long", "int", "short", "byte",
        "nonNegativeInteger", "unsignedLong", "unsignedInt",
        "unsignedShort", "unsignedByte", "positiveInteger"))

# term-introspection builtins: each takes a plain ?var and compiles
# onto the companion metadata columns bgp_match(meta_vars=...) binds
# ({v}__kind / {v}__lang / {v}__dt).  A type error (e.g. LANG of an
# IRI) yields NULL, which FILTER treats as false — SPARQL §17.2.
_TERM_FNS = {
    "lang": lambda v: (f"(CASE WHEN {v}__kind = 'literal' "
                       f"THEN coalesce({v}__lang, '') END)"),
    "datatype": lambda v: (
        f"(CASE WHEN {v}__kind = 'literal' THEN coalesce({v}__dt, "
        f"CASE WHEN {v}__lang IS NOT NULL THEN '{_RDF_LANGSTRING}' "
        f"ELSE '{_XSD}string' END) END)"),
    "isiri": lambda v: f"({v}__kind = 'iri')",
    "isuri": lambda v: f"({v}__kind = 'iri')",
    "isblank": lambda v: f"({v}__kind = 'bnode')",
    "isliteral": lambda v: f"({v}__kind = 'literal')",
    "isnumeric": lambda v: (
        f"({v}__kind = 'literal' AND coalesce({v}__dt, '') IN ("
        + ", ".join(f"'{d}'" for d in _XSD_NUMERIC) + "))"),
}

#: term constructors: valid only as the ENTIRE BIND expression, where
#: the engine can mint the constructed term's metadata companion
#: columns (see _Parser._parse_constructor); nested inside a larger
#: expression there is nowhere to carry the metadata, so they raise
_CONSTRUCTOR_FNS = frozenset({"iri", "uri", "bnode", "strdt", "strlang"})

_NUM_RE = re.compile(r"^\d+(\.\d*)?([eE][+-]?\d+)?$")
_IDENT_RE = re.compile(r"^[A-Za-z_]\w*$")


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        # variables referenced by term-introspection builtins anywhere
        # in the query (over-approximation across groups is harmless:
        # companion columns are only minted where the variable binds)
        self.meta_vars: set[str] = set()
        # literal constants seen in CONSTRUCT / update templates while
        # ``in_template`` is set: lexical form → (datatype, lang).  The
        # engine's patterns carry bare strings, so without this a
        # template constant like "0" would fall to bgp_construct's
        # shape heuristic and be emitted as an IRI.
        self.in_template = False
        self.template_literals: dict[str, tuple] = {}
        # every sub-SELECT body parsed anywhere in the query (top-level
        # groups AND nested OPTIONAL/MINUS/EXISTS bodies, where the
        # ParsedQuery hides inside a GroupSpec relation thunk): kept
        # flat so meta-variable stamping reaches all of them
        self.all_subqueries: list = []
        # HAVING bodies may contain aggregate calls (§11.1) — the flag
        # gates _primary's aggregate branch, the counter records that
        # the current condition actually used one
        self._allow_agg = False
        self._saw_agg = False
        self.template_iris: set[str] = set()

    # -- token helpers ------------------------------------------------
    def peek(self, ahead: int = 0) -> _Tok:
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_kw(self, *words: str) -> bool:
        t = self.peek()
        return t.kind == "NAME" and t.text.lower() in words

    def take_kw(self, *words: str) -> bool:
        if self.at_kw(*words):
            self.next()
            return True
        return False

    def expect_kw(self, word: str) -> None:
        if not self.take_kw(word):
            self.fail(f"expected {word.upper()}")

    def at_op(self, *ops: str) -> bool:
        t = self.peek()
        return t.kind == "OP" and t.text in ops

    def take_op(self, *ops: str) -> bool:
        if self.at_op(*ops):
            self.next()
            return True
        return False

    def expect_op(self, op: str) -> None:
        if not self.take_op(op):
            self.fail(f"expected {op!r}")

    def fail(self, msg: str) -> None:
        t = self.peek()
        raise SparqlSyntaxError(
            f"{msg} at offset {t.pos} (near {t.text!r})")

    # -- prologue + terms ---------------------------------------------
    def parse_prologue(self) -> None:
        while True:
            if self.take_kw("prefix"):
                t = self.next()
                if t.kind not in ("PNAME", "COLON"):
                    self.fail("expected prefix name")
                name = t.text[:t.text.index(":")]
                iri = self.next()
                if iri.kind != "IRIREF":
                    self.fail("expected IRI after PREFIX")
                self.prefixes[name] = iri.text[1:-1]
            elif self.take_kw("base"):
                iri = self.next()
                if iri.kind != "IRIREF":
                    self.fail("expected IRI after BASE")
                self.base = iri.text[1:-1]
            else:
                return

    def expand_iri(self, t: _Tok) -> str:
        if t.kind == "IRIREF":
            iri = t.text[1:-1]
            if self.base and "://" not in iri and not iri.startswith(
                    ("urn:", "mailto:")):
                return self.base + iri
            return iri
        if t.kind in ("PNAME", "COLON"):
            pfx, _, local = t.text.partition(":")
            if pfx not in self.prefixes:
                raise SparqlSyntaxError(f"undeclared prefix {pfx!r}:")
            return self.prefixes[pfx] + local
        raise SparqlSyntaxError(f"not an IRI token: {t.text!r}")

    def parse_term(self) -> str:
        """A subject/object term → the engine's string form."""
        t = self.next()
        if t.kind == "VAR":
            return t.text
        if t.kind in ("IRIREF", "PNAME", "COLON"):
            iri = self.expand_iri(t)
            if self.in_template:
                self.template_iris.add(iri)
            return iri
        if t.kind == "NAME" and t.text == "a":
            return RDF_TYPE
        if t.kind == "NAME" and t.text.lower() in ("true", "false"):
            # boolean RDF term literal (§19.8 BooleanLiteral); matching
            # is lexical, and in a template the marking map stamps the
            # xsd:boolean datatype on instantiation
            lex = t.text.lower()
            if self.in_template:
                self.template_literals[lex] = (f"{_XSD}boolean", None)
            return lex
        if t.kind == "BNODE":
            return t.text
        if t.kind == "NUMBER":
            if self.in_template:
                dt = (f"{_XSD}double" if "e" in t.text.lower()
                      else f"{_XSD}decimal" if "." in t.text
                      else f"{_XSD}integer")
                self.template_literals[t.text] = (dt, None)
            return t.text
        if t.kind == "STRING":
            lex = _unquote(t.text)
            nxt = self.peek()
            lang = dt = None
            if nxt.kind == "LANGTAG":
                self.next()
                lang = nxt.text[1:].lower()
            elif nxt.kind == "DHAT":
                self.next()
                it = self.next()
                if it.kind not in ("IRIREF", "PNAME", "COLON"):
                    self.fail("expected a datatype IRI after ^^")
                dt = self.expand_iri(it)
            if self.in_template:
                # template instantiation carries metadata via the
                # lexical-form marking map (bgp_construct
                # literal_consts); the same text with two different
                # markings would stamp one of them wrongly
                meta = (dt, lang)
                if self.template_literals.get(lex, meta) != meta:
                    raise SparqlSyntaxError(
                        f"literal {lex!r} appears with two different "
                        "datatype/language markings in the template — "
                        "ambiguous under lexical literal marking; "
                        "compose at the DataFrame level instead")
                self.template_literals[lex] = meta
                return lex
            if lang or dt:
                # pattern position: exact SPARQL term equality —
                # lexical form AND kind/language/datatype (bgp.Lit)
                return Lit(lex, lang=lang, datatype=dt)
            return lex
        self.fail("expected a term")

    # -- property paths -----------------------------------------------
    def parse_path(self):
        """Path → a plain predicate IRI string (single forward link), a
        ``?var`` (variable predicate — the SPARQL path grammar has no
        variables, so no modifier may follow), or a paths.PathExpr
        (anything richer)."""
        if self.peek().kind == "VAR":
            return self.next().text
        expr = self._path_alt()
        if isinstance(expr, P.Link):
            return expr.pred
        return expr

    def _path_alt(self):
        parts = [self._path_seq()]
        while self.take_op("|"):
            parts.append(self._path_seq())
        return P.alt(*parts)

    def _path_seq(self):
        parts = [self._path_elt_or_inv()]
        while self.take_op("/"):
            parts.append(self._path_elt_or_inv())
        return P.seq(*parts)

    def _path_elt_or_inv(self):
        if self.take_op("^"):
            return P.inv(self._path_elt())
        return self._path_elt()

    def _path_elt(self):
        prim = self._path_primary()
        if self.take_op("+"):
            return P.plus(prim)
        if self.take_op("*"):
            return P.star(prim)
        if self.take_op("?"):
            return P.opt(prim)
        return prim

    def _path_primary(self):
        t = self.peek()
        if t.kind == "OP" and t.text == "(":
            self.next()
            inner = self._path_alt()
            self.expect_op(")")
            return inner
        if t.kind == "OP" and t.text == "!":
            self.next()
            return self._path_negated_set()
        if t.kind == "NAME" and t.text == "a":
            self.next()
            return P.link(RDF_TYPE)
        if t.kind in ("IRIREF", "PNAME", "COLON"):
            return P.link(self.expand_iri(self.next()))
        self.fail("expected a path element")

    def _path_negated_set(self):
        """``!(p1|^p2|...)`` or ``!p`` — forward and inverse members
        split per SPARQL 1.1 §9.1 (NPS evaluates them separately)."""
        fwd, bwd = [], []

        def one():
            if self.take_op("^"):
                lst = bwd
            else:
                lst = fwd
            t = self.next()
            if t.kind == "NAME" and t.text == "a":
                lst.append(RDF_TYPE)
            else:
                lst.append(self.expand_iri(t))

        if self.take_op("("):
            one()
            while self.take_op("|"):
                one()
            self.expect_op(")")
        else:
            one()
        parts = []
        if fwd:
            parts.append(P.nps(*fwd))
        if bwd:
            parts.append(P.inv(P.nps(*bwd)))
        return P.alt(*parts)

    # -- group graph pattern ------------------------------------------
    def parse_group(self, top: bool = True) -> Group:
        self.expect_op("{")
        g = Group()
        if self.at_op("{") and not (
                self.peek(1).kind == "NAME"
                and self.peek(1).text.lower() == "select"):
            # {A} UNION {B} [UNION {C}...] — at the top level or
            # nested inside OPTIONAL/MINUS/EXISTS (GroupSpec recursion)
            g.union.append(self.parse_group(top=False))
            while self.take_kw("union"):
                g.union.append(self.parse_group(top=False))
            if not self.at_op("}"):
                self.fail("UNION must be the entire group body — "
                          "join further patterns at the DataFrame "
                          "level")
            self.next()
            return g
        while not self.at_op("}"):
            if self.at_op("{"):
                # mid-group braced block: a sub-SELECT (§18.2) — at
                # the top level or inside an OPTIONAL/MINUS/EXISTS
                # body (where it compiles to a GroupSpec relation)
                self.next()
                if not self.at_kw("select"):
                    self.fail("expected SELECT (only sub-SELECT blocks "
                              "may appear mid-group; UNION must be the "
                              "entire group body)")
                self.next()
                sq = self._parse_select_body()
                g.subselects.append(sq)
                self.all_subqueries.append(sq)
                self.expect_op("}")
            elif self.take_kw("filter"):
                self._parse_filter(g, top)
            elif self.take_kw("optional"):
                sub = self.parse_group(top=False)
                g.optionals.append(self._subgroup_tuple(sub))
            elif self.take_kw("minus"):
                sub = self.parse_group(top=False)
                g.minus.append(self._subgroup_tuple(sub))
            elif self.take_kw("graph"):
                t = self.peek()
                if t.kind == "VAR":
                    gterm = self.next().text
                elif t.kind in ("IRIREF", "PNAME", "COLON"):
                    gterm = self.expand_iri(self.next())
                else:
                    self.fail("expected a variable or IRI after GRAPH")
                sub = self.parse_group(top=False)
                if (sub.optionals or sub.minus or sub.values or sub.binds
                        or sub.late_binds
                        or sub.exists or sub.not_exists or sub.union
                        or sub.subselects):
                    self.fail(
                        "GRAPH blocks support triple patterns and plain "
                        "FILTER only — compose richer graph-scoped "
                        "groups at the DataFrame level")
                if not sub.patterns:
                    self.fail("GRAPH block contains no triple pattern")
                # stamp the graph term onto each contained pattern; the
                # compiler treats it as a 4th match position (a FILTER
                # inside GRAPH scopes to the enclosing group, per
                # SPARQL's group-level filter semantics).  A NESTED
                # GRAPH block re-scopes its own patterns (§13.3: the
                # inner block changes the active graph), so patterns
                # already carrying a graph term pass through unstamped.
                stamped = [pat if len(pat) == 4 else pat + (gterm,)
                           for pat in sub.patterns]
                g.patterns.extend(stamped)
                g.filters.extend(sub.filters)
                if (gterm.startswith("?")
                        and not any(pat[3] == gterm for pat in stamped)):
                    # the variable scoped NOTHING (every pattern was
                    # re-scoped by a nested GRAPH block): §13.3 still
                    # ranges it over every graph name — record it for
                    # the distinct-graph-name join in _compile_where
                    g.graph_ranges.append(gterm[1:])
            elif self.take_kw("bind"):
                self.expect_op("(")
                expr = self._parse_constructor()
                if expr is None:
                    expr = self.parse_expr()
                self.expect_kw("as")
                v = self.next()
                if v.kind != "VAR":
                    self.fail("expected variable after AS")
                self.expect_op(")")
                if isinstance(expr, tuple):
                    # constructed terms carry companion metadata
                    # columns — same lifecycle as introspected vars
                    # (SELECT * drops them, projection hides them)
                    self.meta_vars.add(v.text[1:])
                # §18.2.2.6 syntax order: a BIND whose expression
                # references a variable introduced by a PRECEDING
                # OPTIONAL (or by an earlier late bind) must apply
                # after that left join — route it to late_binds.
                # Identifier scan over-approximates (same convention
                # as _entry_vars): a false hit only delays the bind,
                # which is always safe before MINUS/FILTER/EXISTS.
                refs = set()
                for part in (expr if isinstance(expr, tuple)
                             else (expr,)):
                    if isinstance(part, str):
                        refs |= set(_SQL_IDENT.findall(part))
                req = {t[1:] for pat in g.patterns for t in pat
                       if isinstance(t, str) and t.startswith("?")}
                opt = set()
                for entry in g.optionals:
                    opt |= _entry_vars(entry)
                late = {name for name, _ in g.late_binds}
                if refs & ((opt - req) | late):
                    g.late_binds.append((v.text[1:], expr))
                else:
                    g.binds.append((v.text[1:], expr))
            elif self.take_kw("values"):
                g.values.extend(self._parse_values())
            else:
                self._parse_triples_block(g)
            self.take_op(".")
        self.expect_op("}")
        if g.union and (g.patterns or g.filters):
            self.fail("UNION must be the entire group body")
        if (g.subselects and not g.patterns
                and (g.optionals or g.minus or g.exists
                     or g.not_exists)):
            self.fail("a group whose only relation is a sub-SELECT "
                      "cannot take OPTIONAL/MINUS/EXISTS — add a "
                      "triple pattern or compose at the DataFrame "
                      "level")
        return g

    def _parse_filter(self, g: Group, top: bool) -> None:
        negate = False
        if self.take_kw("not"):
            self.expect_kw("exists")
            negate = True
        elif self.take_kw("exists"):
            pass
        else:
            g.filters.append(self.parse_expr_or_call())
            return
        sub = self.parse_group(top=False)
        dest = g.not_exists if negate else g.exists
        dest.append(self._subgroup_tuple(sub))

    def _parse_triples_block(self, g: Group) -> None:
        subj = self.parse_term()
        while True:
            pred = self.parse_path()
            obj = self.parse_term()
            g.patterns.append((subj, pred, obj))
            while self.take_op(","):
                g.patterns.append((subj, pred, self.parse_term()))
            if not self.take_op(";"):
                return
            if self.at_op(".", "}"):  # trailing ; before . or }
                return

    def _parse_values(self) -> list[dict]:
        def value(var):
            if self.take_kw("undef"):
                return None
            v = self.parse_term()
            if isinstance(v, Lit):
                # term-exact VALUES entry: the variable joins on its
                # metadata companion columns too (bgp._join_values);
                # mark it so the compiler binds them
                self.meta_vars.add(var)
            return v

        if self.peek().kind == "VAR":  # VALUES ?v { v1 v2 }
            var = self.next().text[1:]
            self.expect_op("{")
            rows = []
            while not self.at_op("}"):
                rows.append({var: value(var)})
            self.expect_op("}")
            return rows
        self.expect_op("(")
        names = []
        while self.peek().kind == "VAR":
            names.append(self.next().text[1:])
        self.expect_op(")")
        self.expect_op("{")
        rows = []
        while self.take_op("("):
            vals = [value(n) for n in names]
            self.expect_op(")")
            rows.append(dict(zip(names, vals)))
        self.expect_op("}")
        return rows

    def _parse_constructor(self):
        """IRI / URI / STRDT / STRLANG as the ENTIRE BIND expression →
        a ``(lex_sql, kind, datatype, lang)`` 4-tuple for bgp's
        constructor-bind channel (the variable gets term-metadata
        companion columns minted alongside the value).  Returns None
        when the next tokens are not a constructor call.  STRDT's
        datatype and STRLANG's tag must be constants in this engine
        (the metadata rides in literal companion columns, one value
        per BIND).  BNODE(expr) mints a deterministic skolem-style
        label (same argument → same bnode across solutions, the
        documented deviation); zero-arg BNODE() mints a FRESH label
        per solution row (§17.4.2.9) — a hash of the whole row plus
        an index among identical rows, deterministic as a multiset
        under distributed re-evaluation (bgp._apply_bind)."""
        t = self.peek()
        if (t.kind != "NAME" or t.text.lower() not in _CONSTRUCTOR_FNS
                or self.peek(1).kind != "OP"
                or self.peek(1).text != "("):
            return None
        word = t.text.lower()
        self.next()
        self.next()
        if word == "bnode":
            if self.at_op(")"):
                # §17.4.2.9 fresh blank node per solution: the label
                # is a function of the whole solution row plus an
                # index among identical rows (bgp._apply_bind) — fresh
                # per solution AND deterministic as a multiset under
                # distributed re-evaluation
                self.expect_op(")")
                return (BNODE_FRESH_SENTINEL, "bnode", None, None)
            sql = self.parse_expr()
            self.expect_op(")")
            # deterministic skolem-style label: a pure function of the
            # argument, so the same argument yields the SAME bnode in
            # every solution (documented deviation from §17.4.2.9's
            # per-solution freshness — the deterministic distributed
            # choice).  The '_:fn' prefix keeps minted labels disjoint
            # from extractor/serializer labels ('_:b…').
            return (f"concat('_:fn', substr(sha2(CAST({sql} AS STRING)"
                    ", 256), 1, 40))", "bnode", None, None)
        if word in ("iri", "uri"):
            sql = self.parse_expr()
            self.expect_op(")")
            if self.base:
                # resolve scheme-less values against BASE (same naive
                # concat rule as expand_iri applies to parsed IRIs)
                b = _sql_str(self.base)
                sql = (f"(CASE WHEN {sql} RLIKE "
                       "'^[A-Za-z][A-Za-z0-9+.-]*:' "
                       f"THEN {sql} ELSE concat({b}, {sql}) END)")
            return (sql, "iri", None, None)
        sql = self.parse_expr()
        self.expect_op(",")
        if word == "strdt":
            dt_tok = self.next()
            if dt_tok.kind not in ("IRIREF", "PNAME", "COLON"):
                self.fail("STRDT takes a constant datatype IRI in "
                          "this engine")
            self.expect_op(")")
            return (f"CAST({sql} AS STRING)", "literal",
                    self.expand_iri(dt_tok), None)
        lt = self.next()  # strlang
        if lt.kind != "STRING":
            self.fail("STRLANG takes a constant language tag in this "
                      "engine")
        self.expect_op(")")
        return (f"CAST({sql} AS STRING)", "literal", None,
                _unquote(lt.text).lower())

    @staticmethod
    def _subgroup_tuple(sub: "Group"):
        """OPTIONAL/MINUS/EXISTS group → the bgp OptionalGroup tuple,
        or a recursive :class:`bgp.GroupSpec` when the group itself
        nests OPTIONAL/MINUS/EXISTS/UNION; group-scoped BIND/VALUES
        ride in the optional tail elements (they used to be silently
        dropped)."""
        if sub.graph_ranges:
            raise SparqlSyntaxError(
                "a GRAPH variable with nothing to scope (every pattern "
                "re-scoped by nested GRAPH blocks) is only supported "
                "at the top level of WHERE")
        if (sub.optionals or sub.minus or sub.exists or sub.not_exists
                or sub.union or sub.subselects or sub.late_binds):
            return _group_to_spec(sub)
        if sub.binds or sub.values:
            return (sub.patterns, sub.filters or None,
                    sub.binds or None, sub.values or None)
        return (sub.patterns, sub.filters or None)

    # -- expressions → Spark SQL --------------------------------------
    def parse_expr_or_call(self) -> str:
        """FILTER body: a bracketted expression or a bare builtin
        call (both legal per the SPARQL grammar)."""
        if self.at_op("("):
            return self.parse_expr()
        return self._primary()[0]

    def parse_expr(self) -> str:
        return self._or_expr()[0]

    def _or_expr(self):
        sql, kind = self._and_expr()
        while self.take_op("||"):
            rhs, _ = self._and_expr()
            sql, kind = f"({sql} OR {rhs})", "other"
        return sql, kind

    def _and_expr(self):
        sql, kind = self._rel_expr()
        while self.take_op("&&"):
            rhs, _ = self._rel_expr()
            sql, kind = f"({sql} AND {rhs})", "other"
        return sql, kind

    _REL_OPS = {"=": "=", "!=": "<>", "<": "<", ">": ">",
                "<=": "<=", ">=": ">="}

    def _rel_expr(self):
        sql, kind = self._add_expr()
        t = self.peek()
        if t.kind == "OP" and t.text in self._REL_OPS:
            self.next()
            rhs, rkind = self._add_expr()
            lhs = sql
            # SPARQL numeric comparison over lexical columns: cast the
            # bare-variable side when the other side is a number.
            if rkind == "num" and kind == "var":
                lhs = f"CAST({lhs} AS DOUBLE)"
            elif kind == "num" and rkind == "var":
                rhs = f"CAST({rhs} AS DOUBLE)"
            return f"({lhs} {self._REL_OPS[t.text]} {rhs})", "other"
        negated = False
        if (self.peek().kind == "NAME" and self.peek().text.lower() == "not"
                and self.peek(1).kind == "NAME"
                and self.peek(1).text.lower() == "in"):
            self.next()
            negated = True
        if self.take_kw("in"):
            self.expect_op("(")
            items = [self._add_expr()[0]]
            while self.take_op(","):
                items.append(self._add_expr()[0])
            self.expect_op(")")
            op = "NOT IN" if negated else "IN"
            return f"({sql} {op} ({', '.join(items)}))", "other"
        if negated:
            self.fail("expected IN after NOT")
        return sql, kind

    def _add_expr(self):
        sql, kind = self._mul_expr()
        while self.at_op("+", "-"):
            op = self.next().text
            rhs, _ = self._mul_expr()
            sql, kind = f"({sql} {op} {rhs})", "other"
        return sql, kind

    def _mul_expr(self):
        sql, kind = self._unary()
        while self.at_op("*", "/"):
            op = self.next().text
            rhs, _ = self._unary()
            sql, kind = f"({sql} {op} {rhs})", "other"
        return sql, kind

    def _unary(self):
        if self.take_op("!"):
            sql, _ = self._unary()
            return f"(NOT {sql})", "other"
        if self.take_op("-"):
            sql, _ = self._unary()
            return f"(- {sql})", "other"
        if self.take_op("+"):
            return self._unary()
        return self._primary()

    def _primary(self):
        t = self.peek()
        if t.kind == "OP" and t.text == "(":
            self.next()
            sql, _ = self._or_expr()
            self.expect_op(")")
            return f"({sql})", "other"
        if t.kind == "VAR":
            self.next()
            return t.text[1:], "var"
        if t.kind == "NUMBER":
            self.next()
            return t.text, "num"
        if t.kind == "STRING":
            self.next()
            if self.peek().kind in ("LANGTAG", "DHAT"):
                raise SparqlSyntaxError(
                    "tagged literals in expressions are not supported "
                    f"(offset {t.pos})")
            return _sql_str(_unquote(t.text)), "str"
        if t.kind == "IRIREF" or t.kind == "PNAME":
            self.next()
            return _sql_str(self.expand_iri(t)), "str"
        if t.kind == "NAME":
            word = t.text.lower()
            if word in ("true", "false"):
                self.next()
                return word.upper(), "other"
            if word in _TERM_FNS:
                self.next()
                self.expect_op("(")
                a = self.peek()
                if a.kind == "NAME" and a.text.lower() == "coalesce":
                    # LANG(COALESCE(?a, ?b, ...)) — §17.4.1.5 COALESCE
                    # of plain variables: the result term is the first
                    # BOUND argument's term, so the introspection
                    # dispatches on boundness to that variable's own
                    # metadata companions (an unbound tail → NULL →
                    # type error, dropped by FILTER per §17.2).
                    self.next()
                    self.expect_op("(")
                    vs = []
                    while True:
                        v = self.next()
                        if v.kind != "VAR":
                            self.fail(
                                f"{t.text.upper()}(COALESCE(...)) "
                                "takes plain variables in this engine "
                                "(nested expressions carry no term "
                                "metadata)")
                        vs.append(v.text[1:])
                        if self.take_op(","):
                            continue
                        break
                    self.expect_op(")")
                    self.expect_op(")")
                    self.meta_vars.update(vs)
                    branches = " ".join(
                        f"WHEN {v} IS NOT NULL "
                        f"THEN {_TERM_FNS[word](v)}" for v in vs)
                    return f"(CASE {branches} END)", "other"
                if a.kind != "VAR":
                    self.fail(
                        f"{t.text.upper()}() takes a plain variable "
                        "or a COALESCE of plain variables in this "
                        "engine (other nested expressions carry no "
                        "term metadata)")
                self.next()
                self.expect_op(")")
                self.meta_vars.add(a.text[1:])
                return _TERM_FNS[word](a.text[1:]), "other"
            if word == "sameterm":
                # §17.4.1.8: RDF-term equality — lexical form AND
                # kind/datatype/language, all null-safe, via the
                # term-metadata companion columns of both variables.
                self.next()
                self.expect_op("(")
                vs = []
                for _ in range(2):
                    a = self.next()
                    if a.kind != "VAR":
                        self.fail("SAMETERM() takes two plain variables "
                                  "in this engine (nested expressions "
                                  "carry no term metadata)")
                    vs.append(a.text[1:])
                    if len(vs) == 1:
                        self.expect_op(",")
                self.expect_op(")")
                self.meta_vars.update(vs)
                x, y = vs
                return ("((" + f"{x} <=> {y}) AND "
                        + " AND ".join(
                            f"({x}{sfx} <=> {y}{sfx})"
                            for sfx in META_SUFFIXES) + ")"), "other"
            if word in _CONSTRUCTOR_FNS:
                raise SparqlSyntaxError(
                    f"term constructor {t.text.upper()}() is only "
                    "supported as the entire BIND expression — "
                    f"BIND({t.text.upper()}(...) AS ?v) — where its "
                    "term metadata can be carried as companion columns "
                    f"(offset {t.pos})")
            if word in _AGG_FNS:
                if self._allow_agg:
                    self.next()
                    self._saw_agg = True
                    return self._agg_call(word), "other"
                raise SparqlSyntaxError(
                    f"aggregate {t.text.upper()}() is only allowed in "
                    f"SELECT expressions and HAVING conditions "
                    f"(offset {t.pos})")
            if word in _SCALAR_FNS:
                self.next()
                self.expect_op("(")
                args = []
                if not self.at_op(")"):
                    args.append(self.parse_expr())
                    while self.take_op(","):
                        args.append(self.parse_expr())
                self.expect_op(")")
                return _SCALAR_FNS[word](args), "other"
            self.fail(f"unsupported function or keyword {t.text!r}")
        self.fail("expected an expression")

    # -- SELECT items + aggregates ------------------------------------
    def parse_select_item(self) -> SelectItem:
        t = self.peek()
        if t.kind == "VAR":
            self.next()
            return SelectItem(var=t.text[1:])
        self.expect_op("(")
        sql, is_agg = self._agg_or_expr()
        self.expect_kw("as")
        v = self.next()
        if v.kind != "VAR":
            self.fail("expected variable after AS")
        self.expect_op(")")
        return SelectItem(var=v.text[1:], sql=sql, is_agg=is_agg)

    def _agg_or_expr(self) -> tuple[str, bool]:
        t = self.peek()
        if t.kind == "NAME" and t.text.lower() in _AGG_FNS:
            fn = self.next().text.lower()
            return self._agg_call(fn), True
        return self.parse_expr(), False

    def _agg_call(self, fn: str) -> str:
        """Parse the parenthesized body of an aggregate call (the name
        token is already consumed) and return its Spark SQL."""
        self.expect_op("(")
        distinct = self.take_kw("distinct")
        if fn == "count" and self.take_op("*"):
            if distinct:
                raise SparqlSyntaxError(
                    "COUNT(DISTINCT *) is not supported — project "
                    "the variables and COUNT(DISTINCT ?v) instead")
            self.expect_op(")")
            return "count(1)"
        arg = self.parse_expr()
        sep = " "
        if fn == "group_concat" and self.take_op(";"):
            self.expect_kw("separator")
            self.expect_op("=")
            s = self.next()
            if s.kind != "STRING":
                self.fail("expected string SEPARATOR value")
            sep = _unquote(s.text)
        self.expect_op(")")
        d = "DISTINCT " if distinct else ""
        if fn == "group_concat":
            inner = (f"collect_set({arg})" if distinct
                     else f"collect_list({arg})")
            return (f"array_join(array_sort({inner}), "
                    f"{_sql_str(sep)})")
        if fn == "sample":
            return f"min({d}{arg})"
        return f"{fn}({d}{arg})"

    def _parse_select_body(self) -> ParsedQuery:
        """Everything after the SELECT keyword (shared by the top-level
        form and mid-group sub-SELECTs, §18.2)."""
        q = ParsedQuery(form="select", where=Group())
        if self.take_kw("distinct") or self.take_kw("reduced"):
            q.distinct = True
        if self.take_op("*"):
            q.select = None
        else:
            items = []
            while self.peek().kind == "VAR" or self.at_op("("):
                items.append(self.parse_select_item())
            if not items:
                self.fail("SELECT needs at least one item or *")
            q.select = items
        self.expect_kw("where")
        q.where = self.parse_group()
        _parse_modifiers(self, q)
        return q


def _unquote(raw: str) -> str:
    """Decode a SPARQL string literal body (ECHAR escapes).

    Sentinel-free, like functions/ntriples.unescape_literal: any raw
    byte (including NUL) may legitimately appear inside the body, so a
    sentinel character would corrupt it — split on escaped-backslash
    pairs, decode ECHARs per part, re-join with a real backslash."""
    def echars(part: str) -> str:
        return (part.replace("\\t", "\t").replace("\\n", "\n")
                    .replace("\\r", "\r").replace('\\"', '"')
                    .replace("\\'", "'"))
    return "\\".join(echars(p) for p in raw[1:-1].split("\\\\"))


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


# --------------------------------------------------------------------
# SPARQL 1.1 Update (single operation; compiled onto operators/update)
# --------------------------------------------------------------------

@dataclass
class ParsedUpdate:
    form: str                      # insert_data | delete_data | modify
    data: list = field(default_factory=list)   # ground triples
    delete: list | None = None     # template patterns
    insert: list | None = None
    where: Group | None = None
    template_literals: dict = field(default_factory=dict)  # lex→(dt,lang)
    meta_vars: frozenset = frozenset()  # vars whose FILTERs need term meta
    target: str | None = None      # clear/drop/create selector
    src: str | None = None         # add/move/copy source graph
    dst: str | None = None         # add/move/copy destination graph


def _parse_data_term(p: _Parser, position: str):
    """A ground term in an INSERT/DELETE DATA block.  Objects return an
    explicit ``(value, kind, datatype, lang)`` tuple — the one place
    the front-end supports typed/tagged literal constants, since no
    solution column is involved."""
    t = p.next()
    if t.kind in ("IRIREF", "PNAME", "COLON"):
        return (p.expand_iri(t), "iri", None, None)
    if t.kind == "BNODE":
        if position == "pred":
            p.fail("a predicate must be an IRI")
        return (t.text, "bnode", None, None)
    if position != "obj":
        if t.kind == "NAME" and t.text == "a" and position == "pred":
            return (RDF_TYPE, "iri", None, None)
        p.fail(f"ground {position} must be an IRI"
               + ("" if position == "pred" else " or blank node"))
    if t.kind == "NUMBER":
        dt = (f"{_XSD}double" if "e" in t.text.lower()
              else f"{_XSD}decimal" if "." in t.text
              else f"{_XSD}integer")
        return (t.text, "literal", dt, None)
    if t.kind == "STRING":
        lex = _unquote(t.text)
        nxt = p.peek()
        if nxt.kind == "LANGTAG":
            p.next()
            return (lex, "literal", None, nxt.text[1:].lower())
        if nxt.kind == "DHAT":
            p.next()
            dt_tok = p.next()
            if dt_tok.kind not in ("IRIREF", "PNAME", "COLON"):
                p.fail("expected a datatype IRI after ^^")
            return (lex, "literal", p.expand_iri(dt_tok), None)
        return (lex, "literal", None, None)
    p.fail("expected a ground RDF term")


def _parse_data_triples(p: _Parser, out: list, graph: "str | None"):
    """The triple list of one DATA block scope (top level or inside a
    ``GRAPH <g> { ... }`` wrapper); appends ``(s, p, obj)`` rows, or
    ``(s, p, obj, graph)`` quads when a graph IRI scopes them."""
    while not p.at_op("}"):
        s = _parse_data_term(p, "subj")[0]
        while True:
            pr = _parse_data_term(p, "pred")[0]
            row = (s, pr, _parse_data_term(p, "obj"))
            out.append(row + (graph,) if graph else row)
            while p.take_op(","):
                row = (s, pr, _parse_data_term(p, "obj"))
                out.append(row + (graph,) if graph else row)
            if not p.take_op(";"):
                break
            if p.at_op(".", "}"):
                break
        p.take_op(".")


def _parse_data_block(p: _Parser) -> list:
    """``{ ground triples }`` → ``[(s, p, (ov, okind, odt, olang))]``
    rows for operators.update.insert_data/delete_data.  ``GRAPH <g>
    { ... }`` wrappers (§3.1.1 QuadData) emit 4-tuples with the graph
    IRI — the executing table must then be a quads table."""
    p.expect_op("{")
    out = []
    while not p.at_op("}"):
        if p.at_kw("graph"):
            p.next()
            t = p.peek()
            if t.kind not in ("IRIREF", "PNAME", "COLON"):
                p.fail("expected a graph IRI after GRAPH (DATA blocks "
                       "are ground — no graph variables)")
            g = p.expand_iri(p.next())
            p.expect_op("{")
            _parse_data_triples(p, out, g)
            p.expect_op("}")
        else:
            _parse_data_triples_top(p, out)
    p.expect_op("}")
    if not out:
        p.fail("empty DATA block")
    return out


def _parse_data_triples_top(p: _Parser, out: list) -> None:
    """One top-level (default-graph) triple group of a DATA block:
    parse subject..object runs until a GRAPH keyword or the closing
    brace takes over."""
    while not p.at_op("}") and not p.at_kw("graph"):
        s = _parse_data_term(p, "subj")[0]
        while True:
            pr = _parse_data_term(p, "pred")[0]
            out.append((s, pr, _parse_data_term(p, "obj")))
            while p.take_op(","):
                out.append((s, pr, _parse_data_term(p, "obj")))
            if not p.take_op(";"):
                break
            if p.at_op(".", "}"):
                break
        p.take_op(".")


def _parse_template(p: _Parser) -> list:
    """``{ triples }`` template for DELETE/INSERT: plain patterns only
    (variables allowed anywhere incl. the predicate; property paths
    raise, as in CONSTRUCT templates).  ``GRAPH ?g/<iri> { triples }``
    wrappers (§3.1.3 QuadPattern) emit 4-tuple patterns targeting that
    named graph — the executing table must then be a quads table; bare
    triples target the default graph."""
    tmpl = Group()
    p.expect_op("{")
    p.in_template = True
    try:
        while not p.at_op("}"):
            if p.at_kw("graph"):
                p.next()
                t = p.peek()
                if t.kind == "VAR":
                    gterm = p.next().text
                elif t.kind in ("IRIREF", "PNAME", "COLON"):
                    gterm = p.expand_iri(p.next())
                else:
                    p.fail("expected a variable or IRI after GRAPH")
                sub = Group()
                p.expect_op("{")
                while not p.at_op("}"):
                    p._parse_triples_block(sub)
                    p.take_op(".")
                p.expect_op("}")
                if not sub.patterns:
                    p.fail("GRAPH template block contains no triple "
                           "pattern")
                tmpl.patterns.extend(pat + (gterm,)
                                     for pat in sub.patterns)
                p.take_op(".")
            else:
                p._parse_triples_block(tmpl)
                p.take_op(".")
    finally:
        p.in_template = False
    p.expect_op("}")
    for pat in tmpl.patterns:
        if not isinstance(pat[1], str):
            raise SparqlSyntaxError(
                "property paths are not allowed in an update template")
    if not tmpl.patterns:
        p.fail("empty update template")
    return tmpl.patterns


def parse_update(text: str) -> ParsedUpdate:
    """Parse one SPARQL 1.1 Update operation: ``INSERT DATA``,
    ``DELETE DATA``, ``DELETE WHERE``, or ``DELETE {} INSERT {} WHERE
    {}`` (either template optional).  One operation per call — chain
    calls for ``;``-sequences."""
    p = _Parser(text)
    p.parse_prologue()

    def _graph_ref():
        """((GRAPH)? iri) | DEFAULT — ADD/MOVE/COPY operand."""
        if p.take_kw("default"):
            return "DEFAULT"
        p.take_kw("graph")
        t = p.peek()
        if t.kind in ("IRIREF", "PNAME", "COLON"):
            return p.expand_iri(p.next())
        p.fail("expected DEFAULT or a graph IRI")

    mgmt = next((v for v in ("clear", "drop", "create", "add", "move",
                             "copy") if p.take_kw(v)), None)
    if mgmt:
        # graph management (§3.2); SILENT accepted and ignored — the
        # quads-table representation has no missing-graph errors
        p.take_kw("silent")
        if mgmt in ("clear", "drop"):
            if p.take_kw("default"):
                tgt = "DEFAULT"
            elif p.take_kw("named"):
                tgt = "NAMED"
            elif p.take_kw("all"):
                tgt = "ALL"
            else:
                p.expect_kw("graph")
                t = p.peek()
                if t.kind not in ("IRIREF", "PNAME", "COLON"):
                    p.fail("expected a graph IRI after GRAPH")
                tgt = p.expand_iri(p.next())
            u = ParsedUpdate(mgmt, target=tgt)
        elif mgmt == "create":
            p.expect_kw("graph")
            t = p.peek()
            if t.kind not in ("IRIREF", "PNAME", "COLON"):
                p.fail("expected a graph IRI after GRAPH")
            u = ParsedUpdate("create", target=p.expand_iri(p.next()))
        else:
            src = _graph_ref()
            p.expect_kw("to")
            u = ParsedUpdate(mgmt, src=src, dst=_graph_ref())
        if p.peek().kind != "EOF":
            p.fail("trailing input after update (one operation per "
                   "call)")
        return u
    if p.take_kw("insert"):
        if p.take_kw("data"):
            u = ParsedUpdate("insert_data", data=_parse_data_block(p))
        else:
            tmpl = _parse_template(p)
            p.expect_kw("where")
            u = ParsedUpdate("modify", insert=tmpl,
                             where=p.parse_group())
    elif p.take_kw("delete"):
        if p.take_kw("data"):
            u = ParsedUpdate("delete_data", data=_parse_data_block(p))
        elif p.take_kw("where"):
            tmpl = _parse_template(p)
            w = Group()
            w.patterns = list(tmpl)
            u = ParsedUpdate("modify", delete=tmpl, where=w)
        else:
            tmpl = _parse_template(p)
            ins = _parse_template(p) if p.take_kw("insert") else None
            p.expect_kw("where")
            u = ParsedUpdate("modify", delete=tmpl, insert=ins,
                             where=p.parse_group())
    else:
        p.fail("expected INSERT, DELETE, CLEAR, DROP, CREATE, ADD, "
               "MOVE or COPY")
    if p.peek().kind != "EOF":
        p.fail("trailing input after update (one operation per call)")
    _check_template_collisions(p)
    u.template_literals = dict(p.template_literals)
    u.meta_vars = frozenset(p.meta_vars)
    return u


def _check_template_collisions(p: _Parser) -> None:
    """Literal-constant marking is by lexical form (the engine's
    template terms are bare strings), so a template where the same text
    appears both quoted and as an IRI would silently stamp the IRI
    triple ``obj_kind='literal'`` — reject it loudly instead."""
    clash = set(p.template_literals) & p.template_iris
    if clash:
        raise SparqlSyntaxError(
            f"{sorted(clash)!r} appear(s) as both an IRI and a literal "
            "constant in the template — ambiguous under lexical "
            "literal marking; compose at the DataFrame level instead")


def sparql_update(graph: DataFrame, text: str) -> DataFrame:
    """Parse and apply one SPARQL Update operation against the graph
    (full term schema required for template forms); returns the NEW
    graph DataFrame — nothing mutates in place (see operators/update
    for semantics: lexical-identity DELETE, metadata-preserving
    INSERT, set-semantics result)."""
    from rdfa_streaming_parser_js_spark.operators import update as U

    u = parse_update(text)
    if u.form in ("clear", "drop"):
        return (U.clear_graph if u.form == "clear"
                else U.drop_graph)(graph, u.target)
    if u.form == "create":
        # CREATE GRAPH: a quads table is a SET of quads — empty graphs
        # have no rows to record, so this is the identity (the §3.2.1
        # reading for stores without empty-graph bookkeeping)
        U._require_quads(graph)
        return graph
    if u.form in ("add", "move", "copy"):
        fn = {"add": U.add_graph, "move": U.move_graph,
              "copy": U.copy_graph}[u.form]
        return fn(graph, u.src, u.dst)
    if u.form == "insert_data":
        return U.insert_data(graph, u.data)
    if u.form == "delete_data":
        return U.delete_data(graph, u.data)
    g = u.where
    if g.union or g.subselects or g.graph_ranges:
        raise SparqlSyntaxError(
            "UNION / sub-SELECT / an all-rescoped GRAPH variable in an "
            "update WHERE is not supported — compose at the DataFrame "
            "level with apply_update")
    if g.late_binds:
        raise SparqlSyntaxError(
            "BIND referencing OPTIONAL-bound variables in an update "
            "WHERE is not supported — compose at the DataFrame level "
            "with apply_update")
    return U.apply_update(
        graph, delete=u.delete, insert=u.insert,
        literal_consts=u.template_literals or None,
        meta_vars=u.meta_vars,
        where=g.patterns, filters=g.filters or None,
        optionals=g.optionals or None, minus=g.minus or None,
        values=g.values or None, binds=g.binds or None,
        exists=g.exists or None, not_exists=g.not_exists or None)


# --------------------------------------------------------------------
# top-level parse
# --------------------------------------------------------------------

def parse_sparql(text: str) -> ParsedQuery:
    """Parse SPARQL text into a :class:`ParsedQuery` (no Spark work)."""
    p = _Parser(text)
    p.parse_prologue()
    if p.take_kw("select"):
        q = p._parse_select_body()
    elif p.take_kw("ask"):
        q = ParsedQuery(form="ask", where=Group())
        p.take_kw("where")
        q.where = p.parse_group()
    elif p.take_kw("describe"):
        q = ParsedQuery(form="describe", where=Group())
        while True:
            t = p.peek()
            if t.kind == "VAR":
                q.describe_targets.append(p.next().text)
            elif t.kind in ("IRIREF", "PNAME", "COLON"):
                q.describe_targets.append(p.expand_iri(p.next()))
            else:
                break
        if not q.describe_targets:
            p.fail("DESCRIBE needs at least one IRI or variable")
        if p.take_kw("where") or p.at_op("{"):
            q.where = p.parse_group()
        if any(v.startswith("?") for v in q.describe_targets) \
                and not q.where.patterns and not q.where.union \
                and not q.where.subselects:
            p.fail("DESCRIBE with a variable needs a WHERE clause "
                   "binding it")
    elif p.take_kw("construct"):
        q = ParsedQuery(form="construct", where=Group())
        if p.at_kw("where"):
            # CONSTRUCT WHERE { ... } shorthand (§10.2.3): the WHERE
            # pattern doubles as the template.  The spec limits the
            # body to triple patterns; this engine additionally
            # requires variable/IRI terms only — a literal constant
            # would need the template literal-marking channel that
            # only full templates thread, and a quad or path has no
            # template meaning.
            p.next()
            q.where = p.parse_group()
            if (q.where.filters or q.where.binds or q.where.late_binds
                    or q.where.values
                    or q.where.optionals or q.where.minus
                    or q.where.exists or q.where.not_exists
                    or q.where.union or q.where.subselects):
                p.fail("CONSTRUCT WHERE shorthand allows triple "
                       "patterns only (SPARQL §10.2.3)")
            if not q.where.patterns:
                p.fail("CONSTRUCT WHERE shorthand needs at least one "
                       "triple pattern")
            for pat in q.where.patterns:
                if len(pat) != 3 or not isinstance(pat[1], str):
                    p.fail("CONSTRUCT WHERE shorthand allows plain "
                           "triple patterns only (no GRAPH, no "
                           "property paths)")
                if any(isinstance(t, Lit) for t in pat) or (
                        isinstance(pat[2], str)
                        and not pat[2].startswith("?")
                        and ":" not in pat[2]):
                    p.fail("CONSTRUCT WHERE shorthand takes variable "
                           "or IRI terms only — use the full "
                           "CONSTRUCT {} WHERE {} form for literal "
                           "constants")
            q.template = list(q.where.patterns)
            _parse_modifiers(p, q)
            if p.peek().kind != "EOF":
                p.fail("trailing input after query")
            _stamp_meta(q, frozenset(p.meta_vars), p)
            return q
        tmpl = Group()
        p.expect_op("{")
        p.in_template = True
        try:
            while not p.at_op("}"):
                p._parse_triples_block(tmpl)
                p.take_op(".")
        finally:
            p.in_template = False
        p.expect_op("}")
        for s, pr, o in tmpl.patterns:
            if not isinstance(pr, str):
                raise SparqlSyntaxError(
                    "property paths are not allowed in a CONSTRUCT "
                    "template")
        q.template = tmpl.patterns
        p.expect_kw("where")
        q.where = p.parse_group()
        _parse_modifiers(p, q)
    else:
        p.fail("expected SELECT, ASK or CONSTRUCT")
    if p.peek().kind != "EOF":
        p.fail("trailing input after query")
    _stamp_meta(q, frozenset(p.meta_vars), p)
    _check_template_collisions(p)
    q.template_literals = dict(p.template_literals)
    return q


def _stamp_meta(q: ParsedQuery, mv: frozenset,
                p: "_Parser | None" = None) -> None:
    """Record the term-metadata variable set on the query and every
    nested sub-SELECT (the set is parser-global; a variable only gains
    companion columns in groups that actually bind it).  Sub-SELECTs
    inside OPTIONAL/MINUS/EXISTS bodies are hidden behind GroupSpec
    relation thunks by stamping time, so the parser's flat
    ``all_subqueries`` registry covers them."""
    q.meta_vars = mv
    stack = [q.where]
    while stack:
        g = stack.pop()
        stack.extend(b for b in g.union if isinstance(b, Group))
        for sq in g.subselects:
            _stamp_meta(sq, mv)
    for sq in (p.all_subqueries if p is not None else ()):
        _stamp_meta(sq, mv)


def _parse_modifiers(p: _Parser, q: ParsedQuery) -> None:
    if p.take_kw("group"):
        p.expect_kw("by")
        while p.peek().kind == "VAR":
            q.group_by.append(p.next().text[1:])
        if not q.group_by:
            p.fail("GROUP BY needs at least one variable")
    if p.take_kw("having"):
        # HavingCondition+ (§11.1): each condition may contain
        # aggregate calls directly — compiled later as hidden agg
        # columns — or reference SELECT aggregate aliases (?n).
        p._allow_agg = True
        try:
            while True:
                p._saw_agg = False
                q.having.append((p.parse_expr_or_call(), p._saw_agg))
                if not p.at_op("("):
                    break
        finally:
            p._allow_agg = False
    if p.take_kw("order"):
        p.expect_kw("by")
        while True:
            if p.take_kw("asc"):
                p.expect_op("(")
                q.order_by.append((p.parse_expr(), True))
                p.expect_op(")")
            elif p.take_kw("desc"):
                p.expect_op("(")
                q.order_by.append((p.parse_expr(), False))
                p.expect_op(")")
            elif p.peek().kind == "VAR":
                q.order_by.append((p.next().text[1:], True))
            else:
                break
        if not q.order_by:
            p.fail("ORDER BY needs at least one key")
    # LIMIT/OFFSET accepted in either order, per the SPARQL grammar
    # (grammar requires INTEGER — a decimal NUMBER token must fail as
    # a SparqlSyntaxError, not a raw ValueError)
    for _ in range(2):
        if p.take_kw("limit"):
            t = p.next()
            if t.kind != "NUMBER" or not t.text.lstrip("+-").isdigit():
                p.fail("expected integer LIMIT count")
            q.limit = int(t.text)
        elif p.take_kw("offset"):
            t = p.next()
            if t.kind != "NUMBER" or not t.text.lstrip("+-").isdigit():
                p.fail("expected integer OFFSET count")
            q.offset = int(t.text)
    if p.at_kw("values"):
        p.next()
        _attach_trailing_values(p, q)


def _attach_trailing_values(p: "_Parser", q: ParsedQuery) -> None:
    """Trailing ``VALUES`` block (the grammar's query-final
    ValuesClause — the standard parameterized-query idiom).  §18.2
    joins the inline data with the whole query pattern, which commutes
    with pushing the join INTO the group exactly when every VALUES
    variable is bound by the group's required triple patterns (then
    ``Join(LeftJoin(P,O), V) = LeftJoin(Join(P,V), O)``, and the join
    distributes over every UNION branch).  So the rows compile onto
    the existing in-group VALUES machinery under that guard; grouping/
    aggregates (where §18.2.4 puts the join AFTER aggregation) and
    VALUES variables the required patterns don't bind raise rather
    than silently mis-evaluate — put the VALUES inside WHERE there."""
    rows = p._parse_values()
    if q.group_by or q.having or any(
            it.is_agg for it in (q.select or [])):
        p.fail("a trailing VALUES block on a grouped/aggregated query "
               "is not supported — put the VALUES block inside WHERE")
    used = set()
    for row in rows:
        used |= set(row)

    def _inject(g: Group) -> None:
        if g.union:
            for b in g.union:
                _inject(b)
            return
        req = {t[1:] for pat in g.patterns for t in pat
               if isinstance(t, str) and t.startswith("?")}
        missing = used - req
        if missing:
            p.fail("trailing VALUES constrains "
                   f"{sorted('?' + v for v in missing)} which the "
                   "group's required triple patterns do not bind — "
                   "put the VALUES block inside WHERE")
        g.values.extend(rows)

    _inject(q.where)


# --------------------------------------------------------------------
# execution
# --------------------------------------------------------------------

_SQL_IDENT = re.compile(r"[A-Za-z_][A-Za-z_0-9]*")


def _entry_vars(entry) -> set:
    """Over-approximate every variable a compiled OPTIONAL/MINUS/
    EXISTS entry can bind or reference: pattern variables, BIND names
    + expression identifiers, VALUES keys, filter-SQL identifiers
    (which over-count — function names match the identifier regex —
    but an over-approximation can only RAISE more, never silently
    mis-evaluate), recursing through nested :class:`bgp.GroupSpec`."""
    out = set()
    if isinstance(entry, GroupSpec):
        parts = (entry.patterns, entry.filters,
                 (entry.binds or []) + (entry.late_binds or []),
                 entry.values)
        for sub in ((entry.optionals or []) + (entry.minus or [])
                    + (entry.exists or []) + (entry.not_exists or [])
                    + (entry.union or [])):
            out |= _entry_vars(sub)
    else:  # OptionalGroup tuple: (patterns, filters[, binds, values])
        parts = tuple(entry) + (None,) * (4 - len(entry))
    patterns, filters, binds, values = parts[0], parts[1], parts[2], parts[3]
    for pat in patterns or ():
        out |= {t[1:] for t in pat
                if isinstance(t, str) and t.startswith("?")}
    for f in filters or ():
        out |= set(_SQL_IDENT.findall(f))
    for name, expr in binds or ():
        out.add(name)
        out |= set(_SQL_IDENT.findall(expr))
    for row in values or ():
        out |= set(row)
    if isinstance(entry, GroupSpec):
        for _thunk, _cert, cols in entry.relations or ():
            out |= set(cols)
    return out


def _projected_vars(q: "ParsedQuery") -> set:
    """The variables a sub-SELECT's solution relation binds, computed
    at parse time (no DataFrame yet).  Explicit projections are exact;
    ``SELECT *`` over-approximates via the group's variable walk —
    over-counting only makes the composition guard raise MORE, never
    silently mis-evaluate."""
    if q.select is not None:
        return {it.var for it in q.select}
    return _group_vars(q.where)


def _group_vars(g: Group) -> set:
    """Over-approximate the variables visible in a parser Group's own
    solution (pattern vars, BIND/VALUES names, graph-range names,
    OPTIONAL/MINUS-introduced vars, nested sub-SELECT projections).
    FILTER/EXISTS identifiers ride along via :func:`_entry_vars` —
    an over-approximation, harmless for guards."""
    out = {t[1:] for pat in g.patterns for t in pat
           if isinstance(t, str) and t.startswith("?")}
    for name, _expr in g.binds + g.late_binds:
        out.add(name)
    for row in g.values:
        out |= set(row)
    out |= set(g.graph_ranges)
    for b in g.union:
        out |= (_entry_vars(b) if isinstance(b, GroupSpec)
                else _group_vars(b))
    for entry in g.optionals + g.minus:
        out |= _entry_vars(entry)
    for sq in g.subselects:
        out |= _projected_vars(sq)
    return out


def _certain_out_vars(q: "ParsedQuery") -> frozenset:
    """The sub-SELECT projections bound in EVERY solution row — the
    sound under-approximation the §18.3 mask machinery needs (claiming
    certainty for a NULL-able column would compute wrong answers, the
    reverse only costs extra mask partitions).  A plain projected
    variable is certain iff certain in the WHERE group; every
    expression/aggregate projection counts as maybe-unbound (COUNT
    never is, but conservatism is free here)."""
    cert = _group_certain(q.where)
    if q.select is None:
        return frozenset(cert)
    return frozenset(it.var for it in q.select
                     if it.sql is None and not it.is_agg
                     and it.var in cert)


def _group_certain(g: Group) -> set:
    """Variables bound in every solution of a parser Group: its own
    pattern vars, the certain projections of its sub-SELECTs (inner
    joins), and graph-range names (non-NULL by construction); a UNION
    is the intersection of its branches.  OPTIONAL/MINUS/BIND/VALUES
    never add certainty."""
    if g.union:
        sets = [(_certain_vars(b) if isinstance(b, GroupSpec)
                 else _group_certain(b)) for b in g.union]
        out = sets[0]
        for s in sets[1:]:
            out &= s
        return set(out)
    cert = {t[1:] for pat in g.patterns for t in pat
            if isinstance(t, str) and t.startswith("?")}
    for sq in g.subselects:
        cert |= _certain_out_vars(sq)
    cert |= set(g.graph_ranges)
    return cert


def _check_subselect_commutes(g: Group, sub_cols: list) -> None:
    """§18.2 composition guard: the compiled plan joins sub-SELECT
    relations AFTER bgp_match applies the group's OPTIONAL/MINUS/
    EXISTS, i.e. it evaluates ``Join(LeftJoin(P, O), S)``.  SPARQL's
    left-to-right group algebra can instead mean
    ``LeftJoin(Join(P, S), O)`` — the two commute exactly when every
    variable an O-entry touches that also appears in a sub-SELECT's
    projection is CERTAIN in the group's own patterns (bound in every
    P solution, so the left join can neither mint nor rewrite it —
    rewriting happens only for maybe-unbound shared variables under
    the §18.3 mask machinery).  Anything else raises rather than
    silently picking an order.  ``sub_cols`` is a list of per-sub
    column-name sets (parse-time projections for nested groups,
    actual DataFrame columns at the top level)."""
    if not sub_cols:
        return
    all_cols = set()
    for s in sub_cols:
        all_cols |= set(s)
    certain = {t[1:] for pat in g.patterns for t in pat
               if isinstance(t, str) and t.startswith("?")}
    for entry in (g.optionals + g.minus + g.exists + g.not_exists):
        clash = (_entry_vars(entry) & all_cols) - certain
        if clash:
            raise SparqlSyntaxError(
                "sub-SELECT and OPTIONAL/MINUS/EXISTS in one group "
                f"share maybe-unbound variable(s) {sorted(clash)} — "
                "join order is semantically significant here; "
                "compose at the DataFrame level")


def _compile_where(triples: DataFrame, g: Group,
                   meta_vars: frozenset = frozenset()) -> DataFrame:
    if g.union:
        return bgp_union(
            *[_compile_where(triples, b, meta_vars) for b in g.union])
    subs = [(_execute_select(triples, sq), _certain_out_vars(sq))
            for sq in g.subselects]
    certain = {t[1:] for pat in g.patterns for t in pat
               if isinstance(t, str) and t.startswith("?")}
    if g.patterns:
        _check_subselect_commutes(g, [s.columns for s, _c in subs])
        sol = bgp_match(
            triples, g.patterns,
            meta_vars=meta_vars,
            # with sub-SELECTs present, group filters may reference the
            # subquery's variables, so they apply to the joined
            # relation below (SPARQL filters scope to the whole group;
            # Catalyst still pushes var-local conjuncts to the scans)
            filters=None if subs else (g.filters or None),
            optionals=g.optionals or None,
            minus=g.minus or None,
            values=g.values or None,
            binds=g.binds or None,
            late_binds=g.late_binds or None,
            exists=g.exists or None,
            not_exists=g.not_exists or None)
    elif subs:
        if g.values or g.binds or g.late_binds:
            raise SparqlSyntaxError(
                "VALUES/BIND in a group whose only relation is a "
                "sub-SELECT is not supported — add a triple pattern "
                "or compose at the DataFrame level")
        sol, cert0 = subs.pop(0)
        certain |= set(cert0)
    else:
        raise SparqlSyntaxError("empty group pattern")
    for s, cert in subs:
        # §18.3-exact Join: a shared variable that is maybe-unbound on
        # either side (an OPTIONAL/BIND projection of the sub-SELECT,
        # or an OPTIONAL/BIND/VALUES variable of the group) routes
        # through the bound-mask machinery — a plain equi join would
        # drop the NULL side, computing non-SPARQL answers.
        sol = join_relation(sol, s, certain, cert)
        certain |= set(cert)
    if g.subselects and g.filters:
        for expr in g.filters:
            sol = sol.filter(F.expr(expr))
    for var in g.graph_ranges:
        # an outer GRAPH variable that scoped nothing (§13.3): range it
        # over every graph name.  The distinct-name dimension is tiny
        # relative to the quads table — broadcast, never a shuffle.
        if "graph" not in triples.columns:
            raise SparqlSyntaxError(
                f"GRAPH ?{var} ranges over graph names, but the input "
                "is a triples table with no 'graph' column — query a "
                "quads table")
        # §13.3 ranges over NAMED graphs only: a quads table may hold
        # default-graph rows (NULL graph — e.g. after a SPARQL Update
        # inserting bare triples), which must not mint a NULL name
        names = (triples.filter(F.col("graph").isNotNull())
                 .select(F.col("graph").alias(var)).distinct())
        sol = (sol.join(F.broadcast(names), on=var, how="inner")
               if var in sol.columns
               else sol.crossJoin(F.broadcast(names)))
    return sol


def sparql_query(triples: DataFrame, text: str) -> DataFrame:
    """Parse and execute SPARQL ``text`` against the ``triples`` table
    (the engine's extraction schema: subj/pred/obj_value...).  Returns
    the solution DataFrame: one column per projected variable, one
    boolean ``ask`` column for ASK, triples-shaped rows for CONSTRUCT.
    """
    q = parse_sparql(text)
    if q.form == "select":
        return _execute_select(triples, q)
    if q.form == "describe":
        spark = triples.sparkSession
        iris = [v for v in q.describe_targets
                if not v.startswith("?")]
        seeds = (spark.createDataFrame([(i,) for i in iris],
                                       "node string")
                 if iris else None)
        var_names = [v[1:] for v in q.describe_targets
                     if v.startswith("?")]
        if var_names:
            sol = _compile_where(triples, q.where, q.meta_vars)
            for v in var_names:
                s = sol.select(F.col(v).alias("node")).distinct()
                seeds = s if seeds is None else (
                    seeds.unionByName(s).distinct())
        return describe(triples, seeds)
    sol = _compile_where(triples, q.where, q.meta_vars)
    if q.form == "ask":
        return (sol.limit(1)
                .agg((F.count(F.lit(1)) > 0).alias("ask")))
    # CONSTRUCT solution modifiers act on the SOLUTION SEQUENCE, not on
    # the constructed triple bag (SPARQL 1.1 §16.2: template
    # instantiation happens after ORDER/LIMIT/OFFSET) — slicing the
    # output triples would truncate to an arbitrary subset of a graph.
    if q.having and not q.group_by:
        raise SparqlSyntaxError("HAVING requires GROUP BY")
    if q.group_by:
        # §16.2 + §11: grouping acts on the solution sequence BEFORE
        # template instantiation.  The grouped solution binds only the
        # group keys (CONSTRUCT templates have no AS, so aggregates
        # can't be projected — they may only appear in HAVING), so
        # every template variable must be a group key.
        tvars = {term[1:] for pat in q.template for term in pat
                 if term.startswith("?")}
        bad = sorted(tvars - set(q.group_by))
        if bad:
            raise SparqlSyntaxError(
                "CONSTRUCT template variable(s) ?" + " ?".join(bad)
                + " must appear in GROUP BY (aggregates cannot be "
                "projected into a template)")
        # carry each key's term-metadata companions through the
        # grouping as one co-observed (kind, lang, dt) tuple — min of
        # the struct is deterministic and never mixes columns from
        # different source terms
        meta_aggs = []
        for v in q.group_by:
            comps = [v + sfx for sfx in META_SUFFIXES]
            if all(c in sol.columns for c in comps):
                meta_aggs.append((v, comps))
        hidden = [F.expr(expr).alias(f"__having_{i}")
                  for i, (expr, has_agg) in enumerate(q.having)
                  if has_agg]
        carried = [F.min(F.struct(*[F.col(c) for c in comps]))
                   .alias(f"__meta_{v}")
                   for v, comps in meta_aggs]
        if hidden or carried:
            sol = sol.groupBy(*q.group_by).agg(*hidden, *carried)
        else:
            sol = sol.select(*q.group_by).dropDuplicates()
        for i, (expr, has_agg) in enumerate(q.having):
            if not has_agg:
                raise SparqlSyntaxError(
                    "HAVING in CONSTRUCT must be an aggregate "
                    "condition (there are no SELECT aliases to "
                    "reference)")
            sol = sol.filter(F.col(f"__having_{i}"))
        sol = sol.drop(*[f"__having_{i}"
                         for i in range(len(q.having))])
        for v, comps in meta_aggs:
            for c in comps:
                sol = sol.withColumn(
                    c, F.col(f"__meta_{v}.{c}"))
            sol = sol.drop(f"__meta_{v}")
    if q.order_by:
        sol = _order(sol, q.order_by)
    sol = _slice(sol, q)
    # use_meta: template variables that carry companion metadata
    # columns (introspected or constructor-bound) emit the SOURCE
    # term's kind/datatype/language instead of the shape heuristic —
    # a copied literal stays the same literal
    return bgp_construct(sol, q.template, use_meta=True,
                         literal_consts=q.template_literals or None)


def _execute_select(triples: DataFrame, q: ParsedQuery) -> DataFrame:
    """The SELECT pipeline (shared by top-level queries and §18.2
    sub-SELECTs): aggregate path vs plain projection, then DISTINCT /
    ORDER / LIMIT / OFFSET in SPARQL's slice order."""
    sol = _compile_where(triples, q.where, q.meta_vars)
    items = q.select
    agg_mode = bool(q.group_by) or bool(
        items and any(it.is_agg for it in items))
    if agg_mode:
        if items is None:
            raise SparqlSyntaxError(
                "SELECT * cannot be combined with GROUP BY/aggregates")
        aggs = [F.expr(it.sql).alias(it.var)
                for it in items if it.is_agg]
        keys = [it.var for it in items if not it.is_agg]
        for k in keys:
            if k not in q.group_by:
                raise SparqlSyntaxError(
                    f"non-aggregated SELECT variable ?{k} must appear "
                    "in GROUP BY")
        if not aggs:
            raise SparqlSyntaxError(
                "GROUP BY without any aggregate in SELECT")
        # HAVING conditions that contain aggregates evaluate IN the
        # grouping (hidden boolean agg columns, filtered then
        # projected away); aggregate-free ones reference SELECT
        # aliases and filter the grouped solution directly.
        hidden = [F.expr(expr).alias(f"__having_{i}")
                  for i, (expr, has_agg) in enumerate(q.having)
                  if has_agg]
        sol = (sol.groupBy(*q.group_by).agg(*aggs, *hidden)
               if q.group_by else sol.agg(*aggs, *hidden))
        for i, (expr, has_agg) in enumerate(q.having):
            sol = sol.filter(F.col(f"__having_{i}") if has_agg
                             else F.expr(expr))
        sol = sol.select(*[it.var for it in items])
    else:
        for it in items or []:
            if it.sql is not None:
                if it.var in sol.columns:
                    raise SparqlSyntaxError(
                        f"(expr AS ?{it.var}) would rebind an "
                        "in-scope variable")
                sol = sol.withColumn(it.var, F.expr(it.sql))
        if q.having:
            raise SparqlSyntaxError("HAVING requires GROUP BY")
        if not q.distinct and q.order_by:
            # order on the full solution (keys may be unprojected —
            # SPARQL sorts before projection)...
            sol = _order(sol, q.order_by)
        if items is not None:
            sol = sol.select(*[it.var for it in items])
        elif q.meta_vars:
            # SELECT *: companion metadata columns are engine plumbing,
            # not solution variables — drop after ordering (ORDER BY
            # expressions may reference them)
            sol = sol.drop(*[v + sfx for v in q.meta_vars
                             for sfx in META_SUFFIXES])

    if q.distinct:
        sol = sol.dropDuplicates()
        # ...but after DISTINCT / aggregation the earlier sort is
        # shuffled away, so ordering applies to projected columns.
        if q.order_by:
            sol = _order(sol, q.order_by)
    elif agg_mode and q.order_by:
        sol = _order(sol, q.order_by)
    return _slice(sol, q)


def _order(sol: DataFrame, keys: list[tuple[str, bool]]) -> DataFrame:
    cols = [F.expr(sql).asc() if asc else F.expr(sql).desc()
            for sql, asc in keys]
    return sol.orderBy(*cols)


def _slice(sol: DataFrame, q: ParsedQuery) -> DataFrame:
    if q.offset:
        sol = sol.offset(q.offset)
    if q.limit is not None:
        sol = sol.limit(q.limit)
    return sol
