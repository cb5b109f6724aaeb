"""Transcribe the reference's jest fixture corpus into JSON goldens.

Reads /root/reference/test/RdfParser-test.ts (the reference's end-to-end
fixture suite, 209 cases) and mechanically extracts each
(parser options, input document, expected quads) triple into
tests/fixtures/rdfa_cases.json. Only test DATA is extracted — no code.

Skipped (non-fixture) cases: error-propagation tests, direct emitTriple
unit tests, Sink/import plumbing, htmlParseListener hooks, and tests whose
input is not an inline template literal.

Run: python tools/transcribe_fixtures.py
"""

from __future__ import annotations

import json
import re
from pathlib import Path

SRC = Path("/root/reference/test/RdfParser-test.ts")
OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "rdfa_cases.json"

IT_RE = re.compile(
    r"\bit\(((?:'(?:\\.|[^'\\])*')(?:\s*\+\s*'(?:\\.|[^'\\])*')*),"
    r"\s*async\(\)\s*=>\s*\{", re.S)
HTML_RE = re.compile(r"parse\(parser,\s*`((?:\\.|[^`\\])*)`\)", re.S)
ISO_RE = re.compile(r"toBeRdfIsomorphic\(\[", re.S)
QUAD_RE = re.compile(r"\bquad\(")
STR_RE = re.compile(r"'((?:\\.|[^'\\])*)'", re.S)
CTOR_RE = re.compile(r"new RdfaParser\(", re.S)
FEATVAR_RE = re.compile(r"const features\s*=\s*(\{[^}]*\})", re.S)

OPT_STR_RE = {
    "base_iri": re.compile(r"baseIRI:\s*'([^']*)'"),
    "profile": re.compile(r"profile:\s*'([^']*)'"),
    "content_type": re.compile(r"contentType:\s*'([^']*)'"),
    "language": re.compile(r"language:\s*'([^']*)'"),
    "vocab": re.compile(r"vocab:\s*'([^']*)'"),
}
FEAT_FLAG_RE = re.compile(r"(\w+):\s*(true|false)")

# camelCase (reference RdfaProfile.ts) → snake_case (our profiles.py)
FEATURE_NAMES = {
    "baseTag": "base_tag",
    "xmlBase": "xml_base",
    "langAttribute": "lang_attribute",
    "onlyAllowUriRelRevIfProperty": "only_allow_uri_rel_rev_if_property",
    "inheritSubjectInHeadBody": "inherit_subject_in_head_body",
    "datetimeAttribute": "datetime_attribute",
    "timeTag": "time_tag",
    "htmlDatatype": "html_datatype",
    "copyRdfaPatterns": "copy_rdfa_patterns",
    "xmlnsPrefixMappings": "xmlns_prefix_mappings",
    "skipHandlingXmlLiteralChildren": "skip_handling_xml_literal_children",
    "xhtmlInitialContext": "xhtml_initial_context",
    "roleAttribute": "role_attribute",
}

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
            "'": "'", '"': '"', "`": "`", "\\": "\\", "$": "$", "/": "/",
            "0": "\0"}


def js_unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt == "u" and i + 5 < len(s):
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def balanced(text: str, start: int, open_ch: str, close_ch: str) -> str:
    """Return the substring from the opener at ``start`` to its match
    (quote-aware: brackets inside string literals don't count)."""
    depth = 0
    quote = None
    i = start
    while i < len(text):
        c = text[i]
        if quote:
            if c == "\\":
                i += 2
                continue
            if c == quote:
                quote = None
        elif c in "'`\"":
            quote = c
        elif c == open_ch:
            depth += 1
        elif c == close_ch:
            depth -= 1
            if depth == 0:
                return text[start:i + 1]
        i += 1
    return text[start:]


def parse_term(raw: str):
    if raw.startswith("_:"):
        return ["bnode", raw[2:]]
    if raw.startswith('"'):
        m = re.match(r'^"(.*)"(?:@([^@^]+)|\^\^(.+))?$', raw, re.S)
        assert m, raw
        return ["lit", m.group(1), m.group(3), m.group(2)]
    return ["iri", raw]


def split_args(argstr: str) -> list[str]:
    """Split a JS argument list on top-level commas (quote/paren aware)."""
    args, depth, quote, start = [], 0, None, 0
    i = 0
    while i < len(argstr):
        c = argstr[i]
        if quote:
            if c == "\\":
                i += 2
                continue
            if c == quote:
                quote = None
        elif c in "'`\"":
            quote = c
        elif c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif c == "," and depth == 0:
            args.append(argstr[start:i])
            start = i + 1
        i += 1
    args.append(argstr[start:])
    return [a.strip() for a in args]


_FRAG_RE = re.compile(r"'((?:\\.|[^'\\])*)'|`((?:\\.|[^`\\])*)`", re.S)


def eval_js_string_expr(expr: str, consts: dict[str, str]) -> str | None:
    """Evaluate a JS expression that is a concatenation of string
    literals (single-quoted or template) with ${var} interpolation."""
    parts = []
    found = False
    for m in _FRAG_RE.finditer(expr):
        found = True
        if m.group(1) is not None:
            parts.append(js_unescape(m.group(1)))
        else:
            tmpl = m.group(2)
            tmpl = re.sub(
                r"\$\{(\w+)\}",
                lambda im: consts.get(im.group(1), ""), tmpl)
            parts.append(js_unescape(tmpl))
    return "".join(parts) if found else None


_CONST_RE = re.compile(r"const (\w+)\s*=\s*((?:'(?:\\.|[^'\\])*'"
                       r"|`(?:\\.|[^`\\])*`|\s|\+)+);", re.S)


def block_consts(block: str) -> dict[str, str]:
    consts: dict[str, str] = {}
    for m in _CONST_RE.finditer(block):
        val = eval_js_string_expr(m.group(2), consts)
        if val is not None:
            consts[m.group(1)] = val
    return consts


def parse_options(block: str):
    opts: dict = {}
    m = CTOR_RE.search(block)
    if not m:
        return None
    arg = balanced(block, block.index("(", m.start()), "(", ")")
    for key, rx in OPT_STR_RE.items():
        om = rx.search(arg)
        if om:
            opts[key] = om.group(1)
    fm = re.search(r"features:\s*\{", arg)
    if fm:
        fobj = balanced(arg, arg.index("{", fm.start()), "{", "}")
        opts["features"] = {
            FEATURE_NAMES[name]: val == "true"
            for name, val in FEAT_FLAG_RE.findall(fobj)
            if name in FEATURE_NAMES
        }
    elif re.search(r"features\s*[,})]", arg):
        fv = FEATVAR_RE.search(block)
        if fv:
            opts["features"] = {
                FEATURE_NAMES[name]: val == "true"
                for name, val in FEAT_FLAG_RE.findall(fv.group(1))
                if name in FEATURE_NAMES
            }
        else:
            return "SKIP"
    return opts


def main() -> None:
    text = SRC.read_text()
    its = list(IT_RE.finditer(text))
    cases = []
    skipped = []
    seen_names: dict[str, int] = {}
    for idx, m in enumerate(its):
        name = eval_js_string_expr(m.group(1), {})
        end = its[idx + 1].start() if idx + 1 < len(its) else len(text)
        block = text[m.start():end]
        # Don't leak the next describe/beforeEach into this block
        cut = min((p for p in (block.find("describe("),
                               block.find("beforeEach(")) if p >= 0),
                  default=-1)
        if cut >= 0:
            block = block[:cut]

        if (".rejects" in block or "emitTriple(" in block
                or "htmlParseListener" in block or ".import(" in block
                or "defaultGraph" in block):
            skipped.append((name, "non-fixture"))
            continue
        hm = HTML_RE.search(block)
        im = ISO_RE.search(block)
        if not hm or not im:
            skipped.append((name, "no inline html/expectation"))
            continue

        opts = {"base_iri": "http://example.org/"}
        parsed = parse_options(block)
        if parsed == "SKIP":
            skipped.append((name, "unparseable options"))
            continue
        if parsed is not None:
            opts = parsed

        exp_list = balanced(block, block.index("[", im.start()), "[", "]")
        consts = block_consts(block)
        expected = []
        ok = True
        for qm in QUAD_RE.finditer(exp_list):
            qargs = balanced(exp_list, exp_list.index("(", qm.start()),
                             "(", ")")
            args = split_args(qargs[1:-1])
            terms = [eval_js_string_expr(a, consts) for a in args[:3]]
            if len(terms) < 3 or any(t is None for t in terms):
                ok = False
                break
            expected.append([parse_term(t) for t in terms])
        if not ok:
            skipped.append((name, "unparseable quad"))
            continue

        count = seen_names.get(name, 0)
        seen_names[name] = count + 1
        cases.append({
            "name": name if count == 0 else f"{name} #{count + 1}",
            "options": opts,
            "html": hm.group(1).replace("\\`", "`").replace("\\$", "$")
                    .replace("\\\\", "\\"),
            "expected": expected,
        })

    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(
        {"source": str(SRC), "cases": cases}, indent=1))
    print(f"transcribed {len(cases)} cases, skipped {len(skipped)}")
    for name, why in skipped:
        print(f"  SKIP [{why}] {name}")


if __name__ == "__main__":
    main()
