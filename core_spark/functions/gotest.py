"""P7 — Go test-inventory extraction kernel (pure Python, Spark-free).

Reimplements the reference's gotesting strategy
(pkg/parser/strategies/gotesting/definition.go:79-286) over the shared
jstest tokenizer (Go's comment/string syntax is the same C family; raw
backtick strings arrive as template tokens):

  * top-level ``func`` declarations only — methods (``func (r T) Name``)
    are excluded, mirroring tree-sitter's function_declaration node
  * name classification (definition.go:159-179): Test*/Benchmark*/
    Example*/Fuzz* with the next-rune-not-lowercase rule (``Testify`` is
    NOT a test; bare ``Example`` is)
  * exact param validation (definition.go:239-286): tests take exactly
    ``*testing.T``, benchmarks ``*testing.B``, fuzz ``*testing.F``,
    examples take none
  * ``x.Run("name", ...)`` calls anywhere inside a TEST body become
    subtests; a test with subtests becomes a suite named after the func
    (definition.go:100-138, 204-219)
  * subtest names unquoted with Go strconv.Unquote semantics
    (definition.go:228-237) — shared with jstest's _go_unquote_double
"""

from __future__ import annotations

from core_spark.functions.jstest import (
    Tok,
    _go_unquote_double,
    tok_span_location,
    tokenize,
)

STATUS_ACTIVE = "active"

_PARAM_TYPES = {"test": "testing.T", "benchmark": "testing.B", "fuzz": "testing.F"}


def classify_func(name: str) -> str | None:
    """definition.go:159-179."""
    for prefix, kind in (
        ("Benchmark", "benchmark"),
        ("Example", "example"),
        ("Fuzz", "fuzz"),
        ("Test", "test"),
    ):
        if name.startswith(prefix):
            rest = name[len(prefix):]
            if kind == "example":
                if rest == "" or not rest[0].islower():
                    return kind
                return None
            if rest and not rest[0].islower():
                return kind
            return None
    return None


def trim_quotes(s: str) -> str:
    """definition.go:228-237: strconv.Unquote, fallback strip."""
    if len(s) >= 2 and s[0] == '"' and s[-1] == '"':
        try:
            return _go_unquote_double(s[1:-1])
        except (ValueError, IndexError):
            pass
    if len(s) >= 2 and s[0] == s[-1] and s[0] in ('"', "`"):
        return s[1:-1]
    return s


def _match(toks: list[Tok], i: int, hi: int) -> int:
    from core_spark.functions.jstest import _match_bracket

    return _match_bracket(toks, i)


def _params_valid(toks: list[Tok], lo: int, hi: int, kind: str) -> bool:
    """Token range inside the parameter parens (exclusive of parens)."""
    from core_spark.functions.jstest import _split_args

    params = _split_args(toks, lo, hi)
    if kind == "example":
        return len(params) == 0
    if len(params) != 1:
        return False
    plo, phi = params[0]
    # expect ... '*' 'testing' '.' <T|B|F> as the trailing tokens
    tail = toks[phi - 4:phi]
    if len(tail) != 4:
        return False
    star, pkg, dot, typ = tail
    if not (star.kind == "punct" and star.text == "*"):
        return False
    if not (pkg.kind == "id" and dot.kind == "punct" and dot.text == "."
            and typ.kind == "id"):
        return False
    return f"{pkg.text}.{typ.text}" == _PARAM_TYPES[kind]


def _subtests(toks: list[Tok], lo: int, hi: int) -> list[dict]:
    """x.Run("name", ...) anywhere in the body (definition.go:100-138)."""
    from core_spark.functions.jstest import _split_args

    out = []
    i = lo
    while i < hi:
        t = toks[i]
        if (
            t.kind == "punct"
            and t.text == "."
            and i + 2 < hi
            and toks[i + 1].kind == "id"
            and toks[i + 1].text == "Run"
            and toks[i + 2].kind == "punct"
            and toks[i + 2].text == "("
        ):
            close = _match(toks, i + 2, hi)
            args = _split_args(toks, i + 3, min(close, hi))
            name = ""
            for alo, ahi in args:
                if ahi - alo >= 1 and toks[alo].kind in ("str", "tpl"):
                    name = trim_quotes(toks[alo].text)
                    break
            if name:
                # span: the x.Run(...) call expression — receiver token
                # (just before the '.') through the closing paren
                si = i - 1 if i > 0 and toks[i - 1].kind == "id" else i
                out.append(
                    {
                        "name": name,
                        "status": STATUS_ACTIVE,
                        "loc": tok_span_location(toks, si, min(close, hi)),
                    }
                )
            i += 3  # keep scanning INSIDE the Run args (nested t.Run)
            continue
        i += 1
    return out


def parse_go_tests(source: str) -> list[dict]:
    """Flattened inventory rows (same model as jstest.parse_js_tests)."""
    toks = tokenize(source)
    rows: list[dict] = []
    n = len(toks)
    depth = 0
    i = 0
    while i < n:
        t = toks[i]
        if t.kind == "punct":
            if t.text == "{":
                depth += 1
            elif t.text == "}":
                depth = max(0, depth - 1)
            i += 1
            continue
        if t.kind == "id" and t.text == "func" and depth == 0:
            j = i + 1
            if j >= n or toks[j].kind != "id":
                i = j  # method (receiver parens) or anonymous — skip
                continue
            name = toks[j].text
            kind = classify_func(name)
            j += 1
            if j >= n or not (toks[j].kind == "punct" and toks[j].text == "("):
                i = j
                continue
            pclose = _match(toks, j, n)
            if kind is None or not _params_valid(toks, j + 1, pclose, kind):
                i = pclose + 1
                continue
            # body block follows the params for testing funcs
            b = pclose + 1
            if b < n and toks[b].kind == "punct" and toks[b].text == "{":
                bclose = _match(toks, b, n)
            else:
                bclose = b
            subs = _subtests(toks, b + 1, bclose) if kind == "test" else []
            # span: the whole function_declaration — 'func' through the
            # body's closing brace (treesitter.go:114-125 convention)
            floc = tok_span_location(toks, i, bclose if bclose > b else b)
            if subs:
                rows.append(
                    {
                        "kind": "suite",
                        "suite_path": [],
                        "name": name,
                        "status": STATUS_ACTIVE,
                        "modifier": "",
                        **floc,
                    }
                )
                for s in subs:
                    rows.append(
                        {
                            "kind": "test",
                            "suite_path": [name],
                            "name": s["name"],
                            "status": s["status"],
                            "modifier": "",
                            **s["loc"],
                        }
                    )
            else:
                rows.append(
                    {
                        "kind": "test",
                        "suite_path": [],
                        "name": name,
                        "status": STATUS_ACTIVE,
                        "modifier": "",
                        **floc,
                    }
                )
            i = bclose + 1 if bclose > b else b
            continue
        i += 1
    return rows
