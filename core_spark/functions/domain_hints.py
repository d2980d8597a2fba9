"""P19 — domain-hints extraction (imports + calls) for JS/TS, Python, Go.

Reimplements the reference's domain_hints extractors
(pkg/parser/domain_hints/{javascript,python,go}.go) without tree-sitter:
JS/Go ride on the jstest tokenizer (string/comment-aware), Python on the
stdlib ``ast`` parser.

Shared semantics (go.go:138-181, javascript.go:158-209):

  * normalize_call: strip ALL whitespace, keep first 2 dot-segments
  * noise filter: empty, leading '[', 1-char non-identifier
  * per-language test-framework call blacklists checked on the base name
    (segment before the first dot)
  * dedup preserving first-seen order; a file with no imports AND no calls
    yields None (hints absent, not empty)

Language specifics:

  * JS/TS: ES6 ``import ... from 'x'`` / ``import 'x'`` (type-only imports
    excluded, javascript.go:173-189), CommonJS ``require('x')``; calls are
    identifier/member-chain callees anywhere (``require`` skipped —
    already an import)
  * Python: ``import a.b``, ``from a.b import c`` (relative dots kept),
    calls from Name/Attribute callees (python.go:15-37)
  * Go: import declarations (single or parenthesized block, quotes/backticks
    trimmed); calls restricted to statement positions inside func bodies —
    expression statements and := right sides (go.go:19-46's query shape,
    approximated as chain-at-statement-start or after ':=')
"""

from __future__ import annotations

import ast as _pyast
import re

from core_spark.functions.jstest import Tok, tokenize

JS_TEST_CALLS = {
    "describe", "it", "test", "expect",
    "beforeEach", "afterEach", "beforeAll", "afterAll",
    "vi", "jest", "cy", "fn",
}

PY_TEST_CALLS = {
    "pytest", "test", "fixture", "mark", "parametrize",
    "skip", "skipif", "xfail",
    "setup", "teardown", "setup_method", "teardown_method",
    "setup_class", "teardown_class", "setup_module", "teardown_module",
    "raises", "monkeypatch", "caplog", "capsys", "tmpdir",
    "request", "pytestconfig", "tmp_path",
    "unittest", "setUp", "tearDown", "setUpClass", "tearDownClass",
    "setUpModule", "tearDownModule",
    "mock", "patch", "Mock", "MagicMock",
    "self",
}

_WS = re.compile(r"\s+")
_IDENT_CHAR = re.compile(r"[A-Za-z0-9_]")


def normalize_call(call: str) -> str:
    """go.go:138-153: strip whitespace, keep 2 dot-segments."""
    call = _WS.sub("", call)
    parts = call.split(".", 2)
    if len(parts) >= 2:
        return parts[0] + "." + parts[1]
    return call


def is_noise(call: str) -> bool:
    """go.go:156-175."""
    if not call:
        return True
    if call[0] == "[":
        return True
    if len(call) == 1 and not _IDENT_CHAR.match(call):
        return True
    return False


def _blacklisted(call: str, blacklist: set[str]) -> bool:
    base = call.split(".", 1)[0]
    return base in blacklist


def _hints_or_none(imports: list[str], calls: list[str]):
    if not imports and not calls:
        return None
    return {"imports": imports, "calls": calls}


def _unquote(s: str) -> str:
    if len(s) >= 2 and s[0] in "'\"`" and s[-1] == s[0]:
        return s[1:-1]
    return s


# -- JS/TS ------------------------------------------------------------------


def _js_id_chain(toks: list[Tok], i: int):
    if toks[i].kind != "id":
        return None
    names = [toks[i].text]
    j = i + 1
    while (
        j + 1 < len(toks)
        and toks[j].kind == "punct"
        and toks[j].text == "."
        and toks[j + 1].kind == "id"
    ):
        names.append(toks[j + 1].text)
        j += 2
    return names, j


def extract_js_hints(source: str):
    toks = tokenize(source)
    imports: list[str] = []
    calls: list[str] = []
    seen_i: set[str] = set()
    seen_c: set[str] = set()
    n = len(toks)
    i = 0
    while i < n:
        t = toks[i]
        if t.kind == "id" and t.text == "import":
            # `import type {..} from 'x'` -> excluded; `import 'x'` or
            # `import .. from 'x'` -> the first string before ';'/next import
            is_type = i + 1 < n and toks[i + 1].kind == "id" and toks[i + 1].text == "type"
            j = i + 1
            src_str = None
            while j < n:
                tj = toks[j]
                if tj.kind == "str":
                    src_str = tj.text
                    break
                if tj.kind == "punct" and tj.text == ";":
                    break
                if tj.kind == "id" and tj.text == "import":
                    break
                j += 1
            if src_str is not None and not is_type:
                path = _unquote(src_str)
                if path and path not in seen_i:
                    seen_i.add(path)
                    imports.append(path)
            i = j + 1 if src_str is not None else i + 1
            continue
        got = _js_id_chain(toks, i)
        if got is not None:
            names, j = got
            if j < n and toks[j].kind == "punct" and toks[j].text == "(":
                text = ".".join(names)
                if text == "require":
                    # require('x') -> CommonJS import
                    if (
                        j + 1 < n
                        and toks[j + 1].kind == "str"
                    ):
                        path = _unquote(toks[j + 1].text)
                        if path and path not in seen_i:
                            seen_i.add(path)
                            imports.append(path)
                else:
                    call = normalize_call(text)
                    if (
                        call
                        and not is_noise(call)
                        and not _blacklisted(call, JS_TEST_CALLS)
                        and call not in seen_c
                    ):
                        seen_c.add(call)
                        calls.append(call)
            i = j
            continue
        i += 1
    return _hints_or_none(imports, calls)


# -- Python -----------------------------------------------------------------


def _py_func_text(func) -> str | None:
    if isinstance(func, _pyast.Name):
        return func.id
    if isinstance(func, _pyast.Attribute):
        try:
            return _pyast.unparse(func)
        except Exception:
            return None
    return None


def extract_py_hints(source: str):
    try:
        tree = _pyast.parse(source)
    except (SyntaxError, ValueError):
        return None
    imports: list[str] = []
    calls: list[str] = []
    seen_i: set[str] = set()
    seen_c: set[str] = set()
    for node in _pyast.walk(tree):
        if isinstance(node, _pyast.Import):
            for alias in node.names:
                if alias.name and alias.name not in seen_i:
                    seen_i.add(alias.name)
                    imports.append(alias.name)
        elif isinstance(node, _pyast.ImportFrom):
            mod = "." * node.level + (node.module or "")
            if mod and mod not in seen_i:
                seen_i.add(mod)
                imports.append(mod)
        elif isinstance(node, _pyast.Call):
            text = _py_func_text(node.func)
            if not text:
                continue
            call = normalize_call(text)
            if (
                call
                and not is_noise(call)
                and not _blacklisted(call, PY_TEST_CALLS)
                and call not in seen_c
            ):
                seen_c.add(call)
                calls.append(call)
    return _hints_or_none(imports, calls)


# -- Go ---------------------------------------------------------------------


def extract_go_hints(source: str):
    toks = tokenize(source)
    imports: list[str] = []
    calls: list[str] = []
    seen_c: set[str] = set()
    n = len(toks)
    saw_func = False
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
        if t.kind == "id" and t.text == "import" and depth == 0:
            j = i + 1
            if j < n and toks[j].kind in ("str", "tpl"):
                imports.append(_unquote(toks[j].text))
                i = j + 1
                continue
            if j < n and toks[j].kind == "punct" and toks[j].text == "(":
                j += 1
                while j < n and not (toks[j].kind == "punct" and toks[j].text == ")"):
                    if toks[j].kind in ("str", "tpl"):
                        path = _unquote(toks[j].text)
                        if path:
                            imports.append(path)
                    j += 1
                i = j + 1
                continue
            i = j
            continue
        if t.kind == "id" and t.text == "func":
            saw_func = True
            i += 1
            continue
        if t.kind == "id" and saw_func and depth >= 1:
            got = _js_id_chain(toks, i)
            if got is not None:
                names, j = got
                if j < n and toks[j].kind == "punct" and toks[j].text == "(":
                    prev = toks[i - 1] if i > 0 else None
                    at_stmt = (
                        prev is None
                        or (prev.kind == "punct" and prev.text in ("{", "}", ";", "=", ":="))
                        or prev.line < t.line
                    )
                    if at_stmt:
                        call = normalize_call(".".join(names))
                        if (
                            call
                            and not is_noise(call)
                            and call not in seen_c
                        ):
                            seen_c.add(call)
                            calls.append(call)
                i = j
                continue
        i += 1
    return _hints_or_none(imports, calls)


# -- Java (domain_hints/java.go) --------------------------------------------

JAVA_TEST_CALLS = {
    "assertEquals", "assertNotEquals", "assertTrue", "assertFalse",
    "assertNull", "assertNotNull", "assertSame", "assertNotSame",
    "assertArrayEquals", "assertThrows", "assertDoesNotThrow",
    "assertAll", "assertTimeout", "assertTimeoutPreemptively",
    "fail", "assumeTrue", "assumeFalse", "Assertions",
    "assertThat", "is", "equalTo", "hasSize", "contains",
    "containsString", "startsWith", "endsWith", "MatcherAssert",
    "mock", "spy", "when", "verify", "doReturn", "doThrow", "doNothing",
    "times", "never", "any", "eq", "anyString", "anyInt", "anyLong",
    "Mockito", "isEqualTo", "isNotNull",
}

_JAVA_KEYWORDS = {"if", "while", "for", "switch", "catch", "return", "new", "super", "this"}


def extract_java_hints(source: str):
    toks = tokenize(source)
    n = len(toks)
    imports: list[str] = []
    calls: list[str] = []
    seen_i: set[str] = set()
    seen_c: set[str] = set()
    i = 0
    while i < n:
        t = toks[i]
        if t.kind == "id" and t.text == "import":
            j = i + 1
            if j < n and toks[j].kind == "id" and toks[j].text == "static":
                j += 1
            parts = []
            star = False
            while j < n and not (toks[j].kind == "punct" and toks[j].text == ";"):
                if toks[j].kind == "id":
                    parts.append(toks[j].text)
                elif toks[j].kind == "punct" and toks[j].text == "*":
                    star = True
                j += 1
            if parts:
                path = ".".join(parts) + (".*" if star else "")
                if path not in seen_i:
                    seen_i.add(path)
                    imports.append(path)
            i = j + 1
            continue
        got = _js_id_chain(toks, i)
        if got is not None:
            names, j = got
            if (
                j < n
                and toks[j].kind == "punct" and toks[j].text == "("
                and names[0] not in _JAVA_KEYWORDS
                and not (i > 0 and toks[i - 1].kind == "id" and toks[i - 1].text == "new")
            ):
                call = normalize_call(".".join(names))
                if (
                    call and not is_noise(call)
                    and not _blacklisted(call, JAVA_TEST_CALLS)
                    and call not in seen_c
                ):
                    seen_c.add(call)
                    calls.append(call)
            i = j
            continue
        i += 1
    return _hints_or_none(imports, calls)


# -- Rust (domain_hints/rust.go) --------------------------------------------

RUST_TEST_CALLS = {
    "assert", "assert_eq", "assert_ne", "debug_assert", "panic",
    "unreachable", "todo", "unimplemented",
    "println", "print", "eprintln", "eprint", "dbg", "format", "vec",
    "tokio.test", "proptest", "prop_assert", "prop_assert_eq",
    "Ok", "Err", "Some", "None",
}


def extract_rust_hints(source: str):
    from core_spark.functions.rusttest import tokenize_rust

    toks = tokenize_rust(source)
    n = len(toks)
    imports: list[str] = []
    calls: list[str] = []
    seen_i: set[str] = set()
    seen_c: set[str] = set()
    i = 0
    while i < n:
        t = toks[i]
        if t.kind == "id" and t.text == "use":
            # rust.go:137-166: drop {lists}, ' as ' aliases and '::*' globs,
            # then render :: as / (cross-language consistency)
            j = i + 1
            segs: list[str] = []
            while j < n and not (toks[j].kind == "punct" and toks[j].text == ";"):
                tj = toks[j]
                if tj.kind == "punct" and tj.text == "{":
                    break
                if tj.kind == "id" and tj.text == "as":
                    break
                if tj.kind == "id":
                    segs.append(tj.text)
                elif tj.kind == "punct" and tj.text == "*":
                    pass  # glob dropped
                j += 1
            while j < n and not (toks[j].kind == "punct" and toks[j].text == ";"):
                j += 1
            path = "/".join(segs)
            if path and path not in seen_i:
                seen_i.add(path)
                imports.append(path)
            i = j + 1
            continue
        if t.kind == "id" and t.text == "mod" and i + 1 < n and toks[i + 1].kind == "id":
            name = toks[i + 1].text
            if name not in seen_i:
                seen_i.add(name)
                imports.append(name)
            i += 2
            continue
        # call: ident / a::b / a.b followed by '(' (skip macros: '!')
        if t.kind == "id":
            parts = [t.text]
            j = i + 1
            while j + 1 < n and toks[j].kind == "punct" and toks[j].text in (".",) and toks[j + 1].kind == "id":
                parts.append("." + toks[j + 1].text)
                j += 2
            while (
                j + 2 < n
                and toks[j].kind == "punct" and toks[j].text == ":"
                and toks[j + 1].kind == "punct" and toks[j + 1].text == ":"
                and toks[j + 2].kind == "id"
            ):
                parts.append("::" + toks[j + 2].text)
                j += 3
            if (
                j < n
                and toks[j].kind == "punct" and toks[j].text == "("
                and not (j >= 1 and toks[j - 1].kind == "punct" and toks[j - 1].text == "!")
                and len("".join(parts)) > 0
            ):
                text = "".join(parts)
                call = normalize_call(text.replace("::", "."))
                if (
                    call and not is_noise(call)
                    and not _blacklisted(call, RUST_TEST_CALLS)
                    and call not in RUST_TEST_CALLS
                    and call not in seen_c
                ):
                    seen_c.add(call)
                    calls.append(call)
            i = j
            continue
        i += 1
    return _hints_or_none(imports, calls)


# -- Ruby (domain_hints/ruby.go) --------------------------------------------

RUBY_TEST_CALLS = {
    "RSpec", "describe", "context", "it", "specify", "example", "expect",
    "allow", "before", "after", "let", "let!", "subject",
    "shared_examples", "include_examples", "shared_context", "include_context",
    "assert", "refute", "assert_equal", "refute_equal", "must_equal", "wont_equal",
    "FactoryBot", "factory", "build", "create",
    "puts", "print", "raise", "p", "pp",
}


def extract_ruby_hints(source: str):
    from core_spark.functions.rubytest import tokenize_ruby

    toks = tokenize_ruby(source)
    n = len(toks)
    imports: list[str] = []
    calls: list[str] = []
    seen_i: set[str] = set()
    seen_c: set[str] = set()
    i = 0
    while i < n:
        t = toks[i]
        if t.kind == "id" and t.text in ("require", "require_relative"):
            j = i + 1
            if j < n and toks[j].kind == "punct" and toks[j].text == "(":
                j += 1
            if j < n and toks[j].kind == "str":
                path = toks[j].text[1:-1] if len(toks[j].text) >= 2 else toks[j].text
                if path and path not in seen_i:
                    seen_i.add(path)
                    imports.append(path)
            i = j + 1
            continue
        # receiver.method (identifier or Constant receiver)
        if (
            t.kind in ("id", "const")
            and i + 2 < n
            and toks[i + 1].kind == "punct" and toks[i + 1].text == "."
            and toks[i + 2].kind == "id"
        ):
            call = normalize_call(f"{t.text}.{toks[i + 2].text}")
            if (
                call and not is_noise(call)
                and not _blacklisted(call, RUBY_TEST_CALLS)
                and call not in seen_c
            ):
                seen_c.add(call)
                calls.append(call)
            i += 3
            continue
        i += 1
    return _hints_or_none(imports, calls)


# -- dispatch ----------------------------------------------------------------


def extract_hints(path: str, source: str):
    low = path.lower()
    if low.endswith((".js", ".jsx", ".ts", ".tsx", ".mjs", ".cjs")):
        return extract_js_hints(source)
    if low.endswith(".py"):
        return extract_py_hints(source)
    if low.endswith(".go"):
        return extract_go_hints(source)
    if low.endswith(".java"):
        return extract_java_hints(source)
    if low.endswith(".rs"):
        return extract_rust_hints(source)
    if low.endswith(".rb"):
        return extract_ruby_hints(source)
    return None
