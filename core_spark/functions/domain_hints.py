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


# -- C++ (domain_hints/cpp.go) ----------------------------------------------

CPP_TEST_CALLS = {
    # Google Test (cpp.go:145-178)
    "EXPECT_TRUE", "EXPECT_FALSE", "EXPECT_EQ", "EXPECT_NE",
    "EXPECT_LT", "EXPECT_LE", "EXPECT_GT", "EXPECT_GE",
    "EXPECT_STREQ", "EXPECT_STRNE", "EXPECT_THROW", "EXPECT_NO_THROW",
    "EXPECT_DEATH",
    "ASSERT_TRUE", "ASSERT_FALSE", "ASSERT_EQ", "ASSERT_NE",
    "ASSERT_LT", "ASSERT_LE", "ASSERT_GT", "ASSERT_GE",
    "ASSERT_STREQ", "ASSERT_STRNE", "ASSERT_THROW", "ASSERT_NO_THROW",
    "ASSERT_DEATH",
    "TEST", "TEST_F", "TEST_P", "TYPED_TEST", "TYPED_TEST_SUITE",
    "INSTANTIATE_TEST_SUITE_P",
    # Catch2 (cpp.go:179-193)
    "REQUIRE", "REQUIRE_FALSE", "REQUIRE_THROWS", "REQUIRE_NOTHROW",
    "CHECK", "CHECK_FALSE", "CHECK_THROWS", "CHECK_NOTHROW",
    "SECTION", "TEST_CASE", "SCENARIO", "GIVEN", "WHEN", "THEN",
    # common utilities (cpp.go:194-201)
    "std.cout", "std.cerr", "std.endl", "printf", "fprintf", "cout", "cerr",
}

# #include <path> / #include "path" — preproc lines, not general tokens
# (cpp.go:18 preproc_include query; cpp.go:124-141 delimiter stripping)
_CPP_INCLUDE_RE = re.compile(
    r'^[ \t]*#[ \t]*include[ \t]*(<[^>\n]*>|"[^"\n]*")', re.M
)

# statement keywords that may legitimately precede a call expression
_STMT_KEYWORD_PREV = {"return", "else", "do", "case", "co_return", "yield"}
_CPP_KEYWORDS = {
    "if", "while", "for", "switch", "sizeof", "new", "delete",
    "catch", "throw", "return", "alignof", "decltype", "static_cast",
    "dynamic_cast", "const_cast", "reinterpret_cast",
}


def _base_or_full_blacklisted(call: str, blacklist: set[str]) -> bool:
    """cpp.go:204-212 / swift.go:167-175: base-segment OR full match."""
    return call.split(".", 1)[0] in blacklist or call in blacklist


def _cpp_is_template_close(toks: list[Tok], gt: int, limit: int = 40) -> bool:
    """True when the '>' at index gt closes a template-argument list: walk
    back for a matching '<' over type-ish tokens only (ids, '::', ',',
    '*', '&', nested '<'/'>'). 'a > b' has no matching '<' in a pure-type
    window, so comparisons stay comparisons."""
    depth = 1
    j = gt - 1
    steps = 0
    while j >= 0 and steps < limit:
        t = toks[j]
        if t.kind == "punct":
            if t.text == ">":
                depth += 1
            elif t.text == "<":
                depth -= 1
                if depth == 0:
                    return True
            elif t.text not in (",", "*", "&", ":", "."):
                return False
        elif t.kind not in ("id", "num"):
            return False
        j -= 1
        steps += 1
    return False


def _cpp_chain(toks: list[Tok], i: int):
    """id ((. | -> | ::) id)* — '->' and '::' arrive as two single-char
    punct tokens from the shared tokenizer. Returns (parts, j_after)."""
    parts = [toks[i].text]
    j = i + 1
    n = len(toks)
    while j < n and toks[j].kind == "punct":
        if toks[j].text == "." and j + 1 < n and toks[j + 1].kind == "id":
            parts.append(toks[j + 1].text)
            j += 2
        elif (
            toks[j].text == "-"
            and j + 2 < n
            and toks[j + 1].kind == "punct" and toks[j + 1].text == ">"
            and toks[j + 2].kind == "id"
        ):
            parts.append(toks[j + 2].text)
            j += 3
        elif (
            toks[j].text == ":"
            and j + 2 < n
            and toks[j + 1].kind == "punct" and toks[j + 1].text == ":"
            and toks[j + 2].kind == "id"
        ):
            parts.append(toks[j + 2].text)
            j += 3
        else:
            break
    return parts, j


def extract_cpp_hints(source: str):
    """cpp.go:32-51: includes (system + local) and call expressions
    (identifier / '::'-qualified / '.'/'->' field chains), '::' and '->'
    rendered as '.' before 2-segment normalization (cpp.go:96-100)."""
    imports: list[str] = []
    seen_i: set[str] = set()
    for m in _CPP_INCLUDE_RE.finditer(source):
        path = m.group(1)[1:-1].strip()
        if path and path not in seen_i:
            seen_i.add(path)
            imports.append(path)

    toks = tokenize(source)
    calls: list[str] = []
    seen_c: set[str] = set()
    n = len(toks)
    i = 0
    while i < n:
        t = toks[i]
        if t.kind != "id":
            i += 1
            continue
        prev = toks[i - 1] if i > 0 else None
        prev2 = toks[i - 2] if i > 1 else None
        # declaration guard (`Order order(...)`, `void run() {`) and
        # chain-continuation guard — after '.', a genuine '::' or '->'
        # tail, or a template-argument close ('vector<int> name(...)' is a
        # declaration). A lone ':' is a case/goto label and a lone
        # non-template '>' a comparison, after which a call is fresh —
        # EXCEPT after an access specifier (`public: Foo(int);` is a
        # constructor/declaration, never a call; tree-sitter's
        # call_expression query never matches declarations, cpp.go:32-51).
        cont = prev is not None and prev.kind == "punct" and (
            prev.text == "."
            or (prev.text == ":" and prev2 is not None
                and prev2.kind == "punct" and prev2.text == ":")
            or (prev.text == ":" and prev2 is not None
                and prev2.kind == "id"
                and prev2.text in ("public", "private", "protected"))
            # statement-position destructor declaration `~Foo();`
            or (prev.text == "~" and (
                prev2 is None
                or (prev2.kind == "punct" and prev2.text in (";", "{", "}", ":"))
            ))
            or (prev.text == ">" and (
                (prev2 is not None and prev2.kind == "punct"
                 and prev2.text == "-")
                or _cpp_is_template_close(toks, i - 1)
            ))
        )
        if cont or (
            prev is not None and prev.kind == "id"
            and prev.text not in _STMT_KEYWORD_PREV
        ):
            i += 1
            continue
        parts, j = _cpp_chain(toks, i)
        if (
            j < n
            and toks[j].kind == "punct" and toks[j].text == "("
            and parts[0] not in _CPP_KEYWORDS
        ):
            call = normalize_call(".".join(parts))
            if (
                call and not is_noise(call)
                and not _base_or_full_blacklisted(call, CPP_TEST_CALLS)
                and call not in seen_c
            ):
                seen_c.add(call)
                calls.append(call)
        i = max(j, i + 1)
    return _hints_or_none(imports, calls)


# -- C# (domain_hints/csharp.go) ---------------------------------------------

CSHARP_TEST_CALLS = {
    # NUnit / xUnit / MSTest (csharp.go:259-277)
    "Assert", "Assume", "Warn", "Xunit",
    "Should", "BeEquivalentTo", "Be", "HaveCount",
    "CollectionAssert", "StringAssert",
    "Is", "Has", "Does", "Contains", "Throws",
    # Moq / NSubstitute / AutoFixture
    "Mock", "Setup", "Verify", "Returns", "Callback", "It", "Times",
    "Substitute", "Received", "DidNotReceive",
    "Fixture", "Create", "Build", "Freeze",
}

_CS_KEYWORDS = {
    "if", "while", "for", "foreach", "switch", "catch", "using",
    "lock", "new", "return", "throw", "typeof", "sizeof", "checked",
    "unchecked", "default",
}


def _dot_chain(toks: list[Tok], i: int):
    """id ((. | ?.) id)* — shared by the C#/Kotlin/Swift extractors.
    '?.' (Kotlin safe call / C# conditional access) is one token from the
    shared tokenizer and renders as '.' like the reference's navigation
    chains — dropping the receiver would both lose context and let bare
    method names collide with the test-framework blacklists."""
    parts = [toks[i].text]
    j = i + 1
    n = len(toks)
    while (
        j + 1 < n
        and toks[j].kind == "punct" and toks[j].text in (".", "?.")
        and toks[j + 1].kind == "id"
    ):
        parts.append(toks[j + 1].text)
        j += 2
    return parts, j


def _skip_generic_args(toks: list[Tok], j: int, limit: int = 40):
    """If toks[j] opens a type-argument list `<...>` of ids/dots/commas/
    nested <>/[]/?, return the index after the closing '>', else None
    (csharp.go:186-195 GenericName — `Method<T>()`)."""
    n = len(toks)
    if j >= n or toks[j].kind != "punct" or toks[j].text != "<":
        return None
    depth = 0
    k = j
    steps = 0
    while k < n and steps < limit:
        tk = toks[k]
        if tk.kind == "punct":
            if tk.text == "<":
                depth += 1
            elif tk.text == ">":
                depth -= 1
                if depth == 0:
                    return k + 1
            elif tk.text in (">>",):
                depth -= 2
                if depth <= 0:
                    return k + 1
            elif tk.text not in (",", ".", "[", "]", "?"):
                return None
        elif tk.kind != "id":
            return None
        k += 1
        steps += 1
    return None


def extract_csharp_hints(source: str):
    """csharp.go:29-51: using directives (plain / static / global / alias —
    alias keeps the qualified RHS, csharp.go:95-104) and invocation
    expressions (member chains, generic methods)."""
    toks = tokenize(source)
    n = len(toks)
    imports: list[str] = []
    calls: list[str] = []
    seen_i: set[str] = set()
    seen_c: set[str] = set()
    i = 0
    while i < n:
        t = toks[i]
        if t.kind == "id" and t.text == "using":
            # `using (` / `using var x = expr;` are statements, not
            # directives — abort on '(' or a second bare identifier run
            j = i + 1
            if j < n and toks[j].kind == "id" and toks[j].text == "static":
                j += 1
            lhs, ok = [], True
            eq_rhs = None
            while j < n and not (toks[j].kind == "punct" and toks[j].text == ";"):
                tj = toks[j]
                if tj.kind == "punct" and tj.text == "=":
                    eq_rhs = []
                    j += 1
                    continue
                if tj.kind == "id":
                    target = eq_rhs if eq_rhs is not None else lhs
                    if target and not (
                        toks[j - 1].kind == "punct" and toks[j - 1].text == "."
                    ):
                        ok = False  # `using var x ...` — two bare ids
                        break
                    target.append(tj.text)
                elif not (tj.kind == "punct" and tj.text == "."):
                    ok = False
                    break
                j += 1
            if ok:
                if eq_rhs is not None:
                    # alias: keep qualified RHS only (csharp.go:95-104)
                    path = ".".join(eq_rhs) if len(eq_rhs) >= 2 else ""
                else:
                    path = ".".join(lhs)
                if path and path not in seen_i:
                    seen_i.add(path)
                    imports.append(path)
                while i < n and not (toks[i].kind == "punct" and toks[i].text == ";"):
                    i += 1
                i += 1
            else:
                # `using (...)` statement / `using var x = ...`: keep
                # scanning — the header and block contain real calls
                # (Factory.Create(), conn.Run()) the reference captures
                i += 1
            continue
        if t.kind == "id":
            prev = toks[i - 1] if i > 0 else None
            # '[': attributes `[TestCase(1)]` are not invocation expressions
            if prev is not None and (
                (prev.kind == "id" and prev.text not in _STMT_KEYWORD_PREV)
                or (prev.kind == "punct" and prev.text in (".", "?.", ">", "["))
            ):
                i += 1
                continue
            parts, j = _dot_chain(toks, i)
            after_generic = _skip_generic_args(toks, j)
            call_at = after_generic if after_generic is not None else j
            if (
                call_at < n
                and toks[call_at].kind == "punct" and toks[call_at].text == "("
                and parts[0] not in _CS_KEYWORDS
            ):
                call = normalize_call(".".join(parts))
                if (
                    call and not is_noise(call)
                    and not _blacklisted(call, CSHARP_TEST_CALLS)
                    and call not in seen_c
                ):
                    seen_c.add(call)
                    calls.append(call)
            i = max(j, i + 1)
            continue
        i += 1
    return _hints_or_none(imports, calls)


# -- Kotlin (domain_hints/kotlin.go) -----------------------------------------

KOTLIN_TEST_CALLS = {
    # Kotest matchers + spec DSL (kotlin.go:148-157)
    "shouldBe", "shouldNotBe", "shouldThrow", "shouldNotThrow",
    "shouldBeNull", "shouldNotBeNull", "shouldContain",
    "shouldHaveSize", "shouldBeEmpty", "shouldNotBeEmpty",
    "describe", "context", "it", "should", "test",
    "feature", "scenario", "given", "when", "then",
    "expect", "xdescribe", "xit", "xtest",
    # JUnit assertions (kotlin.go:158-160)
    "assertEquals", "assertNotEquals", "assertTrue", "assertFalse",
    "assertNull", "assertNotNull", "assertThrows", "assertDoesNotThrow",
    "Assertions",
    # Mockk (kotlin.go:162-163)
    "mockk", "every", "verify", "slot", "spyk",
    "confirmVerified", "coEvery", "coVerify",
}

_KT_KEYWORDS = {
    "if", "while", "for", "when", "catch", "return", "fun", "throw",
}


def extract_kotlin_hints(source: str):
    """kotlin.go:25-47: import headers (`import a.b.c`, `.*` glob dropped,
    `as` alias stripped — the identifier child only, kotlin.go:75-88) and
    call expressions (navigation chains / simple identifiers)."""
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
            segs: list[str] = []
            while j < n and toks[j].kind == "id" and toks[j].text != "as":
                segs.append(toks[j].text)
                j += 1
                if (
                    j + 1 < n
                    and toks[j].kind == "punct" and toks[j].text == "."
                    and toks[j + 1].kind == "id"
                ):
                    j += 1
                else:
                    break
            path = ".".join(segs)
            if path and path not in seen_i:
                seen_i.add(path)
                imports.append(path)
            i = j
            continue
        if t.kind == "id":
            prev = toks[i - 1] if i > 0 else None
            # '@': annotations `@Suite("x")` are not call expressions
            if prev is not None and (
                (prev.kind == "id" and prev.text not in _STMT_KEYWORD_PREV)
                or (prev.kind == "punct" and prev.text in (".", "?.", "@"))
            ):
                i += 1
                continue
            parts, j = _dot_chain(toks, i)
            if (
                j < n
                and toks[j].kind == "punct" and toks[j].text == "("
                and parts[0] not in _KT_KEYWORDS
            ):
                call = normalize_call(".".join(parts))
                if (
                    call and not is_noise(call)
                    and not _blacklisted(call, KOTLIN_TEST_CALLS)
                    and call not in seen_c
                ):
                    seen_c.add(call)
                    calls.append(call)
            i = max(j, i + 1)
            continue
        i += 1
    return _hints_or_none(imports, calls)


# -- PHP (domain_hints/php.go) -----------------------------------------------

PHP_TEST_CALLS = {
    # PHPUnit (php.go:246-259)
    "this", "self", "Assert", "assertSame", "assertEquals",
    "assertTrue", "assertFalse",
    "setUp", "tearDown", "setUpBeforeClass", "tearDownAfterClass",
    # Mockery / Prophecy / Pest (php.go:260-274)
    "Mockery", "mock", "spy", "shouldReceive",
    "prophesize", "reveal",
    "test", "it", "describe", "beforeEach", "afterEach", "expect",
}

_PHP_KEYWORDS = {
    "if", "while", "for", "foreach", "switch", "catch", "function",
    "new", "return", "echo", "print", "throw", "isset", "unset",
    "empty", "list", "array", "use", "include", "include_once",
    "require", "require_once",
}

_PHP_INCLUDE_KEYWORDS = ("include", "include_once", "require", "require_once")


def _php_last_segment(name: str) -> str:
    """php.go:183-186: qualified names keep the last '\\' segment."""
    return name.rsplit("\\", 1)[-1]


def extract_php_hints(source: str):
    """php.go:37-56: `use` declarations + include/require expressions as
    imports; function / $obj->method / Class::method calls (php.go:173-229),
    '$' stripped and '::'/'->' rendered as '.'."""
    from core_spark.functions.phptest import tokenize_php

    toks = [t for t in tokenize_php(source) if t.kind != "comment"]
    n = len(toks)
    imports: list[str] = []
    calls: list[str] = []
    seen_i: set[str] = set()
    seen_c: set[str] = set()

    def add_call(call):
        if (
            call and not is_noise(call)
            and not _blacklisted(call, PHP_TEST_CALLS)
            and call not in seen_c
        ):
            seen_c.add(call)
            calls.append(call)

    i = 0
    while i < n:
        t = toks[i]
        if t.kind == "id" and t.text == "use":
            # closure `function () use ($x)` — next token is '('
            j = i + 1
            if j < n and toks[j].kind == "id":
                path = toks[j].text.lstrip("\\")
                if path and path not in seen_i:
                    seen_i.add(path)
                    imports.append(path)
                i = j + 1
                continue
            i = j
            continue
        if t.kind == "id" and t.text in _PHP_INCLUDE_KEYWORDS:
            j = i + 1
            if j < n and toks[j].kind == "punct" and toks[j].text == "(":
                j += 1
            if j < n and toks[j].kind == "str":
                raw = toks[j].text
                path = raw[1:-1] if len(raw) >= 2 and raw[0] in "'\"" else raw
                if path and path not in seen_i:
                    seen_i.add(path)
                    imports.append(path)
            i = j + 1
            continue
        # $obj->method(  (php.go:190-204)
        if (
            t.kind == "var"
            and i + 3 < n
            and toks[i + 1].kind == "punct" and toks[i + 1].text == "-"
            and toks[i + 2].kind == "punct" and toks[i + 2].text == ">"
            and toks[i + 3].kind == "id"
            and i + 4 < n
            and toks[i + 4].kind == "punct" and toks[i + 4].text == "("
        ):
            add_call(normalize_call(f"{t.text[1:]}.{toks[i + 3].text}"))
            i += 5
            continue
        if t.kind == "id":
            # Class::method(  (php.go:206-226)
            if (
                i + 3 < n
                and toks[i + 1].kind == "punct" and toks[i + 1].text == ":"
                and toks[i + 2].kind == "punct" and toks[i + 2].text == ":"
                and toks[i + 3].kind == "id"
                and i + 4 < n
                and toks[i + 4].kind == "punct" and toks[i + 4].text == "("
            ):
                cls = _php_last_segment(t.text)
                add_call(normalize_call(f"{cls}.{toks[i + 3].text}"))
                i += 5
                continue
            # plain function(  (php.go:175-188)
            prev = toks[i - 1] if i > 0 else None
            if (
                i + 1 < n
                and toks[i + 1].kind == "punct" and toks[i + 1].text == "("
                and t.text not in _PHP_KEYWORDS
                and not (prev is not None and prev.kind == "id"
                         and prev.text == "function")
                and not (prev is not None and prev.kind == "id"
                         and prev.text == "new")
                and not (prev is not None and prev.kind == "punct"
                         and prev.text == ">")
            ):
                add_call(normalize_call(_php_last_segment(t.text)))
            i += 1
            continue
        i += 1
    return _hints_or_none(imports, calls)


# -- Swift (domain_hints/swift.go) -------------------------------------------

SWIFT_TEST_CALLS = {
    # XCTest (swift.go:137-152)
    "XCTAssert", "XCTAssertTrue", "XCTAssertFalse",
    "XCTAssertEqual", "XCTAssertNotEqual", "XCTAssertNil", "XCTAssertNotNil",
    "XCTAssertThrowsError", "XCTAssertNoThrow",
    "XCTFail", "XCTSkip", "XCTUnwrap", "XCTExpectFailure",
    # Swift Testing (swift.go:153-157)
    "expect", "require", "Issue", "confirmation",
    # common utilities (swift.go:158-164)
    "print", "debugPrint", "dump", "fatalError",
    "precondition", "preconditionFailure", "assertionFailure",
}


def extract_swift_hints(source: str):
    """swift.go:28-47: import declarations (attributes like `@testable`
    stripped, dotted modules kept — swift.go:116-133) and navigation-chain
    calls ONLY (the call query requires a navigation_expression,
    swift.go:21-25 — plain `foo()` is not captured)."""
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
            segs: list[str] = []
            while j < n and toks[j].kind == "id":
                segs.append(toks[j].text)
                j += 1
                if (
                    j + 1 < n
                    and toks[j].kind == "punct" and toks[j].text == "."
                    and toks[j + 1].kind == "id"
                ):
                    j += 1
                else:
                    break
            path = ".".join(segs)
            if path and path not in seen_i:
                seen_i.add(path)
                imports.append(path)
            i = j
            continue
        if t.kind == "id":
            prev = toks[i - 1] if i > 0 else None
            if prev is not None and prev.kind == "punct" and prev.text == ".":
                i += 1
                continue
            parts, j = _dot_chain(toks, i)
            if (
                len(parts) >= 2
                and j < n
                and toks[j].kind == "punct" and toks[j].text == "("
            ):
                call = normalize_call(".".join(parts))
                if (
                    call and not is_noise(call)
                    and not _base_or_full_blacklisted(call, SWIFT_TEST_CALLS)
                    and call not in seen_c
                ):
                    seen_c.add(call)
                    calls.append(call)
            i = max(j, i + 1)
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
    if low.endswith((".cpp", ".cc", ".cxx", ".hpp", ".hh", ".h")):
        return extract_cpp_hints(source)
    if low.endswith(".cs"):
        return extract_csharp_hints(source)
    if low.endswith((".kt", ".kts")):
        return extract_kotlin_hints(source)
    if low.endswith(".php"):
        return extract_php_hints(source)
    if low.endswith(".swift"):
        return extract_swift_hints(source)
    return None
