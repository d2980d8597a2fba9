"""P6 — JS/TS test-inventory extraction kernel (pure Python, Spark-free).

From-scratch reimplementation of the reference's jstest semantics
(reference: pkg/parser/strategies/shared/jstest/parser.go:160-461,
helpers.go:13-66, constants.go:9-74) WITHOUT tree-sitter (not in this
container): a hand-rolled JS/TS tokenizer + bracket-matching recursive
descent covering the reference's table-driven fixture corpus
(jstest/parser_test.go, helpers_test.go — ported to tests/test_jstest.py).

Semantics contract (all from the reference, cited per rule):

  * describe/context/suite -> suite; it/test/specify -> test; bench -> test
    (parser.go:196-215). Nesting via callback descent (parser.go:46-51).
  * Modifiers: .skip/.only/.todo map to skipped/focused/todo
    (constants.go:63-74); x*/f* aliases (constants.go:38-51); .concurrent
    passthrough and nested test.concurrent.skip (helpers.go:187-251).
  * .each/.for -> ONE entity named "<template> (dynamic cases)"
    (ADR core/02; parser.go:92-129, 131-157).
  * Loops / forEach / map bodies -> dynamic: entities get the
    " (dynamic cases)" suffix (parser.go:424-461); bench in dynamic
    context is dropped (parser.go:197-200).
  * Vitest conditional-skip filter: test.skip(cond) with no string first
    arg and no callback is NOT a test (parser.go:224-229, helpers.go:172-185).
  * RuleTester.run(name, rule, cases) -> one dynamic test
    (helpers.go:329-385, parser.go:279-292); defineTest -> one dynamic test
    (parser.go:294-351).
  * IIFE ternary callees: (cond ? describe.skip : describe)(...) uses the
    consequence's name with ACTIVE status (helpers.go:295-324).
  * Unknown function names: descend into the LAST callback argument
    (custom wrappers like describeMatrix, parser.go:209-215).
  * Name extraction: first string/template arg unquoted (UnquoteString,
    helpers.go:13-45); identifier/member/call/binary first arg ->
    "(dynamic)" (helpers.go:156-167).

Output is the flattened inventory row model (SURVEY.md §1.3): one row per
suite/test with the ancestry materialized as ``suite_path``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# --------------------------------------------------------------------------
# Constants (reference: jstest/constants.go:9-53)
# --------------------------------------------------------------------------

DYNAMIC_CASES_SUFFIX = " (dynamic cases)"
DYNAMIC_NAME_PLACEHOLDER = "(dynamic)"
OBJECT_PLACEHOLDER = "<object>"

SUITE_FUNCS = {"describe", "context", "suite"}
TEST_FUNCS = {"it", "test", "specify"}

SKIPPED_ALIASES = {
    "xdescribe": "describe",
    "xit": "it",
    "xtest": "test",
    "xcontext": "context",
    "xspecify": "specify",
}
FOCUSED_ALIASES = {
    "fdescribe": "describe",
    "fit": "it",
    "fcontext": "context",
    "fspecify": "specify",
}

_PLACEHOLDER_RE = re.compile(r"%[sdpji#%]")

STATUS_ACTIVE = "active"
STATUS_SKIPPED = "skipped"
STATUS_TODO = "todo"
STATUS_FOCUSED = "focused"


def parse_modifier_status(modifier: str) -> str:
    """constants.go:63-74."""
    return {
        "skip": STATUS_SKIPPED,
        "todo": STATUS_TODO,
        "only": STATUS_FOCUSED,
    }.get(modifier, STATUS_ACTIVE)


# --------------------------------------------------------------------------
# String helpers (reference: jstest/helpers.go:13-66)
# --------------------------------------------------------------------------

_GO_SIMPLE_ESCAPES = {
    "a": "\a", "b": "\b", "f": "\f", "n": "\n", "r": "\r",
    "t": "\t", "v": "\v", "\\": "\\", '"': '"',
}


def _go_unquote_double(inner: str) -> str:
    """Decode a Go double-quoted string body (strconv.Unquote subset):
    \\a\\b\\f\\n\\r\\t\\v \\\\ \\" \\xHH \\uHHHH \\UHHHHHHHH \\ooo.
    Raises ValueError on anything strconv.Unquote would reject (raw
    newline, unescaped quote, \\' inside double quotes, bad hex)."""
    out: list[str] = []
    i = 0
    n = len(inner)
    while i < n:
        c = inner[i]
        if c == '"' or c == "\n":
            raise ValueError("invalid syntax")
        if c != "\\":
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= n:
            raise ValueError("trailing backslash")
        e = inner[i]
        if e in _GO_SIMPLE_ESCAPES:
            out.append(_GO_SIMPLE_ESCAPES[e])
            i += 1
        elif e == "x":
            out.append(chr(int(inner[i + 1:i + 3], 16)))
            i += 3
        elif e == "u":
            out.append(chr(int(inner[i + 1:i + 5], 16)))
            i += 5
        elif e == "U":
            out.append(chr(int(inner[i + 1:i + 9], 16)))
            i += 9
        elif e in "01234567":
            out.append(chr(int(inner[i:i + 3], 8)))
            i += 3
        else:
            raise ValueError(f"unknown escape \\{e}")
    return "".join(out)


def unquote_string(text: str) -> str:
    """helpers.go:13-45 byte-for-byte: backtick strip, single-quote dance
    (\\' unescape -> escape \" -> Go unquote), double-quote unquote;
    any failure returns the input unchanged."""
    if len(text) < 2:
        return text
    if text[0] == "`" and text[-1] == "`":
        return text[1:-1]
    if text[0] == "'" and text[-1] == "'":
        inner = text[1:-1].replace("\\'", "'").replace('"', '\\"')
        try:
            return _go_unquote_double(inner)
        except (ValueError, IndexError):
            return text
    if text[0] == '"' and text[-1] == '"':
        try:
            return _go_unquote_double(text[1:-1])
        except (ValueError, IndexError):
            return text
    return text


def format_each_name(template: str, data: str) -> str:
    """helpers.go:47-66: substitute %s/%d/%p/%i/%j/%# placeholders from the
    comma-joined data in order; %% emits a literal % without consuming."""
    args = data.split(", ") if data else [""]
    if data == "":
        args = []
    state = {"i": 0}

    def sub(m: re.Match) -> str:
        if m.group(0) == "%%":
            return "%"
        if state["i"] < len(args):
            arg = args[state["i"]]
            state["i"] += 1
            return arg
        return m.group(0)

    return _PLACEHOLDER_RE.sub(sub, template)


# --------------------------------------------------------------------------
# Tokenizer
# --------------------------------------------------------------------------

@dataclass
class Tok:
    kind: str  # 'id' | 'str' | 'tpl' | 'num' | 'punct' | 'regex'
    text: str
    line: int
    col: int = 0  # 0-based start column (tree-sitter Point convention)


_ID_START = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_$")
_ID_CONT = _ID_START | set("0123456789")
_MULTI_PUNCT = (
    "=>", "===", "!==", "**=", "...", "&&=", "||=", "??=", ">>>=",
    "==", "!=", "<=", ">=", "&&", "||", "??", "?.", "**", "++", "--",
    "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=", "<<", ">>", ">>>",
)
_MULTI_PUNCT = tuple(sorted(_MULTI_PUNCT, key=len, reverse=True))
# a '/' after these token kinds/texts starts a regex literal, not division
_REGEX_PREV_KEYWORDS = {
    "return", "typeof", "case", "in", "of", "new", "delete", "void",
    "instanceof", "do", "else", "yield", "await",
}


def _scan_string(src: str, i: int, quote: str) -> int:
    """Return index just past the closing quote."""
    n = len(src)
    j = i + 1
    while j < n:
        c = src[j]
        if c == "\\":
            j += 2
            continue
        if c == quote:
            return j + 1
        if c == "\n" and quote != "`":
            # unterminated — bail at the newline (error tolerance)
            return j
        j += 1
    return n


def _scan_template(src: str, i: int) -> int:
    """Return index just past the closing backtick, handling ${...} nesting
    (which may itself contain strings and nested templates)."""
    n = len(src)
    j = i + 1
    while j < n:
        c = src[j]
        if c == "\\":
            j += 2
            continue
        if c == "`":
            return j + 1
        if c == "$" and j + 1 < n and src[j + 1] == "{":
            depth = 1
            j += 2
            while j < n and depth:
                c2 = src[j]
                if c2 in "'\"":
                    j = _scan_string(src, j, c2)
                    continue
                if c2 == "`":
                    j = _scan_template(src, j)
                    continue
                if c2 == "{":
                    depth += 1
                elif c2 == "}":
                    depth -= 1
                j += 1
            continue
        j += 1
    return n


_MASTER = None


def _build_master():
    """One alternation regex for the common token classes; '`' (templates
    with nested ${}) and '/' (regex-vs-division needs prev-token context)
    fall back to the character scanners. ~3x faster than the per-char loop
    and behavior-identical (the full jstest fixture suite + the fuzz
    properties gate it)."""
    import re as _re

    punct = "|".join(_re.escape(p) for p in _MULTI_PUNCT)
    return _re.compile(
        r"(?P<ws>[ \t\r\f\v]+)"
        r"|(?P<nl>\n)"
        r"|(?P<lc>//[^\n]*)"
        r"|(?P<bc>/\*.*?(?:\*/|\Z))"
        r"|(?P<str>'(?:\\.|[^'\\\n])*'?|\"(?:\\.|[^\"\\\n])*\"?)"
        r"|(?P<id>[A-Za-z_$][A-Za-z0-9_$]*)"
        r"|(?P<num>(?:[0-9]|\.[0-9])[0-9A-Za-z_$.]*)"
        rf"|(?P<punct>{punct}|[^\sA-Za-z0-9_$`/])",
        _re.S,
    )


def tokenize(src: str) -> list[Tok]:
    global _MASTER
    if _MASTER is None:
        _MASTER = _build_master()
    toks: list[Tok] = []
    append = toks.append
    i = 0
    n = len(src)
    line = 1
    ls = 0  # offset of the current line start (col = i - ls, 0-based)
    master = _MASTER
    while i < n:
        c = src[i]
        if c == "`":
            j = _scan_template(src, i)
            append(Tok("tpl", src[i:j], line, i - ls))
            nl = src.count("\n", i, j)
            if nl:
                line += nl
                ls = src.rfind("\n", i, j) + 1
            i = j
            continue
        if c == "/" and not src.startswith(("//", "/*"), i):
            prev = toks[-1] if toks else None
            is_div = prev is not None and (
                prev.kind in ("num", "str", "tpl", "regex")
                or (prev.kind == "id" and prev.text not in _REGEX_PREV_KEYWORDS)
                or (prev.kind == "punct" and prev.text in (")", "]"))
            )
            if not is_div:
                j = i + 1
                in_class = False
                while j < n:
                    c2 = src[j]
                    if c2 == "\\":
                        j += 2
                        continue
                    if c2 == "[":
                        in_class = True
                    elif c2 == "]":
                        in_class = False
                    elif c2 == "/" and not in_class:
                        j += 1
                        while j < n and src[j] in _ID_CONT:
                            j += 1  # flags
                        break
                    elif c2 == "\n":
                        break
                    j += 1
                append(Tok("regex", src[i:j], line, i - ls))
                i = j
                continue
            append(Tok("punct", "/", line, i - ls))
            i += 1
            continue
        m = master.match(src, i)
        if m is None:  # pragma: no cover — master covers every non-`/ char
            i += 1
            continue
        kind = m.lastgroup
        text = m.group()
        j = m.end()
        if kind == "ws":
            i = j
            continue
        if kind == "nl":
            line += 1
            ls = j
            i = j
            continue
        if kind == "lc":
            i = j
            continue
        if kind == "bc":
            nl = src.count("\n", i, j)
            if nl:
                line += nl
                ls = src.rfind("\n", i, j) + 1
            i = j
            continue
        if kind == "str":
            append(Tok("str", text, line, i - ls))
            # single-line strings cannot contain raw newlines
        elif kind == "id":
            append(Tok("id", text, line, i - ls))
        elif kind == "num":
            append(Tok("num", text, line, i - ls))
        else:
            append(Tok("punct", text, line, i - ls))
        i = j
    return toks


# --------------------------------------------------------------------------
# Parser
# --------------------------------------------------------------------------

_OPEN = {"(": ")", "[": "]", "{": "}"}
_CLOSE = {")": "(", "]": "[", "}": "{"}


def tok_span_location(toks: list[Tok], si: int, ei: int) -> dict:
    """Location fields for the token range [si, ei] — the reference's
    convention (domain/location.go:4-15 via treesitter.go:114-125):
    1-based lines, 0-based cols, end col EXCLUSIVE (the point after the
    node's last character). Multi-line tokens (templates, raw strings)
    advance the end line and restart the end col."""
    ei = min(ei, len(toks) - 1)
    st, et = toks[si], toks[ei]
    nl = et.text.count("\n")
    if nl:
        end_col = len(et.text) - et.text.rfind("\n") - 1
    else:
        end_col = et.col + len(et.text)
    return {
        "line": st.line,
        "start_col": st.col,
        "end_line": et.line + nl,
        "end_col": end_col,
    }


def _match_bracket(toks: list[Tok], i: int) -> int:
    """Index of the token matching the bracket at i (or len(toks))."""
    target = _OPEN[toks[i].text]
    depth = 0
    for j in range(i, len(toks)):
        t = toks[j]
        if t.kind != "punct":
            continue
        if t.text in _OPEN:
            depth += 1
        elif t.text in _CLOSE:
            depth -= 1
            if depth == 0 and t.text == target:
                return j
            if depth == 0:
                return j  # mismatched close — tolerate
    return len(toks)


def _split_args(toks: list[Tok], lo: int, hi: int) -> list[tuple[int, int]]:
    """Split token range [lo, hi) on top-level commas -> arg (lo, hi) slices."""
    out = []
    depth = 0
    start = lo
    for j in range(lo, hi):
        t = toks[j]
        if t.kind == "punct":
            if t.text in _OPEN:
                depth += 1
            elif t.text in _CLOSE:
                depth -= 1
            elif t.text == "," and depth == 0:
                if j > start:
                    out.append((start, j))
                start = j + 1
    if hi > start:
        out.append((start, hi))
    return out


def _is_callback(toks: list[Tok], lo: int, hi: int) -> bool:
    """Arg is an arrow function or function expression (helpers.go:131-139):
    optional 'async', then 'function', or a top-level '=>'."""
    if lo >= hi:
        return False
    k = lo
    if toks[k].kind == "id" and toks[k].text == "async":
        k += 1
    if k < hi and toks[k].kind == "id" and toks[k].text == "function":
        return True
    depth = 0
    for j in range(lo, hi):
        t = toks[j]
        if t.kind != "punct":
            continue
        if t.text in _OPEN:
            depth += 1
        elif t.text in _CLOSE:
            depth -= 1
        elif t.text == "=>" and depth == 0:
            return True
    return False


def _callback_body(toks: list[Tok], lo: int, hi: int) -> tuple[int, int] | None:
    """Token range of a callback arg's body ({...} block without braces, or
    the expression after =>)."""
    k = lo
    if toks[k].kind == "id" and toks[k].text == "async":
        k += 1
    if toks[k].kind == "id" and toks[k].text == "function":
        for j in range(k, hi):
            if toks[j].kind == "punct" and toks[j].text == "{":
                end = _match_bracket(toks, j)
                return (j + 1, min(end, hi))
        return None
    depth = 0
    for j in range(lo, hi):
        t = toks[j]
        if t.kind != "punct":
            continue
        if t.text in _OPEN:
            depth += 1
        elif t.text in _CLOSE:
            depth -= 1
        elif t.text == "=>" and depth == 0:
            k = j + 1
            if k < hi and toks[k].kind == "punct" and toks[k].text == "{":
                end = _match_bracket(toks, k)
                return (k + 1, min(end, hi))
            return (k, hi)
    return None


def _parse_ids_chain(toks: list[Tok], i: int, hi: int) -> tuple[list[str], int] | None:
    """Parse ident ('.' ident)* starting at i; return (names, next_index)."""
    if i >= hi or toks[i].kind != "id":
        return None
    names = [toks[i].text]
    j = i + 1
    while (
        j + 1 < hi
        and toks[j].kind == "punct"
        and toks[j].text == "."
        and toks[j + 1].kind == "id"
    ):
        names.append(toks[j + 1].text)
        j += 2
    return names, j


def _parse_callee(toks: list[Tok], i: int, hi: int):
    """Parse a callee at i. Returns (desc, next_index) or None.
    desc: ('ids', [names]) or ('ternary-ids', [names])."""
    t = toks[i]
    if t.kind == "id":
        got = _parse_ids_chain(toks, i, hi)
        if got is None:
            return None
        return ("ids", got[0]), got[1]
    if t.kind == "punct" and t.text == "(":
        close = _match_bracket(toks, i)
        if close >= hi:
            return None
        inner_lo, inner_hi = i + 1, close
        # ternary? top-level '?' ... ':' (helpers.go:308-324)
        q = colon = -1
        depth = 0
        for j in range(inner_lo, inner_hi):
            tt = toks[j]
            if tt.kind != "punct":
                continue
            if tt.text in _OPEN:
                depth += 1
            elif tt.text in _CLOSE:
                depth -= 1
            elif depth == 0 and tt.text == "?" and q < 0:
                q = j
            elif depth == 0 and tt.text == ":" and q >= 0 and colon < 0:
                colon = j
        if q >= 0 and colon > q:
            for blo, bhi in ((q + 1, colon), (colon + 1, inner_hi)):
                got = _parse_ids_chain(toks, blo, bhi)
                if got is not None and got[1] == bhi:
                    return ("ternary-ids", got[0]), close + 1
            return None
        # plain parenthesized callee: must consume the whole parens
        got = _parse_ids_chain(toks, inner_lo, inner_hi)
        if got is not None and got[1] == inner_hi:
            return ("ids", got[0]), close + 1
        inner = _parse_callee(toks, inner_lo, inner_hi)
        if inner is not None and inner[1] == inner_hi:
            return inner[0], close + 1
        return None
    return None


def parse_function_name(desc) -> tuple[str, str, str]:
    """(name, status, modifier) — helpers.go:253-324."""
    kind, ids = desc
    if kind == "ternary-ids":
        name, _, _ = parse_function_name(("ids", ids))
        return (name, STATUS_ACTIVE, "") if name else ("", STATUS_ACTIVE, "")
    if len(ids) == 1:
        name = ids[0]
        if name in SKIPPED_ALIASES:
            return SKIPPED_ALIASES[name], STATUS_SKIPPED, name
        if name in FOCUSED_ALIASES:
            return FOCUSED_ALIASES[name], STATUS_FOCUSED, name
        return name, STATUS_ACTIVE, ""
    if len(ids) == 2:
        obj, prop = ids
        if prop == "concurrent":
            return obj, STATUS_ACTIVE, ""
        if prop == "describe":
            # Playwright's test.describe(...) (playwright/definition.go:420-440)
            return "describe", STATUS_ACTIVE, ""
        if prop == "fixme":
            # Playwright's .fixme -> skipped (playwright/definition.go:378-379)
            return obj, STATUS_SKIPPED, "fixme"
        if prop in ("each", "for"):
            return f"{obj}.{prop}", STATUS_ACTIVE, ""
        if prop in ("only", "skip", "todo"):
            return obj, parse_modifier_status(prop), prop
        return "", STATUS_ACTIVE, ""
    # nested member (helpers.go:209-251): obj = ids[:-2], middle, prop
    obj = ".".join(ids[:-2])
    middle, prop = ids[-2], ids[-1]
    if middle == "concurrent":
        if prop in ("each", "for"):
            return f"{obj}.{prop}", STATUS_ACTIVE, ""
        status = parse_modifier_status(prop)
        return obj, status, prop if status != STATUS_ACTIVE else ""
    if middle == "describe":
        # test.describe.skip / .only / .fixme / .each (Playwright chains)
        if prop in ("each", "for"):
            return "describe.each", STATUS_ACTIVE, ""
        if prop == "fixme":
            return "describe", STATUS_SKIPPED, "fixme"
        status = parse_modifier_status(prop)
        return "describe", status, prop if status != STATUS_ACTIVE else ""
    status = parse_modifier_status(middle)
    modifier = middle if status != STATUS_ACTIVE else ""
    if prop in ("each", "for"):
        return f"{obj}.{prop}", status, modifier
    return "", status, modifier


PLAYWRIGHT_IMPORT_PATH = "@playwright/test"

# the well-known base-fixture object names Playwright suites extend from
# (playwright/definition.go:286)
_EXTEND_BASES = {"base", "baseTest", "browserTest", "contextTest", "playwrightTest"}


def extract_playwright_test_aliases(toks: list[Tok]) -> set[str]:
    """Playwright test-alias pre-pass (playwright/definition.go:187-339).

    Walks TOP-LEVEL statements only (depth 0 — the reference iterates the
    root node's children) and returns the set of identifiers that denote
    the Playwright ``test`` object:

      * always ``test``;
      * every named-import alias of ``test`` from '@playwright/test'
        (``import { test as setup } from '@playwright/test'``), ignoring
        statement-level type-only imports (definition.go:229-238);
      * ``it``/``test`` re-bound via a fixture-extend call
        (``const test = base.extend({...})``) where the extended object is
        a known alias or a conventional base-fixture name
        (definition.go:240-287 — note the reference only re-binds the
        names ``it`` and ``test``, not arbitrary identifiers);
      * ``it`` when the file has NO value import from '@playwright/test'
        (the indirect-fixture convention, definition.go:208-210).
    """
    aliases = {"test"}
    has_pw_import = False
    i, n = 0, len(toks)
    depth = 0
    while i < n:
        t = toks[i]
        if t.kind == "punct":
            if t.text in _OPEN:
                depth += 1
            elif t.text in _CLOSE:
                depth -= 1
            i += 1
            continue
        if depth != 0 or t.kind != "id":
            i += 1
            continue
        if t.text == "import":
            i, is_pw = _scan_import_aliases(toks, i, n, aliases)
            has_pw_import = has_pw_import or is_pw
            continue
        if t.text in ("const", "let", "var"):
            _scan_extend_decl(toks, i, n, aliases)
        i += 1
    if not has_pw_import:
        aliases.add("it")
    return aliases


def _scan_import_aliases(toks, i, n, aliases) -> tuple[int, bool]:
    """Consume one import statement starting at ``i``; collect ``test``
    aliases if it is a value import from '@playwright/test'. Returns
    (index after the statement, is_playwright_value_import)."""
    j = i + 1
    type_only = j < n and toks[j].kind == "id" and toks[j].text == "type"
    # module path = first string token before the statement terminator
    path_idx = -1
    k = j
    while k < n:
        tk = toks[k]
        if tk.kind == "str":
            path_idx = k
            break
        if tk.kind == "punct" and tk.text == ";":
            break
        if tk.kind == "id" and tk.text == "import" and k > i:
            break  # next import statement — malformed/side-effect form
        k += 1
    if path_idx < 0:
        return i + 1, False
    path = unquote_string(toks[path_idx].text)
    if type_only or path != PLAYWRIGHT_IMPORT_PATH:
        return path_idx + 1, False
    # named specifiers: { a, test as x, ... } between import and the path
    b = i + 1
    while b < path_idx and not (toks[b].kind == "punct" and toks[b].text == "{"):
        b += 1
    if b < path_idx:
        spec: list[Tok] = []
        for k in range(b + 1, path_idx):
            tk = toks[k]
            if tk.kind == "punct" and tk.text in (",", "}"):
                _add_spec_alias(spec, aliases)
                spec = []
                if tk.text == "}":
                    break
            else:
                spec.append(tk)
        _add_spec_alias(spec, aliases)
    return path_idx + 1, True


def _add_spec_alias(spec: list[Tok], aliases: set[str]) -> None:
    """`test as X` import specifier -> alias X (definition.go:322-339)."""
    if (
        len(spec) == 3
        and spec[0].kind == "id" and spec[0].text == "test"
        and spec[1].kind == "id" and spec[1].text == "as"
        and spec[2].kind == "id"
    ):
        aliases.add(spec[2].text)


def _scan_extend_decl(toks, i, n, aliases) -> None:
    """`const X = OBJ.extend(...)` with X in {it, test} and OBJ a known
    alias/base name -> X stays a test alias (definition.go:240-287)."""
    if i + 5 >= n:
        return
    name, eq, obj, dot, ext = toks[i + 1:i + 6]
    if (
        name.kind == "id" and name.text in ("it", "test")
        and eq.kind == "punct" and eq.text == "="
        and obj.kind == "id"
        and dot.kind == "punct" and dot.text == "."
        and ext.kind == "id" and ext.text == "extend"
        and (obj.text in aliases or obj.text in _EXTEND_BASES)
    ):
        aliases.add(name.text)


def _classify_arg(toks: list[Tok], lo: int, hi: int) -> str:
    """Mirror tree-sitter's node type for the purposes of ExtractTestName /
    IsFirstArgString (helpers.go:156-185)."""
    if lo >= hi:
        return "empty"
    if hi - lo == 1:
        k = toks[lo].kind
        if k == "str" or k == "tpl":
            return "string"
        if k == "num":
            return "number"
        if k == "id":
            return "identifier"
        return "other"
    if _is_callback(toks, lo, hi):
        return "function"
    first = toks[lo]
    if first.kind == "punct" and first.text == "{":
        return "object"
    if first.kind == "punct" and first.text == "[":
        return "array"
    if first.kind in ("str", "tpl", "num", "id") or (
        first.kind == "punct" and first.text == "("
    ):
        # multi-token expression: member/call/binary per reference
        return "expression"
    return "other"


def _extract_test_name(toks, args: list[tuple[int, int]]) -> str:
    """helpers.go:156-167: first string arg -> unquoted; first
    identifier/expression arg -> '(dynamic)'."""
    for lo, hi in args:
        c = _classify_arg(toks, lo, hi)
        if c == "string":
            return unquote_string(toks[lo].text)
        if c in ("identifier", "expression"):
            return DYNAMIC_NAME_PLACEHOLDER
    return ""


def _is_first_arg_string(toks, args) -> bool:
    """helpers.go:172-185: first arg must itself be a string literal."""
    if not args:
        return False
    return _classify_arg(toks, *args[0]) == "string"


def _find_callback_arg(toks, args, last=False):
    found = None
    for lo, hi in args:
        if _is_callback(toks, lo, hi):
            if not last:
                return (lo, hi)
            found = (lo, hi)
    return found


class _Extractor:
    def __init__(self, toks: list[Tok], extra_tests: frozenset = frozenset()):
        self.toks = toks
        self.extra_tests = extra_tests  # playwright import-aliases of `test`
        self.rows: list[dict] = []

    def emit(self, kind, path, name, status, modifier, span):
        # span = (start_token_idx, end_token_idx) of the call expression
        self.rows.append(
            {
                "kind": kind,
                "suite_path": list(path),
                "name": name,
                "status": status,
                "modifier": modifier,
                **tok_span_location(self.toks, *span),
            }
        )

    # -- main scan loop (parser.go:353-431 analog over tokens) --
    def scan(self, lo: int, hi: int, path: tuple, dynamic: bool):
        toks = self.toks
        i = lo
        while i < hi:
            t = toks[i]
            if t.kind == "id" and t.text in ("for", "while"):
                i = self._loop(i, hi, path)
                continue
            if t.kind == "id" and t.text == "do":
                i = self._do_while(i, hi, path)
                continue
            # iterator on an expression receiver: [1,2].forEach(cb),
            # getCases().map(cb) — the receiver tokens were already scanned,
            # so the member access arrives as a bare '.' here
            if (
                t.kind == "punct"
                and t.text == "."
                and i + 2 < hi
                and toks[i + 1].kind == "id"
                and toks[i + 1].text in ("forEach", "map")
                and toks[i + 2].kind == "punct"
                and toks[i + 2].text == "("
            ):
                close = _match_bracket(toks, i + 2)
                args = _split_args(toks, i + 3, min(close, hi))
                cb = _find_callback_arg(toks, args)
                if cb is not None:
                    body = _callback_body(toks, *cb)
                    if body:
                        self.scan(body[0], body[1], path, dynamic=True)
                i = min(close, hi) + 1
                continue
            if t.kind == "id" or (t.kind == "punct" and t.text == "("):
                consumed = self._try_call(i, hi, path, dynamic)
                if consumed is not None:
                    i = consumed
                    continue
                if t.kind == "punct":
                    # non-callee parens: mirror the reference's early return
                    # for call expressions with unparseable callees — but a
                    # bare parenthesized GROUP is still scanned for nested
                    # statements (default AST recursion)
                    end = _match_bracket(toks, i)
                    nxt = end + 1
                    is_call = (
                        nxt < hi
                        and toks[nxt].kind == "punct"
                        and toks[nxt].text == "("
                    )
                    if is_call:
                        i = _match_bracket(toks, nxt) + 1
                        continue
                    i += 1
                    continue
            i += 1

    def _loop(self, i: int, hi: int, path) -> int:
        """for/while (...) { body } -> dynamic body (parser.go:424-431)."""
        toks = self.toks
        j = i + 1
        if j < hi and toks[j].kind == "punct" and toks[j].text == "(":
            j = _match_bracket(toks, j) + 1
        if j < hi and toks[j].kind == "punct" and toks[j].text == "{":
            end = _match_bracket(toks, j)
            self.scan(j + 1, min(end, hi), path, dynamic=True)
            return min(end, hi) + 1
        return j

    def _do_while(self, i: int, hi: int, path) -> int:
        toks = self.toks
        j = i + 1
        if j < hi and toks[j].kind == "punct" and toks[j].text == "{":
            end = _match_bracket(toks, j)
            self.scan(j + 1, min(end, hi), path, dynamic=True)
            return min(end, hi) + 1
        return j

    def _try_call(self, i: int, hi: int, path, dynamic: bool):
        """Parse-and-process a call expression starting at i; returns index
        after it, or None if i doesn't start a call."""
        toks = self.toks
        got = _parse_callee(toks, i, hi)
        if got is None:
            return None
        desc, j = got
        if j >= hi or toks[j].kind != "punct" or toks[j].text != "(":
            return None
        close1 = _match_bracket(toks, j)
        args1 = _split_args(toks, j + 1, min(close1, hi))
        end = min(close1, hi) + 1
        span = (i, min(close1, hi - 1))

        # chained call f.each(...)(...)? (parser.go:175-177)
        if end < hi and toks[end].kind == "punct" and toks[end].text == "(":
            close2 = _match_bracket(toks, end)
            args2 = _split_args(toks, end + 1, min(close2, hi))
            outer_end = min(close2, hi) + 1
            if not dynamic:
                self._each_call(desc, args2, (i, min(close2, hi - 1)), path)
            return outer_end

        self._process_call(desc, args1, span, path, dynamic)
        return end

    def _each_call(self, inner_desc, outer_args, span, path):
        """ProcessEachCall (parser.go:131-157)."""
        toks = self.toks
        fname, status, modifier = parse_function_name(inner_desc)
        if not fname:
            return
        template = _extract_test_name(toks, outer_args)
        cb = _find_callback_arg(toks, outer_args)
        suite_each = {
            f"{f}.{m}" for f in SUITE_FUNCS for m in ("each", "for")
        }
        test_each = {f"{f}.{m}" for f in TEST_FUNCS for m in ("each", "for")}
        if fname in suite_each:
            if cb is None or not template:
                return
            name = template + DYNAMIC_CASES_SUFFIX
            self.emit("suite", path, name, status, modifier, span)
            body = _callback_body(toks, *cb)
            if body:
                self.scan(body[0], body[1], path + (name,), dynamic=False)
        elif fname in test_each:
            if not template:
                return
            self.emit(
                "test", path, template + DYNAMIC_CASES_SUFFIX, status, modifier, span
            )

    def _process_call(self, desc, args, span, path, dynamic):
        """processCallExpressionWithMode (parser.go:164-216)."""
        toks = self.toks
        kind, ids = desc

        # array iterator callback -> dynamic (parser.go:434-461)
        if kind == "ids" and len(ids) >= 2 and ids[-1] in ("forEach", "map"):
            cb = _find_callback_arg(toks, args)
            if cb is not None:
                body = _callback_body(toks, *cb)
                if body:
                    self.scan(body[0], body[1], path, dynamic=True)
                return

        # RuleTester.run (helpers.go:329-385, parser.go:186-189, 279-292)
        if (
            kind == "ids"
            and len(ids) >= 2
            and ids[-1] == "run"
            and "tester" in ".".join(ids[:-1]).lower()
        ):
            n_args = len(args)
            first_is_str = bool(args) and _classify_arg(toks, *args[0]) == "string"
            if n_args >= 3 and first_is_str:
                name = unquote_string(toks[args[0][0]].text)
                if not name:
                    name = DYNAMIC_NAME_PLACEHOLDER
                self.emit(
                    "test", path, name + DYNAMIC_CASES_SUFFIX, STATUS_ACTIVE, "", span
                )
                return

        fname, status, modifier = parse_function_name(desc)
        if not fname:
            return

        if fname == "bench":
            if not dynamic:
                name = _extract_test_name(toks, args)
                if name:
                    self.emit("test", path, name, status, modifier, span)
            return
        if fname in SUITE_FUNCS:
            self._suite(args, span, path, status, modifier, dynamic)
            return
        if fname in TEST_FUNCS or fname in self.extra_tests:
            self._test(args, span, path, status, modifier, dynamic)
            return
        if fname == "defineTest":
            self._define_test(args, span, path)
            return
        # unknown function: descend into the last callback (parser.go:209-215)
        cb = _find_callback_arg(toks, args, last=True)
        if cb is not None:
            body = _callback_body(toks, *cb)
            if body:
                self.scan(body[0], body[1], path, dynamic=False)

    def _suite(self, args, span, path, status, modifier, dynamic):
        toks = self.toks
        name = _extract_test_name(toks, args)
        if not name:
            return
        cb = _find_callback_arg(toks, args)
        if not _is_first_arg_string(toks, args) and cb is None:
            return  # Vitest conditional skip (parser.go:251-256)
        if dynamic:
            name += DYNAMIC_CASES_SUFFIX
        self.emit("suite", path, name, status, modifier, span)
        if cb is not None:
            body = _callback_body(toks, *cb)
            if body:
                # ParseCallbackBody resets dynamic (parser.go:46-51 -> 353)
                self.scan(body[0], body[1], path + (name,), dynamic=False)

    def _test(self, args, span, path, status, modifier, dynamic):
        toks = self.toks
        name = _extract_test_name(toks, args)
        if not name:
            return
        if not _is_first_arg_string(toks, args) and _find_callback_arg(toks, args) is None:
            return  # Vitest conditional skip (parser.go:224-229)
        if dynamic:
            name += DYNAMIC_CASES_SUFFIX
        self.emit("test", path, name, status, modifier, span)

    def _define_test(self, args, span, path):
        """parser.go:294-351: name from 4th (prefix) else 2nd (transform)
        string arg, else '(dynamic)'."""
        toks = self.toks
        name = ""
        for idx in (3, 1):  # 0-based: 4th then 2nd
            if len(args) > idx:
                lo, hi = args[idx]
                if _classify_arg(toks, lo, hi) == "string":
                    name = unquote_string(toks[lo].text)
                    if name:
                        break
        if not name:
            name = DYNAMIC_NAME_PLACEHOLDER
        self.emit("test", path, name + DYNAMIC_CASES_SUFFIX, STATUS_ACTIVE, "", span)


def detect_language(filename: str) -> str:
    """parser.go:14-25."""
    if filename.endswith((".js", ".jsx")):
        return "javascript"
    if filename.endswith(".tsx"):
        return "tsx"
    return "typescript"


def parse_js_tests(source: str, filename: str = "test.ts") -> list[dict]:
    """Extract the flattened test inventory from JS/TS source.

    Rows: {kind: 'suite'|'test', suite_path: [ancestors...], name, status,
    modifier, line (1-based)} in document order (parents before children).
    """
    toks = tokenize(source)
    # playwright alias pre-pass: import aliases of `test` become test
    # callees for this file; it/test/specify are already generic, so only
    # genuinely new names flow through (no behavior change for non-aliased
    # files; playwright/definition.go:181-182). Names outside TEST_FUNCS
    # can ONLY come from a '@playwright/test' named import (extend may
    # re-bind only it/test), so files without that literal skip the walk —
    # keeps the pre-pass off the hot path for the jest/vitest majority.
    if PLAYWRIGHT_IMPORT_PATH in source:
        extra = frozenset(extract_playwright_test_aliases(toks)) - TEST_FUNCS
    else:
        extra = frozenset()
    ex = _Extractor(toks, extra_tests=extra)
    ex.scan(0, len(ex.toks), (), dynamic=False)
    return ex.rows


def count_tests(rows: list[dict]) -> int:
    """Recursive test count analog (inventory.go:29-36): flattened, so just
    the number of test rows."""
    return sum(1 for r in rows if r["kind"] == "test")
