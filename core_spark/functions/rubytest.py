"""P13 — Ruby RSpec inventory extraction (pure Python, Spark-free).

Reimplements the reference's rspec strategy
(pkg/parser/strategies/rspec/definition.go:150-426,
shared/rubyast/helpers.go:11-18) with a small Ruby tokenizer:

  * describe/context (+ RSpec.describe receiver form) -> suites;
    it/specify/example -> tests; x-prefixed aliases -> skipped with the
    alias as modifier (xit/xdescribe/xcontext/xspecify/xexample);
    f-prefixes map to base names (definition.go:277-291... the reference's
    getBaseMethod maps f* to base with ACTIVE status — x* carry skipped
    via the x-prefix rule)
  * skip "reason"/pending "reason": with a block -> skipped suite;
    without -> skipped test; ``pending`` maps to xfail as a METHOD prefix
    status but the pending-block handler emits skipped (definition.go:331-360)
  * names: first string (quotes stripped raw), symbol, identifier, or
    Const::Scope argument; nameless it/specify -> "(anonymous)"
  * unknown calls with blocks descend (shared_examples etc., :212-216)
  * blocks are ``do ... end`` (keyword matching with a statement-start
    heuristic for if/unless/while/until) or braces
"""

from __future__ import annotations

from core_spark.functions.jstest import tok_span_location

import re
from dataclasses import dataclass

STATUS_ACTIVE = "active"
STATUS_SKIPPED = "skipped"
STATUS_XFAIL = "xfail"

SUITE_FUNCS = {"describe", "context"}
TEST_FUNCS = {"it", "specify", "example"}
_BASE = {
    "xdescribe": "describe", "fdescribe": "describe",
    "xcontext": "context", "fcontext": "context",
    "xit": "it", "fit": "it",
    "xspecify": "specify", "fspecify": "specify",
    "xexample": "example", "fexample": "example",
}
# keywords that open an `end`-terminated region anywhere
_OPENERS_ALWAYS = {"do", "def", "class", "module", "begin", "case"}
# keywords that open one only in statement position (not modifier form)
_OPENERS_STMT = {"if", "unless", "while", "until"}


@dataclass
class RbTok:
    kind: str  # 'id' | 'const' | 'str' | 'sym' | 'num' | 'punct' | 'kw'
    text: str
    line: int
    stmt_start: bool  # first token of its line
    col: int = 0  # 0-based start column


_ID_START = set("abcdefghijklmnopqrstuvwxyz_")
_CONST_START = set("ABCDEFGHIJKLMNOPQRSTUVWXYZ")
_ID_CONT = _ID_START | _CONST_START | set("0123456789") | {"?", "!"}


def tokenize_ruby(src: str) -> list[RbTok]:
    toks: list[RbTok] = []
    i = 0
    n = len(src)
    line = 1
    ls = 0  # current line start offset (col = i - ls)
    at_start = True

    def push(kind, text, ln, col):
        nonlocal at_start
        toks.append(RbTok(kind, text, ln, at_start, col))
        at_start = False

    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            ls = i + 1
            at_start = True
            i += 1
            continue
        if c in " \t\r":
            i += 1
            continue
        if c == "#":
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if c in "'\"":
            j = i + 1
            while j < n:
                if src[j] == "\\":
                    j += 2
                    continue
                if src[j] == c:
                    j += 1
                    break
                j += 1
            push("str", src[i:j], line, i - ls)
            nl = src.count("\n", i, j)
            if nl:
                line += nl
                ls = src.rfind("\n", i, j) + 1
            i = j
            continue
        if c == ":" and i + 1 < n and (src[i + 1] in _ID_START or src[i + 1] in _CONST_START):
            j = i + 2
            while j < n and src[j] in _ID_CONT:
                j += 1
            push("sym", src[i:j], line, i - ls)
            i = j
            continue
        if c in _ID_START or c in _CONST_START:
            j = i + 1
            while j < n and src[j] in _ID_CONT:
                j += 1
            text = src[i:j]
            kind = "const" if c in _CONST_START else "id"
            push(kind, text, line, i - ls)
            i = j
            continue
        if c.isdigit():
            j = i + 1
            while j < n and (src[j].isdigit() or src[j] in "._xbo"):
                j += 1
            push("num", src[i:j], line, i - ls)
            i = j
            continue
        if src.startswith("::", i):
            push("punct", "::", line, i - ls)
            i += 2
            continue
        push("punct", c, line, i - ls)
        i += 1
    return toks


def _find_end(toks: list[RbTok], i: int) -> int:
    """Index of the 'end' matching the opener at i."""
    depth = 0
    for j in range(i, len(toks)):
        t = toks[j]
        if t.kind in ("id", "const"):
            if t.text in _OPENERS_ALWAYS or (t.text in _OPENERS_STMT and t.stmt_start):
                depth += 1
            elif t.text == "end":
                depth -= 1
                if depth == 0:
                    return j
    return len(toks)


def _match_brace(toks: list[RbTok], i: int) -> int:
    depth = 0
    for j in range(i, len(toks)):
        t = toks[j]
        if t.kind == "punct":
            if t.text == "{":
                depth += 1
            elif t.text == "}":
                depth -= 1
                if depth == 0:
                    return j
    return len(toks)


def _strip_quotes(text: str) -> str:
    if len(text) >= 2 and text[0] == text[-1] and text[0] in "'\"":
        return text[1:-1]
    return text


def _status_for(name: str) -> tuple[str, str]:
    """getStatusAndModifierFromMethod (definition.go:258-272)."""
    if name.startswith("x"):
        return STATUS_SKIPPED, name
    if name == "skip":
        return STATUS_SKIPPED, "skip"
    if name == "pending":
        return STATUS_XFAIL, "pending"
    return STATUS_ACTIVE, ""


class _RubyExtractor:
    def __init__(self, toks: list[RbTok]):
        self.toks = toks
        self.rows: list[dict] = []

    def emit(self, kind, path, name, status, modifier, span):
        # span = (start_tok, end_tok): the call through its do/end or {}
        # block close (the reference's call node with block argument)
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

    def _extract_name(self, i: int, hi: int) -> tuple[str, int]:
        """Name from the args following the call at i; returns (name, j)
        with j positioned at the block opener or statement end."""
        toks = self.toks
        j = i
        name = ""
        line = toks[i].line if i < hi else 0
        parens = False
        if j < hi and toks[j].kind == "punct" and toks[j].text == "(":
            parens = True
            j += 1
        while j < hi:
            t = toks[j]
            if t.kind == "str":
                name = _strip_quotes(t.text)
                break
            if t.kind == "sym":
                name = t.text[1:]
                break
            if t.kind == "const":
                # Const or Const::Scope
                parts = [t.text]
                k = j + 1
                while (
                    k + 1 < hi
                    and toks[k].kind == "punct" and toks[k].text == "::"
                    and toks[k + 1].kind == "const"
                ):
                    parts.append(toks[k + 1].text)
                    k += 2
                name = "::".join(parts)
                j = k - 1
                break
            if t.kind == "id" and t.text in ("do",):
                break
            if t.kind == "punct" and t.text == "{":
                break
            if t.line != line and not parens:
                break  # next statement
            j += 1
        # advance to block opener / end of args
        while j < hi:
            t = toks[j]
            if t.kind == "id" and t.text == "do":
                return name, j
            if t.kind == "punct" and t.text == "{":
                return name, j
            if t.line != line:
                return name, j
            j += 1
        return name, j

    def scan(self, lo: int, hi: int, path: tuple):
        toks = self.toks
        i = lo
        while i < hi:
            t = toks[i]
            if t.kind == "id":
                name = t.text
                # RSpec.describe / receiver.method
                recv = None
                if (
                    i >= 2
                    and toks[i - 1].kind == "punct" and toks[i - 1].text == "."
                    and toks[i - 2].kind == "const"
                ):
                    recv = toks[i - 2].text
                base = _BASE.get(name, name)
                status, modifier = _status_for(name)
                if recv == "RSpec" and name == "describe":
                    base, status, modifier = "describe", STATUS_ACTIVE, ""
                if base in SUITE_FUNCS or base in TEST_FUNCS or name in ("skip", "pending"):
                    si = i - 2 if recv is not None else i
                    cname, j = self._extract_name(i + 1, hi)
                    block = None
                    if j < hi and toks[j].kind == "id" and toks[j].text == "do":
                        block = (j + 1, _find_end(toks, j))
                    elif j < hi and toks[j].kind == "punct" and toks[j].text == "{":
                        block = (j + 1, _match_brace(toks, j))
                    span = (si, min(block[1], hi - 1) if block else max(j - 1, i))
                    if name in ("skip", "pending") and base not in SUITE_FUNCS:
                        # processPendingBlock (definition.go:331-360)
                        if cname:
                            if block:
                                self.emit("suite", path, cname, STATUS_SKIPPED,
                                          modifier, span)
                                self.scan(block[0], block[1], path + (cname,))
                            else:
                                self.emit("test", path, cname, STATUS_SKIPPED,
                                          modifier, span)
                        i = (block[1] + 1) if block else j
                        continue
                    if base in SUITE_FUNCS:
                        if cname:
                            self.emit("suite", path, cname, status, modifier, span)
                            if block:
                                self.scan(block[0], block[1], path + (cname,))
                        i = (block[1] + 1) if block else j
                        continue
                    if base in TEST_FUNCS:
                        self.emit(
                            "test", path, cname if cname else "(anonymous)",
                            status, modifier, span,
                        )
                        i = (block[1] + 1) if block else j
                        continue
            i += 1


def parse_rspec_tests(source: str) -> list[dict]:
    """Flattened inventory rows (same model as jstest.parse_js_tests)."""
    ex = _RubyExtractor(tokenize_ruby(source))
    ex.scan(0, len(ex.toks), ())
    return ex.rows


# ---------------------------------------------------------------------------
# Minitest (pkg/parser/strategies/minitest/definition.go:159-290)
# ---------------------------------------------------------------------------



def _qualifies_minitest(superclass: str) -> bool:
    """definition.go:186-191."""
    return (
        "Minitest::Test" in superclass
        or "Minitest::Spec" in superclass
        or superclass.endswith("Test")
    )


class _MinitestExtractor:
    def __init__(self, toks: list[RbTok]):
        self.toks = toks
        self.rows: list[dict] = []

    def emit(self, kind, path, name, status, span):
        self.rows.append(
            {
                "kind": kind,
                "suite_path": list(path),
                "name": name,
                "status": status,
                "modifier": "",
                **tok_span_location(self.toks, *span),
            }
        )

    def scan(self, lo: int, hi: int, path: tuple):
        toks = self.toks
        i = lo
        while i < hi:
            t = toks[i]
            if t.kind == "id" and t.text == "class" and t.stmt_start:
                j = i + 1
                cname = toks[j].text if j < hi and toks[j].kind == "const" else ""
                # superclass: '<' tokens to end of line
                k = j + 1
                superclass = ""
                if k < hi and toks[k].kind == "punct" and toks[k].text == "<":
                    parts = []
                    k += 1
                    while k < hi and toks[k].line == t.line:
                        parts.append(toks[k].text)
                        k += 1
                    superclass = "".join(parts)
                end = _find_end(toks, i)
                if cname and superclass and _qualifies_minitest(superclass):
                    self.emit("suite", path, cname, STATUS_ACTIVE,
                              (i, min(end, hi - 1)))
                    self.scan(k, min(end, hi), path + (cname,))
                else:
                    self.scan(k, min(end, hi), path)
                i = min(end, hi) + 1
                continue
            if t.kind == "id" and t.text == "def" and t.stmt_start:
                j = i + 1
                mname = toks[j].text if j < hi and toks[j].kind == "id" else ""
                end = _find_end(toks, i)
                if mname.startswith("test_"):
                    body = toks[i:min(end, hi)]
                    skipped = any(x.kind == "id" and x.text == "skip" for x in body)
                    self.emit(
                        "test", path, mname,
                        STATUS_SKIPPED if skipped else STATUS_ACTIVE,
                        (i, min(end, hi - 1)),
                    )
                i = min(end, hi) + 1
                continue
            # spec DSL: describe "name" do / it "name" do
            if t.kind == "id" and t.text in ("describe", "it"):
                j = i + 1
                name = ""
                if j < hi and toks[j].kind == "str":
                    name = _strip_quotes(toks[j].text)
                    j += 1
                elif j < hi and toks[j].kind == "const":
                    parts = [toks[j].text]
                    j += 1
                    while (
                        j + 1 < hi
                        and toks[j].kind == "punct" and toks[j].text == "::"
                        and toks[j + 1].kind == "const"
                    ):
                        parts.append(toks[j + 1].text)
                        j += 2
                    name = "::".join(parts)
                if j < hi and toks[j].kind == "id" and toks[j].text == "do" and name:
                    end = _find_end(toks, j)
                    if t.text == "describe":
                        self.emit("suite", path, name, STATUS_ACTIVE,
                                  (i, min(end, hi - 1)))
                        self.scan(j + 1, min(end, hi), path + (name,))
                    else:
                        self.emit("test", path, name, STATUS_ACTIVE,
                                  (i, min(end, hi - 1)))
                    i = min(end, hi) + 1
                    continue
            i += 1


def parse_minitest_tests(source: str) -> list[dict]:
    """Flattened Minitest inventory: Minitest::Test/Spec or *Test classes ->
    suites, def test_* methods (runtime `skip` -> skipped), describe/it
    spec DSL."""
    ex = _MinitestExtractor(tokenize_ruby(source))
    ex.scan(0, len(ex.toks), ())
    return ex.rows


def parse_ruby_tests(source: str) -> list[dict]:
    """Dispatch: Minitest when its class/method conventions appear, else
    RSpec (the reference routes via the detection cascade)."""
    if "Minitest" in source or re.search(r"\bdef\s+test_\w", source):
        return parse_minitest_tests(source)
    return parse_rspec_tests(source)
