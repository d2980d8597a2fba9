"""P14 — PHP PHPUnit inventory extraction (pure Python).

Reimplements the reference's phpunit strategy
(pkg/parser/strategies/phpunit/definition.go:63-218,
shared/phpast/ast.go:102-160) with a small PHP tokenizer (comments kept
as tokens — the @test docblock annotation lives there; ``#[`` starts an
attribute, any other ``#`` a comment):

  * classes extending *TestCase or *Test (qualified base names use the
    last segment) -> suites; others ignored
  * a method is a test if it has the #[Test] attribute (PHP 8), an
    immediately preceding comment containing @test, or a test* name
  * #[Skip]/#[Ignore] -> skipped with modifier "#[Skip]"/"#[Ignore]"
  * suites with no tests are dropped
"""

from __future__ import annotations

from core_spark.functions.jstest import tok_span_location

import re
from dataclasses import dataclass

STATUS_ACTIVE = "active"
STATUS_SKIPPED = "skipped"

_TEST_ANNOTATION = re.compile(r"@test\b")


@dataclass
class PTok:
    kind: str  # 'id' | 'var' | 'str' | 'num' | 'punct' | 'comment' | 'attr_open'
    text: str
    line: int
    col: int = 0  # 0-based start column


_ID_START = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_\\")
_ID_CONT = _ID_START | set("0123456789")


def tokenize_php(src: str) -> list[PTok]:
    toks: list[PTok] = []
    i = 0
    n = len(src)
    line = 1
    ls = 0  # line start offset (col = i - ls)
    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            ls = i + 1
            i += 1
            continue
        if c in " \t\r":
            i += 1
            continue
        if c == "/" and src.startswith("//", i):
            j = src.find("\n", i)
            j = n if j < 0 else j
            toks.append(PTok("comment", src[i:j], line, i - ls))
            i = j
            continue
        if c == "/" and src.startswith("/*", i):
            j = src.find("*/", i + 2)
            j = n if j < 0 else j + 2
            toks.append(PTok("comment", src[i:j], line, i - ls))
            nl = src.count("\n", i, j)
            if nl:
                line += nl
                ls = src.rfind("\n", i, j) + 1
            i = j
            continue
        if c == "#":
            if src.startswith("#[", i):
                toks.append(PTok("attr_open", "#[", line, i - ls))
                i += 2
                continue
            j = src.find("\n", i)
            j = n if j < 0 else j
            toks.append(PTok("comment", src[i:j], line, i - ls))
            i = j
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
            toks.append(PTok("str", src[i:j], line, i - ls))
            nl = src.count("\n", i, j)
            if nl:
                line += nl
                ls = src.rfind("\n", i, j) + 1
            i = j
            continue
        if c == "$":
            j = i + 1
            while j < n and src[j] in _ID_CONT:
                j += 1
            toks.append(PTok("var", src[i:j], line, i - ls))
            i = j
            continue
        if c in _ID_START:
            j = i + 1
            while j < n and src[j] in _ID_CONT:
                j += 1
            toks.append(PTok("id", src[i:j], line, i - ls))
            i = j
            continue
        if c.isdigit():
            j = i + 1
            while j < n and (src[j].isdigit() or src[j] in "._xbe"):
                j += 1
            toks.append(PTok("num", src[i:j], line, i - ls))
            i = j
            continue
        toks.append(PTok("punct", c, line, i - ls))
        i += 1
    return toks


def _match(toks, i, open_c, close_c):
    depth = 0
    for j in range(i, len(toks)):
        t = toks[j]
        if t.kind == "punct" or t.kind == "attr_open":
            txt = "[" if t.kind == "attr_open" else t.text
            if txt == open_c:
                depth += 1
            elif txt == close_c:
                depth -= 1
                if depth == 0:
                    return j
    return len(toks)


def _last_segment(name: str) -> str:
    return name.rsplit("\\", 1)[-1]


def parse_phpunit_tests(source: str) -> list[dict]:
    """Flattened inventory rows (same model as jstest.parse_js_tests)."""
    toks = tokenize_php(source)
    n = len(toks)
    rows: list[dict] = []
    i = 0
    while i < n:
        t = toks[i]
        if t.kind == "id" and t.text == "class" and i + 1 < n and toks[i + 1].kind == "id":
            cname = toks[i + 1].text
            j = i + 2
            base = ""
            while j < n and not (toks[j].kind == "punct" and toks[j].text == "{"):
                if toks[j].kind == "id" and toks[j].text == "extends" and j + 1 < n:
                    base = _last_segment(toks[j + 1].text)
                j += 1
            if j >= n:
                break
            close = _match(toks, j, "{", "}")
            if base.endswith("TestCase") or base.endswith("Test"):
                tests = _scan_methods(toks, j + 1, close)
                if tests:
                    rows.append(
                        {"kind": "suite", "suite_path": [], "name": cname,
                         "status": STATUS_ACTIVE, "modifier": "",
                         **tok_span_location(toks, i, min(close, n - 1))}
                    )
                    for tr in tests:
                        tr["kind"] = "test"
                        tr["suite_path"] = [cname]
                        rows.append(tr)
            i = close + 1
            continue
        i += 1
    return rows


def _scan_methods(toks, lo, hi):
    tests = []
    pending_attrs: list[str] = []
    prev_comment: str | None = None
    i = lo
    while i < hi:
        t = toks[i]
        if t.kind == "comment":
            prev_comment = t.text
            i += 1
            continue
        if t.kind == "attr_open":
            close = _match(toks, i, "[", "]")
            for k in range(i + 1, min(close, hi)):
                if toks[k].kind == "id":
                    pending_attrs.append(_last_segment(toks[k].text))
            i = min(close, hi) + 1
            continue
        if t.kind == "id" and t.text == "function" and i + 1 < hi and toks[i + 1].kind == "id":
            name = toks[i + 1].text
            fstart = i
            # modifiers (public static ...) are inside the reference's
            # method_declaration node — extend the span back over them
            k = i - 1
            while k >= lo and toks[k].kind == "id" and toks[k].text in (
                "public", "private", "protected", "static", "final", "abstract"
            ):
                fstart = k
                k -= 1
            attrs = pending_attrs
            comment = prev_comment
            pending_attrs = []
            prev_comment = None
            j = i + 2
            while j < hi and not (toks[j].kind == "punct" and toks[j].text in ("{", ";")):
                j += 1
            if j < hi and toks[j].text == "{":
                j = _match(toks, j, "{", "}") + 1
            else:
                j += 1
            has_attr = "Test" in attrs
            has_annotation = bool(comment and _TEST_ANNOTATION.search(comment))
            has_prefix = name.startswith("test")
            if has_attr or has_annotation or has_prefix:
                status, modifier = STATUS_ACTIVE, ""
                for a in attrs:
                    if a in ("Skip", "Ignore"):
                        status, modifier = STATUS_SKIPPED, f"#[{a}]"
                        break
                tests.append(
                    {"name": name, "status": status, "modifier": modifier,
                     **tok_span_location(toks, fstart, max(j - 1, i))}
                )
            i = j
            continue
        # visibility/static modifiers sit INSIDE the method declaration in
        # the reference's AST, so they must not break the comment->method
        # adjacency
        if not (
            t.kind == "id"
            and t.text in ("public", "private", "protected", "static", "final", "abstract")
        ):
            prev_comment = None
        i += 1
    return tests
