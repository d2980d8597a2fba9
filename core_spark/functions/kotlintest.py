"""P11 — Kotlin Kotest inventory extraction (pure Python, Spark-free).

Reimplements the reference's kotest strategy — its largest single kernel
(pkg/parser/strategies/kotest/definition.go:125-739,
shared/kotlinast/ast.go:228-246) over the shared tokenizer (Kotlin is
C-family; backtick identifiers arrive as template tokens):

  * spec style from the supertype: FunSpec/StringSpec/BehaviorSpec/
    DescribeSpec/WordSpec/FreeSpec/FeatureSpec/ExpectSpec/ShouldSpec/
    AnnotationSpec; non-spec classes ignored
  * bodies: the constructor lambda ``FunSpec({ ... })`` AND ``init { }``
    blocks (definition.go:175-190)
  * per-style rules: FunSpec test/context; DescribeSpec describe/context/
    it; BehaviorSpec Given/When/Then (case-insensitive, backtickable);
    WordSpec ``"ctx" should { "leaf" { } }`` infix suites; FreeSpec
    ``"ctx" - { }`` suites with ``"leaf" { }`` tests; StringSpec
    ``"name" { }`` with the ``!``-prefix skip rule; ShouldSpec/others via
    the generic battery (test/it/should/describe/context/feature/
    scenario/expect)
  * x-prefixes -> skipped with the full alias as modifier; suite-ness by
    the lowercased-sans-x name being describe/context/given/when/feature
    (definition.go:480-498)
  * AnnotationSpec: @Test functions, @Disabled/@Ignore -> skipped
    "@Disabled"; class-level @Disabled/@Ignore skips the suite
  * suites with no children are dropped; unmatched calls' lambdas are
    scanned through (forEach/map generators)
"""

from __future__ import annotations

from core_spark.functions.jstest import (
    Tok,
    _match_bracket,
    _split_args,
    tok_span_location,
    tokenize,
)

STATUS_ACTIVE = "active"
STATUS_SKIPPED = "skipped"

SPEC_STYLES = {
    "FunSpec", "StringSpec", "BehaviorSpec", "DescribeSpec", "WordSpec",
    "FreeSpec", "FeatureSpec", "ExpectSpec", "ShouldSpec", "AnnotationSpec",
}

_GENERIC_FUNCS = {
    "test", "it", "should", "describe", "context",
    "feature", "scenario", "expect",
}


def _style_matcher(style: str):
    """Return fn(name) -> 'suite' | 'test' | None for call-form entities."""
    def is_suite(base: str) -> bool:
        return base.lower().lstrip("x") in ("describe", "context", "given", "when", "feature")

    def mk(allowed: set[str], case_insensitive=False):
        def match(name: str):
            probe = name.lower() if case_insensitive else name
            base = probe[1:] if probe.startswith("x") else probe
            if base not in allowed and probe not in allowed:
                return None
            return "suite" if is_suite(probe) else "test"
        return match

    if style == "FunSpec":
        return mk({"test", "context"})
    if style == "DescribeSpec":
        return mk({"describe", "context", "it"})
    if style == "BehaviorSpec":
        return mk({"given", "when", "then", "and"}, case_insensitive=True)
    return mk(_GENERIC_FUNCS)


def _strip_backticks(text: str) -> str:
    if len(text) >= 2 and text[0] == "`" and text[-1] == "`":
        return text[1:-1]
    return text


def _str_content(text: str) -> str:
    if len(text) >= 2 and text[0] == text[-1] and text[0] in "'\"":
        return text[1:-1]
    return text


class _KotestExtractor:
    def __init__(self, toks: list[Tok], style: str):
        self.toks = toks
        self.style = style
        self.matcher = _style_matcher(style)

    def scan(self, lo: int, hi: int, path: tuple, out: list[dict]):
        toks = self.toks
        style = self.style
        i = lo
        while i < hi:
            t = toks[i]
            # call form: name [("str"...)] { ... }
            if t.kind == "id" or (t.kind == "tpl" and len(t.text) < 40):
                fname = _strip_backticks(t.text) if t.kind == "tpl" else t.text
                kind = self.matcher(fname)
                if kind is not None:
                    j = i + 1
                    arg_name = None
                    if j < hi and toks[j].kind == "punct" and toks[j].text == "(":
                        close = _match_bracket(toks, j)
                        for alo, ahi in _split_args(toks, j + 1, min(close, hi)):
                            if ahi - alo >= 1 and toks[alo].kind == "str":
                                arg_name = _str_content(toks[alo].text)
                                break
                        j = min(close, hi) + 1
                    lam = None
                    if j < hi and toks[j].kind == "punct" and toks[j].text == "{":
                        lam = (j + 1, min(_match_bracket(toks, j), hi))
                    if arg_name is not None or lam is not None:
                        status, modifier = STATUS_ACTIVE, ""
                        if fname.startswith(("x", "X")):
                            status, modifier = STATUS_SKIPPED, fname
                        name = arg_name if arg_name else fname
                        if kind == "suite":
                            if not arg_name:
                                # nameless suite: scan through (parsing noise)
                                if lam:
                                    self.scan(lam[0], lam[1], path, out)
                                    i = lam[1] + 1
                                    continue
                            else:
                                children: list[dict] = []
                                if lam:
                                    self.scan(lam[0], lam[1], path + (name,), children)
                                if children:
                                    out.append(self._row(
                                        "suite", path, name, status, modifier,
                                        (i, lam[1] if lam else j - 1)))
                                    out.extend(children)
                                i = (lam[1] + 1) if lam else j
                                continue
                        else:
                            out.append(self._row(
                                "test", path, name, status, modifier,
                                (i, lam[1] if lam else j - 1)))
                            i = (lam[1] + 1) if lam else j
                            continue
                i += 1
                continue
            # string forms
            if t.kind == "str":
                nxt = toks[i + 1] if i + 1 < hi else None
                nxt2 = toks[i + 2] if i + 2 < hi else None
                # WordSpec: "ctx" should { ... } / "ctx" When { ... }
                if (
                    style == "WordSpec"
                    and nxt is not None
                    and nxt.kind == "id"
                    and nxt.text.lower() in ("should", "when")
                    and nxt2 is not None
                    and nxt2.kind == "punct" and nxt2.text == "{"
                ):
                    close = _match_bracket(toks, i + 2)
                    name = _str_content(t.text)
                    status, modifier = STATUS_ACTIVE, ""
                    if nxt.text.startswith(("x", "X")):
                        status, modifier = STATUS_SKIPPED, nxt.text
                    children: list[dict] = []
                    self.scan(i + 3, min(close, hi), path + (name,), children)
                    if children:
                        out.append(self._row("suite", path, name, status,
                                             modifier, (i, min(close, hi))))
                        out.extend(children)
                    i = min(close, hi) + 1
                    continue
                # FreeSpec: "ctx" - { ... }
                if (
                    style == "FreeSpec"
                    and nxt is not None
                    and nxt.kind == "punct" and nxt.text == "-"
                    and nxt2 is not None
                    and nxt2.kind == "punct" and nxt2.text == "{"
                ):
                    close = _match_bracket(toks, i + 2)
                    name = _str_content(t.text)
                    children = []
                    self.scan(i + 3, min(close, hi), path + (name,), children)
                    if children:
                        out.append(self._row("suite", path, name, STATUS_ACTIVE,
                                             "", (i, min(close, hi))))
                        out.extend(children)
                    i = min(close, hi) + 1
                    continue
                # string-with-lambda leaf test (StringSpec and nested leaves)
                if nxt is not None and nxt.kind == "punct" and nxt.text == "{":
                    close = _match_bracket(toks, i + 1)
                    name = _str_content(t.text)
                    status, modifier = STATUS_ACTIVE, ""
                    if name.startswith("!"):
                        status, modifier = STATUS_SKIPPED, "!"
                        name = name[1:]
                    if name:
                        out.append(self._row("test", path, name, status,
                                             modifier, (i, min(close, hi))))
                    i = min(close, hi) + 1
                    continue
            i += 1

    def _row(self, kind, path, name, status, modifier, span):
        # span = (start_tok, end_tok) of the call expression incl. the
        # trailing lambda (the reference's call_expression node)
        return {
            "kind": kind,
            "suite_path": list(path),
            "name": name,
            "status": status,
            "modifier": modifier,
            **tok_span_location(self.toks, *span),
        }


def _annotation_spec_tests(toks, lo, hi, path):
    """AnnotationSpec: @Test funs, @Disabled/@Ignore -> skipped."""
    out = []
    pending: list[str] = []
    pend_start = -1
    i = lo
    while i < hi:
        t = toks[i]
        if t.kind == "punct" and t.text == "@" and i + 1 < hi and toks[i + 1].kind == "id":
            if not pending:
                pend_start = i
            pending.append(toks[i + 1].text)
            i += 2
            continue
        if t.kind == "id" and t.text == "fun" and i + 1 < hi and toks[i + 1].kind == "id":
            anns = pending
            pending = []
            fstart = pend_start if anns else i
            pend_start = -1
            j = i + 2
            while j < hi and not (toks[j].kind == "punct" and toks[j].text == "{"):
                j += 1
            end = _match_bracket(toks, j) if j < hi else j
            if "Test" in anns:
                status, modifier = STATUS_ACTIVE, ""
                if "Disabled" in anns or "Ignore" in anns:
                    status, modifier = STATUS_SKIPPED, "@Disabled"
                out.append(
                    {
                        "kind": "test",
                        "suite_path": list(path),
                        "name": toks[i + 1].text,
                        "status": status,
                        "modifier": modifier,
                        **tok_span_location(toks, fstart, min(end, hi - 1)),
                    }
                )
            i = end + 1 if j < hi else j
            continue
        if t.kind == "id":
            pending = []
            pend_start = -1
        i += 1
    return out


_JUNIT_TEST_ANNS = {"Test", "ParameterizedTest", "RepeatedTest", "TestFactory", "TestTemplate"}


def parse_kotlin_junit_tests(source: str) -> list[dict]:
    """Kotlin JUnit5 variant (reference: junit5/kotlin_parser.go): classes
    with @Test-family funs; @Disabled -> skipped; @DisplayName renames."""
    toks = tokenize(source)
    n = len(toks)
    rows: list[dict] = []
    i = 0
    while i < n:
        t = toks[i]
        if t.kind == "id" and t.text == "class" and i + 1 < n and toks[i + 1].kind == "id":
            cname = toks[i + 1].text
            cstart = i
            j = i + 2
            while j < n and not (toks[j].kind == "punct" and toks[j].text == "{"):
                j += 1
            if j >= n:
                break
            close = _match_bracket(toks, j)
            cloc = tok_span_location(toks, cstart, min(close, n - 1))
            tests = []
            pending: list[tuple[str, str]] = []
            pend_start = -1
            k = j + 1
            while k < close:
                tk = toks[k]
                if tk.kind == "punct" and tk.text == "@" and k + 1 < close and toks[k + 1].kind == "id":
                    if not pending:
                        pend_start = k
                    aname = toks[k + 1].text
                    aarg = ""
                    m = k + 2
                    if m < close and toks[m].kind == "punct" and toks[m].text == "(":
                        aclose = _match_bracket(toks, m)
                        for x in range(m + 1, min(aclose, close)):
                            if toks[x].kind == "str":
                                aarg = _str_content(toks[x].text)
                                break
                        m = min(aclose, close) + 1
                    pending.append((aname, aarg))
                    k = m
                    continue
                if tk.kind == "id" and tk.text == "fun" and k + 1 < close:
                    anns = pending
                    pending = []
                    fname = _strip_backticks(toks[k + 1].text)
                    is_test = any(a in _JUNIT_TEST_ANNS for a, _ in anns)
                    status, modifier = STATUS_ACTIVE, ""
                    display = ""
                    for a, arg in anns:
                        if a == "Disabled":
                            status, modifier = STATUS_SKIPPED, "@Disabled"
                        elif a == "DisplayName":
                            display = arg
                    fstart = pend_start if anns else k
                    pend_start = -1
                    m = k + 2
                    while m < close and not (toks[m].kind == "punct" and toks[m].text == "{"):
                        m += 1
                    m = (_match_bracket(toks, m) + 1) if m < close else m
                    if is_test:
                        tests.append((display or fname, status, modifier,
                                      tok_span_location(toks, fstart, max(m - 1, k))))
                    k = m
                    continue
                if tk.kind == "id" and tk.text not in (
                    "public", "internal", "private", "open", "final", "override", "suspend"
                ):
                    pending = []
                k += 1
            if tests:
                rows.append(
                    {"kind": "suite", "suite_path": [], "name": cname,
                     "status": STATUS_ACTIVE, "modifier": "", **cloc}
                )
                for name, status, modifier, loc in tests:
                    rows.append(
                        {"kind": "test", "suite_path": [cname], "name": name,
                         "status": status, "modifier": modifier, **loc}
                    )
            i = close + 1
            continue
        i += 1
    return rows


def parse_kotlin_tests(source: str) -> list[dict]:
    """Dispatch: Kotest when a spec-style supertype appears, else the
    Kotlin JUnit5 annotation path."""
    if any(style in source for style in SPEC_STYLES):
        return parse_kotest_tests(source)
    return parse_kotlin_junit_tests(source)


def parse_kotest_tests(source: str) -> list[dict]:
    """Flattened inventory rows (same model as jstest.parse_js_tests)."""
    toks = tokenize(source)
    n = len(toks)
    rows: list[dict] = []
    pending_anns: list[str] = []
    i = 0
    while i < n:
        t = toks[i]
        if t.kind == "punct" and t.text == "@" and i + 1 < n and toks[i + 1].kind == "id":
            pending_anns.append(toks[i + 1].text)
            i += 2
            continue
        if t.kind == "id" and t.text == "class" and i + 1 < n and toks[i + 1].kind == "id":
            anns = pending_anns
            pending_anns = []
            cname = toks[i + 1].text
            cstart = i
            j = i + 2
            style = ""
            ctor_lambda = None
            # supertype list: Style({...}) or Style()
            while j < n and not (toks[j].kind == "punct" and toks[j].text == "{"):
                if toks[j].kind == "id" and toks[j].text in SPEC_STYLES:
                    style = toks[j].text
                    if j + 1 < n and toks[j + 1].kind == "punct" and toks[j + 1].text == "(":
                        pclose = _match_bracket(toks, j + 1)
                        for k in range(j + 2, min(pclose, n)):
                            if toks[k].kind == "punct" and toks[k].text == "{":
                                ctor_lambda = (k + 1, _match_bracket(toks, k))
                                break
                        j = min(pclose, n) + 1
                        continue
                j += 1
            body = None
            if j < n and toks[j].kind == "punct" and toks[j].text == "{":
                body = (j + 1, _match_bracket(toks, j))
            if not style:
                i = (body[1] + 1) if body else j + 1
                continue
            status, modifier = STATUS_ACTIVE, ""
            if "Disabled" in anns or "Ignore" in anns:
                status, modifier = STATUS_SKIPPED, "@Disabled"
            ex = _KotestExtractor(toks, style)
            children: list[dict] = []
            if ctor_lambda:
                ex.scan(ctor_lambda[0], ctor_lambda[1], (cname,), children)
            if body:
                # init blocks
                k = body[0]
                while k < body[1]:
                    if (
                        toks[k].kind == "id" and toks[k].text == "init"
                        and k + 1 < body[1]
                        and toks[k + 1].kind == "punct" and toks[k + 1].text == "{"
                    ):
                        iclose = _match_bracket(toks, k + 1)
                        ex.scan(k + 2, min(iclose, body[1]), (cname,), children)
                        k = min(iclose, body[1]) + 1
                        continue
                    k += 1
                if style == "AnnotationSpec":
                    children.extend(
                        _annotation_spec_tests(toks, body[0], body[1], (cname,))
                    )
            if children:
                cend = body[1] if body else (j - 1 if j > i else i)
                rows.append(
                    {"kind": "suite", "suite_path": [], "name": cname,
                     "status": status, "modifier": modifier,
                     **tok_span_location(toks, cstart, min(cend, n - 1))}
                )
                rows.extend(children)
            i = (body[1] + 1) if body else j
            continue
        if t.kind not in ("punct",) or t.text not in ("@",):
            if t.kind == "id" and t.text not in ("public", "internal", "private", "open", "final"):
                pending_anns = []
        i += 1
    return rows
