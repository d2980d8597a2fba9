"""P17 — Swift XCTest / swift-testing inventory extraction (pure Python).

Reimplements the reference's xctest and swift-testing strategies
(pkg/parser/strategies/xctest/definition.go:120-225,
swift-testing/definition.go:62-264, shared/swiftast/ast.go:96-155) over
the shared C-family tokenizer (string interpolation ``\\(...)`` rides the
escape-pair skip):

  XCTest:
    * classes whose supertypes include XCTestCase or any *TestCase suffix
    * ``func test<Upper>...`` methods (prefix 'test', 5th char uppercase)
    * body containing ``XCTSkip`` -> skipped with modifier "XCTSkip";
      ``async`` anywhere in the function appends ", async"
    * classes with no tests are dropped

  swift-testing:
    * class/struct declarations with an @Suite attribute OR containing
      @Test functions; @Test funcs keep their Swift names
    * an attribute containing ``.disabled`` -> skipped "@Test(.disabled)"
"""

from __future__ import annotations

from core_spark.functions.jstest import Tok, _match_bracket, tok_span_location, tokenize

STATUS_ACTIVE = "active"
STATUS_SKIPPED = "skipped"


def _is_test_func(name: str) -> bool:
    """swiftast.IsTestFunction (ast.go:134-136)."""
    return name.startswith("test") and len(name) > 4 and name[4].isupper()


def _append_mod(existing: str, new: str) -> str:
    return new if not existing else existing + ", " + new


def _func_ranges(toks, lo, hi):
    """Yield (name, line, body_lo, body_hi, sig_lo) for funcs in range."""
    i = lo
    while i < hi:
        t = toks[i]
        if t.kind == "id" and t.text == "func" and i + 1 < hi and toks[i + 1].kind == "id":
            name = toks[i + 1].text
            line = t.line
            j = i + 2
            while j < hi and not (toks[j].kind == "punct" and toks[j].text == "{"):
                j += 1
            if j >= hi:
                return
            close = _match_bracket(toks, j)
            yield name, line, i, min(close, hi)  # (sig start, body close)
            i = min(close, hi) + 1
            continue
        i += 1


def parse_xctest(source: str) -> list[dict]:
    toks = tokenize(source)
    n = len(toks)
    rows: list[dict] = []
    i = 0
    while i < n:
        t = toks[i]
        if t.kind == "id" and t.text == "class" and i + 1 < n and toks[i + 1].kind == "id":
            cname = toks[i + 1].text
            j = i + 2
            supers: list[str] = []
            if j < n and toks[j].kind == "punct" and toks[j].text == ":":
                j += 1
                while j < n and not (toks[j].kind == "punct" and toks[j].text == "{"):
                    if toks[j].kind == "id":
                        supers.append(toks[j].text)
                    j += 1
            else:
                while j < n and not (toks[j].kind == "punct" and toks[j].text == "{"):
                    j += 1
            if j >= n:
                break
            close = _match_bracket(toks, j)
            is_case = any(s == "XCTestCase" or s.endswith("TestCase") for s in supers)
            if is_case:
                tests = []
                for name, line, flo, fhi in _func_ranges(toks, j + 1, close):
                    if not _is_test_func(name):
                        continue
                    body_toks = toks[flo:fhi]
                    status, modifier = STATUS_ACTIVE, ""
                    if any(bt.kind == "id" and bt.text == "XCTSkip" for bt in body_toks):
                        status, modifier = STATUS_SKIPPED, "XCTSkip"
                    if any(bt.kind == "id" and bt.text == "async" for bt in body_toks):
                        modifier = _append_mod(modifier, "async")
                    tests.append((name, status, modifier,
                                  tok_span_location(toks, flo, fhi)))
                if tests:
                    rows.append(
                        {"kind": "suite", "suite_path": [], "name": cname,
                         "status": STATUS_ACTIVE, "modifier": "",
                         **tok_span_location(toks, i, min(close, n - 1))}
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


def _collect_attrs(toks, i):
    """Walk BACKWARD from the decl keyword collecting @Attr(...)-style
    attributes -> list of (name, args_text)."""
    attrs = []
    j = i - 1
    while j >= 0:
        t = toks[j]
        if t.kind == "id" and t.text in ("final", "public", "private", "internal"):
            j -= 1
            continue
        if t.kind == "punct" and t.text == ")":
            depth = 0
            k = j
            while k >= 0:
                if toks[k].kind == "punct" and toks[k].text == ")":
                    depth += 1
                elif toks[k].kind == "punct" and toks[k].text == "(":
                    depth -= 1
                    if depth == 0:
                        break
                k -= 1
            if k >= 2 and toks[k - 1].kind == "id" and toks[k - 2].text == "@":
                args = " ".join(x.text for x in toks[k:j + 1])
                attrs.append((toks[k - 1].text, args))
                j = k - 3
                continue
            break
        if t.kind == "id" and j >= 1 and toks[j - 1].kind == "punct" and toks[j - 1].text == "@":
            attrs.append((t.text, ""))
            j -= 2
            continue
        break
    return attrs


def parse_swift_testing(source: str) -> list[dict]:
    toks = tokenize(source)
    n = len(toks)
    rows: list[dict] = []
    i = 0
    while i < n:
        t = toks[i]
        if (
            t.kind == "id"
            and t.text in ("class", "struct")
            and i + 1 < n
            and toks[i + 1].kind == "id"
        ):
            cname = toks[i + 1].text
            decl_attrs = _collect_attrs(toks, i)
            j = i + 2
            while j < n and not (toks[j].kind == "punct" and toks[j].text == "{"):
                j += 1
            if j >= n:
                break
            close = _match_bracket(toks, j)
            tests = []
            k = j + 1
            while k < close:
                tk = toks[k]
                if tk.kind == "id" and tk.text == "func" and k + 1 < close:
                    f_attrs = _collect_attrs(toks, k)
                    if any(a[0] == "Test" for a in f_attrs):
                        name = toks[k + 1].text
                        status, modifier = STATUS_ACTIVE, ""
                        if any(".disabled" in a[1].replace(" ", "") for a in f_attrs):
                            status, modifier = STATUS_SKIPPED, "@Test(.disabled)"
                        b = k + 1
                        while b < close and not (
                            toks[b].kind == "punct" and toks[b].text == "{"
                        ):
                            b += 1
                        bclose = _match_bracket(toks, b) if b < close else b
                        if any(
                            x.kind == "id" and x.text == "async"
                            for x in toks[k:min(bclose, close)]
                        ):
                            modifier = _append_mod(modifier, "async")
                        tests.append((name, status, modifier,
                                      tok_span_location(toks, k, min(bclose, close))))
                        k = min(bclose, close) + 1
                        continue
                k += 1
            has_suite_attr = any(a[0] == "Suite" for a in decl_attrs)
            if tests and (has_suite_attr or tests):
                rows.append(
                    {"kind": "suite", "suite_path": [], "name": cname,
                     "status": STATUS_ACTIVE, "modifier": "",
                     **tok_span_location(toks, i, min(close, n - 1))}
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


def parse_swift_tests(source: str) -> list[dict]:
    """Dispatch: swift-testing when the Testing module is in play, else
    XCTest (the reference routes via the detection cascade's import/content
    matchers)."""
    if "import Testing" in source or "@Suite" in source:
        return parse_swift_testing(source)
    return parse_xctest(source)
