"""P10 — Java JUnit5 inventory extraction (pure Python, Spark-free).

Reimplements the reference's junit5 strategy
(pkg/parser/strategies/junit5/definition.go:100-277,
shared/javaast/ast.go:42-131) over the shared tokenizer (Java is
C-family):

  * test annotations: @Test/@ParameterizedTest/@RepeatedTest/@TestFactory/
    @TestTemplate, plus ANY custom annotation ending in "Test"
    (definition.go:229-243); scoped names (@org.junit...Test) use the last
    segment (ast.go:52-60)
  * @Disabled -> skipped with modifier "@Disabled" (method-level overrides,
    class-level inherits, definition.go:232-234, 267-275)
  * @DisplayName("...") replaces the method name — quotes stripped RAW, no
    unescaping (ast.go:113-131)
  * @Nested inner classes recurse (depth-capped 20); inner classes WITHOUT
    @Nested are ignored entirely (definition.go:187-196)
  * classes with no tests and no nested suites are dropped (:198-200)
  * Java 21+ implicit classes: top-level annotated methods form a
    synthetic suite named after the file (definition.go:118-149)
"""

from __future__ import annotations

import posixpath
import re

from core_spark.functions.jstest import tok_span_location, Tok, _match_bracket, tokenize

STATUS_ACTIVE = "active"
STATUS_SKIPPED = "skipped"

TEST_ANNOTATIONS = {"Test", "ParameterizedTest", "RepeatedTest", "TestFactory", "TestTemplate"}
MAX_NESTED_DEPTH = 20


def _parse_annotation(toks: list[Tok], i: int, hi: int):
    """'@' at i -> ((name, first_string_arg_raw, raw_args), next_index)."""
    j = i + 1
    if j >= hi or toks[j].kind != "id":
        return None
    parts = [toks[j].text]
    j += 1
    while (
        j + 1 < hi
        and toks[j].kind == "punct" and toks[j].text == "."
        and toks[j + 1].kind == "id"
    ):
        parts.append(toks[j + 1].text)
        j += 2
    name = parts[-1]
    arg = ""
    raw = ""
    if j < hi and toks[j].kind == "punct" and toks[j].text == "(":
        close = _match_bracket(toks, j)
        raw = "".join(t.text for t in toks[j + 1:min(close, hi)])
        for k in range(j + 1, min(close, hi)):
            if toks[k].kind == "str":
                text = toks[k].text
                if len(text) >= 2:
                    arg = text[1:-1]  # raw strip, no unescape (ast.go:121-125)
                break
        j = min(close, hi) + 1
    return (name, arg, raw), j


TESTNG_CONFIG_ANNOTATIONS = {
    "BeforeMethod", "AfterMethod", "BeforeClass", "AfterClass",
    "BeforeSuite", "AfterSuite", "BeforeTest", "AfterTest",
    "BeforeGroups", "AfterGroups", "DataProvider", "Factory",
}

_ENABLED_FALSE = re.compile(r"enabled\s*=\s*false")
_TESTNG_DESC = re.compile(r'description\s*=\s*"([^"]*)"')


class _JavaExtractor:
    def __init__(self, toks: list[Tok], dialect: str = "junit"):
        self.toks = toks
        self.dialect = dialect
        self.rows: list[dict] = []

    def _method_row(self, anns, name, loc, class_status, class_modifier,
                    mods=(), class_has_test=False, cname=""):
        """parseTestMethod (junit5/definition.go:213-265; junit4 adds @Ignore;
        testng delegates to _method_row_testng)."""
        if self.dialect == "testng":
            return self._method_row_testng(
                anns, name, loc, class_status, class_modifier,
                mods, class_has_test, cname,
            )
        is_test = False
        display = ""
        status, modifier = class_status, class_modifier
        for a_name, a_arg, _raw in anns:
            if a_name in TEST_ANNOTATIONS:
                is_test = True
            elif a_name == "Disabled":
                status, modifier = STATUS_SKIPPED, "@Disabled"
            elif a_name == "Ignore":
                # JUnit4 (junit4/definition.go:193-195)
                status, modifier = STATUS_SKIPPED, "@Ignore"
            elif a_name == "DisplayName":
                display = a_arg
            elif a_name.endswith("Test"):
                is_test = True
        if not is_test or not name:
            return None
        return {
            "name": display if display else name,
            "status": status,
            "modifier": modifier,
            **loc,
        }

    def _method_row_testng(self, anns, name, loc, class_status, class_modifier,
                           mods, class_has_test, cname):
        """TestNG (testng/definition.go:235-287): class-level @Test makes
        PUBLIC methods tests except config-annotated ones; enabled=false ->
        skipped; description= renames."""
        has_method_test = False
        description = ""
        status, modifier = class_status, class_modifier
        for a_name, _arg, raw in anns:
            if a_name in TESTNG_CONFIG_ANNOTATIONS:
                return None
            if a_name == "Test":
                has_method_test = True
                if _ENABLED_FALSE.search(raw):
                    status, modifier = STATUS_SKIPPED, "@Test(enabled=false)"
                m = _TESTNG_DESC.search(raw)
                if m:
                    description = m.group(1)
        is_test = has_method_test or (class_has_test and "public" in mods)
        if not is_test or not name or name == cname:
            return None
        return {
            "name": description if description else name,
            "status": status,
            "modifier": modifier,
            **loc,
        }

    def parse_class_body(self, lo, hi, path, class_status, class_modifier, depth,
                         class_has_test=False, cname=""):
        """Scan a class body for annotated methods and @Nested classes.
        Returns (tests, emitted_nested_suite_names) as flat rows appended
        to self.rows by the CALLER (so empty suites can be dropped)."""
        toks = self.toks
        tests = []
        nested_rows = []
        pending: list[tuple[str, str]] = []
        pend_start = -1  # token index of the FIRST pending annotation
        i = lo
        while i < hi:
            t = toks[i]
            if t.kind == "punct" and t.text == "@":
                got = _parse_annotation(toks, i, hi)
                if got:
                    if not pending:
                        pend_start = i
                    pending.append(got[0])
                    i = got[1]
                    continue
                i += 1
                continue
            if t.kind == "id" and t.text == "class":
                anns = pending
                pending = []
                cstart = pend_start if anns else i
                pend_start = -1
                j = i + 1
                ncname = toks[j].text if j < hi and toks[j].kind == "id" else ""
                while j < hi and not (toks[j].kind == "punct" and toks[j].text == "{"):
                    j += 1
                if j >= hi:
                    break
                close = _match_bracket(toks, j)
                cloc = tok_span_location(toks, cstart, min(close, hi - 1))
                nested_ok = (
                    self.dialect == "testng"  # TestNG recurses into ALL nested
                    or any(a[0] == "Nested" for a in anns)
                )
                if nested_ok and depth < MAX_NESTED_DEPTH and ncname:
                    n_status, n_modifier = STATUS_ACTIVE, ""
                    if any(a[0] == "Disabled" for a in anns):
                        n_status, n_modifier = STATUS_SKIPPED, "@Disabled"
                    sub = self._parse_class(
                        ncname, cloc, j + 1, min(close, hi),
                        path, n_status, n_modifier, depth + 1, class_anns=anns,
                    )
                    nested_rows.extend(sub)
                i = min(close, hi) + 1
                continue
            if (
                t.kind == "id"
                and i + 1 < hi
                and toks[i + 1].kind == "punct"
                and toks[i + 1].text == "("
            ):
                anns = pending
                pending = []
                name = t.text
                close = _match_bracket(toks, i + 1)
                j = min(close, hi) + 1
                while j < hi and not (
                    toks[j].kind == "punct" and toks[j].text in ("{", ";")
                ):
                    if toks[j].kind == "punct" and toks[j].text == "=":
                        break  # field initializer, not a declaration
                    j += 1
                if j < hi and toks[j].kind == "punct" and toks[j].text == "{":
                    body_close = _match_bracket(toks, j)
                    j = min(body_close, hi) + 1
                else:
                    j = j + 1
                mods = []
                k = i - 1
                while k >= 0:
                    tk = toks[k]
                    if tk.kind == "id":
                        mods.append(tk.text)
                        k -= 1
                        continue
                    if tk.kind == "punct" and set(tk.text) == {">"}:
                        # generic return type (`public List<String> foo()`):
                        # skip the balanced <...> group in reverse so the
                        # span still starts at the modifiers — the
                        # reference's method_declaration node span. The
                        # shared tokenizer lexes '>>'/'>>>' as one shift
                        # token (nested generics), hence the set() counts.
                        d = len(tk.text)
                        k -= 1
                        while k >= 0 and d > 0:
                            if toks[k].kind == "punct":
                                if set(toks[k].text) == {">"}:
                                    d += len(toks[k].text)
                                elif set(toks[k].text) == {"<"}:
                                    d -= len(toks[k].text)
                            k -= 1
                        continue
                    if tk.kind == "punct" and tk.text in ("[", "]"):
                        k -= 1  # array return type component
                        continue
                    break
                # method_declaration span: annotations (modifiers node in
                # the reference's tree) through body close / ';'
                mstart = pend_start if anns else (k + 1 if mods else i)
                pend_start = -1
                loc = tok_span_location(toks, mstart, max(j - 1, i))
                row = self._method_row(
                    anns, name, loc, class_status, class_modifier,
                    mods=mods, class_has_test=class_has_test, cname=cname,
                )
                if row is not None:
                    tests.append(row)
                i = j
                continue
            if t.kind == "punct" and t.text == ";":
                pending = []
                pend_start = -1
            i += 1
        return tests, nested_rows

    def _parse_class(self, name, loc, lo, hi, path, status, modifier, depth,
                     class_anns=()):
        """parseTestClassWithDepth: returns the flat rows for this class
        (suite row + tests + nested), or [] if it holds nothing."""
        class_has_test = False
        if self.dialect == "testng":
            for a_name, _arg, raw in class_anns:
                if a_name == "Test":
                    class_has_test = True
                    if _ENABLED_FALSE.search(raw):
                        status, modifier = STATUS_SKIPPED, "@Test(enabled=false)"
        child_path = path + (name,)
        tests, nested_rows = self.parse_class_body(
            lo, hi, child_path, status, modifier, depth,
            class_has_test=class_has_test, cname=name,
        )
        if not tests and not nested_rows:
            return []
        rows = [
            {
                "kind": "suite",
                "suite_path": list(path),
                "name": name,
                "status": status,
                "modifier": modifier,
                **loc,
            }
        ]
        rows.extend(tests)
        for tr in tests:
            tr["kind"] = "test"
            tr["suite_path"] = list(child_path)
        rows.extend(nested_rows)
        return rows


def parse_java_tests(source: str, filename: str = "Test.java") -> list[dict]:
    """Flattened inventory rows (same model as jstest.parse_js_tests).
    Dialect: TestNG when org.testng appears (the reference routes via the
    priority registry — TestNG outranks JUnit5 on the shared @Test), else
    the JUnit5/JUnit4 annotation path."""
    dialect = "testng" if "org.testng" in source else "junit"
    toks = tokenize(source)
    n = len(toks)
    ex = _JavaExtractor(toks, dialect=dialect)
    rows: list[dict] = []
    implicit: list[dict] = []
    pending: list[tuple[str, str]] = []
    pend_start = -1
    i = 0
    while i < n:
        t = toks[i]
        if t.kind == "punct" and t.text == "@":
            got = _parse_annotation(toks, i, n)
            if got:
                if not pending:
                    pend_start = i
                pending.append(got[0])
                i = got[1]
                continue
            i += 1
            continue
        if t.kind == "id" and t.text == "class":
            anns = pending
            pending = []
            cstart = pend_start if anns else i
            pend_start = -1
            j = i + 1
            cname = toks[j].text if j < n and toks[j].kind == "id" else ""
            while j < n and not (toks[j].kind == "punct" and toks[j].text == "{"):
                j += 1
            if j >= n:
                break
            close = _match_bracket(toks, j)
            cloc = tok_span_location(toks, cstart, min(close, n - 1))
            status, modifier = STATUS_ACTIVE, ""
            if any(a[0] == "Disabled" for a in anns):
                status, modifier = STATUS_SKIPPED, "@Disabled"
            if cname:
                rows.extend(
                    ex._parse_class(cname, cloc, j + 1, close, (), status,
                                    modifier, 0, class_anns=anns)
                )
            i = close + 1
            continue
        # Java 21+ implicit class: annotated top-level method
        if (
            t.kind == "id"
            and i + 1 < n
            and toks[i + 1].kind == "punct"
            and toks[i + 1].text == "("
            and pending
        ):
            anns = pending
            pending = []
            mstart = pend_start
            pend_start = -1
            close = _match_bracket(toks, i + 1)
            j = close + 1
            while j < n and not (toks[j].kind == "punct" and toks[j].text in ("{", ";")):
                j += 1
            if j < n and toks[j].text == "{":
                j = _match_bracket(toks, j) + 1
            loc = tok_span_location(toks, mstart, min(max(j - 1, i), n - 1))
            row = ex._method_row(anns, t.text, loc, STATUS_ACTIVE, "")
            if row is not None:
                implicit.append(row)
            i = j
            continue
        if t.kind == "punct" and t.text == ";":
            pending = []
            pend_start = -1
        i += 1
    if implicit:
        suite_name = posixpath.basename(filename)
        if suite_name.endswith(".java"):
            suite_name = suite_name[:-5]
        rows.append(
            {
                "kind": "suite",
                "suite_path": [],
                "name": suite_name,
                "status": STATUS_ACTIVE,
                "modifier": "",
                **tok_span_location(toks, 0, n - 1),  # implicit class = file
            }
        )
        for tr in implicit:
            tr["kind"] = "test"
            tr["suite_path"] = [suite_name]
            rows.append(tr)
    return rows
