"""P6 goldens — ported from the reference's table-driven fixtures
(pkg/parser/strategies/shared/jstest/parser_test.go, helpers_test.go).

Every case's source and expected tree is byte-for-byte the reference's;
the flat row model maps: top-level suites/tests = rows with suite_path ==
[], a suite's children = rows whose suite_path == [suite name, ...].
"""

from __future__ import annotations

import pytest

from core_spark.functions.jstest import (
    count_tests,
    detect_language,
    format_each_name,
    parse_js_tests,
    parse_modifier_status,
    unquote_string,
)


def tops(rows, kind):
    return [r for r in rows if r["kind"] == kind and not r["suite_path"]]


def children(rows, path, kind):
    return [r for r in rows if r["kind"] == kind and r["suite_path"] == list(path)]


# -- helpers_test.go ---------------------------------------------------------

UNQUOTE_CASES = [
    ('"hello"', "hello"),
    ("'hello'", "hello"),
    ("`hello`", "hello"),
    ("a", "a"),
    ("hello", "hello"),
    ("\"hello'", "\"hello'"),
    (r"'it\'s working'", "it's working"),
    (r'"say \"hello\""', 'say "hello"'),
]


@pytest.mark.parametrize("text,want", UNQUOTE_CASES)
def test_unquote_string(text, want):
    assert unquote_string(text) == want


FORMAT_CASES = [
    ("test %s", "value", "test value"),
    ("test %d", "123", "test 123"),
    ("test %p", "data", "test data"),
    ("test %s and %d", "foo, 42", "test foo and 42"),
    ("test %s %s %s", "first, second", "test first second %s"),
    ("100%% complete", "", "100% complete"),
    ("no placeholder", "data", "no placeholder"),
]


@pytest.mark.parametrize("template,data,want", FORMAT_CASES)
def test_format_each_name(template, data, want):
    assert format_each_name(template, data) == want


@pytest.mark.parametrize(
    "modifier,want",
    [("skip", "skipped"), ("todo", "todo"), ("only", "focused"),
     ("unknown", "active"), ("", "active")],
)
def test_parse_modifier_status(modifier, want):
    assert parse_modifier_status(modifier) == want


def test_detect_language():
    assert detect_language("test.js") == "javascript"
    assert detect_language("test.jsx") == "javascript"
    assert detect_language("test.ts") == "typescript"
    assert detect_language("test.tsx") == "tsx"
    assert detect_language("test.mjs") == "typescript"


# -- parser_test.go: TestParse ----------------------------------------------

def test_describe_with_tests():
    rows = parse_js_tests(
        "describe('Suite', () => {\n  it('test1', () => {});\n  it('test2', () => {});\n});"
    )
    assert len(tops(rows, "suite")) == 1
    assert len(tops(rows, "test")) == 0
    assert [r["name"] for r in children(rows, ["Suite"], "test")] == ["test1", "test2"]


def test_top_level_tests():
    rows = parse_js_tests("it('test1', () => {}); test('test2', () => {});")
    assert [r["name"] for r in tops(rows, "test")] == ["test1", "test2"]
    assert not tops(rows, "suite")


def test_empty_file():
    assert parse_js_tests("") == []


def test_nested_describes():
    rows = parse_js_tests(
        "describe('Outer', () => {\n  describe('Inner', () => {\n    it('test', () => {});\n  });\n});"
    )
    assert [r["name"] for r in tops(rows, "suite")] == ["Outer"]
    assert [r["name"] for r in children(rows, ["Outer"], "suite")] == ["Inner"]
    assert [r["name"] for r in children(rows, ["Outer", "Inner"], "test")] == ["test"]


# -- TestParse_Modifiers -----------------------------------------------------

MODIFIER_CASES = [
    ("it.skip('test', () => {});", "test", "test", "skipped", "skip"),
    ("it.only('test', () => {});", "test", "test", "focused", "only"),
    ("test.todo('test');", "test", "test", "todo", "todo"),
    ("xit('test', () => {});", "test", "test", "skipped", "xit"),
    ("fit('test', () => {});", "test", "test", "focused", "fit"),
    ("describe.skip('Suite', () => {});", "suite", "Suite", "skipped", "skip"),
    ("describe.only('Suite', () => {});", "suite", "Suite", "focused", "only"),
    ("xdescribe('Suite', () => {});", "suite", "Suite", "skipped", "xdescribe"),
    ("fdescribe('Suite', () => {});", "suite", "Suite", "focused", "fdescribe"),
]


@pytest.mark.parametrize("source,kind,name,status,modifier", MODIFIER_CASES)
def test_modifiers(source, kind, name, status, modifier):
    rows = parse_js_tests(source)
    got = tops(rows, kind)
    assert len(got) == 1
    assert got[0]["name"] == name
    assert got[0]["status"] == status
    assert got[0]["modifier"] == modifier


# -- TestParse_Each ----------------------------------------------------------

EACH_CASES = [
    ("describe.each([['a'], ['b']])('case %s', () => {});",
     "suite", "case %s (dynamic cases)"),
    ("it.each([[1], [2], [3]])('test %d', () => {});",
     "test", "test %d (dynamic cases)"),
    ("test.each(['foo', 'bar'])('val %s', () => {});",
     "test", "val %s (dynamic cases)"),
    ("it.each(testData)('test %s', () => {});",
     "test", "test %s (dynamic cases)"),
    ("test.for([[1], [2], [3]])('test %d', () => {});",
     "test", "test %d (dynamic cases)"),
    ("it.for([['a'], ['b']])('test %s', () => {});",
     "test", "test %s (dynamic cases)"),
    ("describe.for([['x'], ['y']])('suite %s', () => {});",
     "suite", "suite %s (dynamic cases)"),
]


@pytest.mark.parametrize("source,kind,name", EACH_CASES)
def test_each(source, kind, name):
    rows = parse_js_tests(source)
    got = tops(rows, kind)
    assert len(got) == 1
    assert got[0]["name"] == name


# -- TestParse_Location ------------------------------------------------------

def test_location_lines():
    rows = parse_js_tests("describe('Suite', () => {\n  it('test', () => {});\n});")
    suite = tops(rows, "suite")[0]
    test = children(rows, ["Suite"], "test")[0]
    assert suite["line"] == 1
    assert test["line"] == 2


# -- TestParse_MochaTDDStyle / TDDModifiers ----------------------------------

def test_tdd_style():
    rows = parse_js_tests(
        "suite('Calculator', () => {\n  test('adds', () => {});\n});"
    )
    assert [r["name"] for r in tops(rows, "suite")] == ["Calculator"]
    assert [r["name"] for r in children(rows, ["Calculator"], "test")] == ["adds"]

    rows = parse_js_tests(
        "context('User', () => {\n  specify('validates', () => {});\n});"
    )
    assert [r["name"] for r in tops(rows, "suite")] == ["User"]
    assert [r["name"] for r in children(rows, ["User"], "test")] == ["validates"]

    rows = parse_js_tests("specify('validates', () => {});")
    assert [r["name"] for r in tops(rows, "test")] == ["validates"]


TDD_MODIFIER_CASES = [
    ("suite.skip('Suite', () => {});", "suite", "skipped"),
    ("context.only('Context', () => {});", "suite", "focused"),
    ("specify.skip('test', () => {});", "test", "skipped"),
    ("specify.only('test', () => {});", "test", "focused"),
    ("xcontext('Context', () => {});", "suite", "skipped"),
    ("xspecify('test', () => {});", "test", "skipped"),
    ("fcontext('Context', () => {});", "suite", "focused"),
    ("fspecify('test', () => {});", "test", "focused"),
]


@pytest.mark.parametrize("source,kind,status", TDD_MODIFIER_CASES)
def test_tdd_modifiers(source, kind, status):
    got = tops(parse_js_tests(source), kind)
    assert len(got) == 1 and got[0]["status"] == status


# -- concurrent --------------------------------------------------------------

CONCURRENT_CASES = [
    ("test.concurrent('async test', async () => {});", "test", "active", ""),
    ("it.concurrent('async test', async () => {});", "test", "active", ""),
    ("describe.concurrent('async suite', () => {});", "suite", "active", ""),
    ("test.concurrent.skip('skipped async', async () => {});", "test", "skipped", "skip"),
    ("it.concurrent.only('focused async', async () => {});", "test", "focused", "only"),
    ("describe.concurrent.skip('skipped async suite', () => {});", "suite", "skipped", "skip"),
]


@pytest.mark.parametrize("source,kind,status,modifier", CONCURRENT_CASES)
def test_concurrent(source, kind, status, modifier):
    got = tops(parse_js_tests(source), kind)
    assert len(got) == 1
    assert got[0]["status"] == status
    assert got[0]["modifier"] == modifier


def test_tests_inside_concurrent_suite():
    rows = parse_js_tests(
        "describe.concurrent('suite', () => {\n  it('a', () => {});\n  it('b', () => {});\n});"
    )
    assert len(children(rows, ["suite"], "test")) == 2


CONCURRENT_EACH_CASES = [
    ("test.concurrent.each([[1], [2], [3]])('test %d', async () => {});",
     "test", "test %d (dynamic cases)"),
    ("it.concurrent.each([['a'], ['b']])('test %s', async () => {});",
     "test", "test %s (dynamic cases)"),
    ("describe.concurrent.each([['x'], ['y']])('suite %s', () => {});",
     "suite", "suite %s (dynamic cases)"),
    ("test.concurrent.for([[1], [2], [3]])('test %d', async () => {});",
     "test", "test %d (dynamic cases)"),
    ("it.concurrent.for([['a'], ['b']])('test %s', async () => {});",
     "test", "test %s (dynamic cases)"),
    ("describe.concurrent.for([['x'], ['y']])('suite %s', () => {});",
     "suite", "suite %s (dynamic cases)"),
]


@pytest.mark.parametrize("source,kind,name", CONCURRENT_EACH_CASES)
def test_concurrent_each(source, kind, name):
    got = tops(parse_js_tests(source), kind)
    assert len(got) == 1 and got[0]["name"] == name


# -- bench -------------------------------------------------------------------

def test_bench():
    got = tops(parse_js_tests("bench('sort array', () => { array.sort(); });"), "test")
    assert len(got) == 1 and got[0]["name"] == "sort array"

    got = tops(parse_js_tests("bench.skip('slow sort', () => {});"), "test")
    assert got[0]["status"] == "skipped"

    got = tops(parse_js_tests("bench.only('critical sort', () => {});"), "test")
    assert got[0]["status"] == "focused"

    rows = parse_js_tests("bench('bench1', () => {}); bench('bench2', () => {});")
    assert len(tops(rows, "test")) == 2


def test_bench_in_suite():
    rows = parse_js_tests(
        "describe('Sorting', () => {\n"
        "  bench('sort 1000 items', () => {});\n"
        "  bench.skip('sort 10000 items', () => {});\n"
        "  bench.only('sort 100 items', () => {});\n"
        "});"
    )
    got = children(rows, ["Sorting"], "test")
    assert [(r["name"], r["status"]) for r in got] == [
        ("sort 1000 items", "active"),
        ("sort 10000 items", "skipped"),
        ("sort 100 items", "focused"),
    ]


# -- forEach / map -----------------------------------------------------------

def test_foreach_template_literal():
    rows = parse_js_tests(
        "browsers.forEach((browser) => {\n  it(`supports ${browser}`, () => {});\n});"
    )
    got = tops(rows, "test")
    assert len(got) == 1 and got[0]["name"] == "supports ${browser} (dynamic cases)"


def test_foreach_multiple_tests():
    rows = parse_js_tests(
        "testCases.forEach(({ color, status }) => {\n"
        "  it('renders full mode', () => {});\n"
        "  it('renders compact mode', () => {});\n"
        "});"
    )
    got = tops(rows, "test")
    assert [r["name"] for r in got] == [
        "renders full mode (dynamic cases)",
        "renders compact mode (dynamic cases)",
    ]


def test_map_template_literal():
    rows = parse_js_tests(
        "items.map((item) => {\n  it(`handles ${item}`, () => {});\n});"
    )
    got = tops(rows, "test")
    assert len(got) == 1 and got[0]["name"] == "handles ${item} (dynamic cases)"


def test_foreach_inside_describe():
    rows = parse_js_tests(
        "describe('Badge Renderer', () => {\n"
        "  testCases.forEach(({ color, status }) => {\n"
        "    it('renders full mode', () => {});\n"
        "    it('renders compact mode', () => {});\n"
        "  });\n"
        "});"
    )
    assert not tops(rows, "test")
    got = children(rows, ["Badge Renderer"], "test")
    assert [r["name"] for r in got] == [
        "renders full mode (dynamic cases)",
        "renders compact mode (dynamic cases)",
    ]


def test_each_with_object_array():
    rows = parse_js_tests(
        "it.each([\n  { input: 1, expected: 2 },\n  { input: 2, expected: 4 },\n"
        "])('test $input', ({ input, expected }) => {});"
    )
    got = tops(rows, "test")
    assert len(got) == 1 and got[0]["name"] == "test $input (dynamic cases)"

    rows = parse_js_tests(
        "describe.each([\n  { name: 'Chrome' },\n  { name: 'Firefox' },\n"
        "])('Browser $name', () => {\n  it('works', () => {});\n});"
    )
    assert not tops(rows, "test")
    suites = tops(rows, "suite")
    assert len(suites) == 1 and suites[0]["name"] == "Browser $name (dynamic cases)"
    assert len(children(rows, [suites[0]["name"]], "test")) == 1


def test_mixed_static_and_dynamic():
    rows = parse_js_tests(
        "describe('Suite', () => {\n  it('static test', () => {});\n\n"
        "  [1, 2].forEach((n) => {\n    it(`dynamic ${n}`, () => {});\n  });\n});"
    )
    got = children(rows, ["Suite"], "test")
    assert [r["name"] for r in got] == [
        "static test",
        "dynamic ${n} (dynamic cases)",
    ]


def test_foreach_with_describe():
    rows = parse_js_tests(
        "items.forEach((item) => {\n  describe('Suite', () => {\n"
        "    it('test', () => {});\n  });\n});"
    )
    suites = tops(rows, "suite")
    assert len(suites) == 1
    # dynamic suite, static test inside (callback body resets dynamic)
    assert suites[0]["name"] == "Suite (dynamic cases)"
    assert len(children(rows, [suites[0]["name"]], "test")) == 1


def test_foreach_with_const_before_it():
    rows = parse_js_tests(
        "items.forEach(item => {\n  const name = 'test' + item;\n"
        "  it(name, () => {});\n});"
    )
    assert len(tops(rows, "test")) == 1


def test_nested_foreach_with_describe():
    rows = parse_js_tests(
        "eventTypes.forEach(({type, events}) => {\n"
        "  describe('Events', () => {\n"
        "    events.forEach(eventName => {\n"
        "      const propName = 'on' + eventName;\n"
        "      it('triggers ' + propName, () => {});\n"
        "    });\n"
        "  });\n"
        "});"
    )
    suites = tops(rows, "suite")
    assert len(suites) == 1
    assert len(children(rows, [suites[0]["name"]], "test")) == 1


# -- loops -------------------------------------------------------------------

LOOP_CASES = [
    ("for (const item of items) {\n  test(`test ${item}`, () => {});\n}",
     "test ${item} (dynamic cases)"),
    ("for (const key in obj) {\n  it(`handles ${key}`, () => {});\n}",
     "handles ${key} (dynamic cases)"),
    ("for (let i = 0; i < 10; i++) {\n  test(`iteration ${i}`, () => {});\n}",
     "iteration ${i} (dynamic cases)"),
    ("while (hasMore()) {\n  test('dynamic test', () => {});\n}",
     "dynamic test (dynamic cases)"),
    ("do {\n  test('dynamic test', () => {});\n} while (condition);",
     "dynamic test (dynamic cases)"),
]


@pytest.mark.parametrize("source,name", LOOP_CASES)
def test_loops(source, name):
    got = tops(parse_js_tests(source), "test")
    assert len(got) == 1 and got[0]["name"] == name


def test_nested_for_loops_single_test():
    rows = parse_js_tests(
        "for (const x of xs) {\n  for (const y of ys) {\n"
        "    test(`combo ${x}-${y}`, () => {});\n  }\n}"
    )
    assert len(tops(rows, "test")) == 1


def test_for_loop_inside_describe():
    rows = parse_js_tests(
        "describe('loadConfigFromFile', () => {\n"
        "  const cases = [\n    { fileName: 'vite.config.js' },\n"
        "    { fileName: 'vite.config.ts' },\n  ];\n\n"
        "  for (const { fileName } of cases) {\n"
        "    for (const typeField of [undefined, 'module']) {\n"
        "      test('load ' + fileName, async () => {});\n    }\n  }\n});"
    )
    got = children(rows, ["loadConfigFromFile"], "test")
    assert len(got) == 1
    assert got[0]["name"] == "(dynamic) (dynamic cases)"


def test_for_loop_with_describe():
    rows = parse_js_tests(
        "for (const version of versions) {\n"
        "  describe('ES' + version, () => {\n"
        "    test('should parse', () => {});\n  });\n}"
    )
    suites = tops(rows, "suite")
    assert len(suites) == 1
    assert suites[0]["name"] == "(dynamic) (dynamic cases)"
    got = children(rows, [suites[0]["name"]], "test")
    assert len(got) == 1 and got[0]["name"] == "should parse"


# -- IIFE ternary ------------------------------------------------------------

def test_iife_ternary_describe():
    rows = parse_js_tests(
        ";(process.env.SKIP ? describe.skip : describe)(\n"
        "  'test suite',\n  () => {\n    it('should work', () => {})\n  }\n)"
    )
    suites = tops(rows, "suite")
    assert len(suites) == 1 and suites[0]["name"] == "test suite"
    assert suites[0]["status"] == "active"
    assert len(children(rows, ["test suite"], "test")) == 1


def test_iife_ternary_it():
    rows = parse_js_tests(
        ";(process.env.SKIP ? it.skip : it)(\n  'conditional test',\n  () => {}\n)"
    )
    got = tops(rows, "test")
    assert len(got) == 1 and got[0]["name"] == "conditional test"


def test_parenthesized_describe():
    rows = parse_js_tests("(describe)(\n  'plain suite',\n  () => { it('t', () => {}); }\n)")
    suites = tops(rows, "suite")
    assert len(suites) == 1 and suites[0]["name"] == "plain suite"


def test_iife_nested_ternaries():
    rows = parse_js_tests(
        ";(process.env.IS_TURBOPACK_TEST ? describe.skip : describe)(\n"
        "  'build trace with extra entries',\n  () => {\n"
        "    ;(process.env.TURBOPACK_DEV ? describe.skip : describe)(\n"
        "      'production mode',\n      () => {\n"
        "        it('should build and trace correctly', async () => {})\n"
        "      }\n    )\n  }\n)"
    )
    outer = tops(rows, "suite")
    assert len(outer) == 1 and outer[0]["name"] == "build trace with extra entries"
    inner = children(rows, ["build trace with extra entries"], "suite")
    assert len(inner) == 1 and inner[0]["name"] == "production mode"
    t = children(rows, ["build trace with extra entries", "production mode"], "test")
    assert len(t) == 1 and t[0]["name"] == "should build and trace correctly"


# -- custom wrappers ---------------------------------------------------------

def test_custom_wrapper_describe_matrix():
    rows = parse_js_tests(
        "describeMatrix({ providers: { d1: true } }, 'D1', () => {\n"
        "  test('should succeed', async () => {});\n"
        "  test('should fail gracefully', async () => {});\n});"
    )
    assert not tops(rows, "suite")
    assert len(tops(rows, "test")) == 2


def test_custom_wrapper_with_describe_inside():
    rows = parse_js_tests(
        "describeMatrix({ providers: sqliteOnly }, 'SQLite', () => {\n"
        "  describe('migrations', () => {\n    test('applies', () => {});\n  });\n});"
    )
    suites = tops(rows, "suite")
    assert len(suites) == 1 and suites[0]["name"] == "migrations"
    assert len(children(rows, ["migrations"], "test")) == 1


def test_nested_custom_wrappers():
    rows = parse_js_tests(
        "customWrapper('outer', () => {\n  innerWrapper('inner', () => {\n"
        "    it('deep test', () => {});\n  });\n});"
    )
    got = tops(rows, "test")
    assert len(got) == 1 and got[0]["name"] == "deep test"


def test_wrapper_with_args_before_callback():
    rows = parse_js_tests(
        "myTestHelper(config, options, 'name', () => {\n  test('inner', () => {});\n});"
    )
    got = tops(rows, "test")
    assert len(got) == 1 and got[0]["name"] == "inner"


# -- variable declarations ---------------------------------------------------

VAR_CASES = [
    ('var runningTest = it("test name", function() {});', "test name", "active"),
    ('var skippedTest = xit("pending test", function() {});', "pending test", "skipped"),
    ('var test = it("test", function() {}).timeout(1000);', "test", "active"),
    ('const myTest = it("const test", () => {});', "const test", "active"),
    ('let myTest = it("let test", () => {});', "let test", "active"),
    ('const skipped = it.skip("skipped test", () => {});', "skipped test", "skipped"),
    ('var test = it("chained", () => {}).timeout(1000).retries(3);', "chained", "active"),
]


@pytest.mark.parametrize("source,name,status", VAR_CASES)
def test_variable_declarations(source, name, status):
    got = tops(parse_js_tests(source), "test")
    assert len(got) == 1
    assert got[0]["name"] == name and got[0]["status"] == status


def test_variable_declaration_in_suite():
    rows = parse_js_tests(
        'describe("setting timeout", function () {\n'
        "  var runningTest =\n"
        '    it("enables users to call timeout on active tests", function () {\n'
        '      expect(1 + 1, "to be", 2);\n'
        "    }).timeout(1003);\n\n"
        "  var skippedTest =\n"
        '    xit("enables users to call timeout on pending tests", function () {\n'
        '      expect(1 + 1, "to be", 3);\n'
        "    }).timeout(1002);\n\n"
        '  it("sets timeout on pending tests", function () {\n'
        '    expect(skippedTest._timeout, "to be", 1002);\n'
        "  });\n"
        "});"
    )
    got = children(rows, ["setting timeout"], "test")
    assert [(r["name"], r["status"]) for r in got] == [
        ("enables users to call timeout on active tests", "active"),
        ("enables users to call timeout on pending tests", "skipped"),
        ("sets timeout on pending tests", "active"),
    ]


# -- RuleTester --------------------------------------------------------------

def test_rule_tester_run():
    rows = parse_js_tests(
        "const ruleTester = new RuleTester();\n"
        "ruleTester.run('my-rule', rule, {\n  valid: [],\n  invalid: [],\n});"
    )
    got = tops(rows, "test")
    assert len(got) == 1 and got[0]["name"] == "my-rule (dynamic cases)"


def test_tester_run_variants():
    rows = parse_js_tests(
        "const tester = new RuleTester({ parser: '@typescript-eslint/parser' });\n"
        "tester.run('other-rule', rule, { valid: [], invalid: [] });"
    )
    assert len(tops(rows, "test")) == 1

    rows = parse_js_tests(
        "const stylelintTester = getTestRule();\n"
        "stylelintTester.run('color-hex', rule, { accept: [], reject: [] });"
    )
    assert len(tops(rows, "test")) == 1

    rows = parse_js_tests(
        "const ruleTester = new RuleTester();\n"
        "ruleTester.run('rule-one', ruleOne, { valid: [], invalid: [] });\n"
        "ruleTester.run('rule-two', ruleTwo, { valid: [], invalid: [] });"
    )
    assert len(tops(rows, "test")) == 2


def test_rule_tester_negative():
    assert not tops(parse_js_tests("server.run('start', config, {});"), "test")
    assert not tops(parse_js_tests("tester.run(ruleName, rule, {});"), "test")


def test_rule_tester_inside_describe():
    rows = parse_js_tests(
        "describe('ESLint Rules', () => {\n"
        "  const ruleTester = new RuleTester();\n\n"
        "  ruleTester.run('no-console', rule, {\n"
        "    valid: [{ code: 'var x = 1;' }],\n"
        "    invalid: [{ code: 'console.log(1);', errors: 1 }],\n  });\n});"
    )
    got = children(rows, ["ESLint Rules"], "test")
    assert len(got) == 1 and got[0]["name"] == "no-console (dynamic cases)"


# -- conditional skip (Vitest) ----------------------------------------------

CONDITIONAL_SKIP_CASES = [
    ("test.skip(isCI);", 0, 0),
    ("it.skip(process.env.CI);", 0, 0),
    ("test.skip(isCI, 'skipped on CI');", 0, 0),
    ("describe.skip(isWindows);", 0, 0),
    ("test.skip('skipped test', () => {});", 0, 1),
    ("it.skip('skipped test', () => {});", 0, 1),
    ("describe.skip('skipped suite', () => { it('test', () => {}); });", 1, 0),
    ("test(getTestName(), () => {});", 0, 1),
    ("it(testCase.name, () => {});", 0, 1),
]


@pytest.mark.parametrize("source,want_suites,want_tests", CONDITIONAL_SKIP_CASES)
def test_conditional_skip(source, want_suites, want_tests):
    rows = parse_js_tests(source)
    assert len(tops(rows, "suite")) == want_suites
    assert len(tops(rows, "test")) == want_tests


def test_dynamic_name_placeholder():
    got = tops(parse_js_tests("test(getTestName(), () => {});"), "test")
    assert got[0]["name"] == "(dynamic)"
    got = tops(parse_js_tests("it(testCase.name, () => {});"), "test")
    assert got[0]["name"] == "(dynamic)"


def test_count_tests():
    rows = parse_js_tests(
        "describe('S', () => { it('a', () => {}); it('b', () => {}); });\n"
        "it('c', () => {});"
    )
    assert count_tests(rows) == 3


# -- Playwright specials (playwright/definition.go:370-440) -----------------

def test_playwright_fixme():
    got = tops(parse_js_tests("test.fixme('needs fix', async ({ page }) => {});"), "test")
    assert len(got) == 1
    assert got[0]["status"] == "skipped" and got[0]["modifier"] == "fixme"


def test_playwright_test_describe():
    rows = parse_js_tests(
        "test.describe('Auth', () => {\n"
        "  test('login', async ({ page }) => {});\n"
        "  test.fixme('broken test', async ({ page }) => {});\n"
        "});\n"
        "test('top-level test', async ({ page }) => {});"
    )
    assert [s["name"] for s in tops(rows, "suite")] == ["Auth"]
    got = children(rows, ["Auth"], "test")
    assert [(t["name"], t["status"]) for t in got] == [
        ("login", "active"), ("broken test", "skipped"),
    ]
    assert [t["name"] for t in tops(rows, "test")] == ["top-level test"]


def test_playwright_test_describe_skip_chain():
    rows = parse_js_tests(
        "test.describe.skip('skipped suite', () => { test('t', () => {}); });"
    )
    s = tops(rows, "suite")[0]
    assert s["name"] == "skipped suite" and s["status"] == "skipped"

    rows = parse_js_tests("test.describe.only('focused', () => {});")
    assert tops(rows, "suite")[0]["status"] == "focused"


def test_playwright_conditional_fixme_not_a_test():
    rows = parse_js_tests("test.fixme(process.env.CI, 'reason');")
    assert not tops(rows, "test")


# -- Playwright test-alias tracking (playwright/definition.go:187-339; ------
# fixtures ported from playwright/definition_test.go:381-689)

def test_playwright_setup_alias():
    rows = parse_js_tests(
        "import { test as setup } from '@playwright/test';\n"
        "setup('authenticate', async ({ request }) => {\n"
        "  await request.post('/api/login');\n"
        "});\n"
    )
    assert [t["name"] for t in tops(rows, "test")] == ["authenticate"]


def test_playwright_teardown_alias_with_modifiers():
    rows = parse_js_tests(
        "import { test as teardown } from '@playwright/test';\n"
        "teardown('cleanup', async ({ page }) => {});\n"
        "teardown.skip('later', async ({ page }) => {});\n"
        "teardown.fixme('broken', async ({ page }) => {});\n"
    )
    got = [(t["name"], t["status"]) for t in tops(rows, "test")]
    assert got == [("cleanup", "active"), ("later", "skipped"), ("broken", "skipped")]


def test_playwright_multiple_aliases_detect_all():
    rows = parse_js_tests(
        "import { test, test as setup, expect } from '@playwright/test';\n"
        "setup('auth setup', async ({ request }) => {});\n"
        "test('regular test', async ({ page }) => {});\n"
    )
    assert [t["name"] for t in tops(rows, "test")] == ["auth setup", "regular test"]


def test_playwright_non_playwright_alias_not_detected():
    rows = parse_js_tests(
        "import { test as customTest } from './custom-utils';\n"
        "import { test } from '@playwright/test';\n"
        "customTest('should not be detected', async () => {});\n"
        "test('should be detected', async ({ page }) => {});\n"
    )
    assert [t["name"] for t in tops(rows, "test")] == ["should be detected"]


def test_playwright_type_only_import_no_alias():
    # statement-level `import type` never contributes aliases
    # (definition.go:229-238); the value import on the next line does
    rows = parse_js_tests(
        "import type { Page } from '@playwright/test';\n"
        "import { test, expect } from '@playwright/test';\n"
        "test('should work normally', async ({ page }) => {});\n"
    )
    assert [t["name"] for t in tops(rows, "test")] == ["should work normally"]


def test_playwright_alias_conditional_skip_filtered():
    # the vitest/playwright conditional-skip rule applies to aliases too
    rows = parse_js_tests(
        "import { test as setup } from '@playwright/test';\n"
        "setup.skip(process.env.CI, 'reason');\n"
        "setup('real', async () => {});\n"
    )
    assert [t["name"] for t in tops(rows, "test")] == ["real"]


def test_playwright_extend_rebinding_and_describe():
    # const test = base.extend({...}) keeps `test` a test name
    # (definition.go:240-287); alias.describe(...) opens a suite
    rows = parse_js_tests(
        "import { test as base } from '@playwright/test';\n"
        "const test = base.extend({ user: async ({}, use) => use('u') });\n"
        "test('extended fixture test', async ({ user }) => {});\n"
        "base.describe('alias suite', () => {\n"
        "  base('inner', async () => {});\n"
        "});\n"
    )
    assert [t["name"] for t in tops(rows, "test")] == ["extended fixture test"]
    assert [s["name"] for s in tops(rows, "suite")] == ["alias suite"]
    assert [t["name"] for t in children(rows, ["alias suite"], "test")] == ["inner"]


def test_playwright_alias_extraction_unit():
    from core_spark.functions.jstest import extract_playwright_test_aliases, tokenize

    # no playwright import -> `it` joins via the indirect-fixture fallback
    toks = tokenize("import { browserTest as it } from '../config/browserTest';\n"
                    "it('x', async () => {});")
    assert extract_playwright_test_aliases(toks) == {"test", "it"}
    # playwright value import suppresses the `it` fallback
    toks = tokenize("import { test } from '@playwright/test';\nit('x', () => {});")
    assert extract_playwright_test_aliases(toks) == {"test"}
    # extend of an unknown object does NOT re-bind
    toks = tokenize("const test = weird.extend({});")
    assert "it" in extract_playwright_test_aliases(toks)  # no pw import
    # nested (non-top-level) declarations are ignored
    toks = tokenize("function f() { const test = base.extend({}); }\n"
                    "import { test as setup } from '@playwright/test';")
    assert extract_playwright_test_aliases(toks) == {"test", "setup"}
