"""P10 goldens — ported from the reference's junit5 fixtures
(pkg/parser/strategies/junit5/definition_test.go:266-690)."""

from __future__ import annotations

from core_spark.functions.javatest import parse_java_tests


def suites(rows, path=()):
    return [r for r in rows if r["kind"] == "suite" and r["suite_path"] == list(path)]


def _tests(rows, path):
    return [r for r in rows if r["kind"] == "test" and r["suite_path"] == list(path)]


def test_basic_test_methods():
    rows = parse_java_tests(
        "\npackage com.example;\n\nimport org.junit.jupiter.api.Test;\n\n"
        "class CalculatorTest {\n"
        "    @Test\n    void testAdd() {\n        assertEquals(3, 1 + 2);\n    }\n\n"
        "    @Test\n    void testSubtract() {\n        assertEquals(1, 3 - 2);\n    }\n\n"
        "    void helperMethod() {\n        // not a test\n    }\n}\n"
    )
    assert [s["name"] for s in suites(rows)] == ["CalculatorTest"]
    assert [t["name"] for t in _tests(rows, ["CalculatorTest"])] == [
        "testAdd", "testSubtract",
    ]


def test_disabled_annotation():
    rows = parse_java_tests(
        "class T {\n"
        "    @Test\n    @Disabled(\"flaky\")\n    void disabledTest() {}\n\n"
        "    @Test\n    void activeTest() {}\n}\n"
    )
    got = _tests(rows, ["T"])
    assert [(t["name"], t["status"], t["modifier"]) for t in got] == [
        ("disabledTest", "skipped", "@Disabled"),
        ("activeTest", "active", ""),
    ]


def test_display_name():
    rows = parse_java_tests(
        "class T {\n"
        "    @Test\n    @DisplayName(\"Custom test name\")\n    void method() {}\n}\n"
    )
    assert _tests(rows, ["T"])[0]["name"] == "Custom test name"


def test_parameterized_repeated_factory_template():
    rows = parse_java_tests(
        "class T {\n"
        "    @ParameterizedTest\n    @ValueSource(ints = {1, 2})\n    void p(int x) {}\n"
        "    @RepeatedTest(5)\n    void r() {}\n"
        "    @TestFactory\n    Stream<DynamicTest> f() { return null; }\n"
        "    @TestTemplate\n    void tpl() {}\n}\n"
    )
    assert [t["name"] for t in _tests(rows, ["T"])] == ["p", "r", "f", "tpl"]


def test_nested_classes():
    rows = parse_java_tests(
        "\npackage com.example;\n\n"
        "class OuterTest {\n"
        "    @Test\n    void outerTest() {}\n\n"
        "    @Nested\n    class InnerTest {\n"
        "        @Test\n        void innerTest() {}\n    }\n}\n"
    )
    assert [s["name"] for s in suites(rows)] == ["OuterTest"]
    assert [t["name"] for t in _tests(rows, ["OuterTest"])] == ["outerTest"]
    assert [s["name"] for s in suites(rows, ["OuterTest"])] == ["InnerTest"]
    assert [t["name"] for t in _tests(rows, ["OuterTest", "InnerTest"])] == ["innerTest"]


def test_non_nested_inner_class_ignored():
    rows = parse_java_tests(
        "class Outer {\n"
        "    @Test\n    void a() {}\n"
        "    class Helper {\n        @Test\n        void hidden() {}\n    }\n}\n"
    )
    assert [t["name"] for t in _tests(rows, ["Outer"])] == ["a"]
    assert not suites(rows, ["Outer"])


def test_disabled_on_class_inherited():
    rows = parse_java_tests(
        "@Disabled(\"class disabled\")\n"
        "class DisabledClassTest {\n"
        "    @Test\n    void testOne() {}\n\n    @Test\n    void testTwo() {}\n}\n"
    )
    s = suites(rows)[0]
    assert s["status"] == "skipped" and s["modifier"] == "@Disabled"
    assert [t["status"] for t in _tests(rows, ["DisabledClassTest"])] == [
        "skipped", "skipped",
    ]


def test_custom_test_template_annotations():
    rows = parse_java_tests(
        "\npackage com.example;\n\n"
        "class CartesianProductTests {\n"
        "    @CartesianProductTest({\"0\", \"1\"})\n"
        "    void threeBits(String a, String b, String c) {}\n\n"
        "    @CartesianProductTest\n    void nFold(String string, Class<?> type) {}\n}\n"
    )
    assert [t["name"] for t in _tests(rows, ["CartesianProductTests"])] == [
        "threeBits", "nFold",
    ]


def test_custom_annotations_ending_with_test():
    rows = parse_java_tests(
        "class CustomTests {\n"
        "    @CustomTest\n    void customTestMethod() {}\n\n"
        "    @MyFancyTest\n    void fancyTestMethod() {}\n\n"
        "    @NotATestAnnotation\n    void shouldNotBeDetected() {}\n}\n"
    )
    assert [t["name"] for t in _tests(rows, ["CustomTests"])] == [
        "customTestMethod", "fancyTestMethod",
    ]


def test_scoped_annotation_name():
    rows = parse_java_tests(
        "class T {\n    @org.junit.jupiter.api.Test\n    void scoped() {}\n}\n"
    )
    assert [t["name"] for t in _tests(rows, ["T"])] == ["scoped"]


def test_class_without_tests_dropped():
    rows = parse_java_tests("class Helper {\n    void x() {}\n}\n")
    assert rows == []


def test_implicit_class_java21():
    rows = parse_java_tests(
        "@Test\nvoid topLevel() {}\n", filename="src/ImplicitTest.java"
    )
    assert [s["name"] for s in suites(rows)] == ["ImplicitTest"]
    assert [t["name"] for t in _tests(rows, ["ImplicitTest"])] == ["topLevel"]


# -- TestNG (testng/definition.go:183-287) + JUnit4 @Ignore ------------------

def test_junit4_ignore():
    rows = parse_java_tests(
        "class T {\n    @Test\n    @Ignore(\"flaky\")\n    void old() {}\n}\n"
    )
    got = _tests(rows, ["T"])
    assert [(t["name"], t["status"], t["modifier"]) for t in got] == [
        ("old", "skipped", "@Ignore"),
    ]


TESTNG_HEADER = "import org.testng.annotations.Test;\n\n"


def test_testng_class_level_test():
    rows = parse_java_tests(
        TESTNG_HEADER
        + "@Test\npublic class AccountTests {\n"
        "    public void verifyBalance() {}\n"
        "    public void verifyTransfer() {}\n"
        "    private void helper() {}\n"
        "    @BeforeMethod\n    public void setUp() {}\n}\n"
    )
    got = _tests(rows, ["AccountTests"])
    assert [t["name"] for t in got] == ["verifyBalance", "verifyTransfer"]


def test_testng_enabled_false():
    rows = parse_java_tests(
        TESTNG_HEADER
        + "public class T {\n"
        "    @Test\n    public void active() {}\n"
        "    @Test(enabled = false)\n    public void disabled() {}\n"
        "    @Test(description = \"transfers money\")\n    public void named() {}\n}\n"
    )
    got = _tests(rows, ["T"])
    assert [(t["name"], t["status"]) for t in got] == [
        ("active", "active"),
        ("disabled", "skipped"),
        ("transfers money", "active"),
    ]
    assert got[1]["modifier"] == "@Test(enabled=false)"


def test_testng_class_enabled_false_inherited():
    rows = parse_java_tests(
        TESTNG_HEADER
        + "@Test(enabled = false)\npublic class T {\n"
        "    public void a() {}\n}\n"
    )
    s = suites(rows)[0]
    assert s["status"] == "skipped"
    assert _tests(rows, ["T"])[0]["status"] == "skipped"


def test_testng_generic_return_type_public_method():
    """`public List<String> foo()` — the modifier walk-back crosses the
    balanced type-argument group, so TestNG class-level @Test still sees
    `public` and the span starts at the modifiers (the reference's
    method_declaration node span)."""
    rows = parse_java_tests(
        TESTNG_HEADER
        + "@Test\npublic class GenTests {\n"
        "    public List<String> names() { return null; }\n"
        "    public Map<String, List<Integer>> nested() { return null; }\n"
        "    public String[] arr() { return null; }\n"
        "    private List<String> helper() { return null; }\n}\n"
    )
    got = _tests(rows, ["GenTests"])
    assert [t["name"] for t in got] == ["names", "nested", "arr"]
    # span starts at the `public` modifier column (4), not the method name
    assert got[0]["start_col"] == 4
    assert got[1]["start_col"] == 4
