"""P11 goldens — ported from the reference's kotest fixtures
(pkg/parser/strategies/kotest/definition_test.go:128-790)."""

from __future__ import annotations

from core_spark.functions.kotlintest import parse_kotest_tests


def suites(rows, path=()):
    return [r for r in rows if r["kind"] == "suite" and r["suite_path"] == list(path)]


def _tests(rows, path):
    return [r for r in rows if r["kind"] == "test" and r["suite_path"] == list(path)]


FUN_SPEC = (
    "\npackage com.example\n\n"
    "import io.kotest.core.spec.style.FunSpec\n"
    "import io.kotest.matchers.shouldBe\n\n"
    "class CalculatorTest : FunSpec({\n"
    '    test("addition works") {\n        1 + 1 shouldBe 2\n    }\n\n'
    '    test("subtraction works") {\n        5 - 3 shouldBe 2\n    }\n\n'
    '    context("multiplication") {\n'
    '        test("basic multiplication") {\n            2 * 3 shouldBe 6\n        }\n'
    "    }\n\n"
    '    xtest("skipped test") {\n    }\n})\n'
)


def test_fun_spec():
    rows = parse_kotest_tests(FUN_SPEC)
    assert [s["name"] for s in suites(rows)] == ["CalculatorTest"]
    got = _tests(rows, ["CalculatorTest"])
    assert [(t["name"], t["status"]) for t in got] == [
        ("addition works", "active"),
        ("subtraction works", "active"),
        ("skipped test", "skipped"),
    ]
    assert got[2]["modifier"] == "xtest"
    nested = suites(rows, ["CalculatorTest"])
    assert [s["name"] for s in nested] == ["multiplication"]
    assert [t["name"] for t in _tests(rows, ["CalculatorTest", "multiplication"])] == [
        "basic multiplication",
    ]


def test_string_spec():
    rows = parse_kotest_tests(
        "class StringSpecTest : StringSpec({\n"
        '    "length of hello should be 5" {\n        "hello".length shouldBe 5\n    }\n\n'
        '    "startsWith should test for prefix" {\n'
        '        "world".startsWith("wor") shouldBe true\n    }\n})\n'
    )
    assert [s["name"] for s in suites(rows)] == ["StringSpecTest"]
    assert [t["name"] for t in _tests(rows, ["StringSpecTest"])] == [
        "length of hello should be 5",
        "startsWith should test for prefix",
    ]


def test_string_spec_bang_prefix():
    rows = parse_kotest_tests(
        'class T : StringSpec({\n    "!disabled case" {\n    }\n})\n'
    )
    got = _tests(rows, ["T"])
    assert [(t["name"], t["status"], t["modifier"]) for t in got] == [
        ("disabled case", "skipped", "!"),
    ]


def test_behavior_spec():
    rows = parse_kotest_tests(
        "class BehaviorSpecTest : BehaviorSpec({\n"
        '    Given("a calculator") {\n'
        '        When("adding numbers") {\n'
        '            Then("should return correct sum") {\n'
        "                1 + 1 shouldBe 2\n            }\n        }\n    }\n})\n"
    )
    assert [s["name"] for s in suites(rows)] == ["BehaviorSpecTest"]
    assert [s["name"] for s in suites(rows, ["BehaviorSpecTest"])] == ["a calculator"]
    assert [s["name"] for s in suites(rows, ["BehaviorSpecTest", "a calculator"])] == [
        "adding numbers",
    ]
    assert [t["name"] for t in _tests(
        rows, ["BehaviorSpecTest", "a calculator", "adding numbers"]
    )] == ["should return correct sum"]


def test_describe_spec():
    rows = parse_kotest_tests(
        "class DescribeSpecTest : DescribeSpec({\n"
        '    describe("a calculator") {\n'
        '        it("should add numbers") {\n            1 + 1 shouldBe 2\n        }\n\n'
        '        context("when subtracting") {\n'
        '            it("should return difference") {\n'
        "                5 - 3 shouldBe 2\n            }\n        }\n    }\n})\n"
    )
    assert [s["name"] for s in suites(rows, ["DescribeSpecTest"])] == ["a calculator"]
    assert [t["name"] for t in _tests(rows, ["DescribeSpecTest", "a calculator"])] == [
        "should add numbers",
    ]
    assert [t["name"] for t in _tests(
        rows, ["DescribeSpecTest", "a calculator", "when subtracting"]
    )] == ["should return difference"]


def test_annotation_spec():
    rows = parse_kotest_tests(
        "class AnnotationSpecTest : AnnotationSpec() {\n"
        "    @Test\n    fun testAddition() {\n        assert(1 + 1 == 2)\n    }\n\n"
        "    @Test\n    @Disabled\n    fun testDisabled() {\n    }\n}\n"
    )
    assert [s["name"] for s in suites(rows)] == ["AnnotationSpecTest"]
    got = _tests(rows, ["AnnotationSpecTest"])
    assert [(t["name"], t["status"]) for t in got] == [
        ("testAddition", "active"),
        ("testDisabled", "skipped"),
    ]


def test_non_kotest_class_ignored():
    rows = parse_kotest_tests(
        "class RegularClass {\n    fun doSomething(): Int {\n        return 42\n    }\n}\n"
    )
    assert rows == []


def test_word_spec():
    rows = parse_kotest_tests(
        "class WordSpecTest : WordSpec({\n"
        '    "String.length" should {\n'
        '        "return the length of the string" {\n'
        '            "hello".length shouldBe 5\n        }\n'
        '        "return zero for empty string" {\n'
        '            "".length shouldBe 0\n        }\n    }\n\n'
        '    "String.startsWith" should {\n'
        '        "return true for matching prefix" {\n'
        '            "hello".startsWith("hel") shouldBe true\n        }\n    }\n})\n'
    )
    nested = suites(rows, ["WordSpecTest"])
    assert [s["name"] for s in nested] == ["String.length", "String.startsWith"]
    assert len(_tests(rows, ["WordSpecTest", "String.length"])) == 2
    assert len(_tests(rows, ["WordSpecTest", "String.startsWith"])) == 1


def test_free_spec():
    rows = parse_kotest_tests(
        "class FreeSpecTest : FreeSpec({\n"
        '    "String.length" - {\n'
        '        "should return the length" {\n'
        '            "hello".length shouldBe 5\n        }\n    }\n})\n'
    )
    assert [s["name"] for s in suites(rows, ["FreeSpecTest"])] == ["String.length"]
    assert [t["name"] for t in _tests(rows, ["FreeSpecTest", "String.length"])] == [
        "should return the length",
    ]


def test_should_spec():
    rows = parse_kotest_tests(
        "class ShouldSpecTest : ShouldSpec({\n"
        '    should("return the length of a string") {\n'
        '        "hello".length shouldBe 5\n    }\n\n'
        '    context("String operations") {\n'
        '        should("concatenate strings") {\n'
        '            ("hello" + " world") shouldBe "hello world"\n        }\n    }\n})\n'
    )
    assert [t["name"] for t in _tests(rows, ["ShouldSpecTest"])] == [
        "return the length of a string",
    ]
    assert [t["name"] for t in _tests(rows, ["ShouldSpecTest", "String operations"])] == [
        "concatenate strings",
    ]


def test_init_block_styles():
    rows = parse_kotest_tests(
        "class CalculatorTest : FunSpec() {\n    init {\n"
        '        test("addition works") {\n            1 + 1 shouldBe 2\n        }\n'
        '        context("multiplication") {\n'
        '            test("basic multiplication") {\n'
        "                2 * 3 shouldBe 6\n            }\n        }\n    }\n}\n"
    )
    assert [t["name"] for t in _tests(rows, ["CalculatorTest"])] == ["addition works"]
    assert [t["name"] for t in _tests(rows, ["CalculatorTest", "multiplication"])] == [
        "basic multiplication",
    ]

    rows = parse_kotest_tests(
        "class StringSpecInitTest : StringSpec() {\n    init {\n"
        '        "length of hello should be 5" {\n'
        '            "hello".length shouldBe 5\n        }\n    }\n}\n'
    )
    assert [t["name"] for t in _tests(rows, ["StringSpecInitTest"])] == [
        "length of hello should be 5",
    ]


def test_foreach_generators_descend():
    rows = parse_kotest_tests(
        "class ForEachTest : FunSpec({\n"
        '    setOf("a", "b").forEach { item ->\n'
        '        test("test for $item") {\n            item.length shouldBe 1\n        }\n'
        "    }\n\n"
        '    test("regular test outside forEach") {\n        1 + 1 shouldBe 2\n    }\n})\n'
    )
    got = [t["name"] for t in _tests(rows, ["ForEachTest"])]
    assert "test for $item" in got
    assert "regular test outside forEach" in got


def test_class_level_disabled():
    rows = parse_kotest_tests(
        "@Disabled\nclass T : FunSpec({\n    test(\"a\") {}\n})\n"
    )
    s = suites(rows)[0]
    assert s["status"] == "skipped" and s["modifier"] == "@Disabled"
