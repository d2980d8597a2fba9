"""P17 goldens — semantics from the reference's xctest/swift-testing
strategies (pkg/parser/strategies/xctest/definition.go:120-225,
swift-testing/definition.go:62-264)."""

from __future__ import annotations

from core_spark.functions.swifttest import (
    parse_swift_testing,
    parse_swift_tests,
    parse_xctest,
)


def suites(rows):
    return [r for r in rows if r["kind"] == "suite"]


def _tests(rows, path):
    return [r for r in rows if r["kind"] == "test" and r["suite_path"] == list(path)]


def test_xctest_basic():
    rows = parse_xctest(
        "import XCTest\n\n"
        "class CalculatorTests: XCTestCase {\n"
        "    func testAdd() {\n        XCTAssertEqual(1 + 1, 2)\n    }\n"
        "    func testSubtract() {}\n"
        "    func helper() {}\n"
        "    func testlower() {}\n}\n"
    )
    assert [s["name"] for s in suites(rows)] == ["CalculatorTests"]
    # 'testlower' fails the 5th-char-uppercase rule
    assert [t["name"] for t in _tests(rows, ["CalculatorTests"])] == [
        "testAdd", "testSubtract",
    ]


def test_xctest_custom_testcase_suffix():
    rows = parse_xctest(
        "class MyTests: BaseTestCase {\n    func testIt() {}\n}\n"
    )
    assert [s["name"] for s in suites(rows)] == ["MyTests"]


def test_xctest_skip_and_async():
    rows = parse_xctest(
        "class T: XCTestCase {\n"
        "    func testSkipped() throws {\n        throw XCTSkip(\"na\")\n    }\n"
        "    func testAsync() async {\n        await thing()\n    }\n"
        "    func testPlain() {}\n}\n"
    )
    got = _tests(rows, ["T"])
    assert [(t["name"], t["status"], t["modifier"]) for t in got] == [
        ("testSkipped", "skipped", "XCTSkip"),
        ("testAsync", "active", "async"),
        ("testPlain", "active", ""),
    ]


def test_xctest_non_testcase_class_ignored():
    rows = parse_xctest("class Helper {\n    func testSomething() {}\n}\n")
    assert rows == []


def test_xctest_empty_suite_dropped():
    rows = parse_xctest("class T: XCTestCase {\n    func setUp() {}\n}\n")
    assert rows == []


def test_swift_testing_suite():
    rows = parse_swift_testing(
        "import Testing\n\n"
        "@Suite struct MathTests {\n"
        "    @Test func addition() {\n        #expect(1 + 1 == 2)\n    }\n"
        "    @Test(.disabled(\"broken\")) func broken() {}\n"
        "    func helper() {}\n}\n"
    )
    assert [s["name"] for s in suites(rows)] == ["MathTests"]
    got = _tests(rows, ["MathTests"])
    assert [(t["name"], t["status"], t["modifier"]) for t in got] == [
        ("addition", "active", ""),
        ("broken", "skipped", "@Test(.disabled)"),
    ]


def test_swift_testing_without_suite_attribute():
    rows = parse_swift_testing(
        "struct ImplicitSuite {\n    @Test func works() {}\n}\n"
    )
    assert [s["name"] for s in suites(rows)] == ["ImplicitSuite"]


def test_dispatch():
    xct = parse_swift_tests("class T: XCTestCase { func testA() {} }")
    assert len(xct) == 2
    st = parse_swift_tests("import Testing\nstruct S { @Test func f() {} }")
    assert [t["name"] for t in _tests(st, ["S"])] == ["f"]
