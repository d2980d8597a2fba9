"""P14 goldens — semantics from the reference's phpunit strategy
(pkg/parser/strategies/phpunit/definition.go:63-218)."""

from __future__ import annotations

from core_spark.functions.phptest import parse_phpunit_tests


def suites(rows):
    return [r for r in rows if r["kind"] == "suite"]


def _tests(rows, path):
    return [r for r in rows if r["kind"] == "test" and r["suite_path"] == list(path)]


def test_basic_test_methods():
    rows = parse_phpunit_tests(
        "<?php\nuse PHPUnit\\Framework\\TestCase;\n\n"
        "class CalculatorTest extends TestCase {\n"
        "    public function testAdd(): void {\n"
        "        $this->assertSame(2, 1 + 1);\n    }\n"
        "    public function testSubtract(): void {}\n"
        "    private function helper(): int { return 42; }\n}\n"
    )
    assert [s["name"] for s in suites(rows)] == ["CalculatorTest"]
    assert [t["name"] for t in _tests(rows, ["CalculatorTest"])] == [
        "testAdd", "testSubtract",
    ]


def test_at_test_annotation():
    rows = parse_phpunit_tests(
        "<?php\nclass T extends TestCase {\n"
        "    /** @test */\n    public function itDoesThings(): void {}\n"
        "    /** plain docblock */\n    public function notDetected(): void {}\n}\n"
    )
    assert [t["name"] for t in _tests(rows, ["T"])] == ["itDoesThings"]


def test_php8_attributes():
    rows = parse_phpunit_tests(
        "<?php\nclass T extends TestCase {\n"
        "    #[Test]\n    public function attributeBased(): void {}\n"
        "    #[Test]\n    #[Skip]\n    public function skippedOne(): void {}\n"
        "    #[Test]\n    #[Ignore]\n    public function ignoredOne(): void {}\n}\n"
    )
    got = _tests(rows, ["T"])
    assert [(t["name"], t["status"], t["modifier"]) for t in got] == [
        ("attributeBased", "active", ""),
        ("skippedOne", "skipped", "#[Skip]"),
        ("ignoredOne", "skipped", "#[Ignore]"),
    ]


def test_qualified_base_class():
    rows = parse_phpunit_tests(
        "<?php\nclass T extends \\PHPUnit\\Framework\\TestCase {\n"
        "    public function testIt(): void {}\n}\n"
    )
    assert [s["name"] for s in suites(rows)] == ["T"]


def test_non_testcase_class_ignored():
    rows = parse_phpunit_tests(
        "<?php\nclass Helper {\n    public function testLooksLike(): void {}\n}\n"
    )
    assert rows == []


def test_base_with_test_suffix():
    rows = parse_phpunit_tests(
        "<?php\nclass T extends BaseIntegrationTest {\n"
        "    public function testIt(): void {}\n}\n"
    )
    assert [s["name"] for s in suites(rows)] == ["T"]


def test_empty_suite_dropped():
    rows = parse_phpunit_tests(
        "<?php\nclass T extends TestCase {\n    public function helper(): void {}\n}\n"
    )
    assert rows == []


def test_hash_comment_vs_attribute():
    rows = parse_phpunit_tests(
        "<?php\nclass T extends TestCase {\n"
        "    # just a comment, not an attribute\n"
        "    public function testStill(): void {}\n}\n"
    )
    assert [t["name"] for t in _tests(rows, ["T"])] == ["testStill"]
