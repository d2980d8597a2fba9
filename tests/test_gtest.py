"""P16 goldens — ported from the reference's gtest fixtures
(pkg/parser/strategies/gtest/definition_test.go)."""

from __future__ import annotations

from core_spark.functions.gtest import parse_gtest


def suites(rows):
    return [r for r in rows if r["kind"] == "suite"]


def _tests_of(rows, suite):
    return [r for r in rows if r["kind"] == "test" and r["suite_path"] == [suite]]


def test_basic_test_macro():
    rows = parse_gtest(
        "\n#include <gtest/gtest.h>\n\nTEST(SuiteName, TestName) {\n"
        "    EXPECT_EQ(1, 1);\n}\n"
    )
    assert [s["name"] for s in suites(rows)] == ["SuiteName"]
    assert [t["name"] for t in _tests_of(rows, "SuiteName")] == ["TestName"]


def test_fixture_macro():
    rows = parse_gtest(
        "\n#include <gtest/gtest.h>\n\n"
        "class MyFixture : public ::testing::Test {\nprotected:\n"
        "    void SetUp() override {}\n};\n\n"
        "TEST_F(MyFixture, TestWithFixture) {\n    EXPECT_TRUE(true);\n}\n\n"
        "TEST_F(MyFixture, AnotherTest) {\n    EXPECT_TRUE(true);\n}\n"
    )
    assert [s["name"] for s in suites(rows)] == ["MyFixture"]
    assert [t["name"] for t in _tests_of(rows, "MyFixture")] == [
        "TestWithFixture", "AnotherTest",
    ]


def test_param_macro():
    rows = parse_gtest(
        "\n#include <gtest/gtest.h>\n\n"
        "class ParamTest : public ::testing::TestWithParam<int> {};\n\n"
        "TEST_P(ParamTest, ChecksValue) {\n    EXPECT_GT(GetParam(), 0);\n}\n\n"
        "INSTANTIATE_TEST_SUITE_P(MyInstance, ParamTest, ::testing::Values(1, 2, 3));\n"
    )
    assert [s["name"] for s in suites(rows)] == ["ParamTest"]
    assert [t["name"] for t in _tests_of(rows, "ParamTest")] == ["ChecksValue"]


def test_disabled_test():
    rows = parse_gtest(
        "\n#include <gtest/gtest.h>\n\n"
        "TEST(Suite, DISABLED_SkippedTest) {\n    FAIL() << \"Should not run\";\n}\n\n"
        "TEST(Suite, ActiveTest) {\n    EXPECT_TRUE(true);\n}\n"
    )
    got = _tests_of(rows, "Suite")
    assert [(t["name"], t["status"], t["modifier"]) for t in got] == [
        ("DISABLED_SkippedTest", "skipped", "DISABLED_"),
        ("ActiveTest", "active", ""),
    ]
    assert suites(rows)[0]["status"] == "active"


def test_disabled_suite_applies_to_all():
    rows = parse_gtest(
        "\n#include <gtest/gtest.h>\n\n"
        "TEST(DISABLED_Suite, TestOne) {\n    EXPECT_TRUE(true);\n}\n\n"
        "TEST(DISABLED_Suite, TestTwo) {\n    EXPECT_TRUE(true);\n}\n"
    )
    s = suites(rows)[0]
    assert s["name"] == "DISABLED_Suite" and s["status"] == "skipped"
    assert [t["status"] for t in _tests_of(rows, "DISABLED_Suite")] == [
        "skipped", "skipped",
    ]


def test_multiple_suites_sorted():
    rows = parse_gtest(
        "\n#include <gtest/gtest.h>\n\n"
        "TEST(SuiteB, Test1) { EXPECT_TRUE(true); }\n"
        "TEST(SuiteA, Test1) { EXPECT_TRUE(true); }\n"
        "TEST(SuiteA, Test2) { EXPECT_TRUE(true); }\n"
        "TEST(SuiteC, Test1) { EXPECT_TRUE(true); }\n"
    )
    assert [s["name"] for s in suites(rows)] == ["SuiteA", "SuiteB", "SuiteC"]
    assert [t["name"] for t in _tests_of(rows, "SuiteA")] == ["Test1", "Test2"]


def test_typed_macros():
    rows = parse_gtest(
        "TYPED_TEST(TypedSuite, DoesStuff) {}\n"
        "TYPED_TEST_P(TypedSuiteP, DoesMore) {}\n"
    )
    assert {s["name"] for s in suites(rows)} == {"TypedSuite", "TypedSuiteP"}


def test_non_gtest_macros_ignored():
    rows = parse_gtest(
        "MY_MACRO(Foo, Bar) {}\nASSERT_EQ(a, b);\nTEST_CASE(CatchStyle) {}\n"
    )
    assert rows == []


def test_lines():
    rows = parse_gtest("// header\n\nTEST(S, A) {}\n\nTEST(S, B) {}\n")
    s = suites(rows)[0]
    assert s["line"] == 3
    assert [t["line"] for t in _tests_of(rows, "S")] == [3, 5]
