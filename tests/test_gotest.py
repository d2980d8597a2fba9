"""P7 goldens — ported from the reference's gotesting fixtures
(pkg/parser/strategies/gotesting/definition_test.go)."""

from __future__ import annotations

import pytest

from core_spark.functions.gotest import classify_func, parse_go_tests, trim_quotes


def tops(rows, kind):
    return [r for r in rows if r["kind"] == kind and not r["suite_path"]]


def children(rows, path):
    return [r for r in rows if r["kind"] == "test" and r["suite_path"] == list(path)]


def test_parse_with_subtests():
    rows = parse_go_tests(
        "\npackage mypackage\n\nimport (\n\t\"testing\"\n)\n\n"
        "func TestSimple(t *testing.T) {\n"
        "\tif 1+1 != 2 {\n\t\tt.Error(\"math is broken\")\n\t}\n}\n\n"
        "func TestWithSubtests(t *testing.T) {\n"
        "\tt.Run(\"subtest 1\", func(t *testing.T) {\n\t\t// test code\n\t})\n\n"
        "\tt.Run(\"subtest 2\", func(t *testing.T) {\n\t\t// test code\n\t})\n}\n\n"
        "func TestAnother(t *testing.T) {\n\t// simple test without subtests\n}\n"
    )
    suites = tops(rows, "suite")
    assert [s["name"] for s in suites] == ["TestWithSubtests"]
    assert [t["name"] for t in children(rows, ["TestWithSubtests"])] == [
        "subtest 1", "subtest 2",
    ]
    assert [t["name"] for t in tops(rows, "test")] == ["TestSimple", "TestAnother"]


NAMING_CASES = [
    ("func TestValidName(t *testing.T) {}", 1, "TestValidName"),
    ("func Testinvalid(t *testing.T) {}", 0, None),
    ("func TestCase123(t *testing.T) {}", 1, "TestCase123"),
    ("func Test_With_Underscores(t *testing.T) {}", 1, "Test_With_Underscores"),
    ("func TestWith_Underscores(t *testing.T) {}", 1, "TestWith_Underscores"),
    ("func Test() {}", 0, None),
]


@pytest.mark.parametrize("decl,count,name", NAMING_CASES)
def test_naming_conventions(decl, count, name):
    rows = parse_go_tests(f"\npackage test\nimport \"testing\"\n{decl}\n")
    got = tops(rows, "test")
    assert len(got) == count
    if name:
        assert got[0]["name"] == name


PARAM_CASES = [
    ("func TestValid(t *testing.T) {}", True),
    ("func TestInvalid(t string) {}", False),
    ("func TestInvalid() {}", False),
    ("func TestInvalid(t *testing.T, extra int) {}", False),
    ("func TestInvalid(t testing.T) {}", False),
    ("func BenchmarkValid(b *testing.B) {}", True),
    ("func BenchmarkInvalid(t *testing.T) {}", False),
    ("func FuzzValid(f *testing.F) {}", True),
    ("func FuzzInvalid(t *testing.T) {}", False),
    ("func ExampleValid() {}", True),
    ("func ExampleInvalid(t *testing.T) {}", False),
    ("func Example() {}", True),  # bare Example is valid (len==7 rule)
]


@pytest.mark.parametrize("decl,detected", PARAM_CASES)
def test_param_validation(decl, detected):
    rows = parse_go_tests(f"package test\nimport \"testing\"\n{decl}\n")
    assert (len(rows) == 1) is detected


def test_classify():
    assert classify_func("TestFoo") == "test"
    assert classify_func("Testfoo") is None
    assert classify_func("BenchmarkX") == "benchmark"
    assert classify_func("Benchmarkx") is None
    assert classify_func("Example") == "example"
    assert classify_func("Examplelower") is None
    assert classify_func("FuzzY") == "fuzz"
    assert classify_func("helper") is None


def test_methods_excluded():
    rows = parse_go_tests(
        "package test\nimport \"testing\"\n"
        "func (s *Suite) TestMethod(t *testing.T) {}\n"
        "func TestReal(t *testing.T) {}\n"
    )
    assert [r["name"] for r in rows] == ["TestReal"]


def test_nested_t_run():
    rows = parse_go_tests(
        "package test\nimport \"testing\"\n"
        "func TestNested(t *testing.T) {\n"
        "\tt.Run(\"outer\", func(t *testing.T) {\n"
        "\t\tt.Run(\"inner\", func(t *testing.T) {})\n"
        "\t})\n}\n"
    )
    assert [s["name"] for s in tops(rows, "suite")] == ["TestNested"]
    # WalkTree finds ALL .Run calls, flat under the func suite
    assert [t["name"] for t in children(rows, ["TestNested"])] == ["outer", "inner"]


def test_raw_string_subtest_name():
    rows = parse_go_tests(
        "package test\nimport \"testing\"\n"
        "func TestRaw(t *testing.T) {\n"
        "\tt.Run(`raw name`, func(t *testing.T) {})\n}\n"
    )
    assert children(rows, ["TestRaw"])[0]["name"] == "raw name"


def test_trim_quotes():
    assert trim_quotes('"hello"') == "hello"
    assert trim_quotes('"say \\"hi\\""') == 'say "hi"'
    assert trim_quotes("`raw`") == "raw"
    assert trim_quotes("bare") == "bare"


def test_lines():
    rows = parse_go_tests(
        "package test\n\nimport \"testing\"\n\n"
        "func TestA(t *testing.T) {}\n"
    )
    assert rows[0]["line"] == 5
