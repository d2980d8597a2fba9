"""P8/P9 goldens — ported from the reference's table-driven fixtures
(pkg/parser/strategies/pytest/definition_test.go:202-432,
unittest/definition_test.go:170-470)."""

from __future__ import annotations

from core_spark.functions.pytest_ext import parse_pytest_tests, parse_unittest_tests


def tops(rows, kind):
    return [r for r in rows if r["kind"] == kind and not r["suite_path"]]


def children(rows, path, kind="test"):
    return [r for r in rows if r["kind"] == kind and r["suite_path"] == list(path)]


# -- pytest ------------------------------------------------------------------

def test_pytest_basic_functions():
    rows = parse_pytest_tests(
        "\ndef test_add():\n    assert 1 + 1 == 2\n\n"
        "def test_subtract():\n    assert 5 - 3 == 2\n\n"
        "def helper_function():\n    return 42\n"
    )
    assert [r["name"] for r in tops(rows, "test")] == ["test_add", "test_subtract"]
    assert not tops(rows, "suite")


def test_pytest_class_with_methods():
    rows = parse_pytest_tests(
        "\nclass TestCalculator:\n"
        "    def test_add(self):\n        assert 1 + 1 == 2\n\n"
        "    def test_multiply(self):\n        assert 2 * 3 == 6\n\n"
        "    def helper_method(self):\n        pass\n"
    )
    suites = tops(rows, "suite")
    assert len(suites) == 1 and suites[0]["name"] == "TestCalculator"
    assert [r["name"] for r in children(rows, ["TestCalculator"])] == [
        "test_add", "test_multiply",
    ]


def test_pytest_skip_decorator():
    rows = parse_pytest_tests(
        "\nimport pytest\n\n"
        '@pytest.mark.skip(reason="not implemented")\n'
        "def test_skipped():\n    pass\n\n"
        "def test_normal():\n    pass\n"
    )
    got = tops(rows, "test")
    assert [(r["name"], r["status"]) for r in got] == [
        ("test_skipped", "skipped"),
        ("test_normal", "active"),
    ]
    assert got[0]["modifier"] == "@pytest.mark.skip"


def test_pytest_xfail_decorator():
    rows = parse_pytest_tests(
        "\nimport pytest\n\n"
        '@pytest.mark.xfail(reason="known bug")\n'
        "def test_xfail():\n    assert False\n"
    )
    got = tops(rows, "test")
    assert len(got) == 1 and got[0]["status"] == "xfail"


def test_pytest_parametrize_is_one_test():
    rows = parse_pytest_tests(
        "\nimport pytest\n\n"
        '@pytest.mark.parametrize("x,y,expected", [\n'
        "    (1, 2, 3),\n    (2, 3, 5),\n])\n"
        "def test_add(x, y, expected):\n    assert x + y == expected\n"
    )
    got = tops(rows, "test")
    assert len(got) == 1 and got[0]["name"] == "test_add"
    assert got[0]["status"] == "active"


def test_pytest_class_skip_inherited():
    rows = parse_pytest_tests(
        "\nimport pytest\n\n"
        '@pytest.mark.skip(reason="class skipped")\n'
        "class TestSkipped:\n"
        "    def test_one(self):\n        pass\n\n"
        "    def test_two(self):\n        pass\n"
    )
    suites = tops(rows, "suite")
    assert len(suites) == 1 and suites[0]["status"] == "skipped"
    got = children(rows, ["TestSkipped"])
    assert [r["status"] for r in got] == ["skipped", "skipped"]


def test_pytest_mixed():
    rows = parse_pytest_tests(
        "\ndef test_standalone():\n    pass\n\n"
        "class TestGroup:\n    def test_in_class(self):\n        pass\n\n"
        "def test_another():\n    pass\n"
    )
    assert [r["name"] for r in tops(rows, "test")] == ["test_standalone", "test_another"]
    assert [r["name"] for r in tops(rows, "suite")] == ["TestGroup"]


def test_pytest_skipif_maps_to_skip():
    # faithful to the reference's substring matching: skipif contains skip
    rows = parse_pytest_tests(
        "import pytest\n\n"
        "@pytest.mark.skipif(True, reason='cond')\n"
        "def test_cond():\n    pass\n"
    )
    got = tops(rows, "test")
    assert got[0]["status"] == "skipped"
    assert got[0]["modifier"] == "@pytest.mark.skip"


def test_pytest_class_without_tests_dropped():
    rows = parse_pytest_tests("class TestEmpty:\n    def helper(self):\n        pass\n")
    assert rows == []


def test_pytest_syntax_error_returns_empty():
    assert parse_pytest_tests("def test_broken(:\n") == []


def test_pytest_lines():
    rows = parse_pytest_tests("def test_a():\n    pass\n\ndef test_b():\n    pass\n")
    assert [r["line"] for r in tops(rows, "test")] == [1, 4]


# -- unittest ----------------------------------------------------------------

def test_unittest_basic_testcase():
    rows = parse_unittest_tests(
        "\nimport unittest\n\n"
        "class TestCalculator(unittest.TestCase):\n"
        "    def test_add(self):\n        self.assertEqual(1 + 1, 2)\n\n"
        "    def test_subtract(self):\n        self.assertEqual(5 - 3, 2)\n\n"
        "    def helper_method(self):\n        return 42\n"
    )
    suites = tops(rows, "suite")
    assert len(suites) == 1 and suites[0]["name"] == "TestCalculator"
    assert [r["name"] for r in children(rows, ["TestCalculator"])] == [
        "test_add", "test_subtract",
    ]


def test_unittest_skip_decorator():
    rows = parse_unittest_tests(
        "\nimport unittest\n\n"
        "class TestWithSkip(unittest.TestCase):\n"
        '    @unittest.skip("not implemented")\n'
        "    def test_skipped(self):\n        pass\n\n"
        "    def test_normal(self):\n        pass\n"
    )
    got = children(rows, ["TestWithSkip"])
    assert [(r["name"], r["status"]) for r in got] == [
        ("test_skipped", "skipped"),
        ("test_normal", "active"),
    ]
    assert got[0]["modifier"] == "@unittest.skip"


def test_unittest_skipif():
    rows = parse_unittest_tests(
        "\nimport unittest\n\n"
        "class TestConditionalSkip(unittest.TestCase):\n"
        '    @unittest.skipIf(True, "condition met")\n'
        "    def test_conditional_skip(self):\n        pass\n"
    )
    got = children(rows, ["TestConditionalSkip"])
    assert got[0]["status"] == "skipped"
    assert got[0]["modifier"] == "@unittest.skipIf"


def test_unittest_expected_failure():
    rows = parse_unittest_tests(
        "\nimport unittest\n\n"
        "class TestExpectedFailure(unittest.TestCase):\n"
        "    @unittest.expectedFailure\n"
        "    def test_xfail(self):\n        self.assertEqual(1, 2)\n"
    )
    got = children(rows, ["TestExpectedFailure"])
    assert got[0]["status"] == "xfail"
    assert got[0]["modifier"] == "@unittest.expectedFailure"


def test_unittest_class_skip_inherited():
    rows = parse_unittest_tests(
        "\nimport unittest\n\n"
        '@unittest.skip("entire class skipped")\n'
        "class TestSkippedClass(unittest.TestCase):\n"
        "    def test_one(self):\n        pass\n\n"
        "    def test_two(self):\n        pass\n"
    )
    suites = tops(rows, "suite")
    assert suites[0]["status"] == "skipped"
    assert [r["status"] for r in children(rows, ["TestSkippedClass"])] == [
        "skipped", "skipped",
    ]


def test_unittest_multiple_classes():
    rows = parse_unittest_tests(
        "\nimport unittest\n\n"
        "class TestAddition(unittest.TestCase):\n"
        "    def test_add(self):\n        self.assertEqual(1 + 1, 2)\n\n"
        "class TestMultiplication(unittest.TestCase):\n"
        "    def test_multiply(self):\n        self.assertEqual(2 * 3, 6)\n"
    )
    assert [r["name"] for r in tops(rows, "suite")] == [
        "TestAddition", "TestMultiplication",
    ]


def test_unittest_test_suffix_class():
    rows = parse_unittest_tests(
        "\nimport unittest\n\n"
        "class CalculatorTest(unittest.TestCase):\n"
        "    def test_add(self):\n        pass\n"
    )
    assert [r["name"] for r in tops(rows, "suite")] == ["CalculatorTest"]


def test_unittest_method_decorator_overrides_class():
    rows = parse_unittest_tests(
        "\nimport unittest\n\n"
        '@unittest.skip("class skipped")\n'
        "class TestMixed(unittest.TestCase):\n"
        "    @unittest.expectedFailure\n"
        "    def test_method_override(self):\n        self.assertEqual(1, 2)\n\n"
        "    def test_inherited(self):\n        pass\n"
    )
    got = children(rows, ["TestMixed"])
    assert [(r["name"], r["status"]) for r in got] == [
        ("test_method_override", "xfail"),
        ("test_inherited", "skipped"),
    ]


def test_unittest_non_test_class_ignored():
    rows = parse_unittest_tests(
        "\nimport unittest\n\n"
        "class Helper:\n    def do_something(self):\n        pass\n\n"
        "class TestReal(unittest.TestCase):\n"
        "    def test_real(self):\n        pass\n"
    )
    assert [r["name"] for r in tops(rows, "suite")] == ["TestReal"]
