"""Location-parity goldens (VERDICT #6): spans for the JS/Go/Python
kernels match the reference's Location convention (location.go:4-15 via
treesitter.go:114-125): 1-based lines, 0-based cols, end col exclusive."""

from core_spark.functions.gotest import parse_go_tests
from core_spark.functions.jstest import parse_js_tests
from core_spark.functions.pytest_ext import parse_pytest_tests


def _by_name(rows):
    return {r["name"]: r for r in rows}


def test_js_spans():
    src = (
        "describe('outer', () => {\n"          # line 1
        "  it('a', () => {\n"                  # line 2
        "    expect(1).toBe(1);\n"             # line 3
        "  });\n"                              # line 4
        "});\n"                                # line 5
    )
    rows = _by_name(parse_js_tests(src))
    outer = rows["outer"]
    # whole call expression: col 0 line 1 .. the ')' on line 5 (before ';')
    assert (outer["line"], outer["start_col"]) == (1, 0)
    assert (outer["end_line"], outer["end_col"]) == (5, 2)
    a = rows["a"]
    assert (a["line"], a["start_col"]) == (2, 2)
    assert (a["end_line"], a["end_col"]) == (4, 4)


def test_py_spans():
    src = (
        "import pytest\n"                       # 1
        "\n"                                    # 2
        "def test_a():\n"                       # 3
        "    assert True\n"                     # 4
        "\n"                                    # 5
        "class TestB:\n"                        # 6
        "    def test_m(self):\n"               # 7
        "        assert 1\n"                    # 8
    )
    rows = _by_name(parse_pytest_tests(src))
    a = rows["test_a"]
    assert (a["line"], a["start_col"], a["end_line"], a["end_col"]) == (3, 0, 4, 15)
    b = rows["TestB"]
    assert (b["line"], b["start_col"]) == (6, 0)
    assert b["end_line"] == 8
    m = rows["test_m"]
    assert (m["line"], m["start_col"], m["end_line"], m["end_col"]) == (7, 4, 8, 16)


def test_go_spans():
    src = (
        'package p\n'                                     # 1
        '\n'                                              # 2
        'import "testing"\n'                              # 3
        '\n'                                              # 4
        'func TestA(t *testing.T) {\n'                    # 5
        '\tt.Run("sub", func(t *testing.T) {\n'           # 6
        '\t\t_ = 1\n'                                     # 7
        '\t})\n'                                          # 8
        '}\n'                                             # 9
    )
    rows = _by_name(parse_go_tests(src))
    fn = rows["TestA"]
    assert (fn["line"], fn["start_col"]) == (5, 0)
    assert (fn["end_line"], fn["end_col"]) == (9, 1)
    sub = rows["sub"]
    # t.Run(...) call: from the receiver 't' through its closing ')'
    assert (sub["line"], sub["start_col"]) == (6, 1)
    assert (sub["end_line"], sub["end_col"]) == (8, 3)
