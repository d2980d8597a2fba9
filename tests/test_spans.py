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


# -- round-3 extension: spans for the remaining kernels ----------------------

def test_gtest_spans():
    from core_spark.functions.gtest import parse_gtest

    rows = _by_name(parse_gtest(
        "TEST(Geo, Near) {\n  EXPECT_EQ(1, 1);\n}\n"
    ))
    near = rows["Near"]
    assert (near["line"], near["start_col"]) == (1, 0)
    assert (near["end_line"], near["end_col"]) == (3, 1)
    # synthesized suite shares the first TEST's span
    assert rows["Geo"]["line"] == 1 and rows["Geo"]["end_line"] == 3


def test_java_spans():
    from core_spark.functions.javatest import parse_java_tests

    src = (
        "import org.junit.jupiter.api.Test;\n"   # 1
        "\n"                                      # 2
        "class CalcTest {\n"                      # 3
        "    @Test\n"                             # 4
        "    void adds() {\n"                     # 5
        "    }\n"                                 # 6
        "}\n"                                     # 7
    )
    rows = _by_name(parse_java_tests(src))
    c = rows["CalcTest"]
    assert (c["line"], c["start_col"], c["end_line"], c["end_col"]) == (3, 0, 7, 1)
    a = rows["adds"]
    # method_declaration includes the annotation (modifiers child)
    assert (a["line"], a["start_col"], a["end_line"], a["end_col"]) == (4, 4, 6, 5)


def test_kotlin_kotest_spans():
    from core_spark.functions.kotlintest import parse_kotest_tests

    src = (
        "import io.kotest.core.spec.style.FunSpec\n"  # 1
        "class PaySpec : FunSpec({\n"                 # 2
        '    test("charges") {\n'                     # 3
        "    }\n"                                     # 4
        "})\n"                                        # 5
    )
    rows = _by_name(parse_kotest_tests(src))
    t = rows["charges"]
    assert (t["line"], t["start_col"], t["end_line"], t["end_col"]) == (3, 4, 4, 5)
    s = rows["PaySpec"]
    assert s["line"] == 2 and s["end_line"] >= 4


def test_csharp_spans():
    from core_spark.functions.dotnettest import parse_csharp_tests

    src = (
        "using Xunit;\n"                      # 1
        "public class CartTests {\n"          # 2
        "    [Fact]\n"                        # 3
        "    public void Adds() {\n"          # 4
        "    }\n"                             # 5
        "}\n"                                 # 6
    )
    rows = _by_name(parse_csharp_tests(src))
    a = rows["Adds"]
    # attribute list + modifiers open the method_declaration span
    assert (a["line"], a["start_col"], a["end_line"], a["end_col"]) == (3, 4, 5, 5)
    c = rows["CartTests"]
    assert (c["line"], c["end_line"]) == (2, 6)


def test_swift_spans():
    from core_spark.functions.swifttest import parse_swift_tests

    src = (
        "import XCTest\n"                       # 1
        "class WalletTests: XCTestCase {\n"     # 2
        "    func testFunds() {\n"              # 3
        "    }\n"                               # 4
        "}\n"                                   # 5
    )
    rows = _by_name(parse_swift_tests(src))
    f = rows["testFunds"]
    assert (f["line"], f["start_col"], f["end_line"], f["end_col"]) == (3, 4, 4, 5)
    assert rows["WalletTests"]["end_line"] == 5


def test_rust_spans():
    from core_spark.functions.rusttest import parse_rust_tests

    src = (
        "#[cfg(test)]\n"            # 1
        "mod tests {\n"             # 2
        "    #[test]\n"             # 3
        "    fn test_in() {\n"      # 4
        "    }\n"                   # 5
        "}\n"                       # 6
    )
    rows = _by_name(parse_rust_tests(src))
    t = rows["test_in"]
    # rust attributes are SIBLING nodes — fn span starts at `fn`
    assert (t["line"], t["start_col"], t["end_line"], t["end_col"]) == (4, 4, 5, 5)
    m = rows["tests"]
    assert (m["line"], m["end_line"], m["end_col"]) == (2, 6, 1)


def test_ruby_spans():
    from core_spark.functions.rubytest import parse_rspec_tests

    src = (
        "RSpec.describe 'Cart' do\n"   # 1
        "  it 'adds' do\n"             # 2
        "  end\n"                      # 3
        "end\n"                        # 4
    )
    rows = _by_name(parse_rspec_tests(src))
    s = rows["Cart"]
    # span starts at the RSpec receiver, ends at the matching `end`
    assert (s["line"], s["start_col"], s["end_line"], s["end_col"]) == (1, 0, 4, 3)
    t = rows["adds"]
    assert (t["line"], t["start_col"], t["end_line"], t["end_col"]) == (2, 2, 3, 5)


def test_php_spans():
    from core_spark.functions.phptest import parse_phpunit_tests

    src = (
        "<?php\n"                                       # 1
        "class InvoiceTest extends TestCase\n"          # 2
        "{\n"                                           # 3
        "    public function testIssues(): void {\n"    # 4
        "    }\n"                                       # 5
        "}\n"                                           # 6
    )
    rows = _by_name(parse_phpunit_tests(src))
    t = rows["testIssues"]
    # modifiers open the method span (inside the reference's decl node)
    assert (t["line"], t["start_col"], t["end_line"], t["end_col"]) == (4, 4, 5, 5)
    c = rows["InvoiceTest"]
    assert (c["line"], c["end_line"], c["end_col"]) == (2, 6, 1)
