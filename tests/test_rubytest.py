"""P13 goldens — ported from the reference's rspec fixtures
(pkg/parser/strategies/rspec/definition_test.go)."""

from __future__ import annotations

from core_spark.functions.rubytest import parse_rspec_tests


def suites(rows, path=()):
    return [r for r in rows if r["kind"] == "suite" and r["suite_path"] == list(path)]


def _tests(rows, path):
    return [r for r in rows if r["kind"] == "test" and r["suite_path"] == list(path)]


def test_basic_describe_and_it():
    rows = parse_rspec_tests(
        '\nRSpec.describe User do\n  it "creates a user" do\n'
        "    expect(User.new).to be_valid\n  end\nend\n"
    )
    assert [s["name"] for s in suites(rows)] == ["User"]
    assert [t["name"] for t in _tests(rows, ["User"])] == ["creates a user"]


def test_nested_describe_and_context():
    rows = parse_rspec_tests(
        '\nRSpec.describe Calculator do\n  describe "#add" do\n'
        '    context "with positive numbers" do\n'
        '      it "returns the sum" do\n'
        "        expect(Calculator.add(1, 2)).to eq(3)\n      end\n    end\n  end\nend\n"
    )
    assert [s["name"] for s in suites(rows)] == ["Calculator"]
    assert [s["name"] for s in suites(rows, ["Calculator"])] == ["#add"]
    assert [s["name"] for s in suites(rows, ["Calculator", "#add"])] == [
        "with positive numbers",
    ]
    assert [t["name"] for t in _tests(
        rows, ["Calculator", "#add", "with positive numbers"]
    )] == ["returns the sum"]


def test_xit_skipped():
    rows = parse_rspec_tests(
        '\nRSpec.describe User do\n  xit "is skipped" do\n'
        "    expect(true).to be true\n  end\n\n"
        '  it "runs normally" do\n    expect(true).to be true\n  end\nend\n'
    )
    got = _tests(rows, ["User"])
    assert [(t["name"], t["status"], t["modifier"]) for t in got] == [
        ("is skipped", "skipped", "xit"),
        ("runs normally", "active", ""),
    ]


def test_xdescribe_skipped_suite():
    rows = parse_rspec_tests(
        '\nxdescribe "skipped suite" do\n  it "is in skipped suite" do\n'
        "    expect(true).to be true\n  end\nend\n"
    )
    s = suites(rows)[0]
    assert s["name"] == "skipped suite" and s["status"] == "skipped"


def test_specify_and_example():
    rows = parse_rspec_tests(
        '\nRSpec.describe User do\n  specify "user is valid" do\n'
        "    expect(User.new).to be_valid\n  end\n\n"
        '  example "another test" do\n    expect(true).to be true\n  end\nend\n'
    )
    assert [t["name"] for t in _tests(rows, ["User"])] == [
        "user is valid", "another test",
    ]


def test_double_quoted_suite_name():
    rows = parse_rspec_tests(
        '\nRSpec.describe "String Utils" do\n  it "handles strings" do\n'
        '    expect("hello").to eq("hello")\n  end\nend\n'
    )
    assert suites(rows)[0]["name"] == "String Utils"


def test_loop_blocks_descend():
    rows = parse_rspec_tests(
        '\nRSpec.describe "Group" do\n  3.times do |i|\n'
        '    it "test #{i}" do\n    end\n  end\nend\n'
    )
    got = _tests(rows, ["Group"])
    assert len(got) == 1 and got[0]["name"] == "test #{i}"

    rows = parse_rspec_tests(
        '\nRSpec.describe "Array tests" do\n  [1, 2, 3].each do |n|\n'
        '    it "handles #{n}" do\n      expect(n).to be > 0\n    end\n  end\nend\n'
    )
    assert len(_tests(rows, ["Array tests"])) == 1


def test_loop_in_nested_describe():
    rows = parse_rspec_tests(
        '\nRSpec.describe "Outer" do\n  describe "Inner" do\n'
        "    2.times do |i|\n"
        '      it "nested test #{i}" do\n      end\n    end\n  end\nend\n'
    )
    assert [s["name"] for s in suites(rows)] == ["Outer"]
    assert [s["name"] for s in suites(rows, ["Outer"])] == ["Inner"]
    assert len(_tests(rows, ["Outer", "Inner"])) == 1


def test_multiple_tests_in_loop():
    rows = parse_rspec_tests(
        '\nRSpec.describe "Multiple" do\n  2.times do |i|\n'
        '    it "passes #{i}" do\n    end\n    it "fails #{i}" do\n    end\n  end\nend\n'
    )
    assert len(_tests(rows, ["Multiple"])) == 2


def test_pending_and_skip():
    rows = parse_rspec_tests(
        '\nRSpec.describe "P" do\n  skip "not ready" do\n'
        '    it "inside skip" do\n    end\n  end\n\n'
        '  pending "waiting on fix"\nend\n'
    )
    skip_suites = suites(rows, ["P"])
    assert [s["name"] for s in skip_suites] == ["not ready"]
    assert skip_suites[0]["status"] == "skipped"
    assert [t["name"] for t in _tests(rows, ["P", "not ready"])] == ["inside skip"]
    pend = _tests(rows, ["P"])
    assert [(t["name"], t["status"]) for t in pend] == [("waiting on fix", "skipped")]


def test_anonymous_it():
    rows = parse_rspec_tests("describe \"S\" do\n  it { is_expected.to be_valid }\nend\n")
    got = _tests(rows, ["S"])
    assert len(got) == 1 and got[0]["name"] == "(anonymous)"


def test_scope_resolution_name():
    rows = parse_rspec_tests("describe MyApp::Utils do\n  it \"works\" do\n  end\nend\n")
    assert suites(rows)[0]["name"] == "MyApp::Utils"


# -- Minitest (minitest/definition.go:159-290) -------------------------------

def test_minitest_class_methods():
    from core_spark.functions.rubytest import parse_minitest_tests

    rows = parse_minitest_tests(
        "require 'minitest/autorun'\n\n"
        "class UserTest < Minitest::Test\n"
        "  def test_valid\n    assert true\n  end\n\n"
        "  def test_skipped\n    skip 'not ready'\n    assert false\n  end\n\n"
        "  def helper\n  end\nend\n"
    )
    assert [s["name"] for s in suites(rows)] == ["UserTest"]
    got = _tests(rows, ["UserTest"])
    assert [(t["name"], t["status"]) for t in got] == [
        ("test_valid", "active"), ("test_skipped", "skipped"),
    ]


def test_minitest_superclass_filter():
    from core_spark.functions.rubytest import parse_minitest_tests

    rows = parse_minitest_tests(
        "class Helper < Struct\n  def test_like\n  end\nend\n\n"
        "class RealTest < ActiveSupport::Test\n  def test_real\n  end\nend\n"
    )
    # Struct superclass doesn't qualify -> method floats to top level;
    # *Test suffix superclass qualifies
    assert [s["name"] for s in suites(rows)] == ["RealTest"]
    assert [t["name"] for t in _tests(rows, ["RealTest"])] == ["test_real"]


def test_minitest_spec_dsl():
    from core_spark.functions.rubytest import parse_minitest_tests

    rows = parse_minitest_tests(
        "describe 'Array' do\n"
        "  it 'starts empty' do\n    _([]).must_be_empty\n  end\nend\n"
    )
    assert [s["name"] for s in suites(rows)] == ["Array"]
    assert [t["name"] for t in _tests(rows, ["Array"])] == ["starts empty"]


def test_ruby_dispatch():
    from core_spark.functions.rubytest import parse_ruby_tests

    mt = parse_ruby_tests(
        "class T < Minitest::Test\n  def test_a\n  end\nend\n"
    )
    assert [t["name"] for t in _tests(mt, ["T"])] == ["test_a"]
    rs = parse_ruby_tests("RSpec.describe 'S' do\n  it 'works' do\n  end\nend\n")
    assert [t["name"] for t in _tests(rs, ["S"])] == ["works"]
