"""Never-throw fuzz property for every extraction kernel.

At 10^12 documents the inventory stage's error-as-data contract only
holds if the PURE kernels cannot raise on garbage (truncated files, wrong
language routed to a kernel, binary junk decoded as text). The Arrow
stage wraps kernels in try/except as a last resort, but a kernel that
throws on common junk floods the err column — so: arbitrary text in,
rows out, no exception, always."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from core_spark.functions.domain_hints import extract_hints
from core_spark.functions.dotnettest import parse_csharp_tests
from core_spark.functions.gotest import parse_go_tests
from core_spark.functions.gtest import parse_gtest
from core_spark.functions.javatest import parse_java_tests
from core_spark.functions.jstest import parse_js_tests, tokenize, unquote_string
from core_spark.functions.kotlintest import parse_kotlin_tests
from core_spark.functions.phptest import parse_phpunit_tests
from core_spark.functions.pytest_ext import parse_pytest_tests, parse_unittest_tests
from core_spark.functions.rubytest import parse_ruby_tests
from core_spark.functions.rusttest import parse_rust_tests
from core_spark.functions.swifttest import parse_swift_tests

KERNELS = [
    parse_js_tests,
    parse_go_tests,
    parse_pytest_tests,
    parse_unittest_tests,
    parse_java_tests,
    parse_kotlin_tests,
    parse_csharp_tests,
    parse_ruby_tests,
    parse_phpunit_tests,
    parse_rust_tests,
    parse_gtest,
    parse_swift_tests,
]

# junk skewed toward syntax-looking fragments: quotes, braces, backslashes,
# keywords, unicode
_fragments = st.sampled_from(
    list("{}()[]\"'`\\/#@$.,;:!?*-=<> \n\t")
    + ["describe", "it", "test", "fn", "def", "class", "func", "end",
       "do", "TEST", "@Test", "#[test]", "macro_rules", "é", "\U0001f600"]
)
_syntaxy = st.lists(_fragments, max_size=80).map("".join)
_any_text = st.text(max_size=300)


@pytest.mark.parametrize("kernel", KERNELS, ids=lambda k: k.__name__)
@settings(max_examples=60, deadline=None)
@given(src=st.one_of(_any_text, _syntaxy))
def test_kernel_never_throws(kernel, src):
    rows = kernel(src)
    assert isinstance(rows, list)
    for r in rows:
        assert r["kind"] in ("suite", "test")
        assert isinstance(r["name"], str)
        assert isinstance(r["suite_path"], list)


@settings(max_examples=80, deadline=None)
@given(src=st.one_of(_any_text, _syntaxy))
def test_tokenizer_and_helpers_never_throw(src):
    tokenize(src)
    unquote_string(src)


@settings(max_examples=60, deadline=None)
@given(
    src=st.one_of(_any_text, _syntaxy),
    ext=st.sampled_from([".ts", ".py", ".go", ".java", ".rs", ".rb",
                         ".cc", ".cs", ".kt", ".php", ".swift"]),
)
def test_hints_never_throw(src, ext):
    h = extract_hints("f" + ext, src)
    assert h is None or set(h) == {"imports", "calls"}


@settings(max_examples=60, deadline=None)
@given(src=st.one_of(_any_text, _syntaxy))
def test_span_invariants_never_violated(src):
    """Every kernel row's span obeys the Location contract whenever it is
    populated: 1-based lines, 0-based cols, end >= start."""
    for kernel in KERNELS:
        for r in kernel(src):
            if r.get("line") is None:
                continue
            assert r["line"] >= 1
            if r.get("end_line") is not None:
                assert r["end_line"] >= r["line"]
                assert r.get("start_col", 0) >= 0
                assert r.get("end_col", 0) >= 0
                if r["end_line"] == r["line"] and r.get("start_col") is not None:
                    assert r["end_col"] >= r["start_col"]
