"""P8/P9 — Python test-inventory extraction kernels (pure, Spark-free).

Reimplements the reference's pytest and unittest strategies
(reference: pkg/parser/strategies/pytest/definition.go:139-315,
unittest/definition.go:103-268) over Python's own stdlib ``ast`` parser —
the one language where a from-scratch grammar would be silly, since the
canonical parser ships with the runtime and is fully deterministic.

Semantics contract (reference citations per rule):

  pytest (definition.go):
    * module-level ``test_*`` functions -> tests (isTestFunction :308-311)
    * module-level ``Test*`` classes -> suites; methods named ``test_*``
      become the suite's tests; classes with no matching methods are
      dropped (parseTestClassWithStatus :225-283)
    * decorator text containing ``pytest.mark.skip`` -> skipped with
      modifier "@pytest.mark.skip" (NOTE: ``skipif`` contains ``skip`` so
      it maps the same way — faithful to the substring matching at
      :293-305); ``pytest.mark.xfail`` -> xfail
    * methods with active status inherit the class status/modifier
      (:252-257)

  unittest (definition.go):
    * only classes: superclasses text containing ``TestCase`` OR name
      starting/ending with ``Test`` (:162-166, 245-252)
    * methods with ``test`` prefix (:228-231 — NOT ``test_``)
    * decorators: ``unittest.skipUnless``/``skipIf``/``skip`` -> skipped,
      ``unittest.expectedFailure`` -> xfail (:254-268; longest-substring
      first so skipIf isn't reported as plain skip)
    * suites with zero tests are dropped (:206-208)

Output is the same flattened row model as jstest.parse_js_tests.
"""

from __future__ import annotations

import ast

STATUS_ACTIVE = "active"
STATUS_SKIPPED = "skipped"
STATUS_XFAIL = "xfail"

_FUNC_NODES = (ast.FunctionDef, ast.AsyncFunctionDef)


def _decorator_text(dec: ast.expr, source: str) -> str:
    seg = ast.get_source_segment(source, dec)
    if seg is not None:
        return seg
    try:
        return ast.unparse(dec)
    except Exception:
        return ""


def _pytest_decorator_status(decorators, source) -> tuple[str, str]:
    """definition.go:293-305 — substring matching, skip checked first."""
    for dec in decorators:
        text = _decorator_text(dec, source)
        if "pytest.mark.skip" in text:
            return STATUS_SKIPPED, "@pytest.mark.skip"
        if "pytest.mark.xfail" in text:
            return STATUS_XFAIL, "@pytest.mark.xfail"
    return STATUS_ACTIVE, ""


def _unittest_decorator_status(decorators, source) -> tuple[str, str]:
    """unittest/definition.go:254-268 — most-specific substring first."""
    for dec in decorators:
        text = _decorator_text(dec, source)
        if "unittest.skipUnless" in text:
            return STATUS_SKIPPED, "@unittest.skipUnless"
        if "unittest.skipIf" in text:
            return STATUS_SKIPPED, "@unittest.skipIf"
        if "unittest.skip" in text:
            return STATUS_SKIPPED, "@unittest.skip"
        if "unittest.expectedFailure" in text:
            return STATUS_XFAIL, "@unittest.expectedFailure"
    return STATUS_ACTIVE, ""


def _row(kind, path, name, status, modifier, node):
    # Location parity with the reference (domain/location.go:4-15 via
    # treesitter.go:114-125): 1-based lines, 0-based cols, end exclusive.
    # Python's ast gives the function/class node span directly (decorators
    # excluded — matching the reference, which passes the definition node,
    # not the decorated_definition wrapper).
    return {
        "kind": kind,
        "suite_path": list(path),
        "name": name,
        "status": status,
        "modifier": modifier,
        "line": node.lineno,
        "start_col": node.col_offset,
        "end_line": node.end_lineno,
        "end_col": node.end_col_offset,
    }


def _class_tests(node: ast.ClassDef, source, name_pred, status_fn,
                 class_status, class_modifier, path):
    rows = []
    for child in node.body:
        if not isinstance(child, _FUNC_NODES):
            continue
        if not name_pred(child.name):
            continue
        status, modifier = status_fn(child.decorator_list, source)
        if status == STATUS_ACTIVE and class_status != STATUS_ACTIVE:
            status, modifier = class_status, class_modifier
        rows.append(_row("test", path, child.name, status, modifier, child))
    return rows


def parse_pytest_tests(source: str) -> list[dict]:
    """pytest inventory: flattened rows, parents before children.
    Unparseable source -> [] (error-as-data: callers record the error
    column, the stage never throws — SURVEY §4 last row)."""
    try:
        tree = ast.parse(source)
    except (SyntaxError, ValueError):
        return []
    rows: list[dict] = []
    for node in tree.body:
        if isinstance(node, _FUNC_NODES):
            if node.name.startswith("test_"):
                status, modifier = _pytest_decorator_status(node.decorator_list, source)
                rows.append(_row("test", (), node.name, status, modifier, node))
        elif isinstance(node, ast.ClassDef):
            if not node.name.startswith("Test"):
                continue
            cstatus, cmod = _pytest_decorator_status(node.decorator_list, source)
            tests = _class_tests(
                node, source, lambda n: n.startswith("test_"),
                _pytest_decorator_status, cstatus, cmod, (node.name,),
            )
            if not tests:
                continue
            rows.append(_row("suite", (), node.name, cstatus, cmod, node))
            rows.extend(tests)
    return rows


def _is_testcase_class(node: ast.ClassDef, source: str) -> bool:
    """unittest/definition.go:245-252: superclasses TEXT contains TestCase."""
    for base in node.bases:
        if "TestCase" in _decorator_text(base, source):
            return True
    return False


def parse_unittest_tests(source: str) -> list[dict]:
    """unittest inventory: classes only (no module-level tests)."""
    try:
        tree = ast.parse(source)
    except (SyntaxError, ValueError):
        return []
    rows: list[dict] = []
    for node in tree.body:
        if not isinstance(node, ast.ClassDef):
            continue
        if not _is_testcase_class(node, source):
            if not (node.name.startswith("Test") or node.name.endswith("Test")):
                continue
        cstatus, cmod = _unittest_decorator_status(node.decorator_list, source)
        tests = _class_tests(
            node, source, lambda n: n.startswith("test"),
            _unittest_decorator_status, cstatus, cmod, (node.name,),
        )
        if not tests:
            continue
        rows.append(_row("suite", (), node.name, cstatus, cmod, node))
        rows.extend(tests)
    return rows
