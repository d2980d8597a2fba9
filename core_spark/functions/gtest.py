"""P16 — C++ GoogleTest inventory extraction (pure Python, Spark-free).

Reimplements the reference's gtest strategy
(pkg/parser/strategies/gtest/definition.go:108-280) over the shared
tokenizer (C/C++ comment and string syntax matches; char literals scan as
short strings):

  * macros TEST / TEST_F / TEST_P / TYPED_TEST / TYPED_TEST_P with
    (SuiteName, TestName) identifier args (definition.go:34-37, 201-240)
  * DISABLED_ prefix -> skipped; test-level prefix takes precedence over
    suite-level, suite prefix applies to all its tests (:262-280)
  * tests grouped per suite; suite location = first macro occurrence;
    suites emitted sorted by name for determinism (:186-196)
  * tolerant scan — the reference 'works inside tree-sitter ERROR nodes';
    the token walk has no parse errors to begin with
"""

from __future__ import annotations

from core_spark.functions.jstest import _match_bracket, tok_span_location, tokenize

GTEST_MACROS = {"TEST", "TEST_F", "TEST_P", "TYPED_TEST", "TYPED_TEST_P"}
_DISABLED = "DISABLED_"

STATUS_ACTIVE = "active"
STATUS_SKIPPED = "skipped"


def _disabled_status(name: str) -> tuple[str, str]:
    if name.startswith(_DISABLED):
        return STATUS_SKIPPED, _DISABLED
    return STATUS_ACTIVE, ""


def parse_gtest(source: str) -> list[dict]:
    """Flattened inventory rows (same model as jstest.parse_js_tests):
    suite rows sorted by name, each followed by its tests in source order."""
    toks = tokenize(source)
    n = len(toks)
    suites: dict[str, dict] = {}
    order: list[str] = []
    i = 0
    while i < n:
        t = toks[i]
        if (
            t.kind == "id"
            and t.text in GTEST_MACROS
            and i + 5 < n
            and toks[i + 1].kind == "punct" and toks[i + 1].text == "("
            and toks[i + 2].kind == "id"
            and toks[i + 3].kind == "punct" and toks[i + 3].text == ","
            and toks[i + 4].kind == "id"
            and toks[i + 5].kind == "punct" and toks[i + 5].text == ")"
        ):
            suite_name = toks[i + 2].text
            test_name = toks[i + 4].text
            status, modifier = _disabled_status(test_name)
            if status == STATUS_ACTIVE:
                status, modifier = _disabled_status(suite_name)
            # span: macro token through the body's closing brace (the whole
            # function_definition node in the reference's tree)
            end = i + 5
            if i + 6 < n and toks[i + 6].kind == "punct" and toks[i + 6].text == "{":
                end = min(_match_bracket(toks, i + 6), n - 1)
            loc = tok_span_location(toks, i, end)
            if suite_name not in suites:
                s_status, s_modifier = _disabled_status(suite_name)
                suites[suite_name] = {
                    "loc": loc,
                    "status": s_status,
                    "modifier": s_modifier,
                    "tests": [],
                }
                order.append(suite_name)
            suites[suite_name]["tests"].append(
                {
                    "name": test_name,
                    "status": status,
                    "modifier": modifier,
                    "loc": loc,
                }
            )
            i += 6
            continue
        i += 1

    rows: list[dict] = []
    for name in sorted(suites):
        s = suites[name]
        rows.append(
            {
                "kind": "suite",
                "suite_path": [],
                "name": name,
                "status": s["status"],
                "modifier": s["modifier"],
                **s["loc"],
            }
        )
        for tt in s["tests"]:
            rows.append(
                {
                    "kind": "test",
                    "suite_path": [name],
                    "name": tt["name"],
                    "status": tt["status"],
                    "modifier": tt["modifier"],
                    **tt["loc"],
                }
            )
    return rows
