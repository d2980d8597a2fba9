"""P15 — Rust cargo-test inventory extraction (pure Python, Spark-free).

Reimplements the reference's cargotest strategy
(pkg/parser/strategies/cargotest/definition.go:110-544) with a dedicated
Rust tokenizer (nested block comments, raw strings, char-vs-lifetime
disambiguation, byte offsets for exact attribute text):

  * two-pass: macro_rules! definitions whose expansion contains ``#[test]``
    register as local test macros (:219-280); invocation names are then
    counted as tests (modifier "name!"), with a contains-"test" name
    heuristic for external macros (:534-544)
  * #[test] fns -> tests; #[ignore] -> skipped with modifier "#[ignore]";
    #[should_panic...] preserves the EXACT attribute source text in the
    modifier, appended after ignore (:369-394)
  * ``#[cfg(test)] mod`` or ``mod tests`` -> suite; tests inside nested
    NON-test modules flatten into the nearest test-module ancestor
    (:460-478, 329-338); suites with no tests are dropped
  * fn and macro bodies are never scanned for further items (the
    reference returns false from WalkTree there), so a ``fn $name`` with
    ``#[test]`` inside a macro definition is not itself a test
"""

from __future__ import annotations

from dataclasses import dataclass

STATUS_ACTIVE = "active"
STATUS_SKIPPED = "skipped"


@dataclass
class RTok:
    kind: str  # 'id' | 'str' | 'punct' | 'num' | 'life'
    text: str
    line: int
    start: int
    end: int


_ID_START = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_")
_ID_CONT = _ID_START | set("0123456789")


def _span_loc(source: str, toks, si: int, ei: int) -> dict:
    """Location fields from token byte offsets (the reference's
    treesitter.go:114-125 convention: 1-based lines, 0-based cols, end
    exclusive). Rust attributes are SIBLING nodes of function_item in the
    reference's tree, so fn spans start at `fn`, not at `#[...]`."""
    st = toks[si]
    et = toks[min(ei, len(toks) - 1)]
    return {
        "line": st.line,
        "start_col": st.start - (source.rfind("\n", 0, st.start) + 1),
        "end_line": et.line + source.count("\n", et.start, et.end),
        "end_col": et.end - (source.rfind("\n", 0, et.end) + 1),
    }


def tokenize_rust(src: str) -> list[RTok]:
    toks: list[RTok] = []
    i = 0
    n = len(src)
    line = 1
    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            i += 1
            continue
        if c in " \t\r":
            i += 1
            continue
        if c == "/" and src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if c == "/" and src.startswith("/*", i):
            depth = 1
            j = i + 2
            while j < n and depth:
                if src.startswith("/*", j):
                    depth += 1
                    j += 2
                elif src.startswith("*/", j):
                    depth -= 1
                    j += 2
                else:
                    j += 1
            line += src.count("\n", i, j)
            i = j
            continue
        if c == "r" and i + 1 < n and src[i + 1] in "\"#":
            # raw string r"..." / r#"..."#
            j = i + 1
            hashes = 0
            while j < n and src[j] == "#":
                hashes += 1
                j += 1
            if j < n and src[j] == '"':
                closer = '"' + "#" * hashes
                k = src.find(closer, j + 1)
                k = n if k < 0 else k + len(closer)
                toks.append(RTok("str", src[i:k], line, i, k))
                line += src.count("\n", i, k)
                i = k
                continue
        if c == '"':
            j = i + 1
            while j < n:
                if src[j] == "\\":
                    j += 2
                    continue
                if src[j] == '"':
                    j += 1
                    break
                j += 1
            toks.append(RTok("str", src[i:j], line, i, j))
            line += src.count("\n", i, j)
            i = j
            continue
        if c == "'":
            # char literal ('a', '\n', '\u{1F600}') vs lifetime ('a)
            j = i + 1
            if j < n and src[j] == "\\":
                k = j + 1
                while k < n and src[k] != "'":
                    k += 1
                toks.append(RTok("str", src[i:k + 1], line, i, k + 1))
                i = k + 1
                continue
            if j + 1 < n and src[j + 1] == "'":
                toks.append(RTok("str", src[i:j + 2], line, i, j + 2))
                i = j + 2
                continue
            toks.append(RTok("life", "'", line, i, i + 1))
            i += 1
            continue
        if c in _ID_START:
            j = i + 1
            while j < n and src[j] in _ID_CONT:
                j += 1
            toks.append(RTok("id", src[i:j], line, i, j))
            i = j
            continue
        if c.isdigit():
            j = i + 1
            while j < n and (src[j] in _ID_CONT or src[j] == "."):
                j += 1
            toks.append(RTok("num", src[i:j], line, i, j))
            i = j
            continue
        toks.append(RTok("punct", c, line, i, i + 1))
        i += 1
    return toks


_OPEN = {"(": ")", "[": "]", "{": "}"}
_CLOSE = {")", "]", "}"}


def _match(toks: list[RTok], i: int) -> int:
    depth = 0
    for j in range(i, len(toks)):
        t = toks[j]
        if t.kind != "punct":
            continue
        if t.text in _OPEN:
            depth += 1
        elif t.text in _CLOSE:
            depth -= 1
            if depth == 0:
                return j
    return len(toks)


def _collect_test_macros(toks: list[RTok]) -> set[str]:
    """Pass 1 (definition.go:219-244): macro_rules! names whose body
    contains a ``#[...test...]`` attribute pattern."""
    out = set()
    i = 0
    n = len(toks)
    while i < n:
        if (
            toks[i].kind == "id"
            and toks[i].text == "macro_rules"
            and i + 2 < n
            and toks[i + 1].text == "!"
            and toks[i + 2].kind == "id"
        ):
            name = toks[i + 2].text
            j = i + 3
            if j < n and toks[j].kind == "punct" and toks[j].text in _OPEN:
                close = _match(toks, j)
                for k in range(j + 1, close):
                    if (
                        toks[k].kind == "punct"
                        and toks[k].text == "#"
                        and k + 1 < close
                        and toks[k + 1].text == "["
                    ):
                        bend = _match(toks, k + 1)
                        if any(
                            toks[m].kind == "id" and toks[m].text == "test"
                            for m in range(k + 2, min(bend, close))
                        ):
                            out.add(name)
                            break
                i = close + 1
                continue
        i += 1
    return out


def parse_rust_tests(source: str) -> list[dict]:
    """Flattened inventory rows (same model as jstest.parse_js_tests)."""
    toks = tokenize_rust(source)
    n = len(toks)
    registry = _collect_test_macros(toks)

    suites: list[dict] = []  # in first-seen order
    top_tests: list[dict] = []
    mod_stack: list[dict | None] = []  # suite dict for test modules else None

    def current_suite():
        for entry in reversed(mod_stack):
            if entry is not None:
                return entry
        return None

    def add_test(row):
        s = current_suite()
        if s is not None:
            s["tests"].append(row)
        else:
            top_tests.append(row)

    pending_attrs: list[tuple[str, str]] = []  # (name, exact_text)
    mod_ends: list[int] = []
    i = 0
    while i < n:
        # close modules whose brace range ended
        while mod_ends and i >= mod_ends[-1]:
            mod_ends.pop()
            mod_stack.pop()
        t = toks[i]
        if t.kind == "punct" and t.text == "#" and i + 1 < n and toks[i + 1].text == "[":
            bend = _match(toks, i + 1)
            name = ""
            for m in range(i + 2, bend):
                if toks[m].kind == "id":
                    name = toks[m].text
                    break
            text = source[t.start:toks[bend].end] if bend < n else source[t.start:]
            pending_attrs.append((name, text))
            i = bend + 1
            continue
        if t.kind == "id" and t.text == "macro_rules" and i + 2 < n and toks[i + 1].text == "!":
            j = i + 3
            if j < n and toks[j].kind == "punct" and toks[j].text in _OPEN:
                i = _match(toks, j) + 1
            else:
                i = j
            pending_attrs = []
            continue
        if t.kind == "id" and t.text == "mod":
            j = i + 1
            name = toks[j].text if j < n and toks[j].kind == "id" else ""
            is_test_mod = name == "tests" or any(
                a[0] == "cfg" and "cfg(test)" in a[1] for a in pending_attrs
            )
            pending_attrs = []
            j += 1
            if j < n and toks[j].kind == "punct" and toks[j].text == "{":
                close = _match(toks, j)
                entry = None
                if is_test_mod and name:
                    entry = {
                        "name": name,
                        "loc": _span_loc(source, toks, i, min(close, n - 1)),
                        "tests": [],
                    }
                    suites.append(entry)
                mod_stack.append(entry)
                mod_ends.append(close)
                i = j + 1
                continue
            i = j
            continue
        if t.kind == "id" and t.text == "fn":
            attrs = pending_attrs
            pending_attrs = []
            j = i + 1
            name = toks[j].text if j < n and toks[j].kind == "id" else ""
            is_test = any(a[0] == "test" for a in attrs)
            # skip to body and past it (fn bodies are never scanned)
            while j < n and not (toks[j].kind == "punct" and toks[j].text in ("(", "{")):
                j += 1
            if j < n and toks[j].text == "(":
                j = _match(toks, j) + 1
            while j < n and not (toks[j].kind == "punct" and toks[j].text == "{"):
                if toks[j].kind == "punct" and toks[j].text == ";":
                    break  # bodyless declaration
                j += 1
            if j < n and toks[j].kind == "punct" and toks[j].text == "{":
                j = _match(toks, j) + 1
            if is_test and name:
                status, modifier = STATUS_ACTIVE, ""
                if any(a[0] == "ignore" for a in attrs):
                    status, modifier = STATUS_SKIPPED, "#[ignore]"
                for a in attrs:
                    if a[0] == "should_panic":
                        modifier = (modifier + " " + a[1]).strip() if modifier else a[1]
                add_test(
                    {"name": name, "status": status, "modifier": modifier,
                     "loc": _span_loc(source, toks, i, max(j - 1, i))}
                )
            i = j
            continue
        if (
            t.kind == "id"
            and i + 1 < n
            and toks[i + 1].kind == "punct"
            and toks[i + 1].text == "!"
            and i + 2 < n
            and toks[i + 2].kind == "punct"
            and toks[i + 2].text in _OPEN
        ):
            macro = t.text
            close = _match(toks, i + 2)
            if macro in registry or "test" in macro.lower():
                tname = ""
                for m in range(i + 3, close):
                    if toks[m].kind == "id":
                        tname = toks[m].text
                        break
                if tname:
                    add_test(
                        {
                            "name": tname,
                            "status": STATUS_ACTIVE,
                            "modifier": macro + "!",
                            "loc": _span_loc(source, toks, i, min(close, n - 1)),
                        }
                    )
            pending_attrs = []
            i = close + 1
            continue
        if t.kind not in ("life",):
            pending_attrs = []
        i += 1

    rows: list[dict] = []
    for t_ in top_tests:
        rows.append(
            {
                "kind": "test",
                "suite_path": [],
                "name": t_["name"],
                "status": t_["status"],
                "modifier": t_["modifier"],
                **t_["loc"],
            }
        )
    for s in suites:
        if not s["tests"]:
            continue
        rows.append(
            {
                "kind": "suite",
                "suite_path": [],
                "name": s["name"],
                "status": STATUS_ACTIVE,
                "modifier": "",
                **s["loc"],
            }
        )
        for t_ in s["tests"]:
            rows.append(
                {
                    "kind": "test",
                    "suite_path": [s["name"]],
                    "name": t_["name"],
                    "status": t_["status"],
                    "modifier": t_["modifier"],
                    **t_["loc"],
                }
            )
    return rows
