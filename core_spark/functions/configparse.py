"""P20 — framework config-file parsing (pure Python, Spark-free).

Reimplements the reference's regex-based config parsers that produce the
ConfigScope table consumed by the D5 resolver (operators/detect.py
resolve_scopes):

  * Jest: rootDir / roots (<rootDir> placeholder + configDir resolution) /
    testMatch -> include / testPathIgnorePatterns + modulePathIgnorePatterns
    -> exclude / injectGlobals:false (reference:
    pkg/parser/strategies/jest/definition.go:86-213)
  * Vitest: root / globals (comment-stripped match) / include + exclude
    with the coverage block removed first (vitest/definition.go:42-109);
    the reference strips comments with tree-sitter — here the jstest
    tokenizer provides the same comment/string-aware stripping
  * Playwright: testDirRoot var > testDir string > path.join form;
    projects array via bracket matching, per-project {name, testDir}
    blocks (playwright/definition.go:51-161); GlobalsMode always False

Scope model (framework/scope.go:12-30) as a plain dict:
  {cfg_path, framework, base_dir, roots, include, exclude, globals_mode,
   projects: [{name, base_dir}]}
with base_dir = clean(join(dir(cfg_path), root)) per NewConfigScope
(scope.go:214-229).

``contains``/``scope_depth`` port the containment + doublestar matching of
scope.go:72-152, and ``scopes_to_rows`` flattens scopes into the
(cfg_path, base_dir, framework) table resolve_scopes broadcasts — one row
per effective root (scope.go:126-138).
"""

from __future__ import annotations

import posixpath
import re

# -- doublestar glob (scope.go uses github.com/bmatcuk/doublestar) ----------


def _glob_to_regex(pattern: str) -> str:
    out = []
    i = 0
    n = len(pattern)
    while i < n:
        c = pattern[i]
        if c == "*":
            if pattern.startswith("**/", i):
                out.append("(?:[^/]+/)*")
                i += 3
            elif pattern.startswith("**", i) and i + 2 == n:
                out.append(".*")
                i += 2
            elif pattern.startswith("**", i):
                out.append(".*")
                i += 2
            else:
                out.append("[^/]*")
                i += 1
        elif c == "?":
            out.append("[^/]")
            i += 1
        elif c == "{":
            j = pattern.find("}", i)
            if j < 0:
                out.append(re.escape(c))
                i += 1
            else:
                alts = pattern[i + 1:j].split(",")
                out.append("(?:" + "|".join(re.escape(a) for a in alts) + ")")
                i = j + 1
        elif c == "[":
            j = pattern.find("]", i + 1)
            if j < 0:
                out.append(re.escape(c))
                i += 1
            else:
                out.append(pattern[i:j + 1])
                i = j + 1
        else:
            out.append(re.escape(c))
            i += 1
    return "".join(out) + r"\Z"


def glob_match(pattern: str, path: str) -> bool:
    try:
        return re.match(_glob_to_regex(pattern), path) is not None
    except re.error:
        return False


# -- comment stripping (vitest globals check) -------------------------------


def strip_js_comments(content: str) -> str:
    """Remove // and /* */ comments, preserving strings/templates — the
    jstest tokenizer already knows the difference, so re-render everything
    that is not a comment (the reference does this with a tree-sitter walk,
    extraction/javascript.go:37-85)."""
    from core_spark.functions.jstest import tokenize

    return " ".join(t.text for t in tokenize(content))


# -- scope construction -----------------------------------------------------


def _go_join(a: str, b: str) -> str:
    """Go's filepath.Join: concatenate-then-clean — an absolute second arg
    does NOT discard the first (unlike posixpath.join)."""
    if not a:
        return posixpath.normpath(b) if b else ""
    if not b:
        return posixpath.normpath(a)
    return posixpath.normpath(a + "/" + b)


def _new_scope(cfg_path: str, root: str, framework: str) -> dict:
    config_dir = posixpath.dirname(cfg_path)
    if root:
        base_dir = _go_join(config_dir, root)
    else:
        base_dir = config_dir
    return {
        "cfg_path": cfg_path,
        "framework": framework,
        "base_dir": base_dir,
        "roots": [],
        "include": [],
        "exclude": [],
        "test_patterns": [],
        "exclude_patterns": [],
        "globals_mode": False,
        "projects": [],
    }


_JEST_ROOTDIR = re.compile(r"rootDir\s*:\s*['\"]([^'\"]+)['\"]")
_JEST_ROOTS = re.compile(r"roots\s*:\s*\[([^\]]+)\]")
_STR_ITEM = re.compile(r"['\"]([^'\"]+)['\"]")
_JEST_INJECT_FALSE = re.compile(r"injectGlobals\s*:\s*false")
_JEST_TESTMATCH = re.compile(r"testMatch\s*:\s*\[([^\]]+)\]")
_JEST_TESTPATH_IGNORE = re.compile(r"testPathIgnorePatterns\s*:\s*\[([^\]]+)\]")
_JEST_MODULEPATH_IGNORE = re.compile(r"modulePathIgnorePatterns\s*:\s*\[([^\]]+)\]")


def parse_jest_config(cfg_path: str, content: str) -> dict:
    m = _JEST_ROOTDIR.search(content)
    root_dir = m.group(1) if m else ""
    scope = _new_scope(cfg_path, root_dir, "jest")
    scope["globals_mode"] = not _JEST_INJECT_FALSE.search(content)

    config_dir = posixpath.dirname(cfg_path)
    m = _JEST_ROOTS.search(content)
    if m:
        resolved_root_dir = config_dir
        if root_dir:
            resolved_root_dir = _go_join(config_dir, root_dir)
        roots = []
        for item in _STR_ITEM.findall(m.group(1)):
            had_placeholder = "<rootDir>" in item
            root = item.replace("<rootDir>", resolved_root_dir)
            if not root.startswith("/") and not had_placeholder:
                root = _go_join(config_dir, root)
            roots.append(posixpath.normpath(root))
        scope["roots"] = roots

    m = _JEST_TESTMATCH.search(content)
    if m:
        scope["include"] = _STR_ITEM.findall(m.group(1))
    exclude = []
    m = _JEST_TESTPATH_IGNORE.search(content)
    if m:
        exclude += _STR_ITEM.findall(m.group(1))
    m = _JEST_MODULEPATH_IGNORE.search(content)
    if m:
        exclude += _STR_ITEM.findall(m.group(1))
    scope["exclude"] = exclude
    return scope


_VITEST_ROOT = re.compile(r"root\s*:\s*['\"]([^'\"]+)['\"]")
_VITEST_GLOBALS = re.compile(r"globals\s*:\s*true")
_VITEST_COVERAGE = re.compile(
    r"coverage\s*:\s*\{[^}]*(?:\{[^}]*\}[^}]*)*\}", re.S
)
_VITEST_INCLUDE = re.compile(r"(?:^|[,\s])include\s*:\s*\[([^\]]+)\]")
_VITEST_EXCLUDE = re.compile(r"(?:^|[,\s])exclude\s*:\s*\[([^\]]+)\]")


def parse_vitest_config(cfg_path: str, content: str) -> dict:
    m = _VITEST_ROOT.search(content)
    scope = _new_scope(cfg_path, m.group(1) if m else "", "vitest")
    # comment-aware: `// globals: true` must NOT enable globals mode
    scope["globals_mode"] = bool(_VITEST_GLOBALS.search(strip_js_comments(content)))
    cleaned = _VITEST_COVERAGE.sub("", content)
    m = _VITEST_INCLUDE.search(cleaned)
    if m:
        scope["include"] = _STR_ITEM.findall(m.group(1))
    m = _VITEST_EXCLUDE.search(cleaned)
    if m:
        scope["exclude"] = _STR_ITEM.findall(m.group(1))
    return scope


_PW_TESTDIR_ROOT_VAR = re.compile(
    r"(?:const|let|var|export\s+const)\s+testDirRoot\s*=\s*['\"]([^'\"]+)['\"]"
)
_PW_TESTDIR_STR = re.compile(r"testDir\s*[=:]\s*['\"]([^'\"]+)['\"]")
_PW_TESTDIR_JOIN = re.compile(
    r"(?:const\s+)?testDir\s*[=:]\s*path\.join\s*\(\s*__dirname\s*,\s*['\"]([^'\"]+)['\"]\s*\)"
)
_PW_PROJECTS = re.compile(r"projects\s*:\s*\[")
_PW_PROJECT_BLOCK = re.compile(r"\{\s*(?:[^{}]*(?:\{[^{}]*\})?)*\s*\}")
_PW_NAME = re.compile(r"name\s*:\s*['\"]([^'\"]+)['\"]")
_PW_PROJ_TESTDIR = re.compile(r"testDir\s*:\s*['\"]([^'\"]+)['\"]")
_PW_PROJ_TESTDIR_JOIN = re.compile(
    r"testDir\s*:\s*path\.join\s*\([^)]+,\s*['\"]([^'\"]+)['\"]\s*\)"
)


def parse_playwright_config(cfg_path: str, content: str) -> dict:
    test_dir = ""
    for pat in (_PW_TESTDIR_ROOT_VAR, _PW_TESTDIR_STR, _PW_TESTDIR_JOIN):
        m = pat.search(content)
        if m:
            test_dir = m.group(1)
            break
    scope = _new_scope(cfg_path, test_dir, "playwright")
    scope["globals_mode"] = False  # Playwright always requires imports

    config_dir = posixpath.dirname(cfg_path)
    loc = _PW_PROJECTS.search(content)
    if loc:
        start = loc.end()
        depth = 1
        end = start
        for i in range(start, len(content)):
            if content[i] == "[":
                depth += 1
            elif content[i] == "]":
                depth -= 1
            end = i
            if depth == 0:
                break
        if depth == 0:
            projects = []
            for block in _PW_PROJECT_BLOCK.findall(content[start:end]):
                name_m = _PW_NAME.search(block)
                dir_m = _PW_PROJ_TESTDIR.search(block) or _PW_PROJ_TESTDIR_JOIN.search(block)
                if dir_m and dir_m.group(1):
                    projects.append(
                        {
                            "name": name_m.group(1) if name_m else "",
                            "base_dir": _go_join(config_dir, dir_m.group(1)),
                        }
                    )
            scope["projects"] = projects
    return scope


_MOCHA_SPEC_SINGLE = re.compile(r"[\"']?spec[\"']?\s*:\s*['\"]([^'\"]+)['\"]")
_MOCHA_SPEC_ARRAY = re.compile(r"[\"']?spec[\"']?\s*:\s*\[([^\]]+)\]")


def parse_mocha_config(cfg_path: str, content: str) -> dict:
    """Mocha (.mocharc.*): root is the config dir, globals on, spec ->
    test_patterns (mocha/definition.go:87-114)."""
    scope = _new_scope(cfg_path, "", "mocha")
    scope["globals_mode"] = True
    m = _MOCHA_SPEC_SINGLE.search(content)
    if m:
        scope["test_patterns"] = [m.group(1)]
    else:
        m = _MOCHA_SPEC_ARRAY.search(content)
        scope["test_patterns"] = _STR_ITEM.findall(m.group(1)) if m else []
    return scope


def _cy_pattern(content: str, single: re.Pattern, array: re.Pattern) -> list[str]:
    m = single.search(content)
    if m:
        return [m.group(1)]
    m = array.search(content)
    return _STR_ITEM.findall(m.group(1)) if m else []


_CY_E2E_SINGLE = re.compile(r"e2e\s*:\s*\{[\s\S]*?specPattern\s*:\s*['\"]([^'\"]+)['\"]", re.S)
_CY_E2E_ARRAY = re.compile(r"e2e\s*:\s*\{[\s\S]*?specPattern\s*:\s*\[([^\]]+)\]", re.S)
_CY_COMP_SINGLE = re.compile(r"component\s*:\s*\{[\s\S]*?specPattern\s*:\s*['\"]([^'\"]+)['\"]", re.S)
_CY_COMP_ARRAY = re.compile(r"component\s*:\s*\{[\s\S]*?specPattern\s*:\s*\[([^\]]+)\]", re.S)
_CY_EXCL_SINGLE = re.compile(r"excludeSpecPattern\s*:\s*['\"]([^'\"]+)['\"]")
_CY_EXCL_ARRAY = re.compile(r"excludeSpecPattern\s*:\s*\[([^\]]+)\]")


def parse_cypress_config(cfg_path: str, content: str) -> dict:
    """Cypress: e2e/component specPattern -> test_patterns,
    excludeSpecPattern -> exclude_patterns; globals on
    (cypress/definition.go:98-145)."""
    scope = _new_scope(cfg_path, "", "cypress")
    scope["globals_mode"] = True  # cy/Cypress injected
    scope["test_patterns"] = (
        _cy_pattern(content, _CY_E2E_SINGLE, _CY_E2E_ARRAY)
        + _cy_pattern(content, _CY_COMP_SINGLE, _CY_COMP_ARRAY)
    )
    scope["exclude_patterns"] = _cy_pattern(content, _CY_EXCL_SINGLE, _CY_EXCL_ARRAY)
    return scope


_PYTEST_SECTION = re.compile(r"\[tool\.pytest")
_PYTEST_TESTPATHS_TOML = re.compile(r"^\s*testpaths\s*=\s*\[([^\]]*)\]", re.M)
_PYTEST_TESTPATHS_INI = re.compile(r"^\s*testpaths\s*=\s*(.+)$", re.M)
_PYTEST_PYFILES_TOML = re.compile(r"^\s*python_files\s*=\s*\[([^\]]*)\]", re.M)
_PYTEST_PYFILES_INI = re.compile(r"^\s*python_files\s*=\s*(.+)$", re.M)


def parse_pytest_config(cfg_path: str, content: str) -> dict | None:
    """pytest (strategies/pytest/definition.go:44-50): the reference's
    ConfigParser is scope-only — NewConfigScope(configPath, "") rooted at
    the config dir with empty Settings. pytest.ini / conftest.py count by
    filename (definition.go:29-32); pyproject.toml counts ONLY when it has
    a [tool.pytest*] section (PytestConfigContentMatcher,
    definition.go:52-76). testpaths / python_files are additionally parsed
    (ini space-separated or TOML array forms) into metadata keys that do
    NOT affect containment — the reference scopes the whole config dir."""
    base = posixpath.basename(cfg_path)
    if base == "pyproject.toml" and not _PYTEST_SECTION.search(content):
        return None
    scope = _new_scope(cfg_path, "", "pytest")
    # NewConfigScope leaves GlobalsMode at its zero value (scope.go:214-229)
    m = _PYTEST_TESTPATHS_TOML.search(content)
    if m:
        scope["test_patterns"] = _STR_ITEM.findall(m.group(1))
    else:
        m = _PYTEST_TESTPATHS_INI.search(content)
        # [] fallback keeps the scope shape consistent (mirror python_files)
        scope["test_patterns"] = m.group(1).split() if m else []
    m = _PYTEST_PYFILES_TOML.search(content)
    if m:
        scope["python_files"] = _STR_ITEM.findall(m.group(1))
    else:
        m = _PYTEST_PYFILES_INI.search(content)
        scope["python_files"] = m.group(1).split() if m else []
    return scope


# -- config-file dispatch (scanner.go:275-309 filename patterns subset) -----

_CONFIG_DISPATCH = [
    (re.compile(r"(^|/)jest\.config\.(js|ts|mjs|cjs|json)$"), parse_jest_config),
    (re.compile(r"(^|/)vitest\.config\.(js|ts|mjs|cts|mts)$"), parse_vitest_config),
    (re.compile(r"(^|/)vite\.config\.(js|ts|mjs)$"), parse_vitest_config),
    (re.compile(r"(^|/)playwright\.config\.(js|ts|mjs)$"), parse_playwright_config),
    (re.compile(r"(^|/)\.mocharc\.(js|cjs|json|yml|yaml)$"), parse_mocha_config),
    (re.compile(r"(^|/)cypress\.config\.(js|ts|mjs)$"), parse_cypress_config),
    # discovery names scanner.go:291-293 (+ conftest.py, definition.go:31)
    (re.compile(r"(^|/)pytest\.ini$"), parse_pytest_config),
    (re.compile(r"(^|/)pyproject\.toml$"), parse_pytest_config),
    (re.compile(r"(^|/)conftest\.py$"), parse_pytest_config),
]


def parse_config(cfg_path: str, content: str) -> dict | None:
    """Dispatch on the config filename; None for unrecognized files."""
    for pat, fn in _CONFIG_DISPATCH:
        if pat.search(cfg_path):
            return fn(cfg_path, content)
    return None


#: The reference's config-DISCOVERY name list (scanner.go:275-308) — a
#: superset of what any ConfigParser can parse: .rspec / spec_helper.rb /
#: rails_helper.rb / phpunit.xml* / mocha.opts are discovered but have
#: nil ConfigParsers in the reference too (scanner.go:374-376 parity,
#: verified), so scanning them yields a config-parse ERROR row, never a
#: scope.
CONFIG_DISCOVERY_NAMES = frozenset({
    "jest.config.js", "jest.config.ts", "jest.config.mjs",
    "jest.config.cjs", "jest.config.json",
    "vitest.config.js", "vitest.config.ts", "vitest.config.mjs",
    "vitest.config.cjs",
    "playwright.config.js", "playwright.config.ts",
    "cypress.config.cjs", "cypress.config.js", "cypress.config.mjs",
    "cypress.config.mts", "cypress.config.ts",
    "pytest.ini", "pyproject.toml", "conftest.py",
    ".rspec", "spec_helper.rb", "rails_helper.rb",
    "phpunit.xml", "phpunit.xml.dist", "phpunit.dist.xml",
    ".mocharc.cjs", ".mocharc.js", ".mocharc.json", ".mocharc.jsonc",
    ".mocharc.mjs", ".mocharc.yaml", ".mocharc.yml", "mocha.opts",
})

_CONFIG_PARSE_ERR = "no matching framework config parser"


def scan_configs(
    configs: list[tuple[str, str]],
) -> tuple[list[dict], list[dict]]:
    """(scopes, errors) over discovered config files — error-as-data
    parity with scanner.go:374-416: a discovered config file that no
    parser claims (no dispatch pattern, or the parser declines — e.g.
    pyproject.toml without a [tool.pytest section, whose content matcher
    NoMatches in the reference as well) yields a
    ``{path, phase: "config-parse", error}`` row instead of being
    silently dropped. ``resolve_scopes`` consumes only the scopes."""
    scopes: list[dict] = []
    errors: list[dict] = []
    for path, content in configs:
        scope = parse_config(path, content)
        if scope is None:
            errors.append({
                "path": path,
                "phase": "config-parse",
                "error": _CONFIG_PARSE_ERR,
            })
        else:
            scopes.append(scope)
    return scopes, errors


# -- containment (scope.go:72-152) ------------------------------------------


def effective_roots(scope: dict) -> list[str]:
    if scope["roots"]:
        return list(scope["roots"])
    roots = [scope["base_dir"]]
    for p in scope["projects"]:
        if p["base_dir"]:
            roots.append(p["base_dir"])
    return roots


def contains(scope: dict, file_path: str) -> bool:
    file_path = posixpath.normpath(file_path)
    for r in effective_roots(scope):
        root = posixpath.normpath(r)
        rel = posixpath.relpath(file_path, root)
        if rel.startswith(".."):
            continue
        if scope["include"]:
            if not any(glob_match(p, rel) for p in scope["include"]):
                continue
        if any(glob_match(p, rel) for p in scope["exclude"]):
            continue
        return True
    return False


def scope_depth(scope: dict) -> int:
    base = posixpath.normpath(scope["base_dir"])
    if base in (".", "/", ""):
        return 0
    return base.count("/")


def scopes_to_rows(scopes: list[dict]) -> list[tuple[str, str, str]]:
    """Flatten scopes into (cfg_path, base_dir, framework) rows for
    resolve_scopes — one row per effective root, so a file inside any
    Jest root / Playwright project dir joins to the scope."""
    rows = []
    for s in scopes:
        for root in effective_roots(s):
            rows.append((s["cfg_path"], root, s["framework"]))
    return rows
