"""P15 goldens — ported from the reference's cargotest fixtures
(pkg/parser/strategies/cargotest/definition_test.go)."""

from __future__ import annotations

from core_spark.functions.rusttest import parse_rust_tests, tokenize_rust


def tops(rows, kind):
    return [r for r in rows if r["kind"] == kind and not r["suite_path"]]


def children(rows, path):
    return [r for r in rows if r["kind"] == "test" and r["suite_path"] == list(path)]


def test_basic_test():
    rows = parse_rust_tests("\n#[test]\nfn test_basic() {\n    assert!(true);\n}\n")
    got = tops(rows, "test")
    assert len(got) == 1
    assert got[0]["name"] == "test_basic" and got[0]["status"] == "active"


def test_ignore_attribute():
    rows = parse_rust_tests(
        "\n#[test]\n#[ignore]\nfn test_ignored() {\n    assert!(true);\n}\n"
    )
    got = tops(rows, "test")[0]
    assert got["status"] == "skipped" and got["modifier"] == "#[ignore]"


def test_should_panic_preserved():
    rows = parse_rust_tests(
        "\n#[test]\n#[should_panic]\nfn test_panics() {\n    panic!(\"expected panic\");\n}\n"
    )
    got = tops(rows, "test")[0]
    assert got["name"] == "test_panics"
    assert got["status"] == "active"
    assert got["modifier"] == "#[should_panic]"


def test_should_panic_expected_message():
    rows = parse_rust_tests(
        "\n#[test]\n#[should_panic(expected = \"division by zero\")]\n"
        "fn test_panic_message() {\n    let _ = 1 / 0;\n}\n"
    )
    got = tops(rows, "test")[0]
    assert got["modifier"] == '#[should_panic(expected = "division by zero")]'


def test_ignore_and_should_panic_combined():
    rows = parse_rust_tests(
        "\n#[test]\n#[ignore]\n#[should_panic]\n"
        "fn test_ignored_panic() {\n    panic!(\"ignored\");\n}\n"
    )
    got = tops(rows, "test")[0]
    assert got["status"] == "skipped"
    assert got["modifier"] == "#[ignore] #[should_panic]"


def test_multiple_tests_in_order():
    rows = parse_rust_tests(
        "\n#[test]\nfn test_one() {\n    assert!(true);\n}\n\n"
        "#[test]\nfn test_two() {\n    assert_eq!(2, 2);\n}\n\n"
        "#[test]\nfn test_three() {\n    assert_ne!(1, 2);\n}\n"
    )
    assert [r["name"] for r in tops(rows, "test")] == [
        "test_one", "test_two", "test_three",
    ]


def test_cfg_test_module():
    rows = parse_rust_tests(
        "\nfn helper() -> i32 {\n    42\n}\n\n"
        "#[cfg(test)]\nmod tests {\n    use super::*;\n\n"
        "    #[test]\n    fn test_helper() {\n        assert_eq!(helper(), 42);\n    }\n\n"
        "    #[test]\n    fn test_another() {\n        assert!(true);\n    }\n}\n"
    )
    suites = tops(rows, "suite")
    assert [s["name"] for s in suites] == ["tests"]
    assert [t["name"] for t in children(rows, ["tests"])] == [
        "test_helper", "test_another",
    ]
    assert not tops(rows, "test")


def test_tests_module_by_convention():
    rows = parse_rust_tests(
        "\nmod tests {\n    #[test]\n    fn test_in_tests_module() {\n"
        "        assert!(true);\n    }\n}\n"
    )
    assert [s["name"] for s in tops(rows, "suite")] == ["tests"]
    assert [t["name"] for t in children(rows, ["tests"])] == ["test_in_tests_module"]


def test_nested_modules_flatten():
    rows = parse_rust_tests(
        "\n#[cfg(test)]\nmod tests {\n    mod unit {\n"
        "        #[test]\n        fn test_nested() {\n            assert!(true);\n        }\n"
        "    }\n\n    #[test]\n    fn test_outer() {\n        assert!(true);\n    }\n}\n"
    )
    suites = tops(rows, "suite")
    assert [s["name"] for s in suites] == ["tests"]
    # nested non-test module's test flattens into the nearest test module
    assert sorted(t["name"] for t in children(rows, ["tests"])) == [
        "test_nested", "test_outer",
    ]


def test_non_test_functions_ignored():
    rows = parse_rust_tests(
        "\nfn helper_function() {\n    println!(\"not a test\");\n}\n\n"
        "#[test]\nfn actual_test() {\n    assert!(true);\n}\n\n"
        "fn another_helper() -> bool {\n    true\n}\n"
    )
    assert [r["name"] for r in tops(rows, "test")] == ["actual_test"]


def test_location_accuracy():
    rows = parse_rust_tests(
        "fn helper() {}\n\n#[test]\nfn test_basic() {\n    assert_eq!(1, 1);\n}\n"
    )
    # line of the fn keyword (GetLocation of the function node -> line 4)
    assert tops(rows, "test")[0]["line"] == 4


def test_external_macro_with_test_in_name():
    rows = parse_rust_tests(
        '\nrgtest!(basic_rgtest, |dir, cmd| {\n    dir.create("test.txt", "hello");\n'
        '    cmd.arg("--help");\n});\n\n'
        "rgtest!(another_test, |dir, cmd| {\n    assert!(true);\n});\n"
    )
    got = tops(rows, "test")
    assert [r["name"] for r in got] == ["basic_rgtest", "another_test"]
    assert got[0]["modifier"] == "rgtest!"


def test_macro_mixed_with_attribute_tests():
    rows = parse_rust_tests(
        "\n#[test]\nfn regular_test() {\n    assert!(true);\n}\n\n"
        'rgtest!(macro_test, |dir, cmd| {\n    cmd.arg("--version");\n});\n\n'
        "#[test]\nfn another_regular() {\n    assert_eq!(1, 1);\n}\n"
    )
    assert [r["name"] for r in tops(rows, "test")] == [
        "regular_test", "macro_test", "another_regular",
    ]


def test_same_file_macro_rules_registry():
    rows = parse_rust_tests(
        "\nmacro_rules! syntax {\n"
        "    ($name:ident, $pat:expr, $tokens:expr) => {\n"
        "        #[test]\n        fn $name() {\n"
        "            let pat = Glob::new($pat).unwrap();\n"
        "            assert_eq!($tokens, pat.tokens.0);\n        }\n    };\n}\n\n"
        'syntax!(literal1, "a", vec![Literal(\'a\')]);\n'
        'syntax!(literal2, "ab", vec![Literal(\'a\'), Literal(\'b\')]);\n'
    )
    got = tops(rows, "test")
    assert [r["name"] for r in got] == ["literal1", "literal2"]
    assert got[0]["modifier"] == "syntax!"


def test_macro_without_test_attribute_not_detected():
    rows = parse_rust_tests(
        "\nmacro_rules! helper {\n    ($name:ident) => {\n"
        "        fn $name() {\n            println!(\"helper function\");\n        }\n"
        "    };\n}\n\nhelper!(my_helper);\n"
    )
    assert rows == []


def test_lifetimes_do_not_break_tokenizer():
    toks = tokenize_rust("fn f<'a>(x: &'a str) -> &'a str { x }")
    assert any(t.kind == "life" for t in toks)
    rows = parse_rust_tests(
        "fn f<'a>(x: &'a str) -> &'a str { x }\n\n"
        "#[test]\nfn test_after_lifetimes() {\n    assert!(true);\n}\n"
    )
    assert [r["name"] for r in tops(rows, "test")] == ["test_after_lifetimes"]


def test_raw_strings_and_char_literals():
    rows = parse_rust_tests(
        '#[test]\nfn test_raw() {\n    let s = r#"quote " inside"#;\n'
        "    let c = 'x';\n    assert!(true);\n}\n"
    )
    assert [r["name"] for r in tops(rows, "test")] == ["test_raw"]
