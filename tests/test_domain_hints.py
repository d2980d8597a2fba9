"""P19 goldens — ported from the reference's domain_hints fixtures
(pkg/parser/domain_hints/{javascript,python,go}_test.go)."""

from __future__ import annotations

from core_spark.functions.domain_hints import (
    extract_go_hints,
    extract_hints,
    extract_js_hints,
    extract_py_hints,
    is_noise,
    normalize_call,
)


def test_normalize_call():
    assert normalize_call("a.b.c.d") == "a.b"
    assert normalize_call("doSomething") == "doSomething"
    assert normalize_call("obj .\n  method") == "obj.method"


def test_noise_filter():
    assert is_noise("")
    assert is_noise("[.")
    assert is_noise("?")
    assert not is_noise("x")
    assert not is_noise("a.b")


# -- javascript_test.go ------------------------------------------------------

def test_js_es6_imports_and_type_exclusion():
    hints = extract_js_hints(
        "\nimport { test, expect } from '@playwright/test';\n"
        "import axios from 'axios';\n"
        "import * as lodash from 'lodash';\n"
        "import '@testing-library/jest-dom';\n"
        "import type { User } from './types';\n\n"
        "test('should work', async () => {\n"
        "  const mockUser = { name: 'test' };\n"
        "  authService.validateToken();\n});\n"
    )
    got = set(hints["imports"])
    assert {"@playwright/test", "axios", "lodash", "@testing-library/jest-dom"} <= got
    assert "./types" not in got  # type-only excluded


def test_js_commonjs_require():
    hints = extract_js_hints(
        "\nconst lodash = require('lodash');\n"
        "const { get } = require('axios');\n"
        "const path = require('path');\n\n"
        "test('should work', async () => {\n  const mockData = getData();\n});\n"
    )
    assert {"lodash", "axios", "path"} <= set(hints["imports"])


def test_js_calls_with_framework_blacklist():
    hints = extract_js_hints(
        "\nimport { test, expect } from '@playwright/test';\n\n"
        "test('should work', async () => {\n"
        "  authService.validateToken('token');\n"
        "  userRepo.findById(1);\n"
        "  const result = orderService.create(order);\n"
        "  doSomething();\n});\n"
    )
    got = set(hints["calls"])
    assert {"authService.validateToken", "userRepo.findById",
            "orderService.create", "doSomething"} <= got
    # framework calls excluded
    assert not any(c.split(".")[0] in ("test", "expect", "describe") for c in got)


def test_js_empty_returns_none():
    assert extract_js_hints("const x = 1;") is None


# -- python_test.go ----------------------------------------------------------

def test_py_imports():
    hints = extract_py_hints(
        "import os\nimport requests.sessions\n"
        "from myapp.services import auth\nfrom . import sibling\n"
    )
    assert hints["imports"] == ["os", "requests.sessions", "myapp.services", "."]


def test_py_calls_with_blacklist():
    hints = extract_py_hints(
        "import pytest\n\n"
        "def test_order():\n"
        "    order_service.create(order)\n"
        "    repo.find_by_id(1)\n"
        "    do_something()\n"
        "    pytest.raises(ValueError)\n"
        "    self.assertEqual(1, 1)\n"
    )
    got = set(hints["calls"])
    assert {"order_service.create", "repo.find_by_id", "do_something"} <= got
    assert not any(c.startswith(("pytest", "self")) for c in got)


def test_py_two_segment_normalization():
    hints = extract_py_hints("def f():\n    a.b.c.d(1)\n")
    assert hints["calls"] == ["a.b"]


def test_py_syntax_error_returns_none():
    assert extract_py_hints("def broken(:\n") is None


# -- go_test.go --------------------------------------------------------------

def test_go_imports():
    hints = extract_go_hints(
        "package order\n\n"
        "import (\n"
        '\t"testing"\n'
        '\t"github.com/stretchr/testify/assert"\n'
        '\t"myapp/repository"\n'
        '\t"myapp/services/inventory"\n'
        ")\n\n"
        "func TestCreateOrder(t *testing.T) {\n"
        "\tmockCart := Cart{Items: []Item{{ID: 1, Qty: 2}}}\n\n"
        '\tt.Run("should create order from cart", func(t *testing.T) {\n'
        "\t\tresult, err := orderService.CreateFromCart(mockCart)\n"
        "\t\tassert.NoError(t, err)\n"
        '\t\tassert.Equal(t, "pending", result.Status)\n'
        "\t})\n}\n"
    )
    assert hints["imports"] == [
        "testing",
        "github.com/stretchr/testify/assert",
        "myapp/repository",
        "myapp/services/inventory",
    ]


def test_go_empty_file_returns_none():
    assert extract_go_hints("package empty") is None


def test_go_calls():
    hints = extract_go_hints(
        "package test\n\n"
        'import "testing"\n\n'
        "func TestSomething(t *testing.T) {\n"
        '\tauthService.ValidateToken("token")\n'
        "\tuserRepo.FindByID(1)\n"
        "\tresult, err := orderService.Create(order)\n"
        "\tdoSomething()\n}\n"
    )
    got = set(hints["calls"])
    assert {"authService.ValidateToken", "userRepo.FindByID",
            "orderService.Create", "doSomething"} <= got


def test_go_noise_filtering():
    hints = extract_go_hints(
        "package test\n\n"
        'import "testing"\n\n'
        "func TestSpread(t *testing.T) {\n"
        "\tresult := []int{1, 2}\n"
        "\texpanded := append([]int{}, result...)\n"
        "\tdoSomething()\n}\n"
    )
    for c in hints["calls"]:
        assert c and c[0] != "["


def test_dispatch():
    assert extract_hints("a.ts", "import x from 'y';")["imports"] == ["y"]
    assert extract_hints("a.py", "import y\n")["imports"] == ["y"]
    assert extract_hints("a.go", 'import "y"\n')["imports"] == ["y"]
    assert extract_hints("a.rb", "require 'y'")["imports"] == ["y"]
    assert extract_hints("a.cpp", "anything") is None


# -- java_test.go ------------------------------------------------------------

def test_java_imports():
    from core_spark.functions.domain_hints import extract_java_hints

    hints = extract_java_hints(
        "package com.example;\n\n"
        "import org.junit.jupiter.api.Test;\n"
        "import static org.junit.jupiter.api.Assertions.assertEquals;\n"
        "import com.example.service.*;\n\n"
        "class T {}\n"
    )
    got = set(hints["imports"])
    assert {"org.junit.jupiter.api.Test",
            "org.junit.jupiter.api.Assertions.assertEquals",
            "com.example.service.*"} <= got


def test_java_calls_with_blacklist():
    from core_spark.functions.domain_hints import extract_java_hints

    hints = extract_java_hints(
        "class T {\n    @Test\n    void t() {\n"
        "        calculator.add(1, 2);\n"
        "        userService.findById(1);\n"
        "        paymentGateway.process(order);\n"
        "        assertEquals(3, result);\n"
        "        Mockito.verify(mock);\n    }\n}\n"
    )
    got = set(hints["calls"])
    assert {"calculator.add", "userService.findById", "paymentGateway.process"} <= got
    assert not any(c.split(".")[0] in ("assertEquals", "Mockito") for c in got)


# -- rust_test.go ------------------------------------------------------------

def test_rust_imports():
    from core_spark.functions.domain_hints import extract_rust_hints

    hints = extract_rust_hints(
        "use std::collections::HashMap;\n"
        "use crate::models::User;\n"
        "use super::helpers;\n"
        "use tokio::sync::mpsc;\n"
    )
    assert set(hints["imports"]) == {
        "std/collections/HashMap", "crate/models/User",
        "super/helpers", "tokio/sync/mpsc",
    }


def test_rust_use_lists_globs_aliases():
    from core_spark.functions.domain_hints import extract_rust_hints

    hints = extract_rust_hints(
        "use std::collections::{HashMap, HashSet};\n"
        "use crate::{models, services};\n"
        "use std::prelude::*;\n"
        "use crate::models::User as UserModel;\n"
    )
    got = set(hints["imports"])
    assert {"std/collections", "crate", "std/prelude", "crate/models/User"} <= got


def test_rust_calls():
    from core_spark.functions.domain_hints import extract_rust_hints

    hints = extract_rust_hints(
        "fn handle() {\n"
        "    user_service.create(user);\n"
        "    PaymentGateway::process(order);\n"
        "    assert_eq!(1, 1);\n"
        "    println!(\"x\");\n"
        "    Ok(())\n}\n"
    )
    got = set(hints["calls"])
    assert {"user_service.create", "PaymentGateway.process"} <= got
    assert not any(c.startswith(("assert", "println", "Ok")) for c in got)


def test_rust_mod_imports():
    from core_spark.functions.domain_hints import extract_rust_hints

    hints = extract_rust_hints("mod tests;\nmod handlers;\n")
    assert set(hints["imports"]) == {"tests", "handlers"}


# -- ruby_test.go ------------------------------------------------------------

def test_ruby_requires():
    from core_spark.functions.domain_hints import extract_ruby_hints

    hints = extract_ruby_hints(
        "require 'json'\nrequire \"net/http\"\nrequire_relative 'helpers'\n"
    )
    assert set(hints["imports"]) == {"json", "net/http", "helpers"}


def test_ruby_calls_with_blacklist():
    from core_spark.functions.domain_hints import extract_ruby_hints

    hints = extract_ruby_hints(
        "RSpec.describe 'Order' do\n"
        "  it 'processes' do\n"
        "    gateway.process(order)\n"
        "    Order.create(attrs)\n"
        "    notification_service.send_confirmation\n"
        "    expect(result).to be_truthy\n"
        "  end\nend\n"
    )
    got = set(hints["calls"])
    assert {"gateway.process", "Order.create",
            "notification_service.send_confirmation"} <= got
    assert not any(c.split(".")[0] in ("RSpec", "expect") for c in got)


def test_dispatch_new_languages():
    assert extract_hints("A.java", "import a.b;\n")["imports"] == ["a.b"]
    assert extract_hints("a.rs", "use a::b;\n")["imports"] == ["a/b"]
    assert extract_hints("a.rb", "require 'x'\n")["imports"] == ["x"]
