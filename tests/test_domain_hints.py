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


# -- cpp_test.go -------------------------------------------------------------

def test_cpp_includes():
    from core_spark.functions.domain_hints import extract_cpp_hints

    hints = extract_cpp_hints(
        '\n#include <iostream>\n#include <vector>\n#include "myheader.h"\n'
        "#include <gtest/gtest.h>\n"
    )
    assert {"iostream", "vector", "myheader.h", "gtest/gtest.h"} <= set(hints["imports"])


def test_cpp_local_headers():
    from core_spark.functions.domain_hints import extract_cpp_hints

    hints = extract_cpp_hints(
        '#include "services/payment.h"\n#include "models/user.h"\n'
        '#include "../common/utils.h"\n'
    )
    assert {"services/payment.h", "models/user.h", "../common/utils.h"} <= set(
        hints["imports"]
    )


def test_cpp_method_calls():
    from core_spark.functions.domain_hints import extract_cpp_hints

    hints = extract_cpp_hints(
        "\n#include <iostream>\n\nvoid testFunction() {\n"
        "    userService.create(user);\n"
        "    PaymentGateway::process(payment);\n"
        "    notificationService->sendEmail(user);\n}\n"
    )
    assert {"userService.create", "PaymentGateway.process",
            "notificationService.sendEmail"} <= set(hints["calls"])


def test_cpp_empty_file_returns_none():
    from core_spark.functions.domain_hints import extract_cpp_hints

    assert extract_cpp_hints("// empty file") is None


def test_cpp_test_framework_calls_excluded():
    from core_spark.functions.domain_hints import extract_cpp_hints

    hints = extract_cpp_hints(
        "\n#include <gtest/gtest.h>\n\nTEST(PaymentTest, ProcessPayment) {\n"
        "    EXPECT_EQ(result, expected);\n    ASSERT_TRUE(condition);\n\n"
        "    paymentService.process(order);\n}\n"
    )
    got = set(hints["calls"])
    assert "paymentService.process" in got
    assert not {"EXPECT_EQ", "ASSERT_TRUE", "TEST"} & got


def test_cpp_gtest_file():
    from core_spark.functions.domain_hints import extract_cpp_hints

    hints = extract_cpp_hints(
        "\n#include <gtest/gtest.h>\n#include \"services/payment.h\"\n"
        "#include \"models/order.h\"\n\n"
        "class PaymentTest : public ::testing::Test {\nprotected:\n"
        "    void SetUp() override {\n"
        "        gateway = std::make_unique<PaymentGateway>();\n    }\n\n"
        "    std::unique_ptr<PaymentGateway> gateway;\n};\n\n"
        "TEST_F(PaymentTest, ProcessPayment) {\n    Order order(100);\n\n"
        "    gateway->process(order);\n"
        "    notificationService->sendConfirmation(order.id);\n\n"
        "    EXPECT_TRUE(gateway->isComplete());\n}\n"
    )
    assert {"gtest/gtest.h", "services/payment.h", "models/order.h"} <= set(
        hints["imports"]
    )
    got = set(hints["calls"])
    assert {"gateway.process", "notificationService.sendConfirmation"} <= got
    assert "TEST_F" not in got and "EXPECT_TRUE" not in got


def test_cpp_catch2_file():
    from core_spark.functions.domain_hints import extract_cpp_hints

    hints = extract_cpp_hints(
        "\n#include <catch2/catch_test_macros.hpp>\n#include \"services/user.h\"\n\n"
        'TEST_CASE("User creation", "[user]") {\n'
        '    SECTION("valid user") {\n'
        "        userService.create(validData);\n"
        "        repository.save(user);\n\n"
        "        REQUIRE(user.isValid());\n    }\n}\n"
    )
    assert {"catch2/catch_test_macros.hpp", "services/user.h"} <= set(hints["imports"])
    got = set(hints["calls"])
    assert {"userService.create", "repository.save"} <= got
    assert "REQUIRE" not in got


def test_cpp_dedup():
    from core_spark.functions.domain_hints import extract_cpp_hints

    hints = extract_cpp_hints(
        "\n#include <iostream>\n#include <iostream>\n\nvoid test() {\n"
        "    userService.create(1);\n    userService.create(2);\n}\n"
    )
    assert hints["imports"].count("iostream") == 1
    assert hints["calls"].count("userService.create") == 1


def test_cpp_namespaced_calls_two_segment():
    from core_spark.functions.domain_hints import extract_cpp_hints

    hints = extract_cpp_hints(
        "\n#include <vector>\n\nvoid test() {\n    std::vector<int> v;\n"
        "    MyNamespace::Service::getInstance();\n"
        "    payment::gateway::process(order);\n}\n"
    )
    assert {"MyNamespace.Service", "payment.gateway"} <= set(hints["calls"])


# -- csharp_test.go ----------------------------------------------------------

def test_csharp_usings():
    from core_spark.functions.domain_hints import extract_csharp_hints

    hints = extract_csharp_hints(
        "\nusing System;\nusing System.Collections.Generic;\n"
        "using NUnit.Framework;\nusing MyApp.Services;\nusing MyApp.Models;\n\n"
        "namespace MyApp.Tests\n{\n    public class CalculatorTests\n    {\n    }\n}\n"
    )
    assert {"System", "System.Collections.Generic", "NUnit.Framework",
            "MyApp.Services", "MyApp.Models"} <= set(hints["imports"])


def test_csharp_calls():
    from core_spark.functions.domain_hints import extract_csharp_hints

    hints = extract_csharp_hints(
        "\nusing NUnit.Framework;\n\nnamespace MyApp.Tests\n{\n"
        "    public class CalculatorTests\n    {\n        [Test]\n"
        "        public void TestAdd()\n        {\n"
        "            var calculator = new Calculator();\n"
        "            var result = calculator.Add(1, 2);\n"
        "            userService.FindById(123);\n"
        "            paymentGateway.Process(order);\n        }\n    }\n}\n"
    )
    assert {"calculator.Add", "userService.FindById",
            "paymentGateway.Process"} <= set(hints["calls"])


def test_csharp_empty_file_returns_none():
    from core_spark.functions.domain_hints import extract_csharp_hints

    assert extract_csharp_hints("// empty file") is None


def test_csharp_test_framework_calls_excluded():
    from core_spark.functions.domain_hints import extract_csharp_hints

    hints = extract_csharp_hints(
        "\nusing NUnit.Framework;\n\nnamespace MyApp.Tests\n{\n"
        "    public class CalculatorTests\n    {\n        [Test]\n"
        "        public void TestAdd()\n        {\n"
        "            var calculator = new Calculator();\n"
        "            Assert.AreEqual(2, calculator.Add(1, 1));\n"
        "            Assert.IsTrue(calculator.IsPositive(5));\n"
        "            Assert.Throws<Exception>(() => calculator.Divide(1, 0));\n"
        "            userService.Validate(user);\n        }\n    }\n}\n"
    )
    got = set(hints["calls"])
    assert not {"Assert.AreEqual", "Assert.IsTrue", "Assert.Throws"} & got
    assert {"calculator.Add", "userService.Validate"} <= got


def test_csharp_using_alias_and_static_and_global():
    from core_spark.functions.domain_hints import extract_csharp_hints

    hints = extract_csharp_hints(
        "\nusing System;\nusing Env = System.Environment;\n"
        "using Console = System.Console;\nusing static System.Math;\n"
        "global using System.Linq;\n\nnamespace MyApp {}\n"
    )
    got = set(hints["imports"])
    assert {"System", "System.Environment", "System.Console",
            "System.Math", "System.Linq"} <= got


def test_csharp_chained_calls_two_segment():
    from core_spark.functions.domain_hints import extract_csharp_hints

    hints = extract_csharp_hints(
        "\nnamespace MyApp.Tests\n{\n    public class Test\n    {\n"
        "        void TestMethod()\n        {\n"
        "            client.Api.Users.FindAll();\n"
        "            response.Data.Items.First().GetValue();\n        }\n    }\n}\n"
    )
    assert {"client.Api", "response.Data"} <= set(hints["calls"])


def test_csharp_xunit_file():
    from core_spark.functions.domain_hints import extract_csharp_hints

    hints = extract_csharp_hints(
        "\nusing Xunit;\nusing FluentAssertions;\nusing MyApp.Services;\n\n"
        "namespace MyApp.Tests\n{\n    public class UserServiceTests\n    {\n"
        "        [Fact]\n        public void GetUser_ReturnsUser()\n        {\n"
        "            var service = new UserService();\n"
        "            var result = service.GetUser(1);\n"
        "            result.Should().NotBeNull();\n"
        "            orderService.CreateOrder(result);\n        }\n    }\n}\n"
    )
    assert {"Xunit", "FluentAssertions", "MyApp.Services"} <= set(hints["imports"])
    got = set(hints["calls"])
    assert {"service.GetUser", "orderService.CreateOrder"} <= got
    assert "Should.NotBeNull" not in got


# -- kotlin_test.go ----------------------------------------------------------

def test_kotlin_imports():
    from core_spark.functions.domain_hints import extract_kotlin_hints

    hints = extract_kotlin_hints(
        "\npackage kotest\n\nimport io.kotest.core.spec.style.StringSpec\n"
        "import io.kotest.matchers.shouldBe\n"
        "import com.example.service.UserService\n"
        "import org.junit.jupiter.api.Test\n\nclass KotestSpec : StringSpec({\n})\n"
    )
    assert {"io.kotest.core.spec.style.StringSpec", "io.kotest.matchers.shouldBe",
            "com.example.service.UserService",
            "org.junit.jupiter.api.Test"} <= set(hints["imports"])


def test_kotlin_calls():
    from core_spark.functions.domain_hints import extract_kotlin_hints

    hints = extract_kotlin_hints(
        "\npackage com.example\n\nimport io.kotest.core.spec.style.FunSpec\n\n"
        'class CalculatorTest : FunSpec({\n    test("add two numbers") {\n'
        "        val calculator = Calculator()\n"
        "        val result = calculator.add(1, 2)\n"
        "        userService.findById(123)\n"
        "        paymentGateway.process(order)\n    }\n})\n"
    )
    assert {"calculator.add", "userService.findById",
            "paymentGateway.process"} <= set(hints["calls"])


def test_kotlin_empty_file_returns_none():
    from core_spark.functions.domain_hints import extract_kotlin_hints

    assert extract_kotlin_hints("// empty file") is None


def test_kotlin_test_framework_calls_excluded():
    from core_spark.functions.domain_hints import extract_kotlin_hints

    hints = extract_kotlin_hints(
        "\npackage com.example\n\nimport io.kotest.core.spec.style.FunSpec\n"
        "import io.kotest.matchers.shouldBe\n\n"
        'class CalculatorTest : FunSpec({\n    test("add two numbers") {\n'
        "        val result = calculator.add(1, 2)\n        result shouldBe 3\n"
        "        userService.validate(user)\n    }\n})\n"
    )
    got = set(hints["calls"])
    assert not {"shouldBe", "test"} & got
    assert {"calculator.add", "userService.validate"} <= got


def test_kotlin_kotest_spec():
    from core_spark.functions.domain_hints import extract_kotlin_hints

    hints = extract_kotlin_hints(
        "\npackage kotest\n\nimport io.kotest.core.spec.style.StringSpec\n"
        "import io.kotest.matchers.shouldBe\n"
        "import com.example.service.PaymentService\n\n"
        'class PaymentSpec : StringSpec({\n    "payment should be processed" {\n'
        "        val service = PaymentService()\n"
        "        val result = service.process(order)\n"
        "        stripe.confirm(result.intentId)\n"
        '        result.status shouldBe "success"\n    }\n})\n'
    )
    assert {"io.kotest.core.spec.style.StringSpec", "io.kotest.matchers.shouldBe",
            "com.example.service.PaymentService"} <= set(hints["imports"])
    assert {"service.process", "stripe.confirm"} <= set(hints["calls"])


def test_kotlin_chained_calls_two_segment():
    from core_spark.functions.domain_hints import extract_kotlin_hints

    hints = extract_kotlin_hints(
        "\npackage com.example\n\nclass Test {\n    fun test() {\n"
        "        client.api.users.findAll()\n"
        "        response.data.items.first().value\n    }\n}\n"
    )
    assert {"client.api", "response.data"} <= set(hints["calls"])


# -- php_test.go -------------------------------------------------------------

def test_php_use_statements():
    from core_spark.functions.domain_hints import extract_php_hints

    hints = extract_php_hints(
        "<?php\nnamespace App\\Tests;\n\nuse PHPUnit\\Framework\\TestCase;\n"
        "use App\\Services\\PaymentService;\nuse Stripe\\PaymentIntent;\n"
        "use App\\Models\\User as UserModel;\n"
    )
    assert {"PHPUnit\\Framework\\TestCase", "App\\Services\\PaymentService",
            "Stripe\\PaymentIntent", "App\\Models\\User"} <= set(hints["imports"])


def test_php_method_calls():
    from core_spark.functions.domain_hints import extract_php_hints

    hints = extract_php_hints(
        "<?php\nnamespace App\\Tests;\n\nuse PHPUnit\\Framework\\TestCase;\n\n"
        "class PaymentTest extends TestCase\n{\n"
        "    public function testCreatePayment(): void\n    {\n"
        "        $paymentService->createIntent($amount);\n"
        "        $stripeClient->processPayment($order);\n"
        "        PaymentGateway::configure($config);\n    }\n}\n"
    )
    assert {"paymentService.createIntent", "stripeClient.processPayment",
            "PaymentGateway.configure"} <= set(hints["calls"])


def test_php_empty_file_returns_none():
    from core_spark.functions.domain_hints import extract_php_hints

    assert extract_php_hints("<?php\n// empty file\n") is None


def test_php_test_framework_calls_excluded():
    from core_spark.functions.domain_hints import extract_php_hints

    hints = extract_php_hints(
        "<?php\nuse PHPUnit\\Framework\\TestCase;\n\n"
        "class UserTest extends TestCase\n{\n"
        "    public function testUser(): void\n    {\n"
        "        $this->assertEquals($expected, $actual);\n"
        "        $this->assertTrue($result);\n"
        "        $userService->findById($id);\n    }\n}\n"
    )
    got = set(hints["calls"])
    assert not {"this.assertEquals", "this.assertTrue"} & got
    assert "userService.findById" in got


def test_php_include_require():
    from core_spark.functions.domain_hints import extract_php_hints

    hints = extract_php_hints(
        "<?php\ninclude 'helpers.php';\ninclude_once 'utils.php';\n"
        "require 'config.php';\nrequire_once 'bootstrap.php';\n"
    )
    assert {"helpers.php", "utils.php", "config.php", "bootstrap.php"} <= set(
        hints["imports"]
    )


def test_php_static_method_calls():
    from core_spark.functions.domain_hints import extract_php_hints

    hints = extract_php_hints(
        "<?php\nuse App\\Models\\User;\n\nclass Test\n{\n"
        "    public function test(): void\n    {\n        User::find(1);\n"
        "        Cache::remember('key', function() {});\n"
        "        DB::table('users')->get();\n    }\n}\n"
    )
    assert {"User.find", "Cache.remember", "DB.table"} <= set(hints["calls"])


def test_php_dedup():
    from core_spark.functions.domain_hints import extract_php_hints

    hints = extract_php_hints(
        "<?php\nuse App\\Models\\User;\n\nclass Test\n{\n"
        "    public function test(): void\n    {\n        User::find(1);\n"
        "        User::find(2);\n        $service->process();\n"
        "        $service->process();\n    }\n}\n"
    )
    assert hints["calls"].count("User.find") == 1
    assert hints["calls"].count("service.process") == 1


def test_php_phpunit_file():
    from core_spark.functions.domain_hints import extract_php_hints

    hints = extract_php_hints(
        "<?php\nnamespace App\\Tests\\Payment;\n\n"
        "use PHPUnit\\Framework\\TestCase;\nuse App\\Services\\PaymentService;\n"
        "use Stripe\\StripeClient;\nuse App\\Models\\Order;\n\n"
        "class PaymentServiceTest extends TestCase\n{\n"
        "    public function testCreatePayment(): void\n    {\n"
        "        StripeClient::setApiKey($key);\n"
        "        NotificationService::sendConfirmation($user);\n"
        "        $orderService->process($data);\n    }\n}\n"
    )
    assert {"PHPUnit\\Framework\\TestCase", "App\\Services\\PaymentService",
            "Stripe\\StripeClient", "App\\Models\\Order"} <= set(hints["imports"])
    assert {"StripeClient.setApiKey", "NotificationService.sendConfirmation",
            "orderService.process"} <= set(hints["calls"])


# -- swift_test.go -----------------------------------------------------------

def test_swift_imports():
    from core_spark.functions.domain_hints import extract_swift_hints

    hints = extract_swift_hints(
        "\nimport Foundation\nimport XCTest\nimport SwiftUI\nimport UIKit\n"
    )
    assert {"Foundation", "XCTest", "SwiftUI", "UIKit"} <= set(hints["imports"])


def test_swift_testable_import():
    from core_spark.functions.domain_hints import extract_swift_hints

    hints = extract_swift_hints(
        "\nimport XCTest\n@testable import MyApp\n@testable import CoreModule\n"
    )
    assert {"XCTest", "MyApp", "CoreModule"} <= set(hints["imports"])


def test_swift_dotted_import():
    from core_spark.functions.domain_hints import extract_swift_hints

    hints = extract_swift_hints(
        "\nimport UIKit.UIView\nimport Foundation.NSObject\n"
    )
    assert {"UIKit.UIView", "Foundation.NSObject"} <= set(hints["imports"])


def test_swift_method_calls():
    from core_spark.functions.domain_hints import extract_swift_hints

    hints = extract_swift_hints(
        "\nimport Foundation\n\nclass TestService {\n    func testMethod() {\n"
        "        userService.create(user)\n        PaymentGateway.process(payment)\n"
        "        notificationService.sendEmail(to: user)\n    }\n}\n"
    )
    assert {"userService.create", "PaymentGateway.process",
            "notificationService.sendEmail"} <= set(hints["calls"])


def test_swift_empty_file_returns_none():
    from core_spark.functions.domain_hints import extract_swift_hints

    assert extract_swift_hints("// empty file") is None


def test_swift_test_framework_calls_excluded():
    from core_spark.functions.domain_hints import extract_swift_hints

    hints = extract_swift_hints(
        "\nimport XCTest\n\nclass PaymentTests: XCTestCase {\n"
        "    func testPayment() {\n        XCTAssertEqual(result, expected)\n"
        "        XCTAssertTrue(condition)\n        print(\"debug output\")\n\n"
        "        paymentService.process(order)\n    }\n}\n"
    )
    got = set(hints["calls"])
    assert not {"XCTAssertEqual", "XCTAssertTrue", "print"} & got
    assert "paymentService.process" in got


def test_swift_xctest_file():
    from core_spark.functions.domain_hints import extract_swift_hints

    hints = extract_swift_hints(
        "\nimport XCTest\n@testable import MyApp\n\n"
        "class UserServiceTests: XCTestCase {\n    var sut: UserService!\n"
        "    var mockRepository: MockUserRepository!\n\n"
        "    override func setUp() {\n        super.setUp()\n"
        "        mockRepository = MockUserRepository()\n"
        "        sut = UserService(repository: mockRepository)\n    }\n\n"
        "    func testCreateUser() {\n        let user = User(name: \"Test\")\n\n"
        "        sut.create(user)\n        userNotification.send(to: user)\n"
        "        analyticsService.track(event: \"user_created\")\n\n"
        "        XCTAssertEqual(mockRepository.savedUsers.count, 1)\n    }\n}\n"
    )
    assert {"XCTest", "MyApp"} <= set(hints["imports"])
    assert {"sut.create", "userNotification.send",
            "analyticsService.track"} <= set(hints["calls"])


def test_swift_testing_framework():
    from core_spark.functions.domain_hints import extract_swift_hints

    hints = extract_swift_hints(
        "\nimport Testing\n@testable import MyApp\n\n"
        '@Suite("Payment Tests")\nstruct PaymentTests {\n'
        '    @Test("processes payment correctly")\n'
        "    func testPaymentProcessing() async throws {\n"
        "        let service = PaymentService()\n\n"
        "        #expect(service.isReady)\n        try #require(service.configure())\n\n"
        "        paymentGateway.process(amount: 100)\n"
        "        notificationService.sendReceipt(to: user)\n    }\n}\n"
    )
    assert {"Testing", "MyApp"} <= set(hints["imports"])
    assert {"paymentGateway.process",
            "notificationService.sendReceipt"} <= set(hints["calls"])


def test_swift_dedup():
    from core_spark.functions.domain_hints import extract_swift_hints

    hints = extract_swift_hints(
        "\nimport Foundation\nimport Foundation\n\nfunc test() {\n"
        "    userService.create(1)\n    userService.create(2)\n}\n"
    )
    assert hints["imports"].count("Foundation") == 1
    assert hints["calls"].count("userService.create") == 1


def test_dispatch_all_eleven_languages():
    assert extract_hints("a.cc", "#include <x>\n")["imports"] == ["x"]
    assert extract_hints("a.cs", "using A.B;\n")["imports"] == ["A.B"]
    assert extract_hints("a.kt", "import a.b.C\n")["imports"] == ["a.b.C"]
    assert extract_hints("a.php", "<?php\nuse A\\B;\n")["imports"] == ["A\\B"]
    assert extract_hints("a.swift", "import Foundation\n")["imports"] == ["Foundation"]


# -- review-fix regressions (round 3) ----------------------------------------

def test_cpp_calls_after_case_and_goto_labels():
    from core_spark.functions.domain_hints import extract_cpp_hints

    h = extract_cpp_hints(
        "void f() { switch (x) { case 1: fire(1); break; default: helper(2); } }"
    )
    assert {"fire", "helper"} <= set(h["calls"])
    h = extract_cpp_hints("void f() {\nlabel:\n  doit(1);\n}")
    assert "doit" in h["calls"]
    # but '::' chains still never restart mid-chain
    h = extract_cpp_hints("void f() { a::b::c(1); }")
    assert h["calls"] == ["a.b"]


def test_cpp_call_after_comparison():
    from core_spark.functions.domain_hints import extract_cpp_hints

    h = extract_cpp_hints("void f() { if (a > check(1)) { run(2); } }")
    assert {"check", "run"} <= set(h["calls"])


def test_cpp_ctor_decl_after_access_specifier_not_a_call():
    """`public: Foo(int x);` is a constructor DECLARATION — tree-sitter's
    call_expression query never matches it (cpp.go:22-28); case labels
    right before a genuine call still count."""
    from core_spark.functions.domain_hints import extract_cpp_hints

    h = extract_cpp_hints(
        "class Foo {\npublic:\n  Foo(int x);\n  ~Foo();\n"
        "private:\n  Bar(int y);\n  void run() { fire(1); }\n};"
    )
    calls = set(h["calls"])
    assert "Foo" not in calls and "Bar" not in calls
    assert "fire" in calls


def test_csharp_using_statement_keeps_inner_calls():
    from core_spark.functions.domain_hints import extract_csharp_hints

    h = extract_csharp_hints(
        "class C { void M() { using (var conn = Factory.Create()) "
        "{ conn.Run(); } After(); } }"
    )
    assert {"Factory.Create", "conn.Run", "After"} <= set(h["calls"])
    assert h["imports"] == []


def test_kotlin_safe_call_keeps_receiver():
    from core_spark.functions.domain_hints import extract_kotlin_hints

    h = extract_kotlin_hints("fun main() {\n    svc?.deliver(1)\n    mock?.verify(x)\n}")
    # receiver preserved: 'mock?.verify' must NOT collapse to the
    # blacklisted bare 'verify'
    assert {"svc.deliver", "mock.verify"} <= set(h["calls"])


def test_cpp_template_declaration_not_a_call():
    from core_spark.functions.domain_hints import extract_cpp_hints

    h = extract_cpp_hints(
        "void f() {\n    std::vector<int> names(3);\n"
        "    std::unique_ptr<Foo> p(new Foo);\n    svc.go(1);\n}"
    )
    got = set(h["calls"])
    assert "svc.go" in got
    assert not {"names", "p"} & got
    # comparisons after which a call IS fresh still work
    h = extract_cpp_hints("void f() { if (a > check(1)) { run(2); } }")
    assert {"check", "run"} <= set(h["calls"])


def test_safe_call_tail_not_captured_bare():
    from core_spark.functions.domain_hints import (
        extract_csharp_hints,
        extract_kotlin_hints,
    )

    h = extract_kotlin_hints("fun main() {\n    repo.load(id)?.save()\n}")
    assert "repo.load" in h["calls"] and "save" not in h["calls"]
    h = extract_csharp_hints("class C { void M() { factory.BuildMock()?.Verify(); } }")
    assert "factory.BuildMock" in h["calls"] and "Verify" not in h["calls"]
