"""Reference-authored parser fixtures, ported verbatim.

Each test is one of the reference's own per-language extraction tests
(colgrep/src/parser/tests/test_python.rs / test_rust.rs /
test_javascript.rs / test_go.rs / test_typescript.rs / test_java.rs /
test_ruby.rs / test_csharp.rs / test_php.rs / test_kotlin.rs /
test_c.rs / test_swift.rs / test_cpp.rs / test_lua.rs / test_scala.rs), with the EXPECTED STRING copied unchanged: the
scanner output run through build_embedding_text must equal what the
reference's tree-sitter extractor + embed.rs::build_embedding_text
produce on the same source. This pins the ast-lite scanners against
reference-expected CodeUnits, not just shape assertions.
"""

from __future__ import annotations

import pytest

from next_plaid_spark.operators.code_parse import parse_code_units
from next_plaid_spark.operators.colgrep import build_embedding_text


def _embed(spark, path: str, source: str) -> dict[str, str]:
    files = spark.createDataFrame([(path, source)], "path string, content string")
    rows = build_embedding_text(parse_code_units(files)).collect()
    return {r.name: r.embed_text for r in rows}


def _unit(spark, path: str, source: str, name: str):
    files = spark.createDataFrame([(path, source)], "path string, content string")
    rows = parse_code_units(files).collect()
    return next(r for r in rows if r.name == name)


# -- Python (test_python.rs) --------------------------------------------------

PY_BASIC = '''def greet(name: str) -> str:
    """Say hello to someone."""
    return f"Hello, {name}!"'''

PY_BASIC_EXPECTED = '''Function: greet
Signature: def greet(name: str) -> str:
Description: """Say hello to someone.
Parameters: name
Returns: str
File: test test.py
Code:
def greet(name: str) -> str:
    """Say hello to someone."""
    return f"Hello, {name}!"'''


def test_python_basic_function(spark):
    # test_python.rs::test_basic_function (expected string verbatim,
    # including the reference's indented-docstring quote quirk)
    assert _embed(spark, "test.py", PY_BASIC)["greet"] == PY_BASIC_EXPECTED


PY_IMPORTS = '''import json
from urllib.parse import urlencode

def fetch_data(url: str) -> dict:
    """Fetch JSON data from URL."""
    return json.loads("{}")'''

PY_IMPORTS_EXPECTED = '''Function: fetch_data
Signature: def fetch_data(url: str) -> dict:
Description: """Fetch JSON data from URL.
Parameters: url
Returns: dict
Calls: loads
Uses: json
File: test test.py
Code:
def fetch_data(url: str) -> dict:
    """Fetch JSON data from URL."""
    return json.loads("{}")'''


def test_python_function_with_imports(spark):
    # test_python.rs::test_function_with_imports — notably "Uses: json"
    # only: urlencode is imported but unused by the unit, so the per-unit
    # import filter (extract.rs:69-82) drops it
    assert _embed(spark, "test.py", PY_IMPORTS)["fetch_data"] == PY_IMPORTS_EXPECTED


PY_CLASS = '''class Calculator:
    """A simple calculator class."""

    def __init__(self, value: int = 0):
        self.value = value

    def add(self, x: int) -> int:
        """Add x to the current value."""
        self.value += x
        return self.value'''

PY_CLASS_EXPECTED = '''Class: Calculator
Signature: class Calculator:
Description: """A simple calculator class.
Variables: self.value
File: test test.py
Code:
class Calculator:
    """A simple calculator class."""

    def __init__(self, value: int = 0):
        self.value = value

    def add(self, x: int) -> int:
        """Add x to the current value."""
        self.value += x
        return self.value'''


def test_python_class_definition(spark):
    # test_python.rs::test_class_definition: the class embeds as a single
    # chunk; methods are extracted as separate units alongside it
    texts = _embed(spark, "test.py", PY_CLASS)
    assert texts["Calculator"] == PY_CLASS_EXPECTED
    assert "__init__" in texts and "add" in texts
    u = _unit(spark, "test.py", PY_CLASS, "Calculator")
    assert "__init__" in u.code and "add" in u.code
    # methods exclude self from parameters (analysis.rs:545)
    init = _unit(spark, "test.py", PY_CLASS, "__init__")
    assert init.parameters == ["value"] and init.parent_class == "Calculator"


# -- Rust (test_rust.rs) ------------------------------------------------------

RS_BASIC = '''fn add(a: i32, b: i32) -> i32 {
    a + b
}
'''

RS_BASIC_EXPECTED = '''Function: add
Signature: fn add(a: i32, b: i32) -> i32 {
Parameters: a, b
Returns: i32
File: test test.rs
Code:
fn add(a: i32, b: i32) -> i32 {
    a + b
}'''


def test_rust_basic_function(spark):
    assert _embed(spark, "test.rs", RS_BASIC)["add"] == RS_BASIC_EXPECTED


RS_DOC = '''/// Calculates the sum of two numbers.
///
/// # Arguments
/// * `a` - First number
/// * `b` - Second number
fn add(a: i32, b: i32) -> i32 {
    a + b
}
'''

RS_DOC_EXPECTED = '''Function: add
Signature: fn add(a: i32, b: i32) -> i32 {
Description: Calculates the sum of two numbers.  # Arguments * `a` - First number * `b` - Second number
Parameters: a, b
Returns: i32
File: test test.rs
Code:
/// Calculates the sum of two numbers.
///
/// # Arguments
/// * `a` - First number
/// * `b` - Second number
fn add(a: i32, b: i32) -> i32 {
    a + b
}'''


def test_rust_function_with_doc_comment(spark):
    # doc comments join with " " INCLUDING the empty /// line (double
    # space), and the unit code starts at the first /// line
    # (find_start_with_attributes, ast.rs:364-409)
    assert _embed(spark, "test.rs", RS_DOC)["add"] == RS_DOC_EXPECTED


RS_PUB = '''pub fn public_func() -> String {
    String::from("public")
}
'''

RS_PUB_EXPECTED = '''Function: public_func
Signature: pub fn public_func() -> String {
Returns: String
Calls: from
File: test test.rs
Code:
pub fn public_func() -> String {
    String::from("public")
}'''


def test_rust_public_function(spark):
    assert _embed(spark, "test.rs", RS_PUB)["public_func"] == RS_PUB_EXPECTED


# -- JavaScript (test_javascript.rs) ------------------------------------------

JS_BASIC = '''function greet(name) {
    return `Hello, ${name}!`;
}'''

JS_BASIC_EXPECTED = '''Function: greet
Signature: function greet(name) {
Parameters: name
File: test test.js
Code:
function greet(name) {
    return `Hello, ${name}!`;
}'''


def test_js_basic_function(spark):
    assert _embed(spark, "test.js", JS_BASIC)["greet"] == JS_BASIC_EXPECTED


JS_ARROW = '''const add = (a, b) => {
    return a + b;
};'''

JS_ARROW_EXPECTED = '''Function: add
Signature: const add = (a, b) => {
Parameters: a, b
File: test test.js
Code:
const add = (a, b) => {
    return a + b;
};'''


def test_js_arrow_function(spark):
    assert _embed(spark, "test.js", JS_ARROW)["add"] == JS_ARROW_EXPECTED


JS_JSDOC = '''/**
 * Calculates the sum of two numbers.
 * @param {number} a - First number
 * @param {number} b - Second number
 * @returns {number} Sum of a and b
 */
function add(a, b) {
    return a + b;
}'''

JS_JSDOC_EXPECTED = '''Function: add
Signature: function add(a, b) {
Description: Calculates the sum of two numbers. @param {number} a - First number @param {number} b - Second number @returns {number} Sum of a and b /
Parameters: a, b
File: test test.js
Code:
/**
 * Calculates the sum of two numbers.
 * @param {number} a - First number
 * @param {number} b - Second number
 * @returns {number} Sum of a and b
 */
function add(a, b) {
    return a + b;
}'''


def test_js_function_with_jsdoc(spark):
    # the reference's JSDoc flattening keeps the closing "*/" line as a
    # bare "/" fragment — its own fixture asserts the trailing " /"
    assert _embed(spark, "test.js", JS_JSDOC)["add"] == JS_JSDOC_EXPECTED


# -- Go (test_go.rs) -----------------------------------------------------------

GO_BASIC = '''package main

func add(a, b int) int {
    return a + b
}
'''

GO_BASIC_EXPECTED = '''Function: add
Signature: func add(a, b int) int {
Parameters: a, b
Returns: int
File: test test.go
Code:
func add(a, b int) int {
    return a + b
}'''


def test_go_basic_function(spark):
    assert _embed(spark, "test.go", GO_BASIC)["add"] == GO_BASIC_EXPECTED


GO_DOC = '''package main

// Add calculates the sum of two integers.
// It returns the result as an integer.
func Add(a, b int) int {
    return a + b
}
'''

GO_DOC_EXPECTED = '''Function: Add
Signature: func Add(a, b int) int {
Description: Add calculates the sum of two integers. It returns the result as an integer.
Parameters: a, b
Returns: int
File: test test.go
Code:
// Add calculates the sum of two integers.
// It returns the result as an integer.
func Add(a, b int) int {
    return a + b
}'''


def test_go_function_with_doc_comment(spark):
    # Go convention: the // doc block belongs to the declaration's code
    assert _embed(spark, "test.go", GO_DOC)["Add"] == GO_DOC_EXPECTED


# -- TypeScript (test_typescript.rs) --------------------------------------------

TS_BASIC = '''function add(a: number, b: number): number {
    return a + b;
}'''

TS_BASIC_EXPECTED = '''Function: add
Signature: function add(a: number, b: number): number {
Parameters: a, b
Returns: : number
File: test test.ts
Code:
function add(a: number, b: number): number {
    return a + b;
}'''


def test_ts_basic_function_with_types(spark):
    # the reference's TS return type is the type_annotation node text,
    # leading ": " included — its fixture asserts "Returns: : number"
    assert _embed(spark, "test.ts", TS_BASIC)["add"] == TS_BASIC_EXPECTED


TS_IFACE = '''interface User {
    id: number;
    name: string;
}

function getUser(id: number): User {
    return { id, name: "John" };
}'''

TS_IFACE_EXPECTED = '''Function: getUser
Signature: function getUser(id: number): User {
Parameters: id
Returns: : User
File: test test.ts
Code:
function getUser(id: number): User {
    return { id, name: "John" };
}'''


def test_ts_interface_and_function(spark):
    texts = _embed(spark, "test.ts", TS_IFACE)
    assert texts["getUser"] == TS_IFACE_EXPECTED
    assert "User" in texts  # the interface is extracted as its own unit


# -- Python, round 2 (decorators / async / variadic / multiline doc) -----------

PY_DECORATED = '''@staticmethod
@decorator_with_args(arg=1)
def decorated_func():
    """A decorated function."""
    pass'''

PY_DECORATED_EXPECTED = '''Function: decorated_func
Signature: def decorated_func():
Description: """A decorated function.
File: test test.py
Code:
@staticmethod
@decorator_with_args(arg=1)
def decorated_func():
    """A decorated function."""
    pass'''


def test_python_decorated_function(spark):
    # decorators belong to the unit's code; the signature stays the def line
    assert _embed(spark, "test.py", PY_DECORATED)["decorated_func"] \
        == PY_DECORATED_EXPECTED


PY_ASYNC = '''async def fetch_async(url: str) -> bytes:
    """Fetch data asynchronously."""
    return b"data"'''

PY_ASYNC_EXPECTED = '''Function: fetch_async
Signature: async def fetch_async(url: str) -> bytes:
Description: """Fetch data asynchronously.
Parameters: url
Returns: bytes
File: test test.py
Code:
async def fetch_async(url: str) -> bytes:
    """Fetch data asynchronously."""
    return b"data"'''


def test_python_async_function(spark):
    assert _embed(spark, "test.py", PY_ASYNC)["fetch_async"] == PY_ASYNC_EXPECTED


PY_VARIADIC = '''def variadic_func(*args, **kwargs):
    """Function with variadic arguments."""
    return args, kwargs'''

PY_VARIADIC_EXPECTED = '''Function: variadic_func
Signature: def variadic_func(*args, **kwargs):
Description: """Function with variadic arguments.
Parameters: args, kwargs
File: test test.py
Code:
def variadic_func(*args, **kwargs):
    """Function with variadic arguments."""
    return args, kwargs'''


def test_python_args_kwargs(spark):
    # splat parameter NAMES, stars stripped (analysis.rs:552-566)
    assert _embed(spark, "test.py", PY_VARIADIC)["variadic_func"] \
        == PY_VARIADIC_EXPECTED


PY_MULTILINE_DOC = '''def complex_function(x: int, y: int) -> int:
    """
    This is a complex function that does many things.

    It processes x and y in a special way.

    Args:
        x: First number
        y: Second number

    Returns:
        The processed result
    """
    return x + y'''

PY_MULTILINE_DOC_EXPECTED = '''Function: complex_function
Signature: def complex_function(x: int, y: int) -> int:
Description: """
    This is a complex function that does many things.

    It processes x and y in a special way.

    Args:
        x: First number
        y: Second number

    Returns:
        The processed result
Parameters: x, y
Returns: int
File: test test.py
Code:
def complex_function(x: int, y: int) -> int:
    """
    This is a complex function that does many things.

    It processes x and y in a special way.

    Args:
        x: First number
        y: Second number

    Returns:
        The processed result
    """
    return x + y'''


def test_python_multiline_docstring(spark):
    # whole-line docstring extraction: opening quotes survive (indentation
    # blocks the start trim), the closing quote line trims away
    assert _embed(spark, "test.py", PY_MULTILINE_DOC)["complex_function"] \
        == PY_MULTILINE_DOC_EXPECTED


# -- Java (test_java.rs) --------------------------------------------------------

JAVA_BASIC = '''public class Calculator {
    public int add(int a, int b) {
        return a + b;
    }
}'''

JAVA_BASIC_EXPECTED = '''Class: Calculator
Signature: public class Calculator {
File: calculator Calculator.java
Code:
public class Calculator {
    public int add(int a, int b) {
        return a + b;
    }
}'''


def test_java_basic_method(spark):
    # the class is a single chunk (declaration heads inside the body are
    # NOT calls — the fixture asserts no Calls line) and the method is
    # also extracted alongside
    texts = _embed(spark, "Calculator.java", JAVA_BASIC)
    assert texts["Calculator"] == JAVA_BASIC_EXPECTED
    assert "add" in texts


# -- Ruby (test_ruby.rs) --------------------------------------------------------

RB_BASIC = '''def greet(name)
  "Hello, #{name}!"
end
'''

RB_BASIC_EXPECTED = '''Function: greet
Signature: def greet(name)
Parameters: name
File: test test.rb
Code:
def greet(name)
  "Hello, #{name}!"
end'''


def test_ruby_basic_method(spark):
    assert _embed(spark, "test.rb", RB_BASIC)["greet"] == RB_BASIC_EXPECTED


RB_RDOC = '''# Calculates the sum of two numbers.
# @param a [Integer] First number
# @param b [Integer] Second number
# @return [Integer] Sum of a and b
def add(a, b)
  a + b
end
'''

RB_RDOC_EXPECTED = '''Function: add
Signature: def add(a, b)
Description: Calculates the sum of two numbers. @param a [Integer] First number @param b [Integer] Second number @return [Integer] Sum of a and b
Parameters: a, b
File: test test.rb
Code:
def add(a, b)
  a + b
end'''


def test_ruby_method_with_rdoc(spark):
    # ruby has no find_start_with_attributes branch: the # rdoc block is
    # the Description but NOT part of the unit's code
    assert _embed(spark, "test.rb", RB_RDOC)["add"] == RB_RDOC_EXPECTED


# -- C# (test_csharp.rs) --------------------------------------------------------

CS_BASIC = '''public class Calculator
{
    public int Add(int a, int b)
    {
        return a + b;
    }
}'''

CS_BASIC_EXPECTED = '''Class: Calculator
Signature: public class Calculator
File: calculator Calculator.cs
Code:
public class Calculator
{
    public int Add(int a, int b)
    {
        return a + b;
    }
}'''


def test_csharp_basic_method(spark):
    # Allman-style braces: the method decl line ends at ')', its block
    # opens on the next line — still a Method unit, still not a "call"
    texts = _embed(spark, "Calculator.cs", CS_BASIC)
    assert texts["Calculator"] == CS_BASIC_EXPECTED
    assert "Add" in texts


# -- PHP (test_php.rs) ----------------------------------------------------------

PHP_BASIC = '''<?php
function greet($name) {
    return "Hello, " . $name . "!";
}
'''

PHP_BASIC_EXPECTED = '''Function: greet
Signature: function greet($name) {
Parameters: $name
File: test test.php
Code:
function greet($name) {
    return "Hello, " . $name . "!";
}'''


def test_php_basic_function(spark):
    # parameter names keep the $ sigil (the tree-sitter name node text)
    assert _embed(spark, "test.php", PHP_BASIC)["greet"] == PHP_BASIC_EXPECTED


PHP_DOC = '''<?php
/**
 * Calculates the sum of two numbers.
 * @param int $a First number
 * @param int $b Second number
 * @return int Sum of a and b
 */
function add($a, $b) {
    return $a + $b;
}
'''

PHP_DOC_EXPECTED = '''Function: add
Signature: function add($a, $b) {
Description: Calculates the sum of two numbers. @param int $a First number @param int $b Second number @return int Sum of a and b /
Parameters: $a, $b
File: test test.php
Code:
function add($a, $b) {
    return $a + $b;
}'''


def test_php_function_with_phpdoc(spark):
    # phpdoc flattens like JSDoc (trailing " /" quirk included); php has
    # no find_start_with_attributes branch so the block is not code
    assert _embed(spark, "test.php", PHP_DOC)["add"] == PHP_DOC_EXPECTED


# -- Kotlin (test_kotlin.rs) ----------------------------------------------------

KT_BASIC = '''fun greet(name: String): String {
    return "Hello, $name!"
}'''

KT_BASIC_EXPECTED = '''Function: greet
Signature: fun greet(name: String): String {
Parameters: name
File: test test.kt
Code:
fun greet(name: String): String {
    return "Hello, $name!"
}'''


def test_kotlin_basic_function(spark):
    # no Returns line: the reference's extract_return_type has no kotlin
    # branch (analysis.rs:571-585)
    assert _embed(spark, "test.kt", KT_BASIC)["greet"] == KT_BASIC_EXPECTED


KT_KDOC = '''/**
 * Calculates the sum of two numbers.
 * @param a First number
 * @param b Second number
 * @return Sum of a and b
 */
fun add(a: Int, b: Int): Int {
    return a + b
}'''

KT_KDOC_EXPECTED = '''Function: add
Signature: fun add(a: Int, b: Int): Int {
Description: Calculates the sum of two numbers. @param a First number @param b Second number @return Sum of a and b /
Parameters: a, b
File: test test.kt
Code:
fun add(a: Int, b: Int): Int {
    return a + b
}'''


def test_kotlin_function_with_kdoc(spark):
    assert _embed(spark, "test.kt", KT_KDOC)["add"] == KT_KDOC_EXPECTED


# -- C (test_c.rs) --------------------------------------------------------------

C_BASIC = '''int add(int a, int b) {
    return a + b;
}'''

C_BASIC_EXPECTED = '''Function: add
Signature: int add(int a, int b) {
Parameters: a, b
Returns: int
File: test test.c
Code:
int add(int a, int b) {
    return a + b;
}'''


def test_c_basic_function(spark):
    assert _embed(spark, "test.c", C_BASIC)["add"] == C_BASIC_EXPECTED


C_COMMENT = '''/* Calculates the sum of two integers.
 * Returns the result.
 */
int add(int a, int b) {
    return a + b;
}'''

C_COMMENT_EXPECTED = '''Function: add
Signature: int add(int a, int b) {
Description: Calculates the sum of two integers. Returns the result. /
Parameters: a, b
Returns: int
File: test test.c
Code:
int add(int a, int b) {
    return a + b;
}'''


def test_c_function_with_comment(spark):
    # C has no find_start_with_attributes branch: the /* */ block is the
    # Description but not part of the code
    assert _embed(spark, "test.c", C_COMMENT)["add"] == C_COMMENT_EXPECTED


# -- Swift / C++ / Lua / Scala basics (test_{swift,cpp,lua,scala}.rs) -----------

SWIFT_BASIC = '''func greet(name: String) -> String {
    return "Hello, \\(name)!"
}'''

SWIFT_BASIC_EXPECTED = '''Function: greet
Signature: func greet(name: String) -> String {
Parameters: name
File: test test.swift
Code:
func greet(name: String) -> String {
    return "Hello, \\(name)!"
}'''


def test_swift_basic_function(spark):
    # no Returns line — swift is not in extract_return_type's language list
    assert _embed(spark, "test.swift", SWIFT_BASIC)["greet"] == SWIFT_BASIC_EXPECTED


CPP_BASIC = '''int add(int a, int b) {
    return a + b;
}'''

CPP_BASIC_EXPECTED = '''Function: add
Signature: int add(int a, int b) {
Parameters: a, b
Returns: int
File: test test.cpp
Code:
int add(int a, int b) {
    return a + b;
}'''


def test_cpp_basic_function(spark):
    assert _embed(spark, "test.cpp", CPP_BASIC)["add"] == CPP_BASIC_EXPECTED


LUA_BASIC = '''function greet(name)
    return "Hello, " .. name .. "!"
end'''

LUA_BASIC_EXPECTED = '''Function: greet
Signature: function greet(name)
Parameters: name
File: test test.lua
Code:
function greet(name)
    return "Hello, " .. name .. "!"
end'''


def test_lua_basic_function(spark):
    assert _embed(spark, "test.lua", LUA_BASIC)["greet"] == LUA_BASIC_EXPECTED


SCALA_BASIC = '''def greet(name: String): String = {
  s"Hello, $name!"
}'''

SCALA_BASIC_EXPECTED = '''Function: greet
Signature: def greet(name: String): String = {
Parameters: name
File: test test.scala
Code:
def greet(name: String): String = {
  s"Hello, $name!"
}'''


def test_scala_basic_function(spark):
    assert _embed(spark, "test.scala", SCALA_BASIC)["greet"] == SCALA_BASIC_EXPECTED
