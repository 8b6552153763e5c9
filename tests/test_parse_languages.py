"""P1 multi-language ast-lite extraction.

Unit shapes mirror the per-language assertions in
colgrep/src/parser/tests/test_{go,typescript,java,csharp,c,cpp,php,ruby}.rs
(e.g. Go methods attach to the receiver type, Java methods are emitted as
separate units alongside their parent class chunk).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from next_plaid_spark.operators.code_parse import (
    _file_imports,
    parse_code_units,
    with_unit_ids,
)

GO_SRC = '''package main

// Add calculates the sum of two integers.
// It returns the result as an integer.
func Add(a, b int) int {
    return a + b
}

type Calculator struct {
    value int
}

func (c *Calculator) Add(x int) int {
    c.value += x
    return c.value
}

func divide(a, b int) (int, error) {
    if b == 0 {
        return 0, errors.New("division by zero")
    }
    return a / b, nil
}

const MaxRetries = 3
'''

TS_SRC = '''interface User {
    id: number;
    name: string;
}

/** Fetch a user by id from the backend. */
async function fetchUser(id: number): Promise<User> {
    const response = await fetch(`/users/${id}`);
    return response.json();
}

const double = (x: number): number => x * 2;

export class Store {
    get(id: string): User | undefined {
        return this.items.get(id);
    }
}
'''

JAVA_SRC = '''public class Calculator {
    public static final int MAX_VALUE = 100;

    /**
     * Calculates the sum of two numbers.
     */
    public int add(int a, int b) {
        return a + b;
    }

    public static String format(String template, Object... args) {
        return String.format(template, args);
    }
}
'''

CSHARP_SRC = '''public sealed class Greeter {
    public const string DEFAULT_NAME = "world";

    public async Task<string> GreetAsync(string name) {
        await Task.Delay(10);
        return $"Hello {name}";
    }
}
'''

C_SRC = '''#define MAX_SIZE 1024

/* Adds two integers. */
static int add(int a, int b) {
    return a + b;
}

struct point {
    int x;
    int y;
};

static int
old_style(int a)
{
    return helper(a);
}

int main(void) {
    if (add(1, 2) > 0) {
        return 0;
    }
    return 1;
}
'''

CPP_SRC = '''class Shape {
public:
    virtual double area() const {
        return 0.0;
    }
};

double Shape::perimeter(int sides) {
    return sides * 1.0;
}

template <typename T>
T clamp(T v, T lo, T hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}
'''

PHP_SRC = '''<?php
const MAX_USERS = 50;

/** Say hello politely. */
function greet($name, $greeting = "Hello") {
    return "$greeting, $name";
}

class UserRepo {
    public function find($id) {
        return $this->db->get($id);
    }
}
'''

RUBY_SRC = '''MAX_RETRIES = 3

# Greets a person by name.
def greet(name, greeting = "Hello")
  "#{greeting}, #{name}"
end

class Calculator
  def add(a, b)
    a + b
  end

  def each_pair
    [1, 2].each do |x|
      yield x, x * 2
    end
  end
end
'''


def _units(spark, path, src):
    files = spark.createDataFrame([(path, src)], "path string, content string")
    return {r.qualified_name: r for r in parse_code_units(files).collect()}


def test_parse_go_units(spark):
    units = _units(spark, "calc.go", GO_SRC)
    add = units["Add"]
    assert add.unit_type == "Function" and add.language == "go"
    assert add.signature == "func Add(a, b int) int {"
    assert add.parameters == ["a", "b"]
    assert "Add calculates the sum" in add.docstring
    assert units["Calculator"].unit_type == "Class"
    meth = units["Calculator.Add"]
    assert meth.unit_type == "Method" and meth.parent_class == "Calculator"
    assert meth.parameters == ["x"]
    div = units["divide"]
    assert div.parameters == ["a", "b"] and "New" in div.calls
    assert units["MaxRetries"].unit_type == "Constant"


def test_parse_typescript_units(spark):
    units = _units(spark, "store.ts", TS_SRC)
    assert units["User"].unit_type == "Class"  # interface
    fu = units["fetchUser"]
    assert fu.unit_type == "Function" and fu.language == "typescript"
    assert fu.parameters == ["id"]
    assert "Fetch a user" in fu.docstring
    assert "fetch" in fu.calls and "json" in fu.calls
    assert units["double"].unit_type == "Function"
    assert units["double"].parameters == ["x"]
    got = units["Store.get"]
    assert got.unit_type == "Method" and got.parent_class == "Store"
    assert got.parameters == ["id"]


def test_parse_java_units(spark):
    units = _units(spark, "Calculator.java", JAVA_SRC)
    cls = units["Calculator"]
    # class chunk spans the whole body AND methods are separate units
    # (test_java.rs: "Methods are extracted as separate units alongside
    # their parent classes")
    assert cls.unit_type == "Class" and cls.end_line > 10
    add = units["Calculator.add"]
    assert add.unit_type == "Method" and add.parent_class == "Calculator"
    assert add.parameters == ["a", "b"]
    assert "Calculates the sum" in add.docstring
    fmt = units["Calculator.format"]
    assert fmt.parameters == ["template", "args"]
    assert units["Calculator.MAX_VALUE"].unit_type == "Constant"


def test_parse_csharp_units(spark):
    units = _units(spark, "Greeter.cs", CSHARP_SRC)
    assert units["Greeter"].unit_type == "Class"
    g = units["Greeter.GreetAsync"]
    assert g.unit_type == "Method" and g.language == "csharp"
    assert g.parameters == ["name"]
    assert units["Greeter.DEFAULT_NAME"].unit_type == "Constant"


def test_parse_c_units(spark):
    units = _units(spark, "main.c", C_SRC)
    assert units["MAX_SIZE"].unit_type == "Constant"
    add = units["add"]
    assert add.unit_type == "Function" and add.parameters == ["a", "b"]
    assert "Adds two integers" in add.docstring
    assert units["point"].unit_type == "Class"
    # return type on its own line (K&R-ish layout)
    old = units["old_style"]
    assert old.parameters == ["a"] and "helper" in old.calls
    main = units["main"]
    assert main.parameters == [] and main.line == 19


def test_parse_cpp_units(spark):
    units = _units(spark, "shape.cpp", CPP_SRC)
    assert units["Shape"].unit_type == "Class"
    area = units["Shape.area"]
    assert area.unit_type == "Method" and area.parent_class == "Shape"
    # out-of-class definition binds to the scoped type
    per = units["Shape.perimeter"]
    assert per.unit_type == "Method" and per.parameters == ["sides"]
    assert units["clamp"].unit_type == "Function"
    assert units["clamp"].parameters == ["v", "lo", "hi"]


def test_parse_php_units(spark):
    units = _units(spark, "repo.php", PHP_SRC)
    assert units["MAX_USERS"].unit_type == "Constant"
    g = units["greet"]
    # $ sigil kept — the reference's name-node text (test_php.rs)
    assert g.unit_type == "Function" and g.parameters == ["$name", "$greeting"]
    assert "Say hello" in g.docstring
    f = units["UserRepo.find"]
    assert f.unit_type == "Method" and f.parent_class == "UserRepo"


def test_parse_ruby_units(spark):
    units = _units(spark, "calc.rb", RUBY_SRC)
    assert units["MAX_RETRIES"].unit_type == "Constant"
    g = units["greet"]
    assert g.unit_type == "Function" and g.language == "ruby"
    assert g.parameters == ["name", "greeting"]
    assert "Greets a person" in g.docstring
    assert units["Calculator"].unit_type == "Class"
    add = units["Calculator.add"]
    assert add.unit_type == "Method" and (add.line, add.end_line) == (9, 11)
    # `do ... end` block inside the method must not break end-matching
    ep = units["Calculator.each_pair"]
    assert (ep.line, ep.end_line) == (13, 17)


def test_search_code_unit_hits_across_languages(spark):
    """search_code returns unit-level hits (not whole-file RawCode) for
    every newly supported language."""
    from next_plaid_spark.operators.colgrep import search_code

    files = spark.createDataFrame(
        [("calc.go", GO_SRC), ("store.ts", TS_SRC), ("Calculator.java", JAVA_SRC),
         ("Greeter.cs", CSHARP_SRC), ("main.c", C_SRC), ("shape.cpp", CPP_SRC),
         ("repo.php", PHP_SRC), ("calc.rb", RUBY_SRC)],
        "path string, content string",
    )
    units = with_unit_ids(parse_code_units(files)).cache()
    assert units.filter(F.col("unit_type") == "RawCode").count() == 0
    langs = {r.language for r in units.select("language").distinct().collect()}
    assert langs == {"go", "typescript", "java", "csharp", "c", "cpp",
                     "php", "ruby"}

    got = search_code(units, "fetch user by id", top_k=5, collapse=False).collect()
    assert got and "fetchUser" in {r.name for r in got}


# -- Layers 2/3/5: called_by, complexity, imports (r5 depth work) -------------

PY_GRAPH = '''import os
import numpy as np
from collections import deque

def helper(x):
    """Shared helper."""
    return x + 1

def caller1(a):
    if a > 0:
        return helper(a)
    for i in range(3):
        a += helper(i)
    return a

def caller2(b):
    return helper(b) if b else 0

def lister(d):
    return os.path.join(d, "x")
'''

RS_GRAPH = '''use std::collections::HashMap;
use serde::Serialize;

/// Shared helper.
fn helper(x: u32) -> u32 { x + 1 }

fn caller(a: u32) -> u32 {
    match a {
        0 => helper(a),
        _ => { if a > 10 { helper(a) } else { a } }
    }
}

fn reader(p: &str) -> String {
    std::fs::read_to_string(p).unwrap()
}
'''

JS_GRAPH = '''import React from 'react';
import { parse } from './utils/parser';
import '@scope/pkg/polyfill';

function helper(x) { return x + 1; }

function caller(a) {
  if (a > 0) { return helper(a); }
  while (a < 10) { a = helper(a); }
  return a;
}

function render() {
  return React.createElement('div');
}
'''


def _units_map(spark, path, src):
    from next_plaid_spark.operators.code_parse import (
        build_call_graph,
        parse_code_units,
    )

    files = spark.createDataFrame([(path, src)], "path string, content string")
    units = build_call_graph(parse_code_units(files))
    return {r.name: r for r in units.collect()}


def test_python_called_by_complexity_imports(spark):
    """Shapes mirror colgrep/src/parser/test_core.rs:670-710: the callee's
    called_by lists every caller by name, sorted unique."""
    by = _units_map(spark, "graph.py", PY_GRAPH)
    assert by["helper"].called_by == ["caller1", "caller2"]
    assert by["caller1"].called_by == []
    # analysis.rs:644-686: 1 + if + for + (ternary in caller2 is its own unit)
    assert by["caller1"].complexity == 3  # 1 + if + for
    assert by["caller2"].complexity == 2  # 1 + conditional_expression
    assert by["helper"].complexity == 1
    # per-unit imports are the reference-FILTERED file imports
    # (extract.rs:69-82): helper/caller1 touch none of the modules, lister
    # uses os.path so "os" survives
    import ast as _ast

    from next_plaid_spark.operators.code_parse import _imports_py

    assert _imports_py(_ast.parse(PY_GRAPH)) == ["os", "numpy", "collections"]
    assert by["helper"].imports == []
    assert by["caller1"].imports == []
    assert by["lister"].imports == ["os"]


def test_rust_called_by_complexity_imports(spark):
    by = _units_map(spark, "graph.rs", RS_GRAPH)
    assert by["helper"].called_by == ["caller"]
    # 1 + match + if (keyword scan over stripped lines)
    assert by["caller"].complexity == 3
    # use first path component (analysis.rs default: split("::")[0]);
    # per-unit filter keeps only modules the unit actually touches
    assert _file_imports(RS_GRAPH, "rust") == ["std", "serde"]
    assert by["caller"].imports == []
    assert by["reader"].imports == ["std"]


def test_js_called_by_complexity_imports(spark):
    by = _units_map(spark, "graph.js", JS_GRAPH)
    assert by["helper"].called_by == ["caller"]
    assert by["caller"].complexity == 3  # 1 + if + while
    # specifier first component; @scope/pkg → pkg; ./utils/parser → utils
    assert _file_imports(JS_GRAPH, "javascript") == ["react", "utils", "pkg"]
    assert by["caller"].imports == []
    assert by["render"].imports == ["react"]  # uses React.createElement


def test_embed_text_carries_call_graph_layers(spark):
    from next_plaid_spark.operators.code_parse import (
        build_call_graph,
        parse_code_units,
        with_unit_ids,
    )
    from next_plaid_spark.operators.colgrep import build_embedding_text

    files = spark.createDataFrame(
        [("graph.py", PY_GRAPH)], "path string, content string"
    )
    units = with_unit_ids(build_call_graph(parse_code_units(files)))
    texts = {r.name: r.embed_text for r in build_embedding_text(units).collect()}
    assert "Called by: caller1, caller2" in texts["helper"]
    # "Uses:" carries the reference-FILTERED imports: helper touches no
    # module (no line at all), lister uses os.path
    assert "Uses:" not in texts["helper"]
    assert "Uses: os" in texts["lister"]
    assert "Calls: helper" in texts["caller1"]
    # Layer 4 data flow (embed.rs:182-185)
    assert "Variables: a" in texts["caller1"]


# -- Layer 4: variables (analysis.rs:690-760) ---------------------------------


def test_python_variables(spark):
    by = _units_map(spark, "graph.py", PY_GRAPH)
    # `a += helper(i)` is an augmented_assignment (reference var kind);
    # the for-loop target `i` is not — analysis.rs:694 counts only
    # assignment / named_expression / augmented_assignment for Python.
    assert by["caller1"].variables == ["a"]
    assert by["helper"].variables == []


def test_astlite_variables(spark):
    rs = '''fn caller(a: u32) -> u32 {
    let mut total = 0;
    let step = a + 1;
    total + step
}
'''
    by = _units_map(spark, "vars.rs", rs)
    assert by["caller"].variables == ["step", "total"]

    js = '''function f(a) {
  const limit = 10;
  let count = 0;
  var old = a;
  return count + limit + old;
}
'''
    by = _units_map(spark, "vars.js", js)
    assert by["f"].variables == ["count", "limit", "old"]

    go = '''package main

func f(a int) int {
	total := 0
	var step int = a
	return total + step
}
'''
    by = _units_map(spark, "vars.go", go)
    assert by["f"].variables == ["step", "total"]


SWIFT_SRC = '''import Foundation

/// Computes the total price including tax.
public func totalPrice(base: Double, tax: Double) -> Double {
    return base * (1.0 + tax)
}

class Cart {
    var items: [String] = []

    func addItem(name: String) {
        items.append(name)
        recalculate()
    }
}

let MAX_ITEMS = 100
'''


def test_parse_swift_units(spark):
    units = _units(spark, "cart.swift", SWIFT_SRC)
    tp = units["totalPrice"]
    assert tp.unit_type == "Function" and tp.language == "swift"
    assert "total price including tax" in tp.docstring
    assert units["Cart"].unit_type == "Class"
    meth = units["Cart.addItem"]
    assert meth.unit_type == "Method" and meth.parent_class == "Cart"
    assert "recalculate" in meth.calls
    assert units["MAX_ITEMS"].unit_type == "Constant"
    # per-unit imports are reference-filtered (extract.rs:69-82); the
    # extraction layer is asserted on the file-level scan
    assert "Foundation" in _file_imports(SWIFT_SRC, "swift")
    assert tp.imports == []  # totalPrice never touches Foundation


KOTLIN_SRC = '''import kotlinx.coroutines.launch

// Formats a user-visible name label.
fun formatName(first: String, last: String): String {
    return "$first $last".trim()
}

data class Account(val id: Long) {
    fun deposit(amount: Long): Long {
        return checkAmount(amount)
    }
}

const val RETRY_LIMIT = 5
'''


def test_parse_kotlin_units(spark):
    units = _units(spark, "account.kt", KOTLIN_SRC)
    fn = units["formatName"]
    assert fn.unit_type == "Function" and fn.language == "kotlin"
    assert "user-visible name label" in fn.docstring
    assert units["Account"].unit_type == "Class"
    dep = units["Account.deposit"]
    assert dep.unit_type == "Method" and "checkAmount" in dep.calls
    assert units["RETRY_LIMIT"].unit_type == "Constant"
    assert "launch" in _file_imports(KOTLIN_SRC, "kotlin")


SCALA_SRC = '''import scala.collection.mutable

// Sums the squares of a list.
def sumSquares(xs: List[Int]): Int = {
    xs.map(x => x * x).sum
}

object MathUtil {
  def clamp(v: Int, lo: Int, hi: Int): Int = {
    math.max(lo, math.min(hi, v))
  }
}

val DEFAULT_SEED = 42
'''


def test_parse_scala_units(spark):
    units = _units(spark, "util.scala", SCALA_SRC)
    ss = units["sumSquares"]
    assert ss.unit_type == "Function" and ss.language == "scala"
    assert "Sums the squares" in ss.docstring
    assert units["MathUtil"].unit_type == "Class"
    cl = units["MathUtil.clamp"]
    assert cl.unit_type == "Method" and cl.parent_class == "MathUtil"
    assert units["DEFAULT_SEED"].unit_type == "Constant"
    assert "mutable" in _file_imports(SCALA_SRC, "scala")


ZIG_SRC = '''const std = @import("std");

/// Returns the larger of two values.
pub fn maxOf(a: i64, b: i64) i64 {
    if (a > b) return a;
    return b;
}

const Config = struct {
    limit: u32,

    fn validate(self: Config) bool {
        return self.limit > 0;
    }
};

const MAX_DEPTH = 32;
'''


def test_parse_zig_units(spark):
    units = _units(spark, "main.zig", ZIG_SRC)
    mo = units["maxOf"]
    assert mo.unit_type == "Function" and mo.language == "zig"
    assert "larger of two values" in mo.docstring
    assert mo.complexity >= 2  # one if branch
    assert units["Config"].unit_type == "Class"
    v = units["Config.validate"]
    assert v.unit_type == "Method" and v.parent_class == "Config"
    assert units["MAX_DEPTH"].unit_type == "Constant"
    assert "std" in _file_imports(ZIG_SRC, "zig")


LUA_SRC = '''local json = require("cjson")

-- Splits a string on a separator.
function split(s, sep)
    local out = {}
    for part in string.gmatch(s, "[^" .. sep .. "]+") do
        table.insert(out, part)
    end
    return out
end

function Router:dispatch(path)
    return self.routes[path]
end

MAX_ROUTES = 128
'''


def test_parse_lua_units(spark):
    units = _units(spark, "router.lua", LUA_SRC)
    sp = units["split"]
    assert sp.unit_type == "Function" and sp.language == "lua"
    assert "Splits a string" in sp.docstring
    assert sp.parameters == ["s", "sep"]
    assert sp.end_line == 10  # the for-do block's end is consumed inside
    d = units["Router.dispatch"]
    assert d.unit_type == "Method" and d.parent_class == "Router"
    assert units["MAX_ROUTES"].unit_type == "Constant"
    assert "cjson" in _file_imports(LUA_SRC, "lua")


JULIA_SRC = '''using LinearAlgebra

# Normalizes a vector to unit length.
function normalize_vec(v)
    n = norm(v)
    if n == 0
        return v
    end
    return v / n
end

struct Point
    x::Float64
    y::Float64
end

const MAX_ITER = 1000
'''


def test_parse_julia_units(spark):
    units = _units(spark, "geo.jl", JULIA_SRC)
    nv = units["normalize_vec"]
    assert nv.unit_type == "Function" and nv.language == "julia"
    assert "Normalizes a vector" in nv.docstring
    assert nv.end_line == 10 and "norm" in nv.calls
    assert units["Point"].unit_type == "Class"
    assert units["MAX_ITER"].unit_type == "Constant"
    assert "LinearAlgebra" in _file_imports(JULIA_SRC, "julia")


ELIXIR_SRC = '''defmodule Geometry do
  alias MyApp.Repo

  @max_sides 12

  # Computes the perimeter of a polygon.
  def perimeter(sides) do
    Enum.sum(sides)
  end

  defp validate(sides) do
    length(sides) <= @max_sides
  end
end
'''


def test_parse_elixir_units(spark):
    units = _units(spark, "geometry.ex", ELIXIR_SRC)
    assert units["Geometry"].unit_type == "Class"
    p = units["Geometry.perimeter"]
    assert p.unit_type == "Method" and p.language == "elixir"
    assert "perimeter of a polygon" in p.docstring
    assert p.parameters == ["sides"] and "sum" in p.calls
    assert units["Geometry.validate"].unit_type == "Method"
    assert units["Geometry.max_sides"].unit_type == "Constant"
    assert "Repo" in _file_imports(ELIXIR_SRC, "elixir")


SQL_SRC = '''-- Users of the system.
CREATE TABLE users (
    id BIGINT PRIMARY KEY,
    name TEXT
);

CREATE OR REPLACE VIEW active_users AS
SELECT * FROM users WHERE active;

CREATE FUNCTION user_count() RETURNS BIGINT AS $$
SELECT count(*) FROM users
$$;
'''


def test_parse_sql_units(spark):
    # reference-fixture shapes since r10 (test_sql.rs): SQL statements are
    # RawCode blocks whose code starts at the leading comment — the embed
    # text is the statement verbatim, no typed header
    units = _units(spark, "schema.sql", SQL_SRC)
    u = units["users"]
    assert u.unit_type == "RawCode" and u.language == "sql"
    assert u.code.startswith("-- Users of the system.\nCREATE TABLE users (")
    assert u.end_line == 5
    assert units["active_users"].unit_type == "RawCode"
    assert units["user_count"].code.rstrip().endswith("$$;")


VUE_SRC = '''<template>
  <div>{{ total }}</div>
</template>

<script>
import axios from 'axios'

function computeTotal(items) {
    return items.reduce((a, b) => a + b.price, 0)
}

export default {
  name: 'Cart'
}
</script>
'''


def test_parse_vue_units(spark):
    units = _units(spark, "Cart.vue", VUE_SRC)
    ct = units["computeTotal"]
    assert ct.unit_type == "Function" and ct.language == "vue"
    assert ct.line == 8  # offset into the SFC, not the script block
    assert "reduce" in ct.calls
    assert "axios" in _file_imports(VUE_SRC, "vue")


CSS_SRC = '''.button {
    color: red;
    padding: 4px;
}

@media (max-width: 600px) {
    .button { padding: 2px; }
}
'''


def test_parse_css_units(spark):
    units = _units(spark, "style.css", CSS_SRC)
    assert units[".button"].unit_type == "RawCode"
    assert units[".button"].end_line == 4
    assert any(k.startswith("@media") for k in units)


HS_SRC = '''module Geometry where

import Data.List (sort)

-- | Computes the area of a rectangle.
area :: Double -> Double -> Double
area w h = w * h

data Shape = Circle Double | Rect Double Double

-- | Sums a list of areas.
totalArea :: [Double] -> Double
totalArea xs = sum (sort xs)
'''


def test_parse_haskell_units(spark):
    # reference-fixture shapes since r10 (test_haskell.rs): the signature
    # is the equation line (type signatures are skipped), and Haskell
    # functions carry no parameters/calls/docstring; data blocks are
    # RawCode
    units = _units(spark, "Geometry.hs", HS_SRC)
    a = units["area"]
    assert a.unit_type == "Function" and a.language == "haskell"
    assert a.signature == "area w h = w * h"
    assert a.parameters == [] and a.docstring is None
    assert units["Shape"].unit_type == "RawCode"
    t = units["totalArea"]
    assert t.signature == "totalArea xs = sum (sort xs)"
    assert "List" in _file_imports(HS_SRC, "haskell")


ML_SRC = '''open Printf

(** Doubles an integer. *)
let double x = 2 * x

let rec fact n =
  if n <= 1 then 1 else n * fact (n - 1)

type point = { x : float; y : float }

let max_depth = 32
'''


def test_parse_ocaml_units(spark):
    units = _units(spark, "math.ml", ML_SRC)
    d = units["double"]
    assert d.unit_type == "Function" and d.language == "ocaml"
    assert "Doubles an integer" in d.docstring
    assert d.parameters == ["x"]
    f = units["fact"]
    # reference-fixture shape since r10 (test_ocaml.rs): the self-call IS
    # extracted (`Calls: factorial` in test_recursive_function)
    assert f.unit_type == "Function" and "fact" in f.calls
    assert units["point"].unit_type == "Class"
    assert units["max_depth"].unit_type == "Constant"
    assert "Printf" in _file_imports(ML_SRC, "ocaml")


R_SRC = '''library(dplyr)

#' Calculates the arithmetic mean of a vector.
calc_mean <- function(x) {
    sum(x) / length(x)
}

# Filter data frame
filter_data <- function(df, column, value) {
    df[df[[column]] == value, ]
}

MAX_ITER <- 1000
'''


def test_parse_r_units(spark):
    """Unit shape from colgrep/src/parser/test_core.rs:195-215 (two
    function_definitions extracted; assignments are variables,
    ast.rs:31,149; no classes for R, ast.rs:100)."""
    units = _units(spark, "stats.r", R_SRC)
    cm = units["calc_mean"]
    assert cm.unit_type == "Function" and cm.language == "r"
    assert "arithmetic mean" in cm.docstring
    assert cm.parameters == ["x"]
    assert cm.end_line == 6
    fd = units["filter_data"]
    assert fd.unit_type == "Function"
    assert fd.parameters == ["df", "column", "value"]
    assert "Filter data frame" in fd.docstring
    assert units["MAX_ITER"].unit_type == "Constant"
    assert "dplyr" in _file_imports(R_SRC, "r")


QML_SRC = '''import Quickshell

PanelWindow {
    id: root
    required property var shell
    readonly property int count: 0
    signal toggled(next: bool)

    function increment(step) {
        return step + 1;
    }

    component FancyChip: Rectangle {
        property string label

        function activate() {
            console.log(label);
        }
    }
}
'''


def test_parse_qml_units(spark):
    """Unit shapes from colgrep/src/parser/tests/test_qml.rs: the root
    object is a Class whose variables are its id/property names; functions
    and signals are Methods of the enclosing object; properties are
    Constants; inline components are Classes without a duplicate object
    unit (variables here are sorted — the repo-wide _variables_scan
    discipline — where the reference keeps declaration order)."""
    units = _units(spark, "shell.qml", QML_SRC)
    root = units["PanelWindow"]
    assert root.unit_type == "Class" and root.language == "qml"
    for v in ("root", "shell", "count"):
        assert v in root.variables
    inc = units["PanelWindow.increment"]
    assert inc.unit_type == "Method" and inc.parent_class == "PanelWindow"
    assert inc.parameters == ["step"]
    sig = units["PanelWindow.toggled"]
    assert sig.unit_type == "Method"
    assert sig.parameters == ["next: bool"]
    shell_p = units["PanelWindow.shell"]
    assert shell_p.unit_type == "Constant"
    assert "property var shell" in shell_p.signature
    chip = units["PanelWindow.FancyChip"]
    assert chip.unit_type == "Class" and chip.parent_class == "PanelWindow"
    act = units["FancyChip.activate"]
    assert act.unit_type == "Method" and act.parent_class == "FancyChip"
    assert "Quickshell" in _file_imports(QML_SRC, "qml")


def test_text_config_formats_are_typed_documents(spark):
    """Text/config formats are first-class Document units with language
    labels matching the reference's detect_language/extract_text_units
    (colgrep/src/parser/language.rs, text.rs:7-123), not RawCode/unknown."""
    files = [
        ("README.md", "# Title\nIntro paragraph line.\n\nBody.", "markdown"),
        ("conf/app.yaml", "server:\n  port: 8080\n", "yaml"),
        ("Cargo.toml", "[package]\nname = \"demo\"\n", "toml"),
        ("data.json", '{"a": 1}', "json"),
        ("deploy.sh", "#!/bin/sh\necho hi\n", "shell"),
        ("run.ps1", "Write-Host 'hi'\n", "powershell"),
        ("notes.txt", "plain text here\n", "text"),
        ("guide.adoc", "= Guide\n", "asciidoc"),
        ("agenda.org", "* TODO things\n", "org"),
        ("svc/Dockerfile", "FROM alpine\nRUN true\n", "dockerfile"),
        ("Makefile", "all:\n\techo hi\n", "makefile"),
    ]
    sdf = spark.createDataFrame(
        [(p, c) for p, c, _ in files], "path string, content string"
    )
    units = {r.file: r for r in parse_code_units(sdf).collect()}
    assert len(units) == len(files)
    for p, content, lang in files:
        u = units[p]
        assert u.language == lang, (p, u.language)
        assert u.unit_type == "Document"
        # name = file stem; signature = first non-empty line
        assert u.name == p.rsplit("/", 1)[-1].rsplit(".", 1)[0]
        assert u.signature == next(
            ln.strip() for ln in content.splitlines() if ln.strip()
        )
        assert u.code == "\n".join(content.splitlines())
    md = units["README.md"]
    # docstring = first paragraph (up to the blank line)
    assert md.docstring == "# Title Intro paragraph line."


def test_html_scripts_plus_rawcode_unit(spark):
    """HTML: <script> content through the JS scanner + the page itself as
    a searchable RawCode unit (colgrep/src/parser/html.rs:1-6)."""
    src = """<html>
<body>
<script>
function greet(name) {
    return "hi " + name;
}
</script>
</body>
</html>"""
    units = _units(spark, "index.html", src)
    fn = units["greet"]
    assert fn.unit_type == "Function" and fn.language == "html"
    assert fn.line == 4  # offset into the page, not the script block
    page = units["index.html"]
    assert page.unit_type == "RawCode" and page.language == "html"
