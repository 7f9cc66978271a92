package graft.util

import org.scalatest.funsuite.AnyFunSuite

class MiniJsonSpec extends AnyFunSuite {

  test("parses nesting, numbers, strings, booleans, null") {
    val v = MiniJson.parse(
      """{"a": [1, -2.5, "x", true, null], "b": {"c": 7}, "d": ""}""")
    val o = MiniJson.obj(v)
    assert(MiniJson.arr(o("a")) === Vector(1L, -2.5, "x", true, null))
    assert(MiniJson.long(MiniJson.obj(o("b"))("c")) === 7L)
    assert(MiniJson.str(o("d")) === "")
  }

  test("string escapes including unicode") {
    assert(MiniJson.parse("\"a\\n\\\"b\\\"\\u00e9\\\\\"") === "a\n\"b\"é\\")
  }

  test("empty containers and whitespace tolerance") {
    assert(MiniJson.parse(" { } ") === Map.empty)
    assert(MiniJson.parse("[\n]") === Vector.empty)
  }

  test("integral numbers come back as Long, floats as Double") {
    assert(MiniJson.parse("12345678901234") === 12345678901234L)
    assert(MiniJson.parse("1e3") === 1000.0)
  }

  test("rejects trailing garbage and malformed input") {
    intercept[IllegalArgumentException](MiniJson.parse("{} x"))
    intercept[IllegalArgumentException](MiniJson.parse("{\"a\" 1}"))
  }
}
