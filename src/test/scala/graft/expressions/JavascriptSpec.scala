package graft.expressions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compiled JS-subset expressions → Catalyst Columns (reference surface:
  * Lucene.Net.Expressions/JS/JavascriptCompiler.cs + Javascript.g;
  * closed-form expectations follow the grammar's double semantics). */
class JavascriptSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Evaluate `src` once over a single row with the given bindings. */
  private def eval(src: String, vars: (String, Double)*): Double = {
    val df = spark.range(1).select(vars.map { case (n, v) => lit(v).as(n) }: _*)
    val bindings = vars.map { case (n, _) => n -> col(n) }.toMap
    df.select(Javascript.compile(src, bindings).cast("double")).head().getDouble(0)
  }

  test("arithmetic, precedence, parens, unary") {
    assert(eval("1 + 2 * 3") === 7d)
    assert(eval("(1 + 2) * 3") === 9d)
    assert(eval("-x + 10", "x" -> 4) === 6d)
    assert(eval("10 % 3") === 1d)
    assert(eval("2.5e2 + 0x10") === 266d)
    assert(eval("7 / 2") === 3.5d)
  }

  test("division by zero follows IEEE doubles like the reference's IL, never null") {
    // Spark's non-ANSI Divide returns NULL on /0; the compiled surface
    // must restore x/0 = ±Inf, 0/0 = x%0 = NaN and keep booleans sane
    assert(eval("1 / x", "x" -> 0).isPosInfinity)
    assert(eval("-1 / x", "x" -> 0).isNegInfinity)
    assert(eval("0 / x", "x" -> 0).isNaN)
    assert(eval("5 % x", "x" -> 0).isNaN)
    assert(eval("1 / x > 2 ? 10 : 20", "x" -> 0) === 10d, "Inf is truthy and > 2")
    assert(eval("1 / x > 0", "x" -> 0) === 1d)
  }

  test("comparison and boolean ops return 1/0; truthiness is != 0") {
    assert(eval("3 > 2") === 1d)
    assert(eval("3 < 2") === 0d)
    assert(eval("2 >= 2 && 1 < 3") === 1d)
    assert(eval("0 || 2") === 1d)
    assert(eval("!0") === 1d)
    assert(eval("!42") === 0d)
    assert(eval("x == 4", "x" -> 4) === 1d)
    assert(eval("x != 4", "x" -> 4) === 0d)
  }

  test("ternary chooses on truthiness") {
    assert(eval("x > 2 ? 10 : 20", "x" -> 3) === 10d)
    assert(eval("x > 2 ? 10 : 20", "x" -> 1) === 20d)
    assert(eval("x ? y : 5", "x" -> 0, "y" -> 9) === 5d)
  }

  test("bitwise and shift operate on long casts") {
    assert(eval("6 & 3") === 2d)
    assert(eval("6 | 3") === 7d)
    assert(eval("6 ^ 3") === 5d)
    assert(eval("~0") === -1d)
    assert(eval("1 << 4") === 16d)
    assert(eval("256 >> 2") === 64d)
    assert(eval("-8 >>> 60") === 15d)
    assert(eval("6.9 & 3") === 2d, "doubles truncate to long first")
  }

  test("function table matches the reference's properties file") {
    assert(eval("abs(-3)") === 3d)
    assert(eval("sqrt(16)") === 4d)
    assert(eval("pow(2, 10)") === 1024d)
    assert(eval("min(3, 2) + max(3, 2)") === 5d)
    assert(math.abs(eval("ln(exp(1))") - 1d) < 1e-12)
    assert(eval("log10(1000)") === 3d)
    assert(math.abs(eval("logn(2, 8)") - 3d) < 1e-12)
    assert(eval("ceil(1.2) + floor(1.8)") === 3d)
    assert(math.abs(eval("atan2(1, 1)") - math.Pi / 4) < 1e-12)
    assert(math.abs(eval("cosh(0) + sinh(0) + tanh(0)") - 1d) < 1e-12)
    assert(math.abs(eval("acosh(1) + asinh(0) + atanh(0)")) < 1e-12)
    // great-circle: equator quarter-turn ≈ 10,010 km (within 0.5%)
    val q = eval("haversin(0, 0, 0, 90)")
    assert(math.abs(q - 10010d) < 50d, s"haversin quarter turn was $q")
  }

  test("variables: bindings, dotted and bracketed names, _score") {
    assert(eval("_score * 2", "_score" -> 3) === 6d)
    val df = spark.range(1).select(lit(5d).as("v"))
    val c = Javascript.compile("doc.popularity + doc['boost']",
      Map("doc.popularity" -> col("v"), "doc['boost']" -> col("v")))
    assert(df.select(c).head().getDouble(0) === 10d)
  }

  test("compile errors: unbound variable, unknown function, dangling input") {
    assertThrows[IllegalArgumentException](eval("nope + 1"))
    assertThrows[IllegalArgumentException](eval("frobnicate(1)"))
    assertThrows[IllegalArgumentException](eval("1 + 2 )"))
  }

  test("stays inside codegen: compiled expression is a pure Column tree") {
    val df = spark.range(100).select(col("id").cast("double").as("x"))
    val out = df.select(Javascript.compile(
      "x > 50 ? sqrt(x) * ln(x + 1) : -x / 2", Map("x" -> col("x"))).as("y"))
    val plan = out.queryExecution.executedPlan.toString
    // `*(n)` is the WholeStageCodegen marker in the compact plan form
    assert(plan.contains("*(1)"), s"expected codegen:\n$plan")
    assert(out.count() === 100)
  }
}
