package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiled score/sort expressions (reference:
  * /root/reference/src/Lucene.Net.Expressions/JS/JavascriptCompiler.cs and
  * the public Javascript.g grammar it embeds; function table:
  * JS/JavascriptCompiler.properties). The reference compiles the
  * expression to IL bytecode over per-document ValueSource bindings; the
  * Spark-first equivalent compiles it to a Catalyst [[Column]] tree over
  * named column bindings — whole-stage codegen then JIT-compiles it
  * exactly once per stage, so the "compiled expression" property is
  * preserved without any bytecode emission of our own.
  *
  * Supported surface (= the reference grammar):
  *   - all values are doubles; booleans are 1.0 / 0.0, "true" ⇔ ≠ 0
  *   - operators by precedence (low→high): `?:`  `||`  `&&`  `|`  `^`
  *     `&`  `==` `!=`  `<` `<=` `>` `>=`  `<<` `>>` `>>>`  `+` `-`
  *     `*` `/` `%`  unary `+ - ! ~`
  *   - bitwise/shift ops truncate to long and return double, like the
  *     reference's IL casts; shift counts must be constants (Spark's
  *     shiftleft/shiftright take literal bit counts)
  *   - functions: abs acos acosh asin asinh atan atan2 atanh ceil cos
  *     cosh exp floor haversin ln log10 logn max min pow sin sinh sqrt
  *     tan tanh (haversin uses the geocentric-radius formula rather than
  *     the reference's precomputed per-latitude diameter table — ~same
  *     values, table-free)
  *   - variables: identifiers (dots and [..] kept verbatim) resolved
  *     against the caller's bindings map (≙ SimpleBindings; `_score` is
  *     just another binding)
  *   - literals: decimal and 0x hex
  */
object Javascript {

  /** Compile `src` to a Column; unknown variables throw immediately
    * (≙ JavascriptCompiler's unbound-variable error at compile time). */
  def compile(src: String, bindings: Map[String, Column]): Column = {
    val p = new Parser(src, bindings)
    val c = p.expression()
    p.expectEnd()
    c
  }

  private val Funcs1: Map[String, Column => Column] = Map(
    "abs" -> abs, "acos" -> acos, "acosh" -> acosh, "asin" -> asin,
    "asinh" -> asinh, "atan" -> atan, "atanh" -> atanh,
    "ceil" -> ((c: Column) => ceil(c).cast("double")), "cos" -> cos,
    "cosh" -> cosh, "exp" -> exp,
    "floor" -> ((c: Column) => floor(c).cast("double")), "ln" -> log,
    "log10" -> log10, "sin" -> sin, "sinh" -> sinh, "sqrt" -> sqrt,
    "tan" -> tan, "tanh" -> tanh)

  private val Funcs2: Map[String, (Column, Column) => Column] = Map(
    "atan2" -> ((y: Column, x: Column) => atan2(y, x)),
    "logn" -> ((base: Column, x: Column) => ieeeDiv(log(x), log(base))),
    "max" -> ((a: Column, b: Column) => greatest(a, b)),
    "min" -> ((a: Column, b: Column) => least(a, b)),
    "pow" -> ((a: Column, b: Column) => pow(a, b)))

  /** Great-circle distance in km (SloppyMath.Haversin shape; geocentric
    * WGS84 radius at the mean latitude instead of the lookup table). */
  private def haversin(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val toRad = math.Pi / 180d
    val x1 = lat1 * toRad
    val x2 = lat2 * toRad
    val h1 = lit(1d) - cos(x1 - x2)
    val h2 = lit(1d) - cos((lon1 - lon2) * toRad)
    val h = (h1 + cos(x1) * cos(x2) * h2) / 2d
    val avg = (x1 + x2) / 2d
    // geocentric radius of the WGS84 ellipsoid at latitude `avg`
    val a = lit(6378.137d); val b = lit(6356.7523142d)
    val ca = cos(avg) * a; val sb = sin(avg) * b
    val r = sqrt((pow(a * ca, 2d) + pow(b * sb, 2d)) / (pow(ca, 2d) + pow(sb, 2d)))
    r * lit(2d) * asin(least(lit(1d), sqrt(h)))
  }

  private def bool(c: Column): Column = c =!= lit(0d)
  private def asDouble(c: Column): Column = when(c, lit(1d)).otherwise(lit(0d))

  /** IEEE double division/remainder. Spark's non-ANSI Divide/Remainder
    * return NULL on a zero divisor, but the reference compiles to IL
    * double arithmetic where x/0 = ±Infinity and 0/0 = x%0 = NaN — and
    * a null here would silently coerce to false/0 in every downstream
    * boolean/score context. (A -0.0 divisor is treated as +0 — sign-of-
    * zero is not recoverable through Catalyst comparisons; stated
    * simplification.) */
  private def ieeeDiv(a: Column, b: Column): Column =
    when(b === lit(0d),
      when(a > lit(0d), lit(Double.PositiveInfinity))
        .when(a < lit(0d), lit(Double.NegativeInfinity))
        .otherwise(lit(Double.NaN)))
      .otherwise(a / b)
  private def ieeeMod(a: Column, b: Column): Column =
    when(b === lit(0d), lit(Double.NaN)).otherwise(a % b)

  private final class Parser(src: String, bindings: Map[String, Column]) {
    private var i = 0
    private def ws(): Unit = while (i < src.length && src(i).isWhitespace) i += 1
    private def peekOp(ops: String*): Option[String] = {
      ws()
      // longest-first so "<<" wins over "<"
      ops.sortBy(-_.length).find(op => src.startsWith(op, i) && {
        // "<" must not match the "<" of "<<" nor "<=": callers pass all
        // longer variants, so longest-first suffices except for `>` vs
        // `>>>` when only `>` is asked for — guard by peeking further
        true
      })
    }
    private def eat(op: String): Unit = { ws(); require(src.startsWith(op, i), s"expected '$op' at $i in '$src'"); i += op.length }
    private def tryEat(ops: String*): Option[String] =
      peekOp(ops: _*).map { op => i += op.length; op }

    def expectEnd(): Unit = { ws(); require(i >= src.length, s"dangling input at '${src.substring(i)}'") }

    // grammar, lowest precedence first (≙ Javascript.g conditional..unary)
    def expression(): Column = conditional()

    private def conditional(): Column = {
      val c = logicalOr()
      ws()
      if (i < src.length && src(i) == '?') {
        i += 1
        val t = conditional(); eat(":"); val f = conditional()
        when(bool(c), t).otherwise(f)
      } else c
    }

    private def logicalOr(): Column = {
      var c = logicalAnd()
      while (tryEat("||").isDefined) c = asDouble(bool(c) || bool(logicalAnd()))
      c
    }
    private def logicalAnd(): Column = {
      var c = bitOr()
      while (tryEat("&&").isDefined) c = asDouble(bool(c) && bool(bitOr()))
      c
    }
    private def bitOr(): Column = {
      var c = bitXor()
      ws()
      while (i < src.length && src(i) == '|' && !src.startsWith("||", i)) {
        i += 1; c = longOp(c, bitXor())(_ bitwiseOR _)
      }
      c
    }
    private def bitXor(): Column = {
      var c = bitAnd()
      while (tryEat("^").isDefined) c = longOp(c, bitAnd())(_ bitwiseXOR _)
      c
    }
    private def bitAnd(): Column = {
      var c = equality()
      ws()
      while (i < src.length && src(i) == '&' && !src.startsWith("&&", i)) {
        i += 1; c = longOp(c, equality())(_ bitwiseAND _)
      }
      c
    }
    private def longOp(a: Column, b: Column)(f: (Column, Column) => Column): Column =
      f(a.cast("long"), b.cast("long")).cast("double")

    private def equality(): Column = {
      var c = relational()
      var op = tryEat("==", "!=")
      while (op.isDefined) {
        val r = relational()
        c = asDouble(if (op.get == "==") c === r else c =!= r)
        op = tryEat("==", "!=")
      }
      c
    }
    private def relational(): Column = {
      var c = shift()
      var op = tryEatRel()
      while (op.isDefined) {
        val r = shift()
        c = asDouble(op.get match {
          case "<" => c < r; case "<=" => c <= r
          case ">" => c > r; case ">=" => c >= r
        })
        op = tryEatRel()
      }
      c
    }
    /** `<`/`>` only when NOT part of a shift operator. */
    private def tryEatRel(): Option[String] = {
      ws()
      if (src.startsWith("<=", i)) { i += 2; Some("<=") }
      else if (src.startsWith(">=", i)) { i += 2; Some(">=") }
      else if (i < src.length && src(i) == '<' && !src.startsWith("<<", i)) { i += 1; Some("<") }
      else if (i < src.length && src(i) == '>' && !src.startsWith(">>", i)) { i += 1; Some(">") }
      else None
    }

    private def shift(): Column = {
      var c = additive()
      var op = tryEat(">>>", "<<", ">>")
      while (op.isDefined) {
        val bits = constShift()
        c = op.get match {
          case "<<" => shiftleft(c.cast("long"), bits).cast("double")
          case ">>" => shiftright(c.cast("long"), bits).cast("double")
          case ">>>" => shiftrightunsigned(c.cast("long"), bits).cast("double")
        }
        op = tryEat(">>>", "<<", ">>")
      }
      c
    }
    /** Spark's shift functions take literal bit counts. */
    private def constShift(): Int = {
      ws()
      val start = i
      while (i < src.length && src(i).isDigit) i += 1
      require(i > start, s"shift amount must be an integer constant at $start in '$src'")
      src.substring(start, i).toInt
    }

    private def additive(): Column = {
      var c = multiplicative()
      var op = tryEat("+", "-")
      while (op.isDefined) {
        val r = multiplicative()
        c = if (op.get == "+") c + r else c - r
        op = tryEat("+", "-")
      }
      c
    }
    private def multiplicative(): Column = {
      var c = unary()
      var op = tryEat("*", "/", "%")
      while (op.isDefined) {
        val r = unary()
        c = op.get match {
          case "*" => c * r
          case "/" => ieeeDiv(c, r)
          case "%" => ieeeMod(c, r)
        }
        op = tryEat("*", "/", "%")
      }
      c
    }
    private def unary(): Column = {
      ws()
      if (i >= src.length) throw new IllegalArgumentException(s"unexpected end of '$src'")
      src(i) match {
        case '+' => i += 1; unary()
        case '-' => i += 1; -unary()
        case '!' => i += 1; asDouble(!bool(unary()))
        case '~' => i += 1; bitwise_not(unary().cast("long")).cast("double")
        case _ => postfix()
      }
    }

    private def postfix(): Column = {
      ws()
      val c = src(i)
      if (c == '(') { i += 1; val e = expression(); eat(")"); e }
      else if (c.isDigit || c == '.') number()
      else if (c.isLetter || c == '_' || c == '$') identifier()
      else throw new IllegalArgumentException(s"unexpected '$c' at $i in '$src'")
    }

    private def number(): Column = {
      val start = i
      if (src.startsWith("0x", i) || src.startsWith("0X", i)) {
        i += 2
        while (i < src.length && (src(i).isDigit || "abcdefABCDEF".contains(src(i)))) i += 1
        lit(java.lang.Long.parseLong(src.substring(start + 2, i), 16).toDouble)
      } else {
        while (i < src.length && (src(i).isDigit || src(i) == '.')) i += 1
        // exponent part
        if (i < src.length && (src(i) == 'e' || src(i) == 'E')) {
          i += 1
          if (i < src.length && (src(i) == '+' || src(i) == '-')) i += 1
          while (i < src.length && src(i).isDigit) i += 1
        }
        lit(src.substring(start, i).toDouble)
      }
    }

    /** VARIABLE or function call. Variables may contain `.` and `[...]`
      * segments (Javascript.g VARIABLE), kept verbatim as binding keys. */
    private def identifier(): Column = {
      val start = i
      while (i < src.length && (src(i).isLetterOrDigit || src(i) == '_' || src(i) == '$')) i += 1
      var name = src.substring(start, i)
      ws()
      if (i < src.length && src(i) == '(') {
        i += 1
        val args = Seq.newBuilder[Column]
        ws()
        if (i < src.length && src(i) != ')') {
          args += expression()
          while ({ ws(); i < src.length && src(i) == ',' }) { i += 1; args += expression() }
        }
        eat(")")
        val as = args.result()
        name match {
          case f if Funcs1.contains(f) =>
            require(as.length == 1, s"$f takes 1 argument"); Funcs1(f)(as.head)
          case f if Funcs2.contains(f) =>
            require(as.length == 2, s"$f takes 2 arguments"); Funcs2(f)(as(0), as(1))
          case "haversin" =>
            require(as.length == 4, "haversin takes 4 arguments")
            haversin(as(0), as(1), as(2), as(3))
          case other => throw new IllegalArgumentException(s"unknown function: $other")
        }
      } else {
        // dotted / bracketed variable segments
        var more = true
        while (more && i < src.length) {
          if (src(i) == '.') {
            val seg = i
            i += 1
            while (i < src.length && (src(i).isLetterOrDigit || src(i) == '_' || src(i) == '$')) i += 1
            name += src.substring(seg, i)
          } else if (src(i) == '[') {
            val seg = i
            while (i < src.length && src(i) != ']') i += 1
            require(i < src.length, s"unterminated [ in '$src'")
            i += 1
            name += src.substring(seg, i)
          } else more = false
        }
        bindings.getOrElse(name,
          throw new IllegalArgumentException(s"unbound variable: $name"))
      }
    }
  }
}
