package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** Surround syntax → SrndQuery AST → span algebra (reference grammar:
  * /root/reference/src/Lucene.Net.QueryParser/Surround/Parser/QueryParser.cs;
  * distance → SpanNear mapping: Surround/Query/DistanceQuery.cs:108). */
class SurroundSpec extends AnyFunSuite {
  import Surround._

  test("precedence: OR < AND < NOT < N < W") {
    assert(parse("a OR b") === SrndOr(Seq(SrndTerm("a"), SrndTerm("b"))))
    assert(parse("a AND b OR c") ===
      SrndOr(Seq(SrndAnd(Seq(SrndTerm("a"), SrndTerm("b"))), SrndTerm("c"))))
    assert(parse("a NOT b AND c") ===
      SrndAnd(Seq(SrndNot(SrndTerm("a"), Seq(SrndTerm("b"))), SrndTerm("c"))))
    assert(parse("a 3n b NOT c") ===
      SrndNot(SrndDistance(Seq(SrndTerm("a"), SrndTerm("b")), 3, ordered = false),
        Seq(SrndTerm("c"))))
    assert(parse("a 3w b 2n c") ===
      SrndDistance(Seq(
        SrndDistance(Seq(SrndTerm("a"), SrndTerm("b")), 3, ordered = true),
        SrndTerm("c")), 2, ordered = false),
      "W binds tighter than N; distance queries nest")
  }

  test("W is ordered, N unordered; bare ops mean distance 1; case-insensitive") {
    assert(parse("a w b") === SrndDistance(Seq(SrndTerm("a"), SrndTerm("b")), 1, ordered = true))
    assert(parse("a N b") === SrndDistance(Seq(SrndTerm("a"), SrndTerm("b")), 1, ordered = false))
    assert(parse("a 5W b") === SrndDistance(Seq(SrndTerm("a"), SrndTerm("b")), 5, ordered = true))
    assert(parse("a and b") === SrndAnd(Seq(SrndTerm("a"), SrndTerm("b"))))
  }

  test("prefix operator forms are n-ary") {
    assert(parse("3W(a, b, c)") ===
      SrndDistance(Seq(SrndTerm("a"), SrndTerm("b"), SrndTerm("c")), 3, ordered = true))
    assert(parse("OR(a, b, c)") === SrndOr(Seq(SrndTerm("a"), SrndTerm("b"), SrndTerm("c"))))
    assert(parse("AND(a, N(b, c))") ===
      SrndAnd(Seq(SrndTerm("a"),
        SrndDistance(Seq(SrndTerm("b"), SrndTerm("c")), 1, ordered = false))))
  }

  test("truncation, weights, field prefix, parens") {
    assert(parse("app*") === SrndPrefix("app"))
    assert(parse("a?p*le") === SrndTrunc("a?p*le"))
    assert(parse("merge^2") === SrndTerm("merge", 2f))
    assert(parse("content: merge") === SrndTerm("merge"))
    assert(parse("(a OR b) AND c") ===
      SrndAnd(Seq(SrndOr(Seq(SrndTerm("a"), SrndTerm("b"))), SrndTerm("c"))))
    // field prefix recurses into a full primary (the reference's
    // FieldsQuery production): parenthesized and chained forms parse,
    // and a trailing 'field:' is a parse ERROR, not an index crash
    assert(parse("title:(a 3w b)") ===
      SrndDistance(Seq(SrndTerm("a"), SrndTerm("b")), 3, ordered = true))
    assert(parse("a:b:merge") === SrndTerm("merge"))
    assert(parse("title:app*") === SrndPrefix("app"))
    assertThrows[IllegalArgumentException](parse("title:"))
  }

  test("distance subtree compiles to span algebra; slop = distance - 1") {
    assert(toSpan(parse("a 3w b")) ===
      SpanNearQ(Seq(SpanTermQ("a"), SpanTermQ("b")), 2, inOrder = true))
    assert(toSpan(parse("(a OR app*) 2N b")) ===
      SpanNearQ(Seq(SpanOrQ(Seq(SpanTermQ("a"), SpanMultiTermQ(PrefixQ("app")))),
        SpanTermQ("b")), 1, inOrder = false))
    assertThrows[IllegalArgumentException] {
      toSpan(parse("W(a AND b, c)")) // AND under a distance op is rejected
    }
  }

  test("w/n as distance ops are left-associative like the reference grammar") {
    assert(parse("a w b w c") ===
      SrndDistance(Seq(
        SrndDistance(Seq(SrndTerm("a"), SrndTerm("b")), 1, ordered = true),
        SrndTerm("c")), 1, ordered = true))
  }
}
