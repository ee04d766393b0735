package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** XML query documents compile onto the shared Query/SpanQuery ADT
  * (reference surface: QueryParser/Xml/CoreParser.cs builders). */
class XmlQueryParserSpec extends AnyFunSuite {

  private def q(xml: String): Query = XmlQueryParser.parse(xml).toOption.get
  private def s(xml: String): SpanQuery = XmlQueryParser.parse(xml).swap.toOption.get

  test("core query builders") {
    assert(q("<TermQuery boost='2.5'>merge</TermQuery>") === TermQ("merge", 2.5f))
    assert(q("<TermsQuery>Merge TABLE</TermsQuery>") ===
      BoolQ(should = Seq(TermQ("merge"), TermQ("table"))))
    assert(q("<MatchAllDocsQuery/>") === MatchAllQ())
    assert(q("<ConstantScoreQuery boost='3'><TermQuery>x</TermQuery></ConstantScoreQuery>") ===
      ConstantScoreQ(TermQ("x"), 3f))
    assert(q("<DisjunctionMaxQuery tieBreaker='0.1'><TermQuery>a</TermQuery><TermQuery>b</TermQuery></DisjunctionMaxQuery>") ===
      DisMaxQ(Seq(TermQ("a"), TermQ("b")), 0.1f))
    assert(q("<RangeQuery lowerTerm='aaa' upperTerm='bbb' includeUpper='false'/>") ===
      TermRangeQ("aaa", "bbb", includeLower = true, includeUpper = false))
    assert(q("<UserQuery>merge AND table</UserQuery>") ===
      new QueryParser(graft.analysis.Analyzer.sqlParity).parse("merge AND table"))
  }

  test("BooleanQuery clauses route by occurs; msm attribute") {
    val b = q(
      """<BooleanQuery minimumNumberShouldMatch="1">
        |  <Clause occurs="must"><TermQuery>m</TermQuery></Clause>
        |  <Clause occurs="should"><TermQuery>s1</TermQuery></Clause>
        |  <Clause occurs="should"><TermQuery>s2</TermQuery></Clause>
        |  <Clause occurs="mustnot"><TermQuery>n</TermQuery></Clause>
        |</BooleanQuery>""".stripMargin).asInstanceOf[BoolQ]
    assert(b.must === Seq(TermQ("m")))
    assert(b.should === Seq(TermQ("s1"), TermQ("s2")))
    assert(b.mustNot === Seq(TermQ("n")))
    assert(b.minShouldMatch === 1)
  }

  test("BoostingQuery: demotion from the BoostQuery child, root boost is overall") {
    // BoostingQueryBuilder.cs:45-51 — the demotion factor is the
    // BoostQuery CHILD's boost attribute (default 0.01); the root's
    // boost attribute scales the whole query
    val plain = q(
      """<BoostingQuery>
        |  <Query><TermQuery>pos</TermQuery></Query>
        |  <BoostQuery boost="0.2"><TermQuery>ctx</TermQuery></BoostQuery>
        |</BoostingQuery>""".stripMargin).asInstanceOf[BoostingQ]
    assert(plain === BoostingQ(TermQ("pos"), TermQ("ctx"), 0.2f))
    val dflt = q(
      """<BoostingQuery>
        |  <Query><TermQuery>pos</TermQuery></Query>
        |  <BoostQuery><TermQuery>ctx</TermQuery></BoostQuery>
        |</BoostingQuery>""".stripMargin).asInstanceOf[BoostingQ]
    assert(dflt.contextBoost === 0.01f)
    val boosted = q(
      """<BoostingQuery boost="2.0">
        |  <Query><TermQuery>pos</TermQuery></Query>
        |  <BoostQuery><TermQuery>ctx</TermQuery></BoostQuery>
        |</BoostingQuery>""".stripMargin).asInstanceOf[FunctionScoreQ]
    assert(boosted.q === BoostingQ(TermQ("pos"), TermQ("ctx"), 0.01f))
    assert(boosted.expr ===
      ScoreExpr.Mul(ScoreExpr.SubScore, ScoreExpr.Const(2.0f)))
  }

  test("span builders produce SpanQuery trees (Left)") {
    assert(s("<SpanTerm>x</SpanTerm>") === SpanTermQ("x"))
    assert(s("<SpanOrTerms>A b</SpanOrTerms>") ===
      SpanOrQ(Seq(SpanTermQ("a"), SpanTermQ("b"))))
    val near = s(
      """<SpanNear slop="2" inOrder="false">
        |  <SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm>
        |</SpanNear>""".stripMargin).asInstanceOf[SpanNearQ]
    assert(near.slop === 2 && !near.inOrder)
    // inOrder DEFAULTS false (SpanNearBuilder.cs:41); slop is mandatory
    val dflt = s(
      """<SpanNear slop="1">
        |  <SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm>
        |</SpanNear>""".stripMargin).asInstanceOf[SpanNearQ]
    assert(!dflt.inOrder)
    assertThrows[IllegalArgumentException](s(
      "<SpanNear><SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm></SpanNear>"))
    assert(s("<SpanFirst end='3'><SpanTerm>a</SpanTerm></SpanFirst>") ===
      SpanFirstQ(SpanTermQ("a"), 3))
    val not = s(
      """<SpanNot>
        |  <Include><SpanTerm>a</SpanTerm></Include>
        |  <Exclude><SpanTerm>b</SpanTerm></Exclude>
        |</SpanNot>""".stripMargin)
    assert(not === SpanNotQ(SpanTermQ("a"), SpanTermQ("b")))
  }

  test("unknown elements and doctypes are rejected") {
    assertThrows[IllegalArgumentException](q("<FrobQuery>x</FrobQuery>"))
    assertThrows[Exception](XmlQueryParser.parse(
      "<!DOCTYPE foo [<!ENTITY x SYSTEM 'file:///etc/passwd'>]><TermQuery>&x;</TermQuery>"))
  }
}
