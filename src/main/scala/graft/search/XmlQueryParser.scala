package graft.search

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Element, Node}

/** XML query syntax (reference: /root/reference/src/Lucene.Net.QueryParser/
  * Xml/CoreParser.cs and its builder registry under Xml/Builders/): each
  * element name maps to a query constructor; attributes carry options
  * (`boost`, `slop`, `inOrder`, `occurs`, …); `UserQuery` defers to the
  * classic parser. The DOM walk builds the same [[Query]]/[[SpanQuery]]
  * ADT every other front-end targets, so execution, planning and oracles
  * are shared. Namespace-free subset = the reference's core builders:
  * TermQuery, TermsQuery, BooleanQuery, DisjunctionMaxQuery,
  * ConstantScoreQuery, RangeQuery, MatchAllDocsQuery, UserQuery,
  * BoostingQuery, SpanTerm/SpanOr/SpanOrTerms/SpanNear/SpanFirst/SpanNot.
  */
object XmlQueryParser {

  /** Parse an XML query document; span-rooted documents land Left. */
  def parse(xml: String): Either[SpanQuery, Query] = {
    val f = DocumentBuilderFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = f.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    val root = doc.getDocumentElement
    if (isSpan(root.getTagName)) Left(span(root)) else Right(query(root))
  }

  private def isSpan(tag: String): Boolean =
    Set("SpanTerm", "SpanOr", "SpanOrTerms", "SpanNear", "SpanFirst", "SpanNot")
      .contains(tag)

  private def children(e: Element): Seq[Element] = {
    val nl = e.getChildNodes
    (0 until nl.getLength).map(nl.item).collect {
      case el: Element => el
    }
  }
  private def attr(e: Element, name: String, dflt: String): String = {
    val v = e.getAttribute(name)
    if (v == null || v.isEmpty) dflt else v
  }
  private def boost(e: Element): Float = attr(e, "boost", "1.0").toFloat
  private def text(e: Element): String = e.getTextContent.trim

  /** The classic-analyzer split TermsQueryBuilder applies: here the
    * SQL-parity analyzer, matching every other front-end. */
  private def terms(e: Element): Seq[String] =
    graft.analysis.Analyzer.sqlParity.analyzeTerms(text(e)).toSeq

  def query(e: Element): Query = e.getTagName match {
    case "TermQuery" => TermQ(text(e), boost(e))
    case "TermsQuery" => // analyzed OR over terms (TermsQueryBuilder.cs)
      BoolQ(should = terms(e).map(TermQ(_)), boost = boost(e))
    case "MatchAllDocsQuery" => MatchAllQ(boost(e))
    case "ConstantScoreQuery" => ConstantScoreQ(query(children(e).head), boost(e))
    case "DisjunctionMaxQuery" =>
      DisMaxQ(children(e).map(query), attr(e, "tieBreaker", "0").toFloat)
    case "RangeQuery" | "TermRangeQuery" =>
      TermRangeQ(attr(e, "lowerTerm", null), attr(e, "upperTerm", null),
        attr(e, "includeLower", "true").toBoolean,
        attr(e, "includeUpper", "true").toBoolean, boost(e))
    case "UserQuery" =>
      new QueryParser(graft.analysis.Analyzer.sqlParity).parse(text(e))
    case "BoostingQuery" =>
      // the DEMOTION factor lives on the BoostQuery CHILD (default 0.01);
      // the root's boost attribute is the overall query boost
      // (BoostingQueryBuilder.cs:45-51)
      val kids = children(e).map(c => c.getTagName -> c).toMap
      val bq = BoostingQ(
        query(children(kids("Query")).head),
        query(children(kids("BoostQuery")).head),
        attr(kids("BoostQuery"), "boost", "0.01").toFloat)
      val overall = boost(e)
      if (overall == 1.0f) bq
      else FunctionScoreQ(bq,
        ScoreExpr.Mul(ScoreExpr.SubScore, ScoreExpr.Const(overall)))
    case "BooleanQuery" =>
      val clauses = children(e).filter(_.getTagName == "Clause")
      def occ(o: String) = clauses
        .filter(c => attr(c, "occurs", "should").equalsIgnoreCase(o))
        .map(c => query(children(c).head))
      BoolQ(must = occ("must"), should = occ("should"), mustNot = occ("mustnot"),
        minShouldMatch = attr(e, "minimumNumberShouldMatch", "0").toInt,
        boost = boost(e))
    case other => throw new IllegalArgumentException(s"unknown query element <$other>")
  }

  def span(e: Element): SpanQuery = e.getTagName match {
    case "SpanTerm" => SpanTermQ(text(e))
    case "SpanOr" => SpanOrQ(children(e).map(span))
    case "SpanOrTerms" => SpanOrQ(terms(e).map(SpanTermQ)) // analyzed union
    case "SpanNear" =>
      // slop is MANDATORY and inOrder defaults FALSE (SpanNearBuilder.cs:
      // 39-41 GetAttributeOrFail / GetAttribute(e, "inOrder", false)) —
      // a true default would silently drop unordered matches
      val slopStr = e.getAttribute("slop")
      require(slopStr != null && slopStr.nonEmpty, "SpanNear requires a slop attribute")
      SpanNearQ(children(e).map(span), slopStr.toInt,
        inOrder = attr(e, "inOrder", "false").toBoolean)
    case "SpanFirst" => SpanFirstQ(span(children(e).head), attr(e, "end", "1").toInt)
    case "SpanNot" =>
      val kids = children(e).map(c => c.getTagName -> c).toMap
      SpanNotQ(span(children(kids("Include")).head),
        span(children(kids("Exclude")).head))
    case other => throw new IllegalArgumentException(s"unknown span element <$other>")
  }
}
