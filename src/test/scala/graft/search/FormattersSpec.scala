package graft.search

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Analyzer

/** Highlighter formatter pack + suggester dictionary adapters. */
class FormattersSpec extends AnyFunSuite {
  import Highlighter._

  test("html encoder escapes the five specials") {
    assert(Formatters.htmlEncode("""a<b>&"c'""") ==
      "a&lt;b&gt;&amp;&quot;c&#x27;")
    assert(Formatters.htmlEncode("plain") == "plain")
  }

  test("gradient formatter interpolates linearly and clamps") {
    val g = Formatters.Gradient(10f,
      minForegroundColor = Some("#000000"), maxForegroundColor = Some("#ffffff"))
    assert(g.foreground(0f).contains("#000000"))
    assert(g.foreground(10f).contains("#ffffff"))
    assert(g.foreground(5f).contains("#7f7f7f"))
    assert(g.foreground(25f).contains("#ffffff")) // clamped
    // background-only gradient emits style, no color
    val bg = Formatters.Gradient(1f,
      minBackgroundColor = Some("#000000"), maxBackgroundColor = Some("#ff0000"))
    val (pre, post) = bg.tags(1f)
    assert(pre == """<font style="background: #ff0000">""" && post == "</font>")
  }

  test("markAll (NullFragmenter) and markAllScored") {
    assert(markAll("the quick fox", Seq((4, 9), (10, 13))) ==
      "the <b>quick</b> <b>fox</b>")
    val g = Formatters.Gradient(1f,
      minForegroundColor = Some("#000000"), maxForegroundColor = Some("#ff0000"))
    val out = markAllScored("ab cd", Seq((0, 2, 1f), (3, 5, 0f)), g)
    assert(out == """<font color="#ff0000">ab</font> <font color="#000000">cd</font>""")
  }

  test("offset-limited fragment ignores hits past the limit") {
    val a = Analyzer.noStop
    val full = bestFragment(a, "alpha beta alpha", Set("alpha"))
    assert(full.get.hits == 2)
    val limited = bestFragmentLimited(a, "alpha beta alpha", Set("alpha"), 10)
    assert(limited.get.hits == 1)
  }

  test("suggester dictionaries + suggest stop filter") {
    val spark = graft.SparkTestSession.spark
    val dict = Suggest.plainTextDictionary(spark,
      Seq(("merge", 10L), ("mercy", 3L), ("table", 7L)))
    val got = Suggest.completeFromDictionary(dict, "mer", 5)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("merge", "mercy"))

    import spark.implicits._
    val docs = Seq(("merge sort", 5L), (null.asInstanceOf[String], 9L))
      .toDF("title", "w")
    import org.apache.spark.sql.functions.col
    val dd = Suggest.documentDictionary(docs, col("title"), col("w"))
    assert(dd.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("merge sort", 5L)))

    def t(ts: String*) = ts.zipWithIndex.map { case (s, i) =>
      graft.analysis.Token(s, i, 0, 0) }.toArray
    val stops = Set("the", "a")
    // trailing stopword kept (user may be mid-word), interior dropped
    assert(Suggest.suggestStopFilter(t("find", "the"), stops)
      .map(_.term).toSeq == Seq("find", "the"))
    assert(Suggest.suggestStopFilter(t("the", "find"), stops)
      .map(_.term).toSeq == Seq("find"))
    assert(Suggest.suggestStopFilter(t("find", "the", "best"), stops)
      .map(_.term).toSeq == Seq("find", "best"))
    // reference end-offset rule: "find the " (trailing space) stops "the"
    val withOffs = Array(graft.analysis.Token("find", 0, 0, 4),
      graft.analysis.Token("the", 1, 5, 8))
    assert(Suggest.suggestStopFilter(withOffs, stops, textLen = 8)
      .map(_.term).toSeq == Seq("find", "the"))
    assert(Suggest.suggestStopFilter(withOffs, stops, textLen = 9)
      .map(_.term).toSeq == Seq("find"))
  }
}
