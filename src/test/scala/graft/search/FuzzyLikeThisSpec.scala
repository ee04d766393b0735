package graft.search

import graft.SparkTestSession
import graft.analysis.Analyzer
import graft.build.IndexBuilder
import graft.corpus.{CorpusGen, SourceFile}
import org.scalatest.funsuite.AnyFunSuite

/** FuzzyLikeThisQuery (reference: Sandbox/Queries/FuzzyLikeThisQuery.cs):
  * the reference-faithful rewrittenQuery — per-term variant caps, the
  * sim²·idf rescore with the source-df / avg-df fallback, the global
  * maxNumTerms queue, per-source grouping — and its relation to the
  * cap-free FuzzyQ composition. */
class FuzzyLikeThisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // dictionary: merge(df 3), merga(1), marge(1), table(2), tab(1)
  private lazy val (reader, searcher) = {
    import spark.implicits._
    val texts = Seq("merge table", "merge table", "merge", "merga", "marge", "tab")
    val docs = texts.zipWithIndex.map { case (t, i) =>
      SourceFile("r", s"f$i", "c", "txt", t, CorpusGen.sha256Hex(t))
    }
    val dir = SparkTestSession.tmpDir("graft-flt-")
    IndexBuilder.build(spark, spark.createDataset(docs), dir, 2)
    val r = new IndexReader(spark, dir)
    (r, new Searcher(r, analyzerFor = _ => Analyzer.sqlParity))
  }

  private def flatTerms(q: Query): Seq[TermQ] = q match {
    case t: TermQ => Seq(t)
    case BoolQ(m, s, n, _, _) => (m ++ s ++ n).flatMap(flatTerms)
    case _ => Nil
  }

  test("variants carry sim²·idf boosts; source df drives idf, avg df when absent") {
    val q = FuzzyLikeThis.rewrittenQuery(reader, "merge", Analyzer.sqlParity)
    val ts = flatTerms(q)
    val byTerm = ts.map(t => t.term -> t.boost).toMap
    // merge itself: sim=1, srcDf=3, N=6 → idf = ln(6/4)+1
    val idf3 = (math.log(6.0 / 4.0) + 1.0).toFloat
    assert(math.abs(byTerm("merge") - idf3) < 1e-6f)
    // merga: 1 edit over min-len 5 → sim=0.8; same source df 3
    assert(math.abs(byTerm("merga") - (0.8 * 0.8 * idf3).toFloat) < 1e-6f)
    assert(byTerm.contains("marge"))
  }

  test("absent source term falls back to the avg variant df (integer division)") {
    // 'merg' is not a dictionary term; variants at 1 edit: merge(3), merga(1)
    val q = FuzzyLikeThis.rewrittenQuery(reader, "merg", Analyzer.sqlParity)
    val ts = flatTerms(q)
    val avgDf = (3L + 1L) / 2 // = 2, the reference's integer avgDf
    val idf = (math.log(6.0 / (avgDf + 1.0)) + 1.0)
    val byTerm = ts.map(t => t.term -> t.boost).toMap
    val sim = 1.0 - 1.0 / 4.0 // 1 edit, min(|merg|,|merge|)=4
    assert(math.abs(byTerm("merge") - (sim * sim * idf).toFloat) < 1e-6f)
  }

  test("global maxNumTerms keeps only the top-scored variants across source terms") {
    val full = FuzzyLikeThis.rewrittenQuery(reader, "merge table", Analyzer.sqlParity)
    val capped = FuzzyLikeThis.rewrittenQuery(reader, "merge table",
      Analyzer.sqlParity, maxNumTerms = 2)
    assert(flatTerms(full).size > 2)
    val keptTerms = flatTerms(capped)
    assert(keptTerms.size === 2)
    // the survivors are the globally best-scored of the full set
    val topScores = flatTerms(full).map(_.boost).sorted.reverse.take(2).toSet
    assert(keptTerms.map(_.boost).forall(topScores.contains))
  }

  test("with generous caps the doc set equals the FuzzyQ composition") {
    val ref = searcher.search(
      FuzzyLikeThis.query("merg tble", Analyzer.sqlParity), 100)
      .map(_.docId).toSet
    val rw = searcher.search(
      FuzzyLikeThis.rewrittenQuery(reader, "merg tble", Analyzer.sqlParity,
        maxNumTerms = 1000, maxVariantsPerTerm = 1000), 100)
      .map(_.docId).toSet
    assert(ref.nonEmpty && rw === ref)
  }
}
