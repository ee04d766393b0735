package graft.search

import graft.SparkTestSession
import graft.build.{CheckIndex, Deletes, IndexBuilder, IndexPaths}
import graft.corpus.{CorpusGen, SourceFile}
import org.scalatest.funsuite.AnyFunSuite

/** The optional positions index (DOCS_AND_FREQS_AND_POSITIONS analog):
  * phrase queries read the aligned positions sidecar instead of
  * re-analyzing stored content, with bit-identical freqs; the sidecar
  * survives expunge, and CheckIndex cross-verifies counts against tfs. */
class PositionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mk(i: Int, text: String) =
    SourceFile("r", f"f$i%02d", "0" * 40, "txt", text, CorpusGen.sha256Hex(text))

  private val fixture = Seq(
    mk(0, "state machine runs"),
    mk(1, "machine state runs"),
    mk(2, "state of machine"),
    mk(3, "state machine state machine"),
    mk(4, "state alpha machine"),
    mk(5, "nothing here"))

  private lazy val (posSearcher, reSearcher, dir) = {
    import spark.implicits._
    val dP = SparkTestSession.tmpDir("graft-pos-")
    IndexBuilder.build(spark, spark.createDataset(fixture), dP, numPartitions = 2,
      indexPositions = true)
    val dR = SparkTestSession.tmpDir("graft-pos-re-")
    IndexBuilder.build(spark, spark.createDataset(fixture), dR, numPartitions = 2)
    (new Searcher(new IndexReader(spark, dP)),
      new Searcher(new IndexReader(spark, dR)), dP)
  }

  test("positions sidecar exists only when requested; CheckIndex verifies it") {
    posSearcher // force builds
    assert(new java.io.File(IndexPaths.positions(dir)).exists())
    val report = CheckIndex.check(spark, dir)
    assert(report.ok, report.problems.mkString("; "))
  }

  test("exact + sloppy phrase freqs from the index == re-analysis, bit-identical") {
    for (slop <- Seq(0, 1, 2)) {
      val fromIndex = posSearcher.phraseFreqsFromIndex(Seq("state", "machine"), slop)
        .collect().sortBy(_._1).toSeq
      val reRef: Seq[(Long, Float, Int)] =
        if (slop == 0) reSearcher.phraseFreqs(Seq("state", "machine"))
          .collect().map(t => (t._1, t._2.toFloat, t._3)).sortBy(_._1).toSeq
        else reSearcher.sloppyPhraseFreqs(Seq("state", "machine"), slop)
          .collect().sortBy(_._1).toSeq
      assert(fromIndex === reRef, s"slop=$slop")
    }
    // repeats go through SloppyPhrase identically
    val a = posSearcher.phraseFreqsFromIndex(Seq("state", "machine", "state"), 3)
      .collect().sortBy(_._1).toSeq
    val b = reSearcher.sloppyPhraseFreqs(Seq("state", "machine", "state"), 3)
      .collect().sortBy(_._1).toSeq
    assert(a === b)
  }

  test("multiPhrase from positions == re-analysis") {
    val slots = Seq(Seq("state", "machine"), Seq("machine", "runs"))
    assert(posSearcher.multiPhraseFreqs(slots).collect().sortBy(_._1).toSeq ===
      reSearcher.multiPhraseFreqs(slots).collect().sortBy(_._1).toSeq)
  }

  test("search() scores identically through either phrase plan") {
    for (q <- Seq(PhraseQ(Seq("state", "machine")),
      PhraseQ(Seq("state", "machine"), slop = 2))) {
      assert(posSearcher.search(q, 10).toSeq === reSearcher.search(q, 10).toSeq,
        s"query $q")
    }
  }

  test("expunge rebuilds aligned positions; phrases still work") {
    import spark.implicits._
    posSearcher // force build
    Deletes.deleteDocs(spark, dir, spark.createDataset(Seq(0L)))
    val out = SparkTestSession.tmpDir("graft-pos-exp-")
    Deletes.expunge(spark, dir, out, numPartitions = 2)
    assert(new java.io.File(IndexPaths.positions(out)).exists())
    val report = CheckIndex.check(spark, out)
    assert(report.ok, report.problems.mkString("; "))
    val s = new Searcher(new IndexReader(spark, out))
    // doc0 deleted; remaining exact matches: old doc3 (now doc2), freq 2
    val freqs = s.phraseFreqsFromIndex(Seq("state", "machine"), 0)
      .collect().map(t => t._1 -> t._2).toMap
    assert(freqs === Map(2L -> 2f))
  }
}
