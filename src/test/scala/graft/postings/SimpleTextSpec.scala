package graft.postings

import graft.SparkTestSession
import graft.build.IndexBuilder
import graft.corpus.CorpusGen
import org.scalatest.funsuite.AnyFunSuite

/** SimpleText debugging codec (Codecs/SimpleText): the reference line
  * grammar verbatim, and a lossless dump → read roundtrip against the
  * binary index. */
class SimpleTextSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val (dir, posDir) = {
    import spark.implicits._
    val d = SparkTestSession.tmpDir("graft-st-")
    IndexBuilder.build(spark, spark.createDataset(CorpusGen.microFixture), d, 2)
    val dp = SparkTestSession.tmpDir("graft-stp-")
    IndexBuilder.build(spark, spark.createDataset(CorpusGen.microFixture), dp, 2,
      indexPositions = true)
    (d, dp)
  }

  private def dumpText(indexDir: String): (String, String) = {
    val out = SparkTestSession.tmpDir("graft-st-out-")
    SimpleText.dump(spark, indexDir, s"$out/txt")
    (s"$out/txt", new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/txt/simpletext.pst"))))
  }

  test("dump follows the reference line grammar; read roundtrips losslessly") {
    val (txtDir, text) = dumpText(dir)
    assert(text.startsWith("field content\n"))
    assert(text.trim.endsWith("END"))
    assert(text.contains("  term all\n") &&
      text.contains("    doc 0\n") && text.contains("      freq "))
    // lossless: parsed rows == the binary index's decoded postings
    val got = SimpleText.read(spark, txtDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val want = graft.ops.DocIndex.hits(spark, dir,
      Seq("all", "dogs", "like", "playing", "fetch"))
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2).toInt)).sorted.toSeq
    assert(want.nonEmpty && got === want)
    // "dogs dogs" → tf 2 survives the text roundtrip
    assert(got.contains(("dogs", 1L, 2)))
  }

  test("positions level: pos lines emitted and parsed back") {
    val (txtDir, text) = dumpText(posDir)
    assert(text.contains("      pos "))
    val parsed = SimpleText.read(spark, txtDir).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getSeq[Int](3)))
      .toMap
    // doc1 = "dogs dogs": term at positions 0 and 1
    assert(parsed(("dogs", 1L)) === Seq(0, 1))
    // every posting carries exactly tf positions
    SimpleText.read(spark, txtDir).collect().foreach { r =>
      assert(r.getSeq[Int](3).length === r.getInt(2))
    }
  }
}
