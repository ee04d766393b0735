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

  test("each term header appears exactly once, even when a term's postings span range partitions") {
    // 200 docs all containing "common": with (term, docId) range
    // partitioning its postings straddled partition boundaries and the
    // per-partition lastTerm state re-emitted '  term common' mid-stream,
    // breaking the reference's one-header-per-term grammar
    import spark.implicits._
    val d = SparkTestSession.tmpDir("graft-st-straddle-")
    val docs = (0 until 200).map { i =>
      val content = s"common word$i"
      graft.corpus.SourceFile("r", s"f$i.txt", "c0", "scala", content,
        graft.corpus.CorpusGen.sha256Hex(content))
    }
    IndexBuilder.build(spark, spark.createDataset(docs), d, 4)
    val (_, text) = dumpText(d)
    val headers = text.linesIterator.filter(_.startsWith("  term ")).toSeq
    assert(headers.contains("  term common"))
    assert(headers.size === headers.distinct.size,
      s"duplicate term headers: ${headers.diff(headers.distinct).distinct}")
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


  test("stored fields dump: reference grammar + lossless roundtrip") {
    val out = graft.SparkTestSession.tmpDir("graft-st-fld-")
    SimpleText.dumpStoredFields(spark, dir, out)
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/simpletext.fld")), "UTF-8")
    assert(text.startsWith("doc 0\n  numfields 6\n  field 0\n    name repo\n    type string\n    value "))
    assert(text.trim.endsWith("END"))
    val back = SimpleText.readStoredFields(spark, out)
    val docs = graft.build.DocsTable.read(spark, dir)
    val origPaths = docs.select("docId", "path").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val dumped = back.where(org.apache.spark.sql.functions.col("field") === "path")
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(dumped == origPaths)
    // content carries real newlines — the escape/unescape roundtrip must
    // be lossless, including a literal backslash-n (not the same as \n)
    val origContent = docs.select("docId", "content").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val dumpedContent = back.where(org.apache.spark.sql.functions.col("field") === "content")
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(dumpedContent == origContent)
  }

  test("live docs dump lists exactly the non-tombstoned docs") {
    import spark.implicits._
    // fresh tiny index, delete one doc
    val d = graft.SparkTestSession.tmpDir("graft-st-liv-")
    IndexBuilder.build(spark, spark.createDataset(CorpusGen.local(5)), d, 2)
    graft.build.Deletes.deleteDocs(spark, d, spark.createDataset(Seq(2L)))
    val out = graft.SparkTestSession.tmpDir("graft-st-livout-")
    SimpleText.dumpLiveDocs(spark, d, out)
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/simpletext.liv")), "UTF-8")
    val lines = text.linesIterator.toSeq
    assert(lines.head == "size 5")
    assert(lines.filter(_.startsWith("  doc ")).map(_.substring(6).toLong) ==
      Seq(0L, 1L, 3L, 4L))
    assert(lines.last == "END")
  }

  test("field infos dump reflects the index's real per-field capabilities") {
    val out = graft.SparkTestSession.tmpDir("graft-st-inf-")
    SimpleText.dumpFieldInfos(spark, posDir, out)
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/simpletext.inf")), "UTF-8")
    assert(text.startsWith("number of fields 5\n  name content\n"))
    assert(text.contains("  index options DOCS_AND_FREQS_AND_POSITIONS\n"))
    assert(text.contains("  name lang\n"))
    // keyword fields are DOCS_ONLY with norms omitted
    assert(text.contains("  index options DOCS_ONLY"))
    val norms = text.linesIterator.filter(_.startsWith("  norms ")).toSeq
    assert(norms.head == "  norms true" && norms.tail.forall(_ == "  norms false"))
  }
}
