package graft.postings

import graft.SparkTestSession
import graft.build.{IndexBuilder, IndexPaths}
import graft.corpus.{CorpusGen, SourceFile}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pulsing postings (Pulsing41PostingsFormat analog): df<=cutoff terms
  * inlined into the term dictionary, removed from the postings table;
  * reads over the pulsed index are bit-equal to the unpulsed index. */
class PulsingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // common="alpha" (df=4), mid="mid" (df=2), hapax rare1/rare2 (df=1);
  // rare1 has tf=3 in its one doc (inline must carry tf, not assume 1)
  private val fixture: Seq[SourceFile] = Seq(
    "alpha mid rare1 rare1 rare1",
    "alpha mid",
    "alpha rare2",
    "alpha").zipWithIndex.map { case (v, i) =>
    SourceFile("repo-0", s"f$i", "0" * 40, "txt", v, CorpusGen.sha256Hex(v))
  }

  private lazy val (baseDir, pulsedDir, pulsed2Dir) = {
    val base = SparkTestSession.tmpDir("graft-pulse-base-")
    IndexBuilder.build(spark, spark.createDataset(fixture)(
      org.apache.spark.sql.Encoders.product[SourceFile]), base, 2)
    val p1 = SparkTestSession.tmpDir("graft-pulse-1-")
    Pulsing.write(spark, base, p1, freqCutoff = 1, numPartitions = 2)
    val p2 = SparkTestSession.tmpDir("graft-pulse-2-")
    Pulsing.write(spark, base, p2, freqCutoff = 2, numPartitions = 2)
    (base, p1, p2)
  }

  private val allTerms = Seq("alpha", "mid", "rare1", "rare2")

  private def asTriples(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "term", "tf").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq

  test("pulsed hits == unpulsed hits across inline and block paths") {
    val got = asTriples(Pulsing.hits(spark, pulsedDir, allTerms))
    val want = asTriples(graft.ops.DocIndex.hits(spark, baseDir, allTerms))
    assert(want.nonEmpty && got === want)
    // the hapax doc carries its true tf (3), not a presumed 1
    assert(got.exists { case (_, t, tf) => t == "rare1" && tf == 3L })
  }

  test("postings table holds only df>cutoff terms; dictionary inlines the rest") {
    import spark.implicits._
    val blockTerms = spark.read.parquet(IndexPaths.postings(pulsedDir))
      .select($"term").distinct().as[String].collect().toSet
    assert(blockTerms === Set("alpha", "mid"))
    val dict = spark.read.parquet(IndexPaths.termDict(pulsedDir))
    val inlined = dict.where($"inlineDocIds".isNotNull)
      .select($"term").as[String].collect().toSet
    assert(inlined === Set("rare1", "rare2"))
    // dictionary still carries every term's stats (df intact for scoring)
    assert(dict.count() === 4 &&
      dict.where($"term" === "alpha" && $"df" === 4).count() === 1)
  }

  test("cutoff=2 inlines the df=2 term with docId-ascending arrays") {
    import spark.implicits._
    val blockTerms = spark.read.parquet(IndexPaths.postings(pulsed2Dir))
      .select($"term").distinct().as[String].collect().toSet
    assert(blockTerms === Set("alpha"))
    val mid = spark.read.parquet(IndexPaths.termDict(pulsed2Dir))
      .where($"term" === "mid").select($"inlineDocIds").head()
    assert(mid.getSeq[Long](0) === Seq(0L, 1L)) // ascending across segments
    val got = asTriples(Pulsing.hits(spark, pulsed2Dir, allTerms))
    val want = asTriples(graft.ops.DocIndex.hits(spark, baseDir, allTerms))
    assert(got === want)
  }

  test("inline read pushes term filters to the dictionary scan") {
    import spark.implicits._
    val q = spark.read.parquet(IndexPaths.termDict(pulsedDir))
      .where($"term".isin("rare1", "rare2") && $"inlineDocIds".isNotNull)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("term"),
      s"inline dictionary read not pruned:\n$plan")
  }
}
