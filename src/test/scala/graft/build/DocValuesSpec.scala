package graft.build

import graft.SparkTestSession
import graft.corpus.CorpusGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Docvalue updates (NumericDocValuesFieldUpdates analog): metadata edits
  * without reindex — read-time merge, last-writer-wins by generation,
  * folded at expunge, derived stats untouchable. */
class DocValuesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("update stream: read-merge, last wins, expunge folds and clears") {
    import spark.implicits._
    val dir = SparkTestSession.tmpDir("graft-dv-")
    IndexBuilder.build(spark, spark.createDataset(CorpusGen.microFixture), dir, 2)

    // update doc0's lang twice — the later generation wins
    DocValues.update(spark, dir,
      Seq((0L, "lang", "xx")).toDF("docId", "field", "value"))
    DocValues.update(spark, dir,
      Seq((0L, "lang", "yy"), (2L, "repo", "moved")).toDF("docId", "field", "value"))

    val merged = DocValues.readDocstats(spark, dir)
      .select($"docId", $"lang", $"repo").as[(Long, String, String)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(merged(0L)._1 === "yy")
    assert(merged(2L)._2 === "moved")
    // the raw table is untouched (updates are a sidecar, not a rewrite)
    val raw = spark.read.parquet(IndexPaths.docstats(dir))
      .where($"docId" === 0L).select($"lang").as[String].head()
    assert(raw !== "yy")
    // docs table merges the same way
    val docLang = DocValues.readDocs(spark, dir)
      .where($"docId" === 0L).select($"lang").as[String].head()
    assert(docLang === "yy")
    // derived stats are not updatable
    intercept[IllegalArgumentException] {
      DocValues.update(spark, dir,
        Seq((0L, "norm", "5")).toDF("docId", "field", "value"))
    }

    // expunge folds updates into the rewritten tables and carries none
    Deletes.deleteDocs(spark, dir, spark.createDataset(Seq(1L)))
    val exp = SparkTestSession.tmpDir("graft-dv-exp-")
    Deletes.expunge(spark, dir, exp, numPartitions = 2)
    assert(!DocValues.hasUpdates(spark, exp))
    val report = CheckIndex.check(spark, exp)
    assert(report.ok, report.problems.mkString("; "))
    // doc0 kept its updated lang through the rewrite (docIds re-pack but
    // doc0 was first in corpus order, so it stays docId 0)
    val expLang = spark.read.parquet(IndexPaths.docstats(exp))
      .where($"docId" === 0L).select($"lang").as[String].head()
    assert(expLang === "yy")
    // read-with-updates over the ORIGINAL == the rewritten table's values
    // for surviving docs (modulo renumbering): compare by path identity
    val before = DocValues.readDocstats(spark, dir)
      .where($"docId" =!= 1L).select($"path", $"lang", $"repo")
      .as[(String, String, String)].collect().toSet
    val after = spark.read.parquet(IndexPaths.docstats(exp))
      .select($"path", $"lang", $"repo").as[(String, String, String)]
      .collect().toSet
    assert(after === before)
  }
}
