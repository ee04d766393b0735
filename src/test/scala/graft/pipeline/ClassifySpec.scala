package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Index-stats classification (the reference's Classification module
  * semantics): Naive Bayes and kNN both recover the label of held-out
  * text from a small labeled corpus with distinct class vocabularies. */
class ClassifySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions._

  private lazy val docs = {
    import spark.implicits._
    val rows =
      (0 until 10).map(i => (i.toLong, s"spark shuffle partition executor stage task $i", "infra")) ++
      (10 until 20).map(i => (i.toLong, s"tokenize stem lemma corpus vocabulary embedding $i", "nlp"))
    rows.toDF("doc_id", "text", "lang")
  }

  test("naive bayes recovers the class of held-out text") {
    // other suites share the session and may hold their own caches —
    // assert only that THIS model's caches are gone after close()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val model = Classify.trainNaiveBayes(docs)
    assert(Classify.naiveBayes(model, "executor task shuffle") === "infra")
    assert(Classify.naiveBayes(model, "corpus lemma vocabulary") === "nlp")
    assert(Classify.naiveBayes(model, "") === "und")
    model.close()
    assert(spark.sparkContext.getPersistentRDDs.keySet.subsetOf(before),
      "model.close() must release both cached tables")
  }

  test("cache=false trains without persisting anything") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val model = Classify.trainNaiveBayes(docs, cache = false)
    assert(Classify.naiveBayes(model, "executor task shuffle") === "infra")
    assert(spark.sparkContext.getPersistentRDDs.keySet.subsetOf(before))
  }

  test("kNN majority vote recovers the class; empty/no-overlap falls back") {
    assert(Classify.knn(docs, "partition stage executor spark", 5) === "infra")
    assert(Classify.knn(docs, "embedding stem tokenize", 5) === "nlp")
    assert(Classify.knn(docs, "zzz qqq", 5) === "und")
  }
}
