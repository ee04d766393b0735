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

  test("perceptron: epoch-1 weights are the labeled tf sums; separable fixture classifies") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = Seq(
      (0L, "spam offer spam deal"),
      (1L, "spam spam prize"),
      (2L, "meeting notes agenda"),
      (3L, "quarterly report agenda")).toDF("doc_id", "text")
    val label = when(col("text").contains("spam"), 1L).otherwise(-1L)
    // epoch 1 from zero weights updates on EVERY doc: w(t) = Σ y·tf
    val w1 = Classify.trainPerceptron(d, label, epochs = 1)
      .as[(String, Long)].collect().toMap
    assert(w1("spam") === 4L)    // +2 +2 from the two positive docs
    assert(w1("agenda") === -2L) // -1 -1 from the two negative docs
    assert(w1("offer") === 1L)
    // two epochs: the separable fixture is classified correctly
    val w2 = Classify.trainPerceptron(d, label, epochs = 2)
    val preds = Classify.perceptronScores(d, w2)
      .select($"doc_id", $"pred").as[(Long, Int)].collect().toMap
    assert(preds(0L) === 1 && preds(1L) === 1)
    assert(preds(2L) === -1 && preds(3L) === -1)
    // no cached state left behind (localCheckpoint hygiene): training twice
    // more must not keep stacking persistent RDDs beyond the returned table
    val before = spark.sparkContext.getPersistentRDDs.size
    val w3 = Classify.trainPerceptron(d, label, epochs = 3)
    w3.count()
    assert(spark.sparkContext.getPersistentRDDs.size <= before + 2,
      "per-epoch checkpoints must be released as the loop advances")
  }
}
