package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text classification from corpus statistics (reference:
  * Lucene.Net.Classification/SimpleNaiveBayesClassifier.cs +
  * KNearestNeighborClassifier.cs — the reference classifies straight off
  * index stats / MLT searches; here the same math runs as Spark
  * aggregations over a labeled `documents`-shaped table).
  *
  * Both classifiers share the tokenizer with the engine (index/query
  * parity) and are driver-light: training is two shuffles, classification
  * of one text is a dictionary-pruned lookup. */
object Classify {

  /** Per-(label, term) counts + per-label totals + vocabulary size —
    * everything multinomial Naive Bayes with add-one smoothing needs. */
  final case class NaiveBayesModel(termCounts: DataFrame, labelTotals: DataFrame,
      vocabSize: Long, nDocs: Long) {
    /** Release the cached training tables. A model is a handle on two
      * cached DataFrames; callers that are done scoring must close it or
      * the executor storage leaks across trainings. */
    def close(): Unit = {
      termCounts.unpersist()
      labelTotals.unpersist()
    }
  }

  /** `cache = false` skips persisting the model tables — right for
    * one-shot scoring jobs where the tables are consumed exactly once
    * (nothing to reuse, nothing to leak). */
  def trainNaiveBayes(docs: DataFrame, labelCol: String = "lang",
      cache: Boolean = true): NaiveBayesModel = {
    val toks = docs.select(col(labelCol).as("label"),
      explode(Dedup.tokensCol("text")).as("t"))
    val termCounts = toks.groupBy(col("label"), col("t")).agg(count("*").as("c"))
    val labelTotals = toks.groupBy(col("label"))
      .agg(count("*").as("total"), countDistinct(col("t")).as("_v"))
      .drop("_v")
      .join(docs.groupBy(col(labelCol).as("label")).agg(count("*").as("docs")), "label")
    val vocab = toks.select(col("t")).distinct().count()
    NaiveBayesModel(if (cache) termCounts.cache() else termCounts,
      if (cache) labelTotals.cache() else labelTotals, vocab, docs.count())
  }

  /** argmax_label [ log P(label) + Σ_t log P(t|label) ], add-one smoothed.
    * The query's terms are a tiny set → the likelihood lookup is a pruned
    * filter on the (label, term) table, not a scan. */
  def naiveBayes(model: NaiveBayesModel, text: String): String = {
    val qTerms = graft.analysis.Analyzer.sqlParity.analyzeTerms(text)
      .groupBy(identity).view.mapValues(_.length).toMap
    if (qTerms.isEmpty) return "und"
    val counts = model.termCounts
      .where(col("t").isin(qTerms.keys.toSeq: _*))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val totals = model.labelTotals.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    totals.map { case (label, (total, docs)) =>
      val prior = math.log(docs.toDouble / model.nDocs)
      val ll = qTerms.map { case (t, qtf) =>
        val c = counts.getOrElse((label, t), 0L)
        qtf * math.log((c + 1.0) / (total + model.vocabSize))
      }.sum
      label -> (prior + ll)
    }.maxBy { case (label, s) => (s, label) }._1
  }

  /** Distributed per-label NB log-likelihood scores for a fixed term
    * multiset — the relational form of [[naiveBayes]] (same math, output
    * as a DataFrame so an independent engine can reproduce it). */
  def naiveBayesScores(model: NaiveBayesModel, qTerms: Map[String, Int]): DataFrame = {
    val spark = model.termCounts.sparkSession
    import spark.implicits._
    val q = qTerms.toSeq.toDF("t", "qtf")
    val smoothedLl = $"qtf" * log(($"c" + lit(1.0)) / ($"total" + lit(model.vocabSize.toDouble)))
    val missing = // terms absent for a label still contribute smoothed mass
      model.labelTotals.select($"label", $"total").crossJoin(q)
        .join(model.termCounts, Seq("label", "t"), "left_outer")
        .withColumn("c", coalesce($"c", lit(0L)))
        .select($"label", $"total", smoothedLl.as("ll"))
    missing.groupBy($"label")
      .agg(sum($"ll").as("ll"))
      .join(model.labelTotals.select($"label", $"docs"), "label")
      .select($"label",
        round(log($"docs" / lit(model.nDocs.toDouble)) + $"ll", 6).as("loglik"))
  }

  /** kNN by tf-vector cosine against the labeled corpus (the MLT-search
    * shape of the reference's kNN: the query's terms pull candidate docs
    * through the inverted term table; only docs sharing a term score). */
  def knn(docs: DataFrame, text: String, k: Int, labelCol: String = "lang"): String = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qTerms = graft.analysis.Analyzer.sqlParity.analyzeTerms(text)
      .groupBy(identity).view.mapValues(_.length.toDouble).toMap
    if (qTerms.isEmpty) return "und"
    val qNorm = math.sqrt(qTerms.values.map(v => v * v).sum)
    val toks = docs.select(col("doc_id"), col(labelCol).as("label"),
      explode(Dedup.tokensCol("text")).as("t"))
    val tf = toks.groupBy($"doc_id", $"label", $"t").agg(count("*").cast("double").as("tf"))
    val docNorm = tf.groupBy($"doc_id").agg(sqrt(sum($"tf" * $"tf")).as("nrm"))
    // query tf lookup as a literal map — codegen'd element_at, no UDF
    val dots = tf.where($"t".isin(qTerms.keys.toSeq: _*))
      .withColumn("qtf", coalesce(element_at(typedLit(qTerms), $"t"), lit(0.0)))
      .groupBy($"doc_id", $"label").agg(sum($"tf" * $"qtf").as("dot"))
    val top = dots.join(docNorm, "doc_id")
      .select($"doc_id", $"label", ($"dot" / ($"nrm" * qNorm)).as("cos"))
      .orderBy($"cos".desc, $"doc_id").limit(k)
      .collect()
    if (top.isEmpty) "und"
    else top.groupBy(_.getString(1)).view.mapValues(_.length).toSeq
      .maxBy { case (label, n) => (n, label) }._1
  }

  // ---------------------------------------------------------- perceptron

  /** Binary perceptron over term frequencies (reference:
    * Lucene.Net.Classification/BooleanPerceptronClassifier.cs — an online
    * perceptron whose weights live in a term→weight FST, trained
    * sequentially doc-by-doc off the index, classifying by thresholded
    * Σ tf·w). Sequential SGD does not distribute; the Spark-first
    * restatement is the BATCH perceptron: each epoch scores EVERY doc
    * against the current weights (one equi-join + one map-side-combinable
    * groupBy), takes the misclassified set (y·s ≤ 0 — epoch 1 with zero
    * weights updates on all docs, the batch analog of their
    * first-pass-fills-the-FST behavior), and applies the SUMMED update
    * w_t += Σ_misclassified y·tf(d,t) in one more combinable groupBy
    * merged into the weight table.
    *
    * Scale shape: the weight state is a (t, w) TABLE — never driver-side,
    * so the vocabulary can be term-dict-sized; one epoch = two shuffles
    * regardless of corpus size. Per-epoch state is persist+materialize+
    * release (CacheManager-tracked so each epoch's cache is DETERMINISTICALLY
    * freed when the next lands — the k-means/DenseIds hygiene; the logical
    * plan nests per epoch, fine at perceptron-typical epoch counts, and a
    * production run past dozens of epochs would re-root via a checkpoint
    * dir). All-integer arithmetic (tf counts,
    * ±1 labels, long weights) → bit-exact cross-engine parity, no
    * learning-rate float drift.
    *
    * @param docs  (doc_id, text)
    * @param label ±1 label column (any integral expression over the row)
    * @return (t, w) learned weights */
  def trainPerceptron(docs: DataFrame, label: org.apache.spark.sql.Column,
                      epochs: Int): DataFrame = {
    require(epochs >= 1, "epochs >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    // cached (not localCheckpoint'd): DataFrame.unpersist releases
    // CacheManager entries deterministically, while checkpoint RDD blocks
    // wait for ContextCleaner GC — and this loop must not stack state
    val tf = docs.select(col("doc_id"), label.cast("long").as("y"),
        explode(Dedup.tokensCol("text")).as("t"))
      .groupBy($"doc_id", $"y", $"t").agg(count("*").as("tf"))
      .persist()
    var weights = spark.emptyDataset[(String, Long)].toDF("t", "w")
    try {
      for (_ <- 0 until epochs) {
        val scores = tf.join(weights, Seq("t"), "left_outer")
          .withColumn("w", coalesce($"w", lit(0L)))
          .groupBy($"doc_id", $"y").agg(sum($"tf" * $"w").as("s"))
        val mis = scores.where($"y" * $"s" <= 0).select($"doc_id")
        val delta = tf.join(mis, Seq("doc_id"), "left_semi")
          .groupBy($"t").agg(sum($"y" * $"tf").as("dw"))
        val next = weights.join(delta, Seq("t"), "full_outer")
          .select($"t",
            (coalesce($"w", lit(0L)) + coalesce($"dw", lit(0L))).as("w"))
          .persist()
        next.count() // materialize BEFORE dropping the cache it reads
        weights.unpersist(blocking = true)
        weights = next
      }
      weights
    } finally { tf.unpersist(blocking = true); () }
  }

  /** Thresholded scores for a trained weight table: s = Σ tf·w, pred =
    * sign(s) (0 when undecided — docs sharing no weighted term score 0
    * through the left join). */
  def perceptronScores(docs: DataFrame, weights: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), explode(Dedup.tokensCol("text")).as("t"))
      .groupBy($"doc_id", $"t").agg(count("*").as("tf"))
      .join(weights, Seq("t"), "left_outer")
      .withColumn("w", coalesce($"w", lit(0L)))
      .groupBy($"doc_id").agg(sum($"tf" * $"w").as("s"))
      .select($"doc_id", $"s",
        when($"s" > 0, 1).when($"s" < 0, -1).otherwise(0).as("pred"))
  }
}
