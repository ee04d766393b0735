package graft.search

import graft.analysis.Analyzer
import graft.build.IndexPaths
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** QueryAutoStopWordAnalyzer analog (reference:
  * /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Query/
  * QueryAutoStopWordAnalyzer.cs): derive a stop set from the INDEX's own
  * document frequencies — terms with df STRICTLY above `maxDocFreq`
  * (:70-75), or above `(int)(maxPercentDocs * numDocs)` for the
  * percentage form (:86-91, default 0.4) — and wrap the delegate
  * analyzer so query-time analysis drops them. The df scan is a pruned
  * dictionary read; the collected set is stats-sized (the reference
  * walks TermsEnum on the same reader). */
object AutoStopwords {

  val DefaultMaxDocFreqPercent = 0.4f

  def stopWords(spark: SparkSession, dir: String, maxDocFreq: Int): Set[String] = {
    import spark.implicits._
    spark.read.parquet(IndexPaths.termDict(dir))
      .where(col("df") > maxDocFreq)
      .select($"term").as[String].collect().toSet
  }

  def stopWordsPercent(spark: SparkSession, dir: String,
                       maxPercentDocs: Float = DefaultMaxDocFreqPercent): Set[String] = {
    val reader = new IndexReader(spark, dir)
    stopWords(spark, dir, (maxPercentDocs * reader.collectionStats.maxDoc).toInt)
  }

  /** The wrapped analyzer: the delegate's chain with the derived terms
    * added to its stop set (the reference composes a StopFilter over the
    * delegate's components, :150-170 — same observable effect). */
  def analyzer(delegate: Analyzer, auto: Set[String]): Analyzer =
    new Analyzer(delegate.stopWords ++ auto, delegate.maxTokenLength,
      delegate.tokenizer, delegate.stemmer, delegate.synonyms,
      delegate.fold, delegate.elisionArticles, delegate.lowerCaser)
}
