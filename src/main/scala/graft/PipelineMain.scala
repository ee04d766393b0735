package graft

import graft.pipeline.{Dedup, Multimodal, TextAnalysis}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** spark-submit demo of the training-data curation pipeline over a
  * `documents`-shaped table: near-dedup → quality filter → lang-ID →
  * multimodal features → curated corpus + a one-line report.
  *
  * usage: spark-submit --class graft.PipelineMain <jar> <documentsParquet> <outDir>
  */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PipelineMain <documentsParquet> <outDir>")
    val Array(in, out) = args.take(2)
    val spark = MainSupport.session("graft-pipeline")
    import spark.implicits._
    val docs = spark.read.parquet(in)
    val n0 = docs.count()

    // 1. near-dedup (production xxhash64 MinHash-LSH): drop the larger id
    //    of every confirmed near-dup pair
    val dupB = Dedup.minhashNearDupsProd(docs, minJaccard = 0.8)
      .select($"b".as("doc_id")).distinct()
    val deduped = docs.join(dupB, Seq("doc_id"), "left_anti")

    // 2. quality floor + language id
    val quality = TextAnalysis.qualityScore(deduped).select($"doc_id", $"quality")
    val lang = TextAnalysis.langId(deduped).select($"doc_id", $"predicted")
    val curated = deduped
      .join(quality, "doc_id").join(lang, "doc_id")
      .where($"quality" >= 0.3)

    // 3. multimodal features ride along for the training mix
    val feats = Multimodal.extractFeatures(spark, Multimodal.assets(curated))
      .toDF().select($"doc_id", $"n_frames", $"features")

    val outDf = curated.join(feats, "doc_id")
    outDf.write.mode(SaveMode.Overwrite).parquet(s"$out/curated")
    val n1 = outDf.count()
    val byLang = outDf.groupBy($"predicted").count().collect()
      .map(r => s""""${r.getString(0)}":${r.getLong(1)}""").sorted.mkString("{", ",", "}")
    println(s"""{"input_docs":$n0,"curated_docs":$n1,"dropped":${n0 - n1},"by_predicted_lang":$byLang}""")
    spark.stop()
  }
}
