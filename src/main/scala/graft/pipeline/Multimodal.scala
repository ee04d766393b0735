package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal asset row: opaque binary payload + typed metadata.
  * The schema a 100 TB media corpus would carry — payloads are opaque
  * `binary`, all per-asset facts live in typed columns so every filter /
  * group / join prunes without touching bytes. */
final case class AssetRow(
    doc_id: Long,
    modality: String, // "image" | "audio" | "video" | "text"
    bytes: Array[Byte],
    byte_len: Long,
    meta_lang: String)

final case class AssetFeatures(
    doc_id: Long,
    modality: String,
    n_frames: Int,
    features: Array[Float])

/** Multimodal-column plumbing for training-data pipelines.
  *
  * The real decode (image/audio codecs) is STUBBED — this container has no
  * media libraries — with a deterministic fake that reads the payload
  * bytes. Everything AROUND the stub is real and load-bearing: the binary
  * column schema, the batched `mapPartitions` execution shape (exactly the
  * batch contract a Pandas-UDF / `mapInPandas` stage has: bounded batches,
  * one model/codec init per partition, vectorized inner loop), the typed
  * feature output, and the partition sizing.
  */
object Multimodal {

  /** Synthesize the asset table from the documents table: payload =
    * UTF-8 bytes of the text (deterministic stand-in for a real media
    * blob), modality derived from doc_id. */
  def assets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(typedLit(Seq("image", "audio", "video", "text")),
        (col("doc_id") % 4 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("bytes"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("byte_len"),
      col("lang").as("meta_lang"))

  /** Metadata extraction — pure column work, never shuffles, prunes to
    * the scanned columns: payload size, magic prefix (first 8 bytes hex),
    * deterministic frame-sample offsets (4 evenly spaced positions). */
  def assetMeta(assets: DataFrame): DataFrame =
    assets
      .withColumn("hx", lower(hex(col("bytes")))) // hex view of the payload
      .select(
        col("doc_id"), col("modality"), col("byte_len"),
        substring(col("hx"), 1, 16).as("magic"), // first 8 bytes
        // 4-point deterministic "frame sample": 1 byte at 0%, 25%, 50%,
        // 75% of the payload. Integer division (div) — float '/' would
        // round differently across engines at .5 boundaries.
        concat(
          substring(col("hx"), 1, 2),
          expr("substring(hx, cast((byte_len div 4) * 2 AS int) + 1, 2)"),
          expr("substring(hx, cast((byte_len div 2) * 2 AS int) + 1, 2)"),
          expr("substring(hx, cast((byte_len * 3 div 4) * 2 AS int) + 1, 2)")).as("sample"))

  /** Max assets decoded per in-flight batch (the `mapInPandas` batch-size
    * knob: bounds executor memory at `batchSize * maxAssetBytes`). */
  val DecodeBatchSize = 64

  val FeatureDims = 16

  /** STUB decoder: stands in for an image/audio codec. Deterministic:
    * "frames" = 1 + len%7; features = byte-histogram moments folded into
    * FeatureDims floats. Replace the body with a real codec; the
    * batching/schema contract around it does not change. */
  def decodeStub(modality: String, bytes: Array[Byte]): (Int, Array[Float]) = {
    val nFrames = 1 + (bytes.length % 7)
    val f = new Array[Float](FeatureDims)
    var i = 0
    while (i < bytes.length) {
      f(i % FeatureDims) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    var j = 0
    while (j < FeatureDims) { f(j) = f(j) / math.max(1, bytes.length / FeatureDims); j += 1 }
    (nFrames, f)
  }

  /** Feature extraction over the asset table: batched per-partition
    * decode (the Scala analog of `mapInPandas`) — accumulate up to
    * [[DecodeBatchSize]] rows, init codec state once per partition, emit
    * typed feature rows. */
  def extractFeatures(spark: SparkSession, assets: DataFrame): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.select($"doc_id", $"modality", $"bytes").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init (≙ loading the model/codec once per worker)
        val codecTag = new StringBuilder("stub-codec").result()
        it.grouped(DecodeBatchSize).flatMap { batch =>
          // vectorizable inner loop over one bounded batch
          batch.iterator.map { case (id, modality, bytes) =>
            require(codecTag.nonEmpty)
            val (nf, feats) = decodeStub(modality, bytes)
            AssetFeatures(id, modality, nf, feats)
          }
        }
      }
  }

  /** End-to-end: assets → features → per-modality feature stats (the
    * aggregation that would feed a training-mix dashboard). */
  def modalityStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val feats = extractFeatures(spark, assets(docs))
    feats.toDF()
      .groupBy(col("modality"))
      .agg(count("*").as("n"),
        sum(col("n_frames")).cast("long").as("frames"),
        round(avg(element_at(col("features"), 1)), 6).as("f0_mean"))
      .orderBy(col("modality"))
  }
}
