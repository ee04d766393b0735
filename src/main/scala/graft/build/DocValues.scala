package graft.build

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** In-place docvalue updates without reindexing (reference:
  * Index/NumericDocValuesFieldUpdates.cs + BinaryDocValuesFieldUpdates
  * .cs — buffered per-field value overrides resolved at read time and
  * folded in at merge): an append-only `updates/` table
  * (docId, field, value, gen) next to the index, merged into the
  * doc-metadata tables at read like tombstones are at search, with
  * last-writer-wins per (docId, field) by generation. [[Deletes.expunge]]
  * folds updates into the rewritten tables and the rewritten index
  * carries none — the reference's merge-applies-updates behavior.
  *
  * Updatable fields are the doc METADATA columns (repo/path/commit/
  * lang): derived stats (tokenCount, norm) and content are index
  * artifacts a docvalue update cannot touch, exactly as the reference
  * cannot update norms through docvalues. */
object DocValues {

  def updatesPath(dir: String): String = s"$dir/updates"

  val UpdatableFields: Set[String] = Set("repo", "path", "commit", "lang")

  def hasUpdates(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(updatesPath(dir))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Append one batch of updates: columns (docId, field, value). The
    * whole batch gets the next generation number — later batches win. */
  def update(spark: SparkSession, dir: String, updates: DataFrame): Unit = {
    val fields = updates.select("field").distinct()
      .collect().map(_.getString(0)).toSet
    require(fields.subsetOf(UpdatableFields),
      s"non-updatable fields: ${fields -- UpdatableFields}")
    val gen =
      if (!hasUpdates(spark, dir)) 0L
      else spark.read.parquet(updatesPath(dir))
        .agg(coalesce(max(col("gen")), lit(-1L))).head().getLong(0) + 1L
    updates.select(col("docId").cast("long").as("docId"),
        col("field").cast("string").as("field"),
        col("value").cast("string").as("value"))
      .withColumn("gen", lit(gen))
      .write.mode(SaveMode.Append).parquet(updatesPath(dir))
  }

  /** `base` (a docId-keyed metadata table) with pending updates applied,
    * last writer wins. One broadcast-sized join per updated field — the
    * update stream is edit-sized, not corpus-sized, like the reference's
    * in-RAM update buffers. */
  def applyUpdates(spark: SparkSession, dir: String, base: DataFrame,
                   maxGen: Long = Long.MaxValue): DataFrame = {
    if (!hasUpdates(spark, dir)) return base
    val latest = spark.read.parquet(updatesPath(dir))
      .where(col("gen") <= maxGen) // snapshot watermark (Snapshots.create)
      .groupBy(col("docId"), col("field"))
      .agg(max_by(col("value"), col("gen")).as("value"))
    val fields = latest.select("field").distinct().collect().map(_.getString(0))
    fields.foldLeft(base) { (df, f) =>
      require(df.columns.contains(f), s"update field $f absent from table")
      val upd = latest.where(col("field") === f)
        .select(col("docId").as("__updId"), col("value").as("__updVal"))
      df.join(broadcast(upd), df("docId") === col("__updId"), "left_outer")
        .withColumn(f, coalesce(col("__updVal").cast(df.schema(f).dataType), col(f)))
        .drop("__updId", "__updVal")
    }
  }

  /** docstats with updates applied. */
  def readDocstats(spark: SparkSession, dir: String): DataFrame =
    applyUpdates(spark, dir, spark.read.parquet(IndexPaths.docstats(dir)))

  /** Stored fields with updates applied. */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    applyUpdates(spark, dir, DocsTable.read(spark, dir))
}
