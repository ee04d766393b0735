package graft.build

import graft.postings.PostingsCodec
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deletes as tombstones (reference model: buffered term/query deletes
  * applied through a liveDocs bitset — Index/BufferedUpdatesStream.cs,
  * Codecs/LiveDocsFormat.cs — restated relationally): an append-only
  * `tombstones/` table of docIds next to the index. Search anti-joins
  * against it; global statistics (df, ttf, maxDoc) intentionally DON'T
  * change until a merge, exactly like the reference (deleted docs still
  * count in idf until expunge).
  *
  * [[expunge]] is the SegmentMerger-with-DocMap analog: drop tombstoned
  * docs, re-assign dense ascending docIds (DocMap rebase — reference:
  * Index/MergeState.cs:42-44), rewrite posting blocks through
  * decode→remap→encode, and recompute the dictionary + stats. */
object Deletes {

  def tombstonesPath(dir: String): String = s"$dir/tombstones"

  def tombstones(spark: SparkSession, dir: String): Dataset[Long] = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(tombstonesPath(dir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) spark.emptyDataset[Long]
    else spark.read.parquet(tombstonesPath(dir)).select("docId").as[Long]
  }

  def deleteDocs(spark: SparkSession, dir: String, ids: Dataset[Long]): Unit =
    ids.toDF("docId").write.mode(SaveMode.Append).parquet(tombstonesPath(dir))

  /** Delete-by-term (the reference's Term-keyed tombstones): every doc
    * currently containing the term. */
  def deleteByTerm(spark: SparkSession, dir: String, term: String): Unit = {
    import spark.implicits._
    val ids = spark.read.parquet(IndexPaths.postings(dir))
      .where($"term" === term)
      .select($"term", $"firstDocId", $"lastDocId", $"numDocs", $"maxTf",
        $"maxNorm", $"sumTf", $"segId", $"bytes").as[PostingRow]
      .flatMap(r => PostingsCodec.decodeBlock(r.firstDocId, r.numDocs, r.bytes)._1)
    deleteDocs(spark, dir, ids)
  }

  /** Rewrite the index at `outDir` without the tombstoned docs, docIds
    * re-packed dense. The remap is broadcast (verification scale); at
    * corpus scale the same remap is a range-join against a sorted
    * (oldId → newId) table — the structure is identical. */
  def expunge(spark: SparkSession, dir: String, outDir: String,
              numPartitions: Int = 8): Unit = {
    import spark.implicits._
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(outPath)) fs.delete(outPath, true)

    val dead = tombstones(spark, dir).collect().toSet
    val liveOld = spark.read.parquet(IndexPaths.docstats(dir))
      .select($"docId").as[Long].collect().filterNot(dead).sorted
    val remap = liveOld.zipWithIndex.map { case (o, n) => o -> n.toLong }.toMap
    val bRemap = spark.sparkContext.broadcast(remap)

    // docs + docstats: filter, remap, keep docId order
    def remapDocIdTable(df: DataFrame, outPathStr: String): Unit = {
      val cols = df.columns
      val remapped = df.flatMap { row =>
        val m = bRemap.value
        val old = row.getLong(row.fieldIndex("docId"))
        m.get(old).map { nid =>
          org.apache.spark.sql.Row.fromSeq(
            cols.map(c => if (c == "docId") nid else row.get(row.fieldIndex(c))).toSeq)
        }
      }(org.apache.spark.sql.Encoders.row(df.schema))
      remapped.repartitionByRange(numPartitions, col("docId"))
        .sortWithinPartitions(col("docId"))
        .write.mode(SaveMode.Overwrite).parquet(outPathStr)
    }
    remapDocIdTable(DocsTable.read(spark, dir), IndexPaths.docs(outDir))
    remapDocIdTable(spark.read.parquet(IndexPaths.docstats(dir)),
      IndexPaths.docstats(outDir))

    // postings: decode -> drop dead -> remap (order-preserving: the remap
    // is monotone) -> re-encode
    val blocks = spark.read.parquet(IndexPaths.postings(dir))
      .select($"term", $"firstDocId", $"lastDocId", $"numDocs", $"maxTf",
        $"maxNorm", $"sumTf", $"segId", $"bytes").as[PostingRow]
      .flatMap { r =>
        val m = bRemap.value
        val (ids, tfs, norms) = PostingsCodec.decodeBlock(r.firstDocId, r.numDocs, r.bytes)
        val keep = ids.indices.filter(i => m.contains(ids(i)))
        if (keep.isEmpty) Iterator.empty
        else {
          val nIds = keep.map(i => m(ids(i))).toArray
          val nTfs = keep.map(tfs(_)).toArray
          val nNorms = keep.map(norms(_)).toArray
          var sumTf = 0L
          nTfs.foreach(sumTf += _)
          PostingsCodec.encodeBlocks(nIds, nTfs, nNorms).map { b =>
            var s = 0L
            var i = 0
            // recompute per-block sumTf from the slice
            val from = nIds.indexOf(b.firstDocId)
            while (i < b.numDocs) { s += nTfs(from + i); i += 1 }
            PostingRow(r.term, b.firstDocId, b.lastDocId, b.numDocs, b.maxTf,
              b.maxNorm, s, r.segId, b.bytes)
          }.iterator
        }
      }
    blocks.repartitionByRange(numPartitions, $"term", $"firstDocId")
      .sortWithinPartitions($"term", $"firstDocId")
      .write.mode(SaveMode.Overwrite).parquet(IndexPaths.postings(outDir))

    // dictionary + collection stats recomputed from the rewritten tables
    IndexBuilder.buildDictAndStats(spark, outDir, numPartitions)
    bRemap.destroy()
  }
}
