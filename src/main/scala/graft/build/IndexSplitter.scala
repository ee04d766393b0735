package graft.build

import graft.postings.PostingsCodec
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Index splitting — carve one index into N self-contained sub-indexes
  * WITHOUT re-indexing the corpus (reference:
  * /root/reference/src/Lucene.Net.Misc/Index/MultiPassIndexSplitter.cs —
  * N passes, each marking the out-of-shard docs deleted then writing the
  * survivors; and PKIndexSplitter.cs — one split boundary on the primary
  * key). This is the shard-rebalancing primitive: split a fat index into
  * per-executor shards, or peel a docId range into its own index.
  *
  * Spark-native restatement, keeping the reference's N-pass shape (pass k
  * touches only shard k's data):
  *   - shard k owns the contiguous docId range [bounds(k), bounds(k+1)) —
  *     the PKIndexSplitter boundary model generalized to N shards;
  *   - original docIds are PRESERVED (no DocMap): shard docId spaces are
  *     disjoint ascending, so the shards together read as one index via
  *     [[graft.search.IndexReader.multi]] — union postings, re-aggregated
  *     dictionary/stats — and must reproduce the unsplit index's answers
  *     bit-for-bit (the splitter's correctness gate);
  *   - posting blocks are PRUNED by their [firstDocId, lastDocId] metadata
  *     before decode (a block strictly outside the shard range is never
  *     read — the reference's per-pass liveDocs skip, done relationally),
  *     then decoded, range-filtered, and re-encoded per partition;
  *   - pending docvalue updates are folded and tombstones dropped, the
  *     same merge-applies-everything behavior as [[Deletes.expunge]].
  */
object IndexSplitter {

  def shardDir(root: String, k: Int): String = f"$root/shard=$k%04d"

  /** Split `dir` into `numShards` contiguous-docId-range sub-indexes under
    * `outRoot`; returns the shard directories in order. */
  def split(spark: SparkSession, dir: String, outRoot: String, numShards: Int,
            numPartitions: Int = 4): Seq[String] = {
    import spark.implicits._
    require(numShards >= 2, s"numShards must be >= 2, got $numShards")

    val outPath = new org.apache.hadoop.fs.Path(outRoot)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(outPath)) fs.delete(outPath, true)

    val b = spark.read.parquet(IndexPaths.docstats(dir))
      .agg(min($"docId"), max($"docId")).head()
    val minId = b.getLong(0); val maxId = b.getLong(1)
    val span = maxId - minId + 1
    // equal-width boundaries over the id span (ids are dense in
    // standard builds, so equal width == equal count)
    val bounds = (0 to numShards).map(k => minId + span * k / numShards)

    val dead = Deletes.tombstones(spark, dir).toDF("deadId").distinct()

    def exists(p: String): Boolean = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
    }
    val hasPositions = exists(IndexPaths.positions(dir))
    val hasOffsets = exists(IndexPaths.offsets(dir))
    val hasPayloads = exists(IndexPaths.payloads(dir))

    (0 until numShards).map { k =>
      val lo = bounds(k); val hi = bounds(k + 1)
      val sd = shardDir(outRoot, k)

      def keepLive(df: DataFrame): DataFrame =
        df.where($"docId" >= lo && $"docId" < hi)
          .join(dead, df("docId") === $"deadId", "left_anti")
      def writeDocTable(df: DataFrame, out: String): Unit =
        keepLive(df)
          .repartitionByRange(numPartitions, $"docId")
          .sortWithinPartitions($"docId")
          .write.mode(SaveMode.Overwrite).parquet(out)

      writeDocTable(DocValues.readDocs(spark, dir), IndexPaths.docs(sd))
      writeDocTable(DocValues.readDocstats(spark, dir), IndexPaths.docstats(sd))

      // posting blocks overlapping [lo, hi) — everything else is skipped
      // unread; decode survivors, drop out-of-range/tombstoned ids,
      // re-encode per partition.
      if (!hasPositions && !hasOffsets && !hasPayloads) {
        val decoded = spark.read.parquet(IndexPaths.postings(dir))
          .where($"lastDocId" >= lo && $"firstDocId" < hi)
          .select($"term", $"firstDocId", $"lastDocId", $"numDocs", $"maxTf",
            $"maxNorm", $"sumTf", $"segId", $"bytes").as[PostingRow]
          .flatMap { r =>
            val (ids, tfs, norms) = PostingsCodec.decodeBlock(r.firstDocId, r.numDocs, r.bytes)
            ids.indices.iterator
              .filter(i => ids(i) >= lo && ids(i) < hi)
              .map(i => (r.term, ids(i), tfs(i), norms(i)))
          }.toDF("term", "docId", "tf", "norm")
        decoded
          .join(dead, decoded("docId") === $"deadId", "left_anti")
          .repartitionByRange(numPartitions, $"term", $"docId")
          .sortWithinPartitions($"term", $"docId")
          .as[(String, Long, Int, Int)]
          .mapPartitions { it =>
            val segId = org.apache.spark.TaskContext.getPartitionId()
            new PostingsReencoder(it, segId)
          }
          .write.mode(SaveMode.Overwrite).parquet(IndexPaths.postings(sd))
      } else {
        // sidecar-aligned rewrite (same join shape as Deletes.expunge:
        // LEFT joins let DOCS_ONLY keyword terms pass with null blobs)
        val t = spark.read.parquet(IndexPaths.postings(dir))
          .where($"lastDocId" >= lo && $"firstDocId" < hi)
          .select($"term", $"firstDocId", $"numDocs", $"bytes")
          .toDF("term", "firstDocId", "tn", "tbytes")
        def withSidecar(df: DataFrame, has: Boolean, path: String, as: String): DataFrame =
          if (has)
            df.join(spark.read.parquet(path)
              .select($"term", $"firstDocId", $"bytes").toDF("term", "firstDocId", as),
              Seq("term", "firstDocId"), "left_outer")
          else df.withColumn(as, lit(null).cast("binary"))
        val joined = withSidecar(withSidecar(withSidecar(t,
          hasPositions, IndexPaths.positions(dir), "pbytes"),
          hasOffsets, IndexPaths.offsets(dir), "obytes"),
          hasPayloads, IndexPaths.payloads(dir), "ybytes")
        val decoded = joined
          .select($"term", $"firstDocId", $"tn", $"tbytes", $"pbytes", $"obytes", $"ybytes")
          .as[(String, Long, Int, Array[Byte], Array[Byte], Array[Byte], Array[Byte])]
          .flatMap { case (term, firstDocId, n, tbytes, pbytes, obytes, ybytes) =>
            val (ids, tfs, norms) = PostingsCodec.decodeBlock(firstDocId, n, tbytes)
            val poss =
              if (pbytes == null) Array.fill[Array[Int]](n)(null)
              else PostingsCodec.decodePositionsBlock(n, pbytes)
            val offs =
              if (obytes == null) Array.fill[Array[Int]](n)(null)
              else PostingsCodec.decodeOffsetsBlock(n, obytes)
            val pays =
              if (ybytes == null) Array.fill[Array[Array[Byte]]](n)(null)
              else PostingsCodec.decodePayloadsBlock(n, ybytes)
            ids.indices.iterator
              .filter(i => ids(i) >= lo && ids(i) < hi)
              .map(i => (term, ids(i), tfs(i), norms(i), poss(i), offs(i), pays(i)))
          }.toDF("term", "docId", "tf", "norm", "ps", "os", "ys")
        val combined = decoded
          .join(dead, decoded("docId") === $"deadId", "left_anti")
          .repartitionByRange(numPartitions, $"term", $"docId")
          .sortWithinPartitions($"term", $"docId")
          .as[(String, Long, Int, Int, Array[Int], Array[Int], Array[Array[Byte]])]
          .mapPartitions { it =>
            val segId = org.apache.spark.TaskContext.getPartitionId()
            new PostingsSidecarReencoder(it, segId)
          }.toDF("post", "posBytes", "offBytes", "payBytes")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        combined.select(col("post.*"))
          .write.mode(SaveMode.Overwrite).parquet(IndexPaths.postings(sd))
        def writeSidecar(byteCol: String, out: String): Unit =
          combined.where(col(byteCol).isNotNull)
            .select(col("post.term").as("term"),
              col("post.firstDocId").as("firstDocId"),
              col("post.lastDocId").as("lastDocId"),
              col("post.numDocs").as("numDocs"),
              col("post.segId").as("segId"),
              col(byteCol).as("bytes"))
            .write.mode(SaveMode.Overwrite).parquet(out)
        if (hasPositions) writeSidecar("posBytes", IndexPaths.positions(sd))
        if (hasOffsets) writeSidecar("offBytes", IndexPaths.offsets(sd))
        if (hasPayloads) writeSidecar("payBytes", IndexPaths.payloads(sd))
        combined.unpersist()
      }

      IndexBuilder.buildDictAndStats(spark, sd, numPartitions)
      sd
    }
  }
}
