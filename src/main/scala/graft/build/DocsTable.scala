package graft.build

import graft.corpus.SourceFile
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Row of the physical docs table: docIds are NOT materialized — each row
  * carries its build partition and local ordinal instead, and the global
  * docId is reconstituted at read time as `offset(pid) + localIdx` from
  * the tiny sibling `docs_offsets` table. */
final case class DocLocalRow(
    pid: Int,
    localIdx: Long,
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String,
    sha256: String)

final case class DocOffsetRow(pid: Int, offset: Long, rows: Long)

/** The stored-fields table with single-pass deterministic docIds.
  *
  * The docId contract (corpus order by `(repo, path, commit)`, dense from
  * `docIdBase` — the score tie-break contract, reference:
  * Search/HitQueue.cs:82-91) used to cost TWO reduce-side passes: a
  * range-shuffle + sort executed once for `zipWithIndex`'s count job and
  * again for its map job. Here the sorted pass runs ONCE and writes
  * `(pid, localIdx)`; partition offsets are then derived from a column-
  * pruned count of the written table (reading two integer columns, RLE/
  * delta-encoded — negligible against the payload sort it replaces) and
  * stored as `docs_offsets`. Because `repartitionByRange` assigns
  * ascending key ranges to ascending partition ids, cumulative offsets in
  * pid order reproduce exactly the ids a global `zipWithIndex` would have
  * assigned.
  *
  * [[read]] hides the arithmetic: it yields the canonical
  * `(docId, repo, path, commit, lang, content, sha256)` schema via a
  * broadcast join against the offsets table (map-side, codegen'd — no
  * shuffle), falling back to a plain read for rewritten tables
  * (Deletes.expunge / StreamingIndexer.compact output) that materialize
  * `docId` directly. */
object DocsTable {

  def offsetsPath(dir: String): String = s"$dir/docs_offsets"

  /** Single-pass write; returns per-partition manifest lineage rows. */
  def write(spark: SparkSession, corpus: Dataset[SourceFile], dir: String,
            numPartitions: Int, docIdBase: Long): Seq[ManifestRow] = {
    import spark.implicits._
    val sorted = corpus
      .repartitionByRange(numPartitions, $"repo", $"path", $"commit")
      .sortWithinPartitions($"repo", $"path", $"commit")
    val acc = spark.sparkContext.collectionAccumulator[ManifestRow]("docsManifest")
    val local = sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var rows = 0L
      var bytes = 0L
      val mapped = it.map { f =>
        val r = DocLocalRow(pid, rows, f.repo, f.path, f.commit, f.lang,
          f.content, f.sha256)
        rows += 1; bytes += f.content.length
        r
      }
      new Iterator[DocLocalRow] {
        private var reported = false
        def hasNext: Boolean = {
          val h = mapped.hasNext
          if (!h && !reported) {
            reported = true
            acc.add(ManifestRow("docs", pid, null, null, rows, rows, bytes,
              0L, System.currentTimeMillis()))
          }
          h
        }
        def next(): DocLocalRow = mapped.next()
      }
    }
    local.write.mode(SaveMode.Overwrite).parquet(IndexPaths.docs(dir))

    // Offsets from a read-back count of the written table (not the
    // accumulator — counts are correctness-critical for docIds, and the
    // committed files are the single source of truth). Column-pruned to
    // (pid, localIdx); the max(localIdx) cross-check catches a torn write.
    val counts = spark.read.parquet(IndexPaths.docs(dir))
      .groupBy($"pid")
      .agg(count("*").as("rows"), (max($"localIdx") + 1).as("rowsByIdx"))
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    counts.foreach { case (pid, n, byIdx) =>
      require(n == byIdx, s"docs partition $pid: count $n != max(localIdx)+1 $byIdx")
    }
    var off = docIdBase
    val offsets = counts.map { case (pid, n, _) =>
      val o = DocOffsetRow(pid, off, n); off += n; o
    }
    spark.createDataset(offsets.toSeq).repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(offsetsPath(dir))
    IndexBuilder.dedupeByPartition(acc.value)
  }

  /** Canonical docs view: `(docId, repo, path, commit, lang, content,
    * sha256)`, docId-ascending within every file split. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val offP = new org.apache.hadoop.fs.Path(offsetsPath(dir))
    val fs = offP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val docs = spark.read.parquet(IndexPaths.docs(dir))
    if (!fs.exists(offP))
      docs.select("docId", "repo", "path", "commit", "lang", "content", "sha256")
    else {
      val off = spark.read.parquet(offsetsPath(dir)).select("pid", "offset")
      docs.join(broadcast(off), Seq("pid"))
        .select((col("offset") + col("localIdx")).as("docId"),
          col("repo"), col("path"), col("commit"), col("lang"),
          col("content"), col("sha256"))
    }
  }
}
