package graft.postings

import graft.build.{IndexPaths, PostingRow}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** SimpleText postings — the reference's human-readable debugging codec
  * (reference: Codecs/SimpleText/SimpleTextFieldsWriter.cs:36-44 line
  * grammar, SimpleTextFieldsReader.cs): the index dumped as plain text
  * you can `cat`, and read back losslessly. Line grammar preserved
  * verbatim (prefix indentation included):
  *
  * {{{
  * field content
  *   term merge
  *     doc 0
  *       freq 2
  *       pos 5        (positions level, when the sidecar exists)
  * END
  * }}}
  *
  * Spark restatement: the body renders from the aligned postings ⋈
  * positions block scan (the same equi-join every phrase query runs),
  * term-sorted; like the reference, this codec trades everything for
  * inspectability — debugging and tests only, never production (their
  * own warning), so the single-file framing is deliberate.
  */
object SimpleText {

  /** Render the index's postings (and positions, when the sidecar
    * exists) as SimpleText lines at `outDir`. Single `content` field —
    * this engine's positioned field. */
  def dump(spark: SparkSession, indexDir: String, outDir: String): Unit = {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasPos = fs.exists(new org.apache.hadoop.fs.Path(IndexPaths.positions(indexDir)))

    val t = spark.read.parquet(IndexPaths.postings(indexDir))
      .select($"term", $"firstDocId", $"numDocs", $"bytes")
      .toDF("term", "firstDocId", "n", "tbytes")
    val joined =
      if (hasPos) {
        val p = spark.read.parquet(IndexPaths.positions(indexDir))
          .select($"term", $"firstDocId", $"bytes").toDF("term", "firstDocId", "pbytes")
        t.join(p, Seq("term", "firstDocId"), "left_outer")
      } else t.withColumn("pbytes", lit(null).cast("binary"))
    val lines = joined
      .as[(String, Long, Int, Array[Byte], Array[Byte])]
      .flatMap { case (term, first, n, tbytes, pbytes) =>
        val (ids, tfs, _) = PostingsCodec.decodeBlock(first, n, tbytes)
        val poss: Array[Array[Int]] =
          if (pbytes == null) null else PostingsCodec.decodePositionsBlock(n, pbytes)
        ids.indices.map { i =>
          val sb = new StringBuilder
          sb.append("    doc ").append(ids(i)).append('\n')
          sb.append("      freq ").append(tfs(i))
          if (poss != null)
            poss(i).foreach(p => sb.append('\n').append("      pos ").append(p))
          (term, ids(i), sb.toString)
        }
      }.toDF("term", "docId", "body")
      // range-partition by TERM ALONE: with docId in the partitioning key
      // a high-df term could straddle a partition boundary and the
      // per-partition lastTerm state would re-emit its header, breaking
      // the reference grammar's one-header-per-term invariant (a skewed
      // term then fills one partition — fine for a debugging codec)
      .repartitionByRange(4, $"term")
      .sortWithinPartitions($"term", $"docId")
      .as[(String, Long, String)]
      .mapPartitions { it =>
        var lastTerm: String = null
        it.map { case (term, _, body) =>
          val head =
            if (term != lastTerm) { lastTerm = term; s"  term $term\n" } else ""
          head + body
        }
      }
    // distributed body, then one-file framing: the driver STREAMS the
    // term-ordered part files (lexical name order = range order) between
    // the field header and END — the reference's single .pst file. Bytes
    // never accumulate on the driver; the single file is the debugging
    // codec's own contract.
    val bodyDir = s"$outDir/_body"
    lines.write.mode(SaveMode.Overwrite).text(bodyDir)
    val outFs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(s"$outDir/simpletext.pst")
    val os = outFs.create(target, true)
    try {
      os.write("field content\n".getBytes("UTF-8"))
      outFs.listStatus(new org.apache.hadoop.fs.Path(bodyDir))
        .filter(_.getPath.getName.startsWith("part-"))
        .sortBy(_.getPath.getName)
        .foreach { st =>
          val in = outFs.open(st.getPath)
          try org.apache.hadoop.io.IOUtils.copyBytes(in, os, 64 * 1024, false)
          finally in.close()
        }
      os.write("END\n".getBytes("UTF-8"))
    } finally os.close()
    outFs.delete(new org.apache.hadoop.fs.Path(bodyDir), true)
  }

  /** Parse a SimpleText dump back to (term, docId, tf, positions) rows —
    * SimpleTextFieldsReader's grammar walk, one pass in line order. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(dir).coalesce(1).mapPartitions { it =>
      var term: String = null
      var docId = -1L
      var tf = -1
      var ps = scala.collection.mutable.ArrayBuffer.empty[Int]
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Int, Seq[Int])]
      def flush(): Unit = {
        if (docId >= 0) out += ((term, docId, tf, ps.toSeq))
        docId = -1L; tf = -1; ps = scala.collection.mutable.ArrayBuffer.empty[Int]
      }
      it.foreach { row =>
        row.split('\n').foreach { line =>
          if (line.startsWith("      pos ")) ps += line.substring(10).toInt
          else if (line.startsWith("      freq ")) tf = line.substring(11).toInt
          else if (line.startsWith("    doc ")) { flush(); docId = line.substring(8).toLong }
          else if (line.startsWith("  term ")) { flush(); term = line.substring(7) }
          else if (line == "END" || line.startsWith("field ")) flush()
        }
      }
      flush()
      out.iterator
    }.toDF("term", "docId", "tf", "positions")
  }
}
