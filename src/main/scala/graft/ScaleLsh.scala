package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off sf1 driver for the scale-parameterized embedding LSH:
  * `cosinePairsBucketed` with a plane count sized to the corpus
  * (the 8-plane gate fixture is oracle-sized; at 200k clustered vectors
  * it leaves a 1.9B-row pair space, while 16 planes spread the same
  * vectors over ~8k buckets). Writes the pair list for the targeted
  * per-pair DuckDB verification.
  *
  * Usage: `runMain graft.ScaleLsh /tmp/graft-sf1 /tmp/graft-lsh16 16`
  */
object ScaleLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val nPlanes = if (args.length > 2) args(2).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val t0 = System.nanoTime()
    graft.pipeline.Similarity
      .cosinePairsBucketed(vecs, minCos = 0.405, nPlanes = nPlanes)
      .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
      .write.mode("overwrite").parquet(outDir)
    System.err.println(
      f"[scale-lsh] nPlanes=$nPlanes done ${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
