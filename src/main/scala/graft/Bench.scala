package graft

import graft.build.IndexBuilder
import graft.corpus.CorpusGen
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Emits ONE JSON line:
  *
  * {"metric":"index_build_files_per_sec@4N","value":…,"unit":"files/sec",
  *  "queries":{name:sec,…},"sf":"…","build":{…scaling evidence…}}
  *
  * Two parts:
  *   1. '''Build-throughput scaling''' (the north rule's two-cluster-size
  *      criterion, evidenced in-sandbox as two local parallelism levels):
  *      the same deterministic synthetic corpus (CorpusGen — the
  *      input_hint table shape) is index-built end-to-end at local[8] (N)
  *      and local[32] (4N); efficiency = thru4N / (4 × thruN).
  *   2. '''Query timings''': every SparkEntry query once at local[32] over
  *      SPARK_GRAFT_SF_DIR.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Full index build (docs → flush → postings → stats) of `n` synthetic
    * source files at the given core count; returns files/sec. */
  private def buildThroughput(cores: Int, n: Long, tag: String): Double = {
    val spark = session(cores)
    val dir = s"/tmp/graft-bench-$tag"
    val t0 = System.nanoTime()
    IndexBuilder.build(spark, CorpusGen.dataset(spark, n, parallelism = cores * 4),
      dir, numPartitions = cores, resume = false)
    val sec = (System.nanoTime() - t0) / 1e9
    spark.stop()
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(dir))
    n / sec
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "600000").toLong
    val nCores = 8
    val n4Cores = 32

    // ---- build-throughput scaling evidence (N vs 4N) ----
    buildThroughput(nCores, math.max(2000, nDocs / 20), "warmup") // JIT warmup
    val thruN = buildThroughput(nCores, nDocs, "n")
    val thru4N = buildThroughput(n4Cores, nDocs, "4n")
    val eff = thru4N / (4.0 * thruN)

    // ---- query timings at 4N over the driver's sf dir ----
    val spark = session(n4Cores)
    // pre-build the engine index so the first index query isn't charged
    // for the one-time build
    try ops.DocIndex.ensure(spark, sfDir) catch { case _: Throwable => }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
      catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val totalSec = results.collect { case (_, v) if v >= 0 => v }.sum
    val build =
      f"""{"docs":$nDocs,"cores_n":$nCores,"files_per_sec_n":$thruN%.1f,""" +
        f""""cores_4n":$n4Cores,"files_per_sec_4n":$thru4N%.1f,""" +
        f""""scaling_efficiency":$eff%.3f}"""
    println(
      f"""{"metric":"index_build_files_per_sec@4N","value":$thru4N%.1f,""" +
        f""""unit":"files/sec","total_query_sec":$totalSec%.3f,""" +
        s""""queries":$qs,"sf":"$sfDir","build":$build}""")
    spark.stop()
  }
}
