package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query job/stage/task profile for the search family — the
  * round-4 verdict's "where does the ~1s/query at toy scale go" item:
  * every search runs stats seek + dict seek + postings scan + merge as
  * separate Spark ACTIONS, so at sf0.1 the suite time is dominated by
  * fixed per-job setup, not operator cost. This main quantifies that:
  * for each query it reports wall seconds, Spark job count, stage
  * count, task count and the summed executor task time — the
  * wall−taskTime gap IS the scheduling overhead. Emits a markdown table
  * (for BENCH.md) on stdout.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.ProfileQueries`
  */
object ProfileQueries {

  private val SearchFamily = Seq(
    "q_term_topk", "q_bool_must", "q_bool_should", "q_bool_mustnot",
    "q_min_should_match", "q_dismax", "q_phrase", "q_phrase_sloppy",
    "q_multi_phrase", "q_prefix_df", "q_wildcard_df", "q_range_df",
    "q_fuzzy_df", "q_fuzzy_topk", "q_span_near", "q_span_first",
    "q_common_terms", "q_count", "q_sort_fields", "q_searchafter")

  private final class Counter extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages += 1
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks += 1
      if (t.taskInfo != null) taskTimeMs += t.taskInfo.duration
    }
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0L }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counter = new Counter
    spark.sparkContext.addSparkListener(counter)

    // warm the index caches + JIT outside the measurement
    SparkEntry.queries("q_term_topk")(spark, sfDir).collect()

    println("| query | wall s | jobs | stages | tasks | task-time s | overhead s |")
    println("|---|---|---|---|---|---|---|")
    var totWall = 0.0
    var totTask = 0.0
    SearchFamily.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        counter.reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).collect()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // listener events are async; let the bus drain
        val taskS = counter.taskTimeMs / 1e3
        totWall += wall
        totTask += taskS
        println(f"| $name | $wall%.2f | ${counter.jobs} | ${counter.stages} " +
          f"| ${counter.tasks} | $taskS%.2f | ${math.max(0, wall - taskS / cpus.toInt)}%.2f |")
      }
    }
    println(f"| TOTAL | $totWall%.2f | | | | $totTask%.2f | |")
    spark.stop()
  }
}
