package graft.search

import org.apache.spark.sql.SparkSession

/** TimeLimitingCollector analog (reference:
  * /root/reference/src/Lucene.Net/Search/TimeLimitingCollector.cs): a
  * wall-clock budget on a search. The reference wraps Collect() with an
  * elapsed check and throws TimeExceededException carrying
  * (timeAllowed, timeElapsed); non-greedy mode drops the in-flight hit.
  * The Spark-native formulation: the whole search action runs under a
  * dedicated job group, a timer cancels the group at the deadline
  * (Spark's cooperative task kill — the distributed twin of the
  * per-collect check), and the caller gets the same typed exception.
  * Greedy partial results have no distributed analog (a cancelled stage
  * has no consistent partial answer), so this is the reference's
  * DEFAULT (non-greedy) semantics: on timeout you get the exception,
  * never a wrong partial top-k. */
object TimeLimit {

  final class TimeExceededException(val timeAllowedMs: Long,
                                    val timeElapsedMs: Long,
                                    cause: Throwable = null)
      extends RuntimeException(
        s"Elapsed time: ${timeElapsedMs}ms exceeded allowed search time: ${timeAllowedMs}ms.",
        cause)

  /** Run `body` (any driver action — search, count, collect) with a
    * wall-clock budget. Cancellation uses
    * `cancelJobGroupAndFutureJobs`: a deadline can strike BEFORE the
    * query's first job is even submitted (planning/codegen time), where
    * a plain cancel-active-jobs is a no-op and the search would still
    * run to completion — future-job cancellation makes the deadline
    * binding across the whole action regardless of planning phase. A
    * fresh UUID group per call keeps the blacklist scoped. */
  def withTimeout[T](spark: SparkSession, timeoutMs: Long)(body: => T): T = {
    val group = s"graft-timelimit-${java.util.UUID.randomUUID()}"
    val sc = spark.sparkContext
    val start = System.nanoTime()
    val timer = new java.util.Timer("graft-timelimit", true)
    @volatile var fired = false
    // save the caller's own job group so nesting works: a bare
    // clearJobGroup() would strip an ENCLOSING withTimeout's group from
    // the jobs that follow, making the outer budget silently non-binding
    val prevId = sc.getLocalProperty("spark.jobGroup.id")
    val prevDesc = sc.getLocalProperty("spark.job.description")
    val prevInterrupt = sc.getLocalProperty("spark.job.interruptOnCancel")
    sc.setJobGroup(group, "time-limited search", interruptOnCancel = true)
    try {
      timer.schedule(new java.util.TimerTask {
        override def run(): Unit = {
          fired = true
          sc.cancelJobGroupAndFutureJobs(group, "graft time limit exceeded")
        }
      }, timeoutMs)
      try body
      catch {
        // only non-fatal failures convert (an OOM Error stays an Error),
        // and the original failure rides along as the cause — a
        // post-deadline AnalysisException is still diagnosable
        case scala.util.control.NonFatal(e) if fired =>
          throw new TimeExceededException(timeoutMs,
            (System.nanoTime() - start) / 1000000L, e)
      }
    } finally {
      timer.cancel()
      if (prevId != null) {
        sc.setLocalProperty("spark.jobGroup.id", prevId)
        sc.setLocalProperty("spark.job.description", prevDesc)
        sc.setLocalProperty("spark.job.interruptOnCancel", prevInterrupt)
      } else sc.clearJobGroup()
    }
  }
}
