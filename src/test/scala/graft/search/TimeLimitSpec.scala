package graft.search

import graft.SparkTestSession.spark
import org.scalatest.funsuite.AnyFunSuite

class TimeLimitSpec extends AnyFunSuite {

  test("a search inside the budget completes; past it throws " +
       "TimeExceededException with elapsed >= allowed") {
    import spark.implicits._
    // fast action: finishes well within budget
    val fast = TimeLimit.withTimeout(spark, 30000) {
      spark.range(1000).as[Long].reduce(_ + _)
    }
    assert(fast === 499500L)
    // slow action: every partition sleeps past the deadline
    val ex = intercept[TimeLimit.TimeExceededException] {
      TimeLimit.withTimeout(spark, 300) {
        spark.range(64).repartition(8).mapPartitions { it =>
          Thread.sleep(5000); it
        }.count()
      }
    }
    assert(ex.timeAllowedMs === 300)
    assert(ex.timeElapsedMs >= 300)
    // the session is still usable after the cancellation
    assert(spark.range(10).count() === 10)
  }

  test("a post-deadline failure carries the real error as the cause") {
    val ex = intercept[TimeLimit.TimeExceededException] {
      TimeLimit.withTimeout(spark, 50) {
        Thread.sleep(300) // deadline fires (no job to cancel)
        throw new IllegalStateException("typo'd column")
      }
    }
    assert(ex.getCause != null &&
      ex.getCause.getMessage === "typo'd column")
  }

  test("nesting restores the enclosing job group (outer budget stays binding)") {
    val sc = spark.sparkContext
    TimeLimit.withTimeout(spark, 60000) {
      val outerGroup = sc.getLocalProperty("spark.jobGroup.id")
      assert(outerGroup != null && outerGroup.startsWith("graft-timelimit-"))
      val inner = TimeLimit.withTimeout(spark, 60000) { 42 }
      assert(inner === 42)
      // the inner finally must restore the OUTER group, not clear it —
      // else jobs after the inner call escape the outer deadline
      assert(sc.getLocalProperty("spark.jobGroup.id") === outerGroup)
    }
    assert(sc.getLocalProperty("spark.jobGroup.id") == null)
  }
}
