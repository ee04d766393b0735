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
}
