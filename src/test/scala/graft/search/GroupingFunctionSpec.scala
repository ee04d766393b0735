package graft.search

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Function*Collector analogs (ValueSource-keyed grouping) + the
  * DistinctValuesCollector. */
class GroupingFunctionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val hits = {
    import spark.implicits._
    Seq(
      (0L, "scala", 10, 0.9), (1L, "scala", 25, 0.8), (2L, "java", 10, 0.7),
      (3L, "java", 31, 0.95), (4L, "go", 7, 0.5)
    ).toDF("doc_id", "lang", "len", "score")
  }

  test("allGroupsBy / allGroupHeadsBy on a computed key") {
    // ValueSource key: length bucket (len / 10)
    val buckets = Grouping.allGroupsBy(hits, (col("len") / 10).cast("int"))
      .collect().map(_.getInt(0)).toSet
    assert(buckets == Set(0, 1, 2, 3))

    // head per bucket by score DESC (negated for the struct-min), tie → doc
    val heads = Grouping.allGroupHeadsBy(hits, (col("len") / 10).cast("int"),
        Seq(negate(col("score"))))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(heads == Map(0 -> 4L, 1 -> 0L, 2 -> 1L, 3 -> 3L))
  }

  test("distinctValues per group (Term/FunctionDistinctValuesCollector)") {
    val dv = Grouping.distinctValues(hits, col("lang"), col("len"))
      .collect().map(r => (r.getString(0),
        r.getSeq[Int](1).toList, r.getLong(2))).sortBy(_._1).toList
    assert(dv == List(
      ("go", Seq(7), 1L), ("java", Seq(10, 31), 2L), ("scala", Seq(10, 25), 2L)))
  }


  test("TermsFilter query node + taxonomyStats") {
    val q = Filters.termsFilter(Seq("merge", "lang:scala", "merge"))
    assert(q == ConstantScoreQ(BoolQ(Nil,
      Seq(TermQ("merge"), TermQ("lang:scala")), Nil)))
    assertThrows[IllegalArgumentException](Filters.termsFilter(Nil))

    import spark.implicits._
    val df = Seq("a/b", "a/c", "a/b", "d/e").toDF("cat")
    val stats = Facets.taxonomyStats(df, "cat")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // dimension a: ords {a, a/b, a/c} = 3, occurrences 3+2+1 = 6
    assert(stats.toList == List(("a", 3L, 6L), ("d", 2L, 2L)))
  }
}
