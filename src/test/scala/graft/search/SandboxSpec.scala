package graft.search

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Sandbox queries (reference: Lucene.Net.Sandbox/Queries/) —
  * DuplicateFilter keep modes, SlowFuzzy similarity semantics, and
  * SortedSetSortField selectors. */
class SandboxSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("duplicateFilter: keeper is global per key, then ANDed with hits") {
    val keys = Seq(
      (0L, "a"), (1L, "a"), (2L, "a"),
      (3L, "b"), (4L, "b"),
      (5L, "c")).toDF("doc_id", "key")
    val hits = Seq(0L, 1L, 3L, 5L).toDF("doc_id")
    // last occurrence: keepers = {2, 4, 5}; 2 and 4 are keepers but not
    // hits, 5 is both — only 5 survives
    val last = Sandbox.duplicateFilter(keys, hits, Sandbox.KeepLastOccurrence)
      .as[Long].collect().toSet
    assert(last == Set(5L))
    // first occurrence: keepers = {0, 3, 5}, all of which are hits
    val first = Sandbox.duplicateFilter(keys, hits, Sandbox.KeepFirstOccurrence)
      .as[Long].collect().toSet
    assert(first == Set(0L, 3L, 5L))
  }

  test("slowFuzzyTerms: fraction similarity, strict >, prefix pushdown") {
    val dict = Seq(
      ("merge", 10L), ("marge", 8L), ("merg", 5L), ("mergers", 4L),
      ("purge", 3L), ("me", 2L), ("mx", 1L)).toDF("term", "df")
    // query "merge", minSim 0.5, prefix 1:
    //  marge  : suffix edits 1, sim = 1 - 1/5 = 0.8  > 0.5  ✓
    //  merg   : edits 1, sim = 1 - 1/4 = 0.75        > 0.5  ✓
    //  mergers: edits 2, sim = 1 - 2/5 = 0.6         > 0.5  ✓
    //  me     : edits 3, sim = 1 - 3/2 = -0.5               ✗
    //  mx     : edits 4, sim = 1 - 4/2 = -1.0               ✗
    //  purge  : prefix 'p' != 'm' — pruned before the residual
    val got = Sandbox.slowFuzzyTerms(dict, "merge", 0.5f, prefixLength = 1)
      .select("term").as[String].collect().toSeq
    assert(got == Seq("merge", "marge", "merg", "mergers")) // sim desc, term asc
    // raw edit-budget mode (minSim >= 1): edits on suffix <= 2
    val raw = Sandbox.slowFuzzyTerms(dict, "merge", 2f, prefixLength = 1)
      .select("term").as[String].collect().toSet
    assert(raw == Set("merge", "marge", "merg", "mergers"))
    // strict >: a term at exactly minSim is rejected
    // "ma" vs query "me" with p=0: edits 1, sim = 1 - 1/2 = 0.5, NOT > 0.5
    val edge = Sandbox.slowFuzzyTerms(Seq(("ma", 1L)).toDF("term", "df"),
      "me", 0.5f).count()
    assert(edge == 0L)
  }

  test("sortedSetSelect: min / max / middleMin / middleMax over the sorted set") {
    val df = Seq((Seq("d", "b", "a", "c", "b"))).toDF("v") // set = [a,b,c,d]
    def sel(s: String): String =
      df.select(Sandbox.sortedSetSelect(col("v"), s)).as[String].head()
    assert(sel("min") == "a")
    assert(sel("max") == "d")
    assert(sel("middleMin") == "b") // lower of the two middles (even size)
    assert(sel("middleMax") == "c") // upper of the two middles
    val odd = Seq((Seq("c", "a", "b"))).toDF("v") // set = [a,b,c]
    def selOdd(s: String): String =
      odd.select(Sandbox.sortedSetSelect(col("v"), s)).as[String].head()
    assert(selOdd("middleMin") == "b")
    assert(selOdd("middleMax") == "b") // odd size: both middles coincide
  }
}
