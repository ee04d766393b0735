package graft.search

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Facet extensions (reference: Lucene.Net.Facet) — sampled counts with
  * amortized caps, association sums with rollup, overlapping ranges. */
class FacetsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sampledCounts: exact when hits <= sampleSize") {
    val hits = Seq(1L, 2L, 3L).toDF("doc_id")
    val labels = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b")).toDF("doc_id", "label")
    val got = Facets.sampledCounts(hits, labels, sampleSize = 10)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
  }

  test("sampledCounts: samples the residue class and caps at the label df") {
    // 40 hits, sampleSize 10 -> binSize 4 -> sample = doc_id % 4 == 0 (10 docs)
    val hits = (0L until 40L).toDF("doc_id")
    // label 'a' on all docs; label 'rare' only on the sampled doc 0 with
    // global df 1 — extrapolation 1*4=4 must be capped at 1
    val labels = (0L until 40L).map(i => (i, "a")).toDF("doc_id", "label")
      .union(Seq((0L, "rare")).toDF("doc_id", "label"))
    val got = Facets.sampledCounts(hits, labels, sampleSize = 10)
      .as[(String, Long)].collect().toMap
    assert(got("a") == 40L) // 10 sampled * 4, equals (and capped at) df 40
    assert(got("rare") == 1L) // capped at the true df, not 4
  }

  test("associationSums: values roll up every path prefix") {
    val df = Seq(("x/y", 2L), ("x/z", 3L), ("x", 5L)).toDF("p", "v")
    val got = Facets.associationSums(df, "p", col("v"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("x" -> 10L, "x/y" -> 2L, "x/z" -> 3L))
  }

  test("taxonomy separators are literals, not regexes; labels with quotes are safe") {
    // a '.' separator must not split on every character (split() is
    // regex-backed — regression for the raw-SQL interpolation)
    val df = Seq("com.example.app", "com.example").toDF("p")
    val got = Facets.taxonomyCounts(df, "p", sep = ".")
      .as[(String, Long)].collect().toMap
    assert(got == Map("com" -> 2L, "com.example" -> 2L, "com.example.app" -> 1L))
    // a single quote in a range label must not break plan construction
    val counts = Facets.rangeCounts(Seq(1L, 2L).toDF("v"), col("v"),
      Seq(Facets.LongFacetRange("men's wear", 0, minInclusive = true,
        10, maxInclusive = true))).as[(String, Long)].collect().toMap
    assert(counts == Map("men's wear" -> 2L))
  }

  test("exclusive bounds at the type extremum are rejected (FailNoMatch), not wrapped") {
    import Facets.{DoubleFacetRange, LongFacetRange}
    intercept[IllegalArgumentException] {
      LongFacetRange("wrap", Long.MaxValue, minInclusive = false, 100L, maxInclusive = true)
    }
    intercept[IllegalArgumentException] {
      LongFacetRange("wrap2", 0L, minInclusive = true, Long.MinValue, maxInclusive = false)
    }
    intercept[IllegalArgumentException] {
      DoubleFacetRange("inf", Double.PositiveInfinity, minInclusive = false,
        Double.PositiveInfinity, maxInclusive = true)
    }
    intercept[IllegalArgumentException] {
      DoubleFacetRange("ninf", -1.0, minInclusive = true,
        Double.NegativeInfinity, maxInclusive = false)
    }
  }

  test("rangeCounts: overlapping ranges each count independently; bounds normalize") {
    import Facets.LongFacetRange
    val df = Seq(5L, 10L, 15L, 20L, 25L).toDF("doc_id")
    val got = Facets.rangeCounts(df, col("doc_id"), Seq(
      LongFacetRange("lo", 0, minInclusive = true, 15, maxInclusive = false), // [0,14]: 5,10
      LongFacetRange("mid", 10, minInclusive = true, 20, maxInclusive = true), // 10,15,20
      LongFacetRange("hi", 15, minInclusive = false, 30, maxInclusive = true) // [16,30]: 20,25
    )).as[(String, Long)].collect().toMap
    assert(got == Map("lo" -> 2L, "mid" -> 3L, "hi" -> 2L))
  }

  test("rangeCountsDouble: exclusive bounds normalize via nextUp/nextAfter") {
    import Facets.DoubleFacetRange
    val df = Seq(1.0, 2.0, 3.0).toDF("v")
    val got = Facets.rangeCountsDouble(df, col("v"), Seq(
      DoubleFacetRange("open", 1.0, minInclusive = false, 3.0, maxInclusive = false),
      DoubleFacetRange("closed", 1.0, minInclusive = true, 3.0, maxInclusive = true)
    )).as[(String, Long)].collect().toMap
    assert(got == Map("open" -> 1L, "closed" -> 3L))
    intercept[IllegalArgumentException] {
      DoubleFacetRange("nan", Double.NaN, minInclusive = true, 1.0, maxInclusive = true)
    }
  }

  test("chained filter: fold with AND/OR/ANDNOT/XOR set semantics") {
    def s(ids: Long*) = ids.toDF("doc_id")
    // ((1,2,3 OR 3,4) ANDNOT 4) XOR (3,5) = ({1,2,3} XOR {3,5}) = {1,2,5}
    val got = Filters.chained(s(1, 2, 3), Seq(
      (Filters.Or, s(3, 4)),
      (Filters.AndNot, s(4)),
      (Filters.Xor, s(3, 5)))).as[Long].collect().toSet
    assert(got == Set(1L, 2L, 5L))
    val and = Filters.chained(s(1, 2), Seq((Filters.And, s(2, 3)))).as[Long].collect().toSet
    assert(and == Set(2L))
  }
}
