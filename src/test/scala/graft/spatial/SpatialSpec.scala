package graft.spatial

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quad-prefix-tree spatial search as Morton-range pruning (reference
  * surface: Lucene.Net.Spatial Prefix/RecursivePrefixTreeStrategy.cs +
  * Prefix/Tree/QuadPrefixTree.cs). Soundness bar: candidates ⊇ exact
  * answer for every shape; refined result ≡ brute-force geometry. */
class SpatialSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Deterministic scattered points (id, lat, lon). */
  private def points(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val lat = ((i.toLong * 7919) % 18000) / 100.0 - 90.0
      val lon = ((i.toLong * 104729) % 36000) / 100.0 - 180.0
      (i.toLong, lat, lon)
    }.toDF("id", "lat", "lon")
  }

  test("driver morton == column morton on a sample") {
    val df = points(500).withColumn("m", Spatial.mortonCol(col("lat"), col("lon")))
    df.collect().foreach { r =>
      val expected = Spatial.morton(
        Spatial.ix(r.getDouble(2)), Spatial.iy(r.getDouble(1)))
      assert(r.getAs[Long]("m") === expected, s"row $r")
    }
  }

  test("cover soundness + tightness: every in-rect leaf is covered, ranges bounded & disjoint") {
    val rects = Seq(
      Spatial.Rect(10, 25, -40, -5), Spatial.Rect(-90, 90, -180, 180),
      Spatial.Rect(0.001, 0.002, 0.001, 0.002), Spatial.Rect(-1, 1, 170, 180),
      Spatial.Rect(59.9, 60.1, -0.05, 0.05))
    for (r <- rects) {
      val ranges = Spatial.cover(
        Spatial.ix(r.lonMin), Spatial.ix(r.lonMax),
        Spatial.iy(r.latMin), Spatial.iy(r.latMax))
      assert(ranges.size <= 64, s"too many ranges for $r: ${ranges.size}")
      assert(ranges.sliding(2).forall {
        case Seq(a, b) => a.hi < b.lo  // merged: strictly disjoint, sorted
        case _ => true
      }, s"unmerged ranges for $r")
      // probe the rect interior + corners: each leaf morton must be covered
      val probes = for {
        lat <- Seq(r.latMin, r.latMax, (r.latMin + r.latMax) / 2)
        lon <- Seq(r.lonMin, r.lonMax, (r.lonMin + r.lonMax) / 2)
      } yield Spatial.morton(Spatial.ix(lon), Spatial.iy(lat))
      probes.foreach { m =>
        assert(ranges.exists(g => m >= g.lo && m < g.hi), s"uncovered probe in $r")
      }
    }
  }

  test("bboxQuery ≡ brute-force filter") {
    val df = points(3000)
    val r = Spatial.Rect(10, 25, -40, -5)
    val got = Spatial.bboxQuery(df, col("lat"), col("lon"), r)
      .select("id").collect().map(_.getLong(0)).sorted
    val want = df.where(col("lat").between(r.latMin, r.latMax) &&
        col("lon").between(r.lonMin, r.lonMax))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(want.nonEmpty && got.sameElements(want))
  }

  test("distanceQuery ≡ brute-force haversine, incl. dateline wrap") {
    val df = points(3000)
    for ((clat, clon, rad) <- Seq((20.0, 10.0, 1500.0), (0.0, 179.5, 800.0), (85.0, 0.0, 1200.0))) {
      val got = Spatial.distanceQuery(df, col("lat"), col("lon"), clat, clon, rad)
        .select("id").collect().map(_.getLong(0)).sorted
      val want = df.withColumn("d",
          Spatial.haversineKm(col("lat"), col("lon"), lit(clat), lit(clon)))
        .where(col("d") <= rad).select("id").collect().map(_.getLong(0)).sorted
      assert(got.sameElements(want), s"center=($clat,$clon) r=$rad")
      assert(want.nonEmpty, s"degenerate fixture at ($clat,$clon)")
    }
  }

  test("cellCounts: totals preserved, cells within grid") {
    val df = points(2000)
    val cc = Spatial.cellCounts(df, col("lat"), col("lon"), level = 4).collect()
    assert(cc.map(_.getAs[Long]("cnt")).sum === 2000)
    assert(cc.forall { r =>
      val x = r.getAs[Long]("cell_x"); val y = r.getAs[Long]("cell_y")
      x >= 0 && x < 16 && y >= 0 && y < 16
    })
  }

  test("morton index: range predicates reach the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-spatial").toString
    Spatial.writeIndex(points(3000), col("lat"), col("lon"), s"$dir/idx", numPartitions = 4)
    val idx = spark.read.parquet(s"$dir/idx")
    val r = Spatial.Rect(10, 25, -40, -5)
    val ranges = Spatial.cover(
      Spatial.ix(r.lonMin), Spatial.ix(r.lonMax), Spatial.iy(r.latMin), Spatial.iy(r.latMax))
    val q = idx.where(Spatial.rangesPredicate(col("morton"), ranges))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("morton"),
      s"morton ranges not pushed:\n$plan")
    // candidates ⊇ exact
    val cand = q.select("id").collect().map(_.getLong(0)).toSet
    val exact = idx.where(col("lat").between(r.latMin, r.latMax) &&
      col("lon").between(r.lonMin, r.lonMax)).select("id").collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(cand) && exact.nonEmpty)
  }

  test("bboxQuery over a stored index: pruned scan, codegen intact, ≡ brute force") {
    val dir = java.nio.file.Files.createTempDirectory("graft-spatial2").toString
    Spatial.writeIndex(points(3000), col("lat"), col("lon"), s"$dir/idx", numPartitions = 4)
    val idx = spark.read.parquet(s"$dir/idx")
    val r = Spatial.Rect(10, 25, -40, -5)
    val q = Spatial.bboxQuery(idx, col("lat"), col("lon"), r)
    val plan = q.queryExecution.executedPlan.toString
    // the cover's BETWEENs reach the scan AND the filter stays inside
    // whole-stage codegen (the inline-morton tree would fall out of it)
    assert(plan.contains("PushedFilters") && plan.contains("morton"),
      s"stored-index bbox not pruned:\n$plan")
    assert(q.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, s"bbox fell out of codegen:\n$plan")
    val got = q.select("id").collect().map(_.getLong(0)).sorted
    val want = idx.where(col("lat").between(r.latMin, r.latMax) &&
      col("lon").between(r.lonMin, r.lonMax)).select("id").collect().map(_.getLong(0)).sorted
    assert(want.nonEmpty && got.sameElements(want))
  }

  test("distanceQuery over a stored index: pole-containing circle wraps all longitudes") {
    // regression: a small circle whose latitude band clamps at +90 contains
    // the pole, so a point on the FAR side (lon ~179) is ~2.2 km away yet
    // was pruned out by the cosine-widened candidate interval (±25.8°)
    import spark.implicits._
    val polar = Seq((90001L, 89.99, 179.0), (90002L, 89.97, -120.0), (90003L, 89.99, 25.0))
      .toDF("id", "lat", "lon")
    val dir = java.nio.file.Files.createTempDirectory("graft-spatial3").toString
    Spatial.writeIndex(points(2000).union(polar), col("lat"), col("lon"),
      s"$dir/idx", numPartitions = 4)
    val idx = spark.read.parquet(s"$dir/idx")
    val (clat, clon, rad) = (89.99, 0.0, 5.0)
    val got = Spatial.distanceQuery(idx, col("lat"), col("lon"), clat, clon, rad)
      .select("id").collect().map(_.getLong(0)).sorted
    val want = idx.withColumn("d",
        Spatial.haversineKm(col("lat"), col("lon"), lit(clat), lit(clon)))
      .where(col("d") <= rad).select("id").collect().map(_.getLong(0)).sorted
    assert(want.contains(90001L), "fixture: the far-side-of-pole point is in radius")
    assert(got.sameElements(want))
  }
}
