package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial search over point columns — the Lucene.Net.Spatial module
  * re-expressed Spark-first (reference:
  * /root/reference/src/Lucene.Net.Spatial/Prefix/Tree/QuadPrefixTree.cs,
  * Prefix/RecursivePrefixTreeStrategy.cs, Prefix/IntersectsPrefixTreeFilter.cs,
  * Vector/PointVectorStrategy.cs).
  *
  * The reference indexes one term per quad-tree cell ('A'..'D' per level)
  * and intersects a query shape by recursively visiting cells: coarse
  * cells fully inside the shape match every doc sharing that term prefix;
  * boundary cells descend to finer levels. The Spark-native equivalent
  * keeps the same recursion but swaps term-prefix matching for
  * **Morton-code ranges**: a quad cell at level `l` is exactly the set of
  * leaf cells whose Z-order (Morton) code shares its `2l`-bit prefix — a
  * CONTIGUOUS range `[prefix << 2(L-l), (prefix+1) << 2(L-l))`. So
  *   - index side: each point gets a level-[[MaxLevel]] Morton code from a
  *     pure Column expression (bit-spread interleave, whole-stage codegen);
  *     [[writeIndex]] range-partitions and sorts by it, so parquet min/max
  *     stats make every cell range file- and row-group-prunable — the same
  *     seek-over-scan trade the term dictionary makes (see DictSeek).
  *   - query side: [[cover]] runs the reference's recursive visit on the
  *     DRIVER over integer cell coordinates (no floats — the grid indices
  *     are computed with the very arithmetic the Column uses, so cover
  *     soundness is exact), emitting a bounded set of merged ranges that
  *     become pushable `morton BETWEEN` predicates over the STORED code;
  *     an exact geometric refine follows, mirroring the reference's
  *     leaf-cell verification. Unindexed input (no stored code) runs the
  *     refine alone — the reference's own unindexed brute-force trade.
  *
  * At 100 TB the candidate step is a metadata-pruned scan (no shuffle, no
  * join); refinement is a codegen'd filter. Heat-map style aggregation
  * ([[cellCounts]]) is one map-side-combinable groupBy on grid cells.
  */
object Spatial {

  /** Leaf grid detail: 2^16 × 2^16 cells (~600 m × 300 m at the equator),
    * past the reference QuadPrefixTree DEFAULT_MAX_LEVELS=12 detail. */
  val MaxLevel = 16

  private val N = 1L << MaxLevel // cells per axis

  // ----------------------------------------------------------- grid math

  /** Leaf x-index of a longitude, as a Column (clamped to the grid). */
  def ixCol(lon: Column): Column =
    least(lit(N - 1), greatest(lit(0L), floor((lon + 180.0d) / 360.0d * N.toDouble)))

  /** Leaf y-index of a latitude, as a Column (clamped to the grid). */
  def iyCol(lat: Column): Column =
    least(lit(N - 1), greatest(lit(0L), floor((lat + 90.0d) / 180.0d * N.toDouble)))

  /** The SAME grid arithmetic on the driver — cover() uses this so its
    * integer cell bounds agree bit-for-bit with the Column's assignment. */
  def ix(lon: Double): Long = math.min(N - 1, math.max(0L, math.floor((lon + 180.0d) / 360.0d * N.toDouble).toLong))
  def iy(lat: Double): Long = math.min(N - 1, math.max(0L, math.floor((lat + 90.0d) / 180.0d * N.toDouble).toLong))

  /** Bit-spread a 16-bit value into the even bit positions of a 32-bit
    * lane (the classic Morton magic-mask ladder), as Column ops on longs. */
  private def spread(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x33333333L))
    (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x55555555L))
  }

  private def spread(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    (x | (x << 1)) & 0x55555555L
  }

  /** Level-[[MaxLevel]] Morton (Z-order) code of a point, pure codegen. */
  def mortonCol(lat: Column, lon: Column): Column =
    spread(ixCol(lon)).bitwiseOR(shiftleft(spread(iyCol(lat)), 1))

  /** Driver-side twin of [[mortonCol]] for integer cell coordinates. */
  def morton(ixv: Long, iyv: Long): Long = spread(ixv) | (spread(iyv) << 1)

  // ------------------------------------------------------------ covering

  /** Half-open Morton range `[lo, hi)` of leaf codes. */
  final case class MortonRange(lo: Long, hi: Long)

  /** Recursive quad cover of the leaf-index rectangle
    * `[ixMin..ixMax] × [iyMin..iyMax]` (inclusive): the reference's
    * RecursivePrefixTreeStrategy visit over integer coordinates. Descends
    * until a cell is fully inside (emit) or the cell side at the detail
    * level is reached (emit the boundary cell whole — the exact refine
    * catches the overshoot, like the reference's leaf verification).
    * `maxCellsPerSide` bounds detail: the level where the rect spans at
    * most that many cells per axis, so emitted ranges stay O(perimeter)
    * and the overshoot area is ≤ ~(1 + 2/maxCellsPerSide)² − 1. */
  def cover(ixMin: Long, ixMax: Long, iyMin: Long, iyMax: Long,
            maxCellsPerSide: Int = 8): Seq[MortonRange] = {
    require(ixMin <= ixMax && iyMin <= iyMax, "empty cell rectangle")
    // detail level: coarsest level where the rect is ≤ maxCellsPerSide wide
    val span = math.max(ixMax - ixMin + 1, iyMax - iyMin + 1)
    var detail = MaxLevel
    while (detail > 0 && (span >> (MaxLevel - detail)) + 2 > maxCellsPerSide) detail -= 1

    val out = Seq.newBuilder[MortonRange]
    def visit(level: Int, cx: Long, cy: Long): Unit = {
      val shift = MaxLevel - level
      val x0 = cx << shift; val x1 = x0 + (1L << shift) - 1
      val y0 = cy << shift; val y1 = y0 + (1L << shift) - 1
      if (x1 < ixMin || x0 > ixMax || y1 < iyMin || y0 > iyMax) () // disjoint
      else if ((x0 >= ixMin && x1 <= ixMax && y0 >= iyMin && y1 <= iyMax) ||
               level >= detail) {
        val m = morton(cx, cy) << (2 * shift)
        out += MortonRange(m, m + (1L << (2 * shift)))
      } else {
        val nx = cx << 1; val ny = cy << 1
        visit(level + 1, nx, ny); visit(level + 1, nx + 1, ny)
        visit(level + 1, nx, ny + 1); visit(level + 1, nx + 1, ny + 1)
      }
    }
    visit(0, 0, 0)
    merge(out.result())
  }

  /** Sort + coalesce adjacent/overlapping ranges (Z-order makes many
    * sibling emissions contiguous). */
  private def merge(rs: Seq[MortonRange]): Seq[MortonRange] = {
    val sorted = rs.sortBy(_.lo)
    val out = scala.collection.mutable.ArrayBuffer.empty[MortonRange]
    for (r <- sorted) {
      if (out.nonEmpty && r.lo <= out.last.hi)
        out(out.length - 1) = MortonRange(out.last.lo, math.max(out.last.hi, r.hi))
      else out += r
    }
    out.toSeq
  }

  /** Candidate predicate for a set of ranges over a Morton column —
    * parquet-pushable BETWEENs, the spatial analog of DictSeek's pushed
    * term ranges. `m` MUST be a plain (stored) column reference, never
    * the inline [[mortonCol]] expression: Column trees are trees, not
    * DAGs, so each of the 5 bit-spread ladder steps duplicates its input
    * subtree — one inline morton is ~2^5 copies of the coordinate
    * arithmetic, and an OR chain of them blows the generated
    * `processNext()` past janino's method limit, silently dropping the
    * scan out of whole-stage codegen (and a computed column can't prune
    * parquet stats anyway, so inline candidates are pure overhead). */
  def rangesPredicate(m: Column, ranges: Seq[MortonRange]): Column =
    ranges.map(r => m >= r.lo && m < r.hi).reduce(_ || _)

  /** Candidate-pruned scan when the input carries a STORED `morton`
    * column ([[writeIndex]] output — the BETWEENs push to parquet
    * min/max stats); the unchanged input otherwise, where the exact
    * refine alone is the query — the reference's own unindexed
    * brute-force trade (see [[rangesPredicate]] for why inline Morton
    * candidates are never emitted). */
  private def pruned(points: DataFrame, ranges: => Seq[MortonRange]): DataFrame =
    if (points.columns.contains("morton"))
      points.where(rangesPredicate(col("morton"), ranges))
    else points

  // ------------------------------------------------------------- queries

  /** Degree-space rectangle (points on the boundary are inside). */
  final case class Rect(latMin: Double, latMax: Double, lonMin: Double, lonMax: Double)

  /** Intersects(bbox) over a point table: Morton-range candidates then
    * exact refine. For point shapes Within ≡ Intersects (reference
    * WithinPrefixTreeFilter degenerates to this). */
  def bboxQuery(points: DataFrame, lat: Column, lon: Column, r: Rect): DataFrame =
    pruned(points, cover(ix(r.lonMin), ix(r.lonMax), iy(r.latMin), iy(r.latMax)))
      .where(lat >= r.latMin && lat <= r.latMax && lon >= r.lonMin && lon <= r.lonMax)

  /** Haversine great-circle distance in km, shaped EXACTLY like the
    * DuckDB oracle expression (same op order, same constants) so both
    * engines produce bit-identical doubles. Spherical mean radius. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val rad = lit(1.7453292519943295e-2) // pi/180
    val sdlat = sin((lat2 - lat1) * rad / 2.0d)
    val sdlon = sin((lon2 - lon1) * rad / 2.0d)
    val h = sdlat * sdlat + cos(lat1 * rad) * cos(lat2 * rad) * sdlon * sdlon
    lit(2.0d) * lit(6371.0d) * asin(least(lit(1.0d), sqrt(h)))
  }

  /** Point-radius (circle) query: cover the circle's bounding box —
    * widened in longitude by the cosine of the closest-to-pole latitude,
    * split at the dateline when it wraps — then refine by exact
    * haversine. Returns the input rows plus a `dist_km` column. */
  def distanceQuery(points: DataFrame, lat: Column, lon: Column,
                    centerLat: Double, centerLon: Double, radiusKm: Double): DataFrame = {
    val latDeg = radiusKm / 111.19492664455873d // km per degree at R=6371
    val latMin = math.max(-90.0, centerLat - latDeg)
    val latMax = math.min(90.0, centerLat + latDeg)
    val maxAbsLat = math.min(89.9, math.max(math.abs(latMin), math.abs(latMax)))
    val lonDeg = math.min(360.0, latDeg / math.cos(maxAbsLat * math.Pi / 180.0))
    // a circle whose latitude band clamps at a pole CONTAINS that pole and
    // therefore spans every longitude — no cosine widening can cover the
    // far side of the pole, so the interval must be the full circle
    val poleInside = latMax >= 90.0 || latMin <= -90.0
    // dateline wrap → two disjoint lon intervals (reference handles this
    // in SpatialContext's world-wrap; we split the cover instead)
    val lonIntervals: Seq[(Double, Double)] =
      if (poleInside || lonDeg * 2 >= 360.0) Seq((-180.0, 180.0))
      else {
        val lo = centerLon - lonDeg; val hi = centerLon + lonDeg
        if (lo < -180.0) Seq((-180.0, hi), (lo + 360.0, 180.0))
        else if (hi > 180.0) Seq((lo, 180.0), (-180.0, hi - 360.0))
        else Seq((lo, hi))
      }
    val d = haversineKm(lat, lon, lit(centerLat), lit(centerLon))
    pruned(points, merge(lonIntervals.flatMap { case (lo, hi) =>
        cover(ix(lo), ix(hi), iy(latMin), iy(latMax))
      }))
      .withColumn("dist_km", d)
      .where(col("dist_km") <= radiusKm)
  }

  /** Grid-cell heat map at `level`: one map-side-combinable groupBy.
    * Cell indices use the same floor arithmetic as the oracle SQL. */
  def cellCounts(points: DataFrame, lat: Column, lon: Column, level: Int): DataFrame = {
    val side = (1L << level).toDouble
    points
      .groupBy(
        floor((lon + 180.0d) / 360.0d * side).cast("long").as("cell_x"),
        floor((lat + 90.0d) / 180.0d * side).cast("long").as("cell_y"))
      .count()
      .withColumnRenamed("count", "cnt")
  }

  // --------------------------------------------------------------- index

  /** Persist a point table as a Morton-ordered spatial index: range
    * partitioning (files prune) + within-partition sort (row groups
    * prune), so [[rangesPredicate]] reaches the scan as parquet
    * min/max-prunable filters — the write-side half of the seek path. */
  def writeIndex(points: DataFrame, lat: Column, lon: Column,
                 outDir: String, numPartitions: Int): Unit = {
    points
      .withColumn("morton", mortonCol(lat, lon))
      .repartitionByRange(numPartitions, col("morton"))
      .sortWithinPartitions(col("morton"))
      .write.mode("overwrite").parquet(outDir)
  }
}
