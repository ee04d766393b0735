package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geohash prefix tree — the reference's second SpatialPrefixTree
  * implementation (reference:
  * /root/reference/src/Lucene.Net.Spatial/Prefix/Tree/GeohashPrefixTree.cs
  * :30-120, which delegates the cell math to Spatial4n's GeohashUtils):
  * base-32 geohashes, 5 bits per level, lon bit first. A cell = a hash
  * prefix; child cells append one character — so prefix predicates prune
  * an indexed geohash column exactly like Morton ranges prune the quad
  * tree, and the two trees are interchangeable front-ends over the same
  * point table.
  *
  * Everything here is the PUBLIC geohash algorithm (Niemeyer 2008), not a
  * port: MSB-first interleave starting with longitude, alphabet
  * "0123456789bcdefghjkmnpqrstuvwxyz".
  */
object Geohash {

  private val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
  /** GeohashPrefixTree.GetMaxLevelsPossible (:62): 24 chars. */
  val MaxLevels = 12 // 60 bits — one long; plenty below ~2 cm cells

  // ------------------------------------------------------------ scalar

  /** Encode to `precision` chars. */
  def encode(lat: Double, lon: Double, precision: Int): String = {
    require(precision >= 1 && precision <= MaxLevels, s"precision $precision")
    val sb = new java.lang.StringBuilder(precision)
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var isLon = true
    var bit = 0
    var ch = 0
    while (sb.length < precision) {
      if (isLon) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      isLon = !isLon
      bit += 1
      if (bit == 5) { sb.append(Alphabet.charAt(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  /** Decode a hash to its cell bbox (latMin, latMax, lonMin, lonMax). */
  def decodeBounds(hash: String): (Double, Double, Double, Double) = {
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var isLon = true
    hash.foreach { c =>
      val v = Alphabet.indexOf(c.toLower)
      require(v >= 0, s"bad geohash char '$c'")
      var b = 4
      while (b >= 0) {
        val bit = (v >> b) & 1
        if (isLon) {
          val mid = (lonLo + lonHi) / 2
          if (bit == 1) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (bit == 1) latLo = mid else latHi = mid
        }
        isLon = !isLon
        b -= 1
      }
    }
    (latLo, latHi, lonLo, lonHi)
  }

  /** Cell-center decode. */
  def decode(hash: String): (Double, Double) = {
    val (a, b, c, d) = decodeBounds(hash)
    ((a + b) / 2, (c + d) / 2)
  }

  /** The 8 neighbors of a cell (N, NE, E, SE, S, SW, W, NW), longitude
    * wrapping at the dateline; latitude neighbors past a pole are
    * dropped. */
  def neighbors(hash: String): Seq[String] = {
    val (latLo, latHi, lonLo, lonHi) = decodeBounds(hash)
    val dLat = latHi - latLo
    val dLon = lonHi - lonLo
    val cLat = (latLo + latHi) / 2
    val cLon = (lonLo + lonHi) / 2
    def wrapLon(x: Double) =
      if (x > 180) x - 360 else if (x < -180) x + 360 else x
    for {
      dy <- Seq(1, 0, -1)
      dx <- Seq(-1, 0, 1)
      if !(dx == 0 && dy == 0)
      lat = cLat + dy * dLat
      if lat > -90 && lat < 90
    } yield encode(lat, wrapLon(cLon + dx * dLon), hash.length)
  }

  // ------------------------------------------------------------ column

  // Morton magic-mask ladder over up-to-30-bit values (precision ≤ 12 →
  // nlon ≤ 30): the DAG-free bit spread (each step references the prior
  // step, not the input — the same shape [[Spatial.mortonCol]] uses).
  private def spread30(c: Column): Column = {
    var x = c.bitwiseAND(lit(0x3FFFFFFFL))
    x = (x.bitwiseOR(shiftleft(x, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x3333333333333333L))
    (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Geohash of (lat, lon) as a codegen'd Column, no UDF. The MSB-first
    * lon-first interleave IS a Morton code, but which lane (even/odd bit
    * positions of the packed long) holds lon depends on the PARITY of
    * `bits = 5*precision`: the LSB of the packed value is the LAST bit
    * of the MSB-first sequence, which is a lon bit when `bits` is odd
    * (odd precision) and a lat bit when `bits` is even. So
    * `acc = spread(lon) | spread(lat) << 1` for odd precision and
    * `acc = spread(lat) | spread(lon) << 1` for even — and the base-32
    * string is one `conv` + `translate` (conv's 0-9A-V digits mapped
    * onto the geohash alphabet), so the interleave appears EXACTLY ONCE
    * in the expression tree: naive per-char extraction would re-inline
    * the whole interleave per character and blow the stage out of
    * whole-stage codegen (PlanSpec asserts it stays in). */
  def geohashCol(lat: Column, lon: Column, precision: Int): Column = {
    require(precision >= 1 && precision <= MaxLevels, s"precision $precision")
    val bits = 5 * precision
    val nlon = (bits + 1) / 2
    val nlat = bits / 2
    val lonQ = least(lit((1L << nlon) - 1), greatest(lit(0L),
      floor((lon + 180.0d) / 360.0d * (1L << nlon).toDouble))).cast("long")
    val latQ = least(lit((1L << nlat) - 1), greatest(lit(0L),
      floor((lat + 90.0d) / 180.0d * (1L << nlat).toDouble))).cast("long")
    val acc =
      if (bits % 2 == 1) spread30(lonQ).bitwiseOR(shiftleft(spread30(latQ), 1))
      else spread30(latQ).bitwiseOR(shiftleft(spread30(lonQ), 1))
    translate(
      lpad(conv(acc.cast("string"), 10, 32), precision, "0"),
      "0123456789ABCDEFGHIJKLMNOPQRSTUV", Alphabet)
  }

  /** Covering cells of a bbox at `precision`: step the cell lattice over
    * the rect (dateline-split like the quad cover). The result feeds
    * [[prefixPredicate]]. */
  def cover(r: Spatial.Rect, precision: Int): Seq[String] = {
    val (latLo, latHi, lonLo, lonHi) = decodeBounds(encode(r.latMin, r.lonMin, precision))
    val dLat = latHi - latLo
    val dLon = lonHi - lonLo
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    var lat = r.latMin
    while (lat <= r.latMax + dLat / 2) {
      var lon = r.lonMin
      while (lon <= r.lonMax + dLon / 2) {
        val la = math.min(r.latMax, math.max(r.latMin, lat))
        val lo = math.min(r.lonMax, math.max(r.lonMin, lon))
        out += encode(la, lo, precision)
        lon += dLon
      }
      lat += dLat
    }
    out.toSeq
  }

  /** Prefix-prune predicate over an indexed geohash column: geohash
    * prefixes are string RANGES ([h, h + '~')) so the predicate reaches
    * parquet min/max stats when the table is sorted by the hash — the
    * GeohashPrefixTree cell-seek, relationally. */
  def prefixPredicate(hashCol: Column, prefixes: Seq[String]): Column =
    prefixes.map(h => hashCol.startsWith(h)).reduce(_ || _)

  /** bbox query through the geohash tree: covering-prefix prune (when an
    * indexed `geohash` column exists) + exact refine — interchangeable
    * with [[Spatial.bboxQuery]]'s Morton path. */
  def bboxQuery(points: DataFrame, lat: Column, lon: Column, r: Spatial.Rect,
      precision: Int = 4): DataFrame = {
    val base =
      if (points.columns.contains("geohash"))
        points.where(prefixPredicate(col("geohash"), cover(r, precision)))
      else points
    base.where(lat >= r.latMin && lat <= r.latMax &&
      lon >= r.lonMin && lon <= r.lonMax)
  }

  /** Persist a geohash-sorted point table (the geohash twin of
    * [[Spatial.writeIndex]]): range-partition + sort by the hash so
    * prefix predicates prune files and row groups. */
  def writeIndex(points: DataFrame, lat: Column, lon: Column,
      outDir: String, numPartitions: Int, precision: Int = 6): Unit = {
    points
      .withColumn("geohash", geohashCol(lat, lon, precision))
      .repartitionByRange(numPartitions, col("geohash"))
      .sortWithinPartitions(col("geohash"))
      .write.mode("overwrite").parquet(outDir)
  }
}
