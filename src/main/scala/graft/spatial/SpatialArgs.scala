package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SpatialArgs / SpatialArgsParser / SpatialOperation (reference:
  * /root/reference/src/Lucene.Net.Spatial/Queries/SpatialArgsParser.cs
  * :40-130, SpatialArgs.cs, SpatialOperation.cs:40-150): the text query
  * front-end of the spatial module —
  *
  *   `Intersects(ENVELOPE(-10, 10, 45, 40)) distErrPct=0.025`
  *   `IsWithin(BUFFER(POINT(2.3 48.8), 5.0))`
  *
  * Shape grammar (the Spatial4n subset the reference tests use): `POINT(x
  * y)` (x = lon, y = lat — WKT axis order), `ENVELOPE(minX, maxX, maxY,
  * minY)` (the spatial4j envelope order), `BUFFER(POINT(x y), distDeg)` —
  * a point-radius circle with the distance in DEGREES like the reference.
  *
  * Execution over a point table: Intersects ≡ IsWithin for point data
  * (each doc is a point; it intersects a shape iff it lies within it);
  * IsDisjointTo is the negation; Contains matches only when the shape is
  * a POINT the doc equals; BBox* run against the shape's bounding box.
  * The candidate prune rides the existing Morton machinery
  * ([[Spatial.bboxQuery]]/[[Spatial.distanceQuery]]). */
object SpatialArgs {

  sealed trait Shape
  final case class Point(lon: Double, lat: Double) extends Shape
  /** minX/maxX = lon, minY/maxY = lat. */
  final case class Envelope(minX: Double, maxX: Double,
                            minY: Double, maxY: Double) extends Shape
  /** Circle of radius `distDeg` DEGREES around a point. */
  final case class Circle(center: Point, distDeg: Double) extends Shape

  sealed abstract class Op(val name: String)
  case object Intersects extends Op("Intersects")
  case object IsWithin extends Op("IsWithin")
  case object Contains extends Op("Contains")
  case object IsDisjointTo extends Op("IsDisjointTo")
  case object BBoxWithin extends Op("BBoxWithin")
  case object BBoxIntersects extends Op("BBoxIntersects")
  case object IsEqualTo extends Op("IsEqualTo")

  final case class Args(op: Op, shape: Shape, distErrPct: Option[Double] = None)

  private val ops: Map[String, Op] = Seq(Intersects, IsWithin, Contains,
    IsDisjointTo, BBoxWithin, BBoxIntersects, IsEqualTo)
    .map(o => o.name.toLowerCase -> o).toMap ++
    // the reference registers these aliases (SpatialOperation.cs:60-75)
    Map("within" -> IsWithin, "disjoint" -> IsDisjointTo,
        "equals" -> IsEqualTo)

  /** Parse `Op(Shape) [key=value ...]` — the reference's
    * SpatialArgsParser.Parse contract, including its errors for unknown
    * operations and malformed bodies. */
  def parse(text: String): Args = {
    val t = text.trim
    val open = t.indexOf('(')
    require(open > 0, s"missing '(' in: $text")
    val close = t.lastIndexOf(')')
    require(close > open, s"missing ')' in: $text")
    val opName = t.substring(0, open).trim
    val op = ops.getOrElse(opName.toLowerCase,
      throw new IllegalArgumentException(s"Unknown operation: $opName"))
    val body = t.substring(open + 1, close).trim
    val tail = t.substring(close + 1).trim
    val distErr = tail.split("\\s+").collectFirst {
      case kv if kv.toLowerCase.startsWith("disterrpct=") =>
        kv.substring("distErrPct=".length).toDouble
    }
    Args(op, parseShape(body), distErr)
  }

  def parseShape(body: String): Shape = {
    val b = body.trim
    val upper = b.toUpperCase(java.util.Locale.ROOT)
    if (upper.startsWith("POINT")) {
      val nums = numbers(b, 2)
      Point(nums(0), nums(1))
    } else if (upper.startsWith("ENVELOPE")) {
      val n = numbers(b, 4)
      // spatial4j order: minX, maxX, maxY, minY
      Envelope(n(0), n(1), n(3), n(2))
    } else if (upper.startsWith("BUFFER")) {
      val inner = b.substring(b.indexOf('(') + 1, b.lastIndexOf(')'))
      val comma = inner.lastIndexOf(',')
      require(comma > 0, s"BUFFER needs (shape, dist): $body")
      val base = parseShape(inner.substring(0, comma))
      val dist = inner.substring(comma + 1).trim.toDouble
      base match {
        case p: Point => Circle(p, dist)
        case other => throw new IllegalArgumentException(
          s"BUFFER supported over POINT only, got $other")
      }
    } else throw new IllegalArgumentException(s"Unknown shape: $body")
  }

  private def numbers(s: String, n: Int): Array[Double] = {
    val inner = s.substring(s.indexOf('(') + 1, s.lastIndexOf(')'))
    val nums = inner.split("[,\\s]+").filter(_.nonEmpty).map(_.toDouble)
    require(nums.length == n, s"expected $n numbers in: $s")
    nums
  }

  private def bbox(shape: Shape): Spatial.Rect = shape match {
    case Point(lon, lat) => Spatial.Rect(lat, lat, lon, lon)
    case Envelope(minX, maxX, minY, maxY) => Spatial.Rect(minY, maxY, minX, maxX)
    case Circle(Point(lon, lat), d) =>
      Spatial.Rect(math.max(-90, lat - d), math.min(90, lat + d),
        math.max(-180, lon - d), math.min(180, lon + d))
  }

  /** Execute parsed args over a point table — returns the matching rows
    * (for IsDisjointTo, the complement; prune helps the POSITIVE side
    * only, the negation scans, like the reference's DisjointSpatialFilter
    * which flips a cached positive filter). */
  def query(points: DataFrame, lat: Column, lon: Column, args: Args): DataFrame = {
    def positive(shape: Shape): DataFrame = shape match {
      case Envelope(minX, maxX, minY, maxY) =>
        Spatial.bboxQuery(points, lat, lon, Spatial.Rect(minY, maxY, minX, maxX))
      case p @ Point(plon, plat) =>
        Spatial.bboxQuery(points, lat, lon, bbox(p))
          .where(lat === plat && lon === plon)
      case Circle(Point(clon, clat), d) =>
        // degree-radius → km via the same km-per-degree constant the
        // distance query uses for its band math
        Spatial.distanceQuery(points, lat, lon, clat, clon,
          d * 111.19492664455873d)
    }
    args.op match {
      case Intersects | IsWithin => positive(args.shape)
      case BBoxIntersects | BBoxWithin =>
        Spatial.bboxQuery(points, lat, lon, bbox(args.shape))
      case IsEqualTo | Contains =>
        // a point doc contains/equals only an identical point shape
        args.shape match {
          case p: Point => positive(p)
          case _ => points.limit(0)
        }
      case IsDisjointTo =>
        val r = bbox(args.shape)
        args.shape match {
          case Circle(Point(clon, clat), d) =>
            points.where(Spatial.haversineKm(lat, lon, lit(clat), lit(clon)) >
              d * 111.19492664455873d)
          case _ =>
            points.where(!(lat >= r.latMin && lat <= r.latMax &&
              lon >= r.lonMin && lon <= r.lonMax))
        }
    }
  }
}
