package graft.spatial

import org.scalatest.funsuite.AnyFunSuite

/** Geohash encode/decode against the published algorithm's well-known
  * vectors, neighbor math, and the SpatialArgs front-end grammar. */
class GeohashSpec extends AnyFunSuite {

  test("encode — canonical vectors") {
    // the geohash.org canonical example
    assert(Geohash.encode(57.64911, 10.40744, 11) == "u4pruydqqvj")
    assert(Geohash.encode(48.8588, 2.3200, 6) == "u09tuy")
    assert(Geohash.encode(0.0, 0.0, 1) == "s")
    assert(Geohash.encode(-90.0, -180.0, 1) == "0")
    assert(Geohash.encode(90.0, 180.0, 1) == "z")
  }

  test("decode inverts encode to cell precision") {
    for ((lat, lon) <- Seq((57.64911, 10.40744), (-33.86, 151.20), (0.01, -0.01))) {
      val h = Geohash.encode(lat, lon, 9)
      val (dlat, dlon) = Geohash.decode(h)
      assert(math.abs(dlat - lat) < 1e-4, s"$h lat")
      assert(math.abs(dlon - lon) < 1e-4, s"$h lon")
      // re-encoding the center reproduces the hash
      assert(Geohash.encode(dlat, dlon, 9) == h)
    }
  }

  test("decodeBounds nests by prefix") {
    val (a1, b1, c1, d1) = Geohash.decodeBounds("u4")
    val (a2, b2, c2, d2) = Geohash.decodeBounds("u4p")
    assert(a2 >= a1 && b2 <= b1 && c2 >= c1 && d2 <= d1)
  }

  test("neighbors are adjacent same-length cells") {
    val n = Geohash.neighbors("u4pruy")
    assert(n.size == 8)
    assert(n.forall(_.length == 6))
    val (latLo, latHi, lonLo, lonHi) = Geohash.decodeBounds("u4pruy")
    n.foreach { h =>
      val (a, b, c, d) = Geohash.decodeBounds(h)
      // each neighbor's bbox touches the cell's bbox
      assert(a <= latHi + 1e-9 && b >= latLo - 1e-9)
      assert(c <= lonHi + 1e-9 && d >= lonLo - 1e-9)
    }
    // pole: latitude neighbors above 90 dropped
    val top = Geohash.neighbors(Geohash.encode(89.99, 0, 3))
    assert(top.size < 8)
  }

  test("cover tiles a rect") {
    val cells = Geohash.cover(Spatial.Rect(48.0, 49.0, 2.0, 3.0), 3)
    assert(cells.nonEmpty)
    // every corner of the rect lands in some covered cell
    for ((la, lo) <- Seq((48.0, 2.0), (49.0, 3.0), (48.5, 2.5)))
      assert(cells.contains(Geohash.encode(la, lo, 3)), s"($la,$lo)")
  }

  test("spatial args — parser grammar") {
    val a1 = SpatialArgs.parse("Intersects(ENVELOPE(-10, 10, 45, 40)) distErrPct=0.025")
    assert(a1.op == SpatialArgs.Intersects)
    assert(a1.shape == SpatialArgs.Envelope(-10, 10, 40, 45))
    assert(a1.distErrPct.contains(0.025))

    val a2 = SpatialArgs.parse("IsWithin(BUFFER(POINT(2.3 48.8), 5.0))")
    assert(a2.op == SpatialArgs.IsWithin)
    assert(a2.shape == SpatialArgs.Circle(SpatialArgs.Point(2.3, 48.8), 5.0))

    // aliases + case-insensitivity (the reference's registered names)
    assert(SpatialArgs.parse("disjoint(POINT(1 2))").op == SpatialArgs.IsDisjointTo)
    assertThrows[IllegalArgumentException](SpatialArgs.parse("Frobnicate(POINT(1 2))"))
    assertThrows[IllegalArgumentException](SpatialArgs.parse("Intersects(BLOB(1 2))"))
  }

  test("spatial args — point-table execution semantics") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val pts = Seq((48.85, 2.35, "paris"), (40.71, -74.0, "nyc"),
      (51.5, -0.12, "london")).toDF("lat", "lon", "name")
    import org.apache.spark.sql.functions.col
    def names(args: String) =
      SpatialArgs.query(pts, col("lat"), col("lon"), SpatialArgs.parse(args))
        .select("name").collect().map(_.getString(0)).toSet
    assert(names("Intersects(ENVELOPE(-1, 3, 52, 48))") == Set("paris", "london"))
    assert(names("IsWithin(ENVELOPE(-1, 3, 52, 48))") == Set("paris", "london"))
    assert(names("IsDisjointTo(ENVELOPE(-1, 3, 52, 48))") == Set("nyc"))
    assert(names("Intersects(BUFFER(POINT(2.3 48.8), 1.0))") == Set("paris"))
    assert(names("IsEqualTo(POINT(-74.0 40.71))") == Set("nyc"))
    assert(names("Contains(ENVELOPE(-1, 3, 52, 48))") == Set.empty)
  }

  test("geohash column matches the scalar encoder") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val pts = Seq((57.64911, 10.40744), (48.8588, 2.32), (-33.86, 151.20),
      (0.0, 0.0), (89.9, 179.9), (-89.9, -179.9)).toDF("lat", "lon")
    val got = pts.withColumn("gh", Geohash.geohashCol(col("lat"), col("lon"), 7))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getString(2)))
    got.foreach { case (lat, lon, gh) =>
      assert(gh == Geohash.encode(lat, lon, 7), s"($lat,$lon)")
    }
  }

  test("geohash column matches the scalar encoder at EVERY precision (parity)") {
    // Even precisions flip which Morton lane holds lon (bits = 5*p even
    // ⇒ the packed LSB is a lat bit): regression for the lane-swap bug
    // that corrupted every even-precision column hash.
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val pts = Seq((57.64911, 10.40744), (48.8588, 2.32), (-33.86, 151.20),
      (0.0, 0.0), (89.9, 179.9), (-89.9, -179.9), (40.71, -74.0),
      (35.68, 139.69), (-1.29, 36.82), (51.5, -0.12)).toDF("lat", "lon")
    (1 to 12).foreach { p =>
      val got = pts.withColumn("gh", Geohash.geohashCol(col("lat"), col("lon"), p))
        .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getString(2)))
      got.foreach { case (lat, lon, gh) =>
        assert(gh == Geohash.encode(lat, lon, p), s"precision=$p ($lat,$lon)")
      }
    }
  }
}
