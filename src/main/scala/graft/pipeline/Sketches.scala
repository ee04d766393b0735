package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a key column (Cormode & Muthukrishnan 2005):
  * the sublinear frequency summary that makes corpus-scale heavy-hitter
  * queries cheap — `depth` hash rows of `width` counters; estimate(x) =
  * min over rows of cell(d, h_d(x)), always an OVER-estimate, within εN
  * (ε = e/width) with probability 1 − δ (δ = e^−depth).
  *
  * Spark-first shape: the sketch is BUILT as one map-only projection of
  * each key occurrence to its `depth` cells + ONE map-side-combinable
  * groupBy(d, c) — the shuffle carries at most width×depth distinct keys
  * regardless of corpus size, which is the entire point versus the exact
  * census ([[TextAnalysis.heavyHitterBigrams]]) whose shuffle carries
  * every distinct n-gram. The materialized sketch is a ≤ width×depth-row
  * cell table: broadcastable by construction, or driver-collectable.
  *
  * Hashing: Kirsch–Mitzenmacher double hashing h_d = (h1 + d·h2) mod
  * width over two seeded xxhash64 columns — the same construction (and
  * the same driver-side XXH64 twin) as the bloom term-dictionary sidecar
  * (graft.build.BloomFilter). Engine-internal: the gate-facing
  * heavy-hitter query stays the exact census; the sketch is the
  * documented scale path, spec-verified against the exact counts
  * (never-undercount + εN bound + candidate-superset). */
object Sketches {

  /** Driver-side materialized sketch (width×depth longs — sublinear). */
  final case class Cms(depth: Int, width: Int, cells: Array[Array[Long]], n: Long) {
    /** Point estimate — min over rows; ≥ true count, ≤ true + εN w.h.p. */
    def estimate(key: String): Long = {
      val (h1r, h2r) = Cms.hashes(key)
      // reduce BEFORE combining (BloomFilter-style) so d·h2 never
      // overflows int64 under ANSI arithmetic; h2 forced nonzero
      val h1 = math.floorMod(h1r, width.toLong)
      val h2 = math.floorMod(h2r, width.toLong - 1) + 1
      (0 until depth).map { d =>
        cells(d)(math.floorMod(h1 + d.toLong * h2, width.toLong).toInt)
      }.min
    }
  }

  object Cms {
    /** Driver-side twin of the Column hashes (see BloomFilter.probes:
      * xxhash64(lit(seed), key) chains seed 42 → hashLong(lit) → string
      * bytes — exactly what XxHash64's codegen emits). */
    private[Sketches] def hashes(key: String): (Long, Long) = {
      def xx(litSeed: Long, s: String): Long = {
        val bytes = s.getBytes("UTF-8")
        val chained = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(litSeed, 42L)
        org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          bytes.length, chained)
      }
      (xx(131L, key), xx(241L, key))
    }
  }

  private def h1c(k: Column, width: Int): Column =
    pmod(xxhash64(lit(131L), k), lit(width.toLong))
  private def h2c(k: Column, width: Int): Column =
    pmod(xxhash64(lit(241L), k), lit(width.toLong - 1)) + 1L

  /** The distributed (d, c, n) cell table over `keys` (one input row per
    * occurrence), ≤ depth×width rows. */
  def cmsCells(keys: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"need depth >= 1, width >= 2 (got $depth x $width)")
    val k = col(keyCol)
    keys.select(h1c(k, width).as("h1"), h2c(k, width).as("h2"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("d"), col("h1"), col("h2"))
      .select(col("d"),
        pmod(col("h1") + col("d").cast("long") * col("h2"), lit(width.toLong))
          .cast("int").as("c"))
      .groupBy(col("d"), col("c")).agg(count(lit(1)).as("n"))
  }

  /** Collect the cell table into a driver-side probe-able sketch. */
  def cmsBuild(keys: DataFrame, keyCol: String,
               depth: Int = 4, width: Int = 8192): Cms = {
    val cells = Array.fill(depth)(Array.fill(width)(0L))
    var n = 0L
    cmsCells(keys, keyCol, depth, width).collect().foreach { r =>
      cells(r.getInt(0))(r.getInt(1)) = r.getLong(2)
      n += r.getLong(2)
    }
    Cms(depth, width, cells, n / math.max(1, depth))
  }

  /** Sketch-filtered heavy-hitter candidates: estimate every distinct key
    * IN the job (probe cells via a broadcast equi-join on (d, c), min
    * over rows) and keep keys whose estimate ≥ `minCount`. CMS never
    * under-counts, so this is a SUPERSET of the true heavy hitters; the
    * exact census then confirms over a candidate set that is
    * heavy-hitter-sized, not vocabulary-sized. */
  def cmsHeavyCandidates(keys: DataFrame, keyCol: String, minCount: Long,
                         depth: Int = 4, width: Int = 8192): DataFrame = {
    val cellTable = cmsCells(keys, keyCol, depth, width)
    val probes = keys.select(col(keyCol).as("key")).distinct()
      .select(col("key"), h1c(col("key"), width).as("h1"), h2c(col("key"), width).as("h2"))
      .select(col("key"), explode(sequence(lit(0), lit(depth - 1))).as("d"),
        col("h1"), col("h2"))
      .select(col("key"), col("d"),
        pmod(col("h1") + col("d").cast("long") * col("h2"), lit(width.toLong))
          .cast("int").as("c"))
    probes.join(broadcast(cellTable), Seq("d", "c"))
      .groupBy(col("key")).agg(min(col("n")).as("est"))
      .where(col("est") >= minCount)
  }
}
