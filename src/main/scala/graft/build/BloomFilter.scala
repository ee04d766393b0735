package graft.build

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-filter sidecar over the term dictionary (reference:
  * /root/reference/src/Lucene.Net.Codecs/Bloom/BloomFilteringPostingsFormat.cs
  * and Bloom/FuzzySet.cs): a query for a term the index does NOT contain
  * should cost one tiny bitset probe, not a dictionary seek — at 10^8+
  * terms per segment that short-circuit is what keeps misses (typo
  * queries, cross-shard fan-out where most shards lack the term) cheap.
  *
  * Spark-native restatement: the bitset is a TABLE of 64-bit words
  * `(word_idx, bits)`, built with one explode + bit_or aggregation over
  * the dictionary (map-side combinable; no driver-sized bitset — the
  * reference's per-segment in-heap FuzzySet would be gigabytes at
  * 10^9 terms, a parquet word table is not). Positions come from double
  * hashing `pos_i = (h1 + i·h2) mod m` (Kirsch-Mitzenmacher, the
  * standard k-from-2 construction) over xxhash64 seeds. Membership
  * probes read exactly k words via a pushed `word_idx IN (…)` point
  * filter — parquet min/max prunes everything else. False negatives are
  * impossible (spec-asserted over the full dictionary); false positives
  * cost one wasted seek, tuned by `bitsPerKey` (10 bits/key ≈ 1% at
  * k = 7, the reference's 10%-saturation ballpark). */
object BloomFilter {

  val K = 7 // hash count (optimal for ~10 bits/key)

  def path(dir: String): String = s"$dir/term_bloom"

  /** Number of 64-bit words for n keys at `bitsPerKey` (power of two). */
  def words(n: Long, bitsPerKey: Int): Long = {
    var m = 64L
    while (m < n * bitsPerKey && m < (1L << 40)) m <<= 1
    m >> 6
  }

  /** Build the sidecar for an index's term dictionary. */
  def build(spark: SparkSession, dir: String, bitsPerKey: Int = 10): Unit = {
    import spark.implicits._
    val dict = spark.read.parquet(IndexPaths.termDict(dir)).select($"term")
    val n = math.max(1L, dict.count())
    val w = words(n, bitsPerKey)
    val m = w * 64
    val h1 = pmod(xxhash64(lit(41L), $"term"), lit(m))
    val h2 = pmod(xxhash64(lit(97L), $"term"), lit(m - 1)) + 1 // never 0
    val pos = explode(sequence(lit(0), lit(K - 1))).as("i")
    dict.select($"term", h1.as("h1"), h2.as("h2"))
      .select(pos, $"h1", $"h2")
      .select(pmod($"h1" + $"i" * $"h2", lit(m)).as("pos"))
      .groupBy(shiftright($"pos", 6).as("word_idx"))
      .agg(bit_or(expr("shiftleft(1L, cast(pos % 64 as int))")).as("bits"))
      .withColumn("m", lit(m)) // carried so probes can re-derive geometry
      .repartitionByRange(1, $"word_idx").sortWithinPartitions($"word_idx")
      .write.mode(SaveMode.Overwrite).parquet(path(dir))
  }

  /** Probe geometry: the k (word_idx, mask) pairs for a term. */
  private def probes(term: String, m: Long): Seq[(Long, Long)] = {
    // driver-side twin of the Column hashes, zero Spark jobs: xxhash64
    // with a leading literal chains `seed 42 → hashLong(lit) → seed for
    // the string bytes`, exactly what XxHash64's codegen emits
    def xx(litSeed: Long, s: String): Long = {
      val bytes = s.getBytes("UTF-8")
      val chained = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashLong(litSeed, 42L)
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        bytes.length, chained)
    }
    val h1 = math.floorMod(xx(41L, term), m)
    val h2 = math.floorMod(xx(97L, term), m - 1) + 1
    (0 until K).map { i =>
      val p = math.floorMod(h1 + i.toLong * h2, m)
      (p >> 6, 1L << (p & 63))
    }
  }

  /** Membership probe: k pushed point reads, no dictionary touch.
    * False → the term is DEFINITELY absent (skip the seek). */
  def mightContain(spark: SparkSession, dir: String, term: String): Boolean = {
    import spark.implicits._
    val bloom = spark.read.parquet(path(dir))
    val m = bloom.select($"m").head().getLong(0)
    val ps = probes(term, m)
    val got = bloom
      .where($"word_idx".isin(ps.map(_._1).distinct: _*))
      .select($"word_idx", $"bits").as[(Long, Long)].collect().toMap
    ps.forall { case (w, mask) => (got.getOrElse(w, 0L) & mask) != 0L }
  }
}
