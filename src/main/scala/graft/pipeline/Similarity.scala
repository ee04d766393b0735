package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`embeddings` table:
  * `vec_id: long, embedding: array<float>, label: int`).
  *
  * All vector math stays inside Catalyst expressions (`aggregate` /
  * `element_at` lambdas — whole-stage-codegen'd, no UDF, no explode of the
  * dimension axis), so a 10^9-vector brute-force scan is one map-shaped
  * stage: broadcast the query vector, score, bounded top-k.
  *
  * The scale path is sign-LSH bucketing (Charikar hyperplane LSH):
  * vectors are pre-bucketed by the sign pattern of `NumPlanes` fixed
  * pseudo-hyperplanes; a query probes only its own bucket — the same
  * dictionary-prune idea the inverted index uses for terms. Hyperplane
  * coefficients are a fixed deterministic ±1 pattern so an independent
  * engine reproduces bucket assignment exactly.
  */
object Similarity {

  val Dims = 64
  val NumPlanes = 8

  /** Double-precision dot product of two array columns, sequential
    * (element order) summation — deterministic. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Deterministic ±1 hyperplane coefficient for (plane b, 1-based dim i):
    * +1 iff (i*37 + b*61) mod 5 ∈ {0, 1}. Public fixture — reproducible in
    * plain SQL by any engine. */
  def planeSign(b: Int, i: Column): Column =
    when((i * 37 + lit(b * 61)) % 5 < 2, lit(1.0)).otherwise(lit(-1.0))

  /** Sign-LSH bucket id (0..2^NumPlanes-1) of an embedding column. */
  def lshBucket(v: Column): Column = {
    val bits = (0 until NumPlanes).map { b =>
      val d = aggregate(zip_with(v, sequence(lit(1), lit(Dims)),
        (x, i) => x.cast("double") * planeSign(b, i)),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Brute-force cosine top-k against a literal query vector: one scan,
    * no shuffle before the final `TakeOrderedAndProject`. */
  def bruteForceTopK(vecs: DataFrame, query: Seq[Float], k: Int): DataFrame = {
    val q = typedLit(query.map(_.toDouble))
    vecs.select(col("vec_id"), cosine(col("embedding"), q).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(k)
  }

  /** LSH-bucketed top-k: prune the scan to the query's bucket, then score.
    * At scale the bucket column is a partition/bucketing key of the stored
    * table, so the scan prunes at the source (partition pruning), not as a
    * post-filter. */
  def lshTopK(vecs: DataFrame, query: Seq[Float], k: Int): DataFrame = {
    val q = typedLit(query.map(_.toDouble))
    val qBucket = lshBucket(q)
    vecs.select(col("vec_id"), col("embedding"), lshBucket(col("embedding")).as("bucket"))
      .where(col("bucket") === qBucket)
      .select(col("vec_id"), cosine(col("embedding"), q).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(k)
  }

  /** Embedding-cosine near-duplicate pairs: all (a < b) pairs scored by
    * cosine, top pairs returned. Verification-scale all-pairs; at corpus
    * scale compose with [[lshBucket]] (join on bucket equality) to keep
    * the candidate set near-linear, exactly like Dedup.candidatePairs. */
  def cosinePairs(vecs: DataFrame, topN: Int): DataFrame = {
    val a = vecs.select(col("vec_id").as("a"), col("embedding").as("ea"))
    val b = vecs.select(col("vec_id").as("b"), col("embedding").as("eb"))
    a.crossJoin(b).where(col("a") < col("b"))
      .select(col("a"), col("b"), round(cosine(col("ea"), col("eb")), 6).as("cos"))
      .orderBy(col("cos").desc, col("a"), col("b")).limit(topN)
  }

  /** Bucketed near-duplicate pairs — the scale path: candidates only
    * within a bucket. */
  def cosinePairsBucketed(vecs: DataFrame, minCos: Double): DataFrame = {
    val withB = vecs.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding")).as("bucket"))
    val a = withB.select(col("bucket"), col("vec_id").as("a"), col("embedding").as("ea"))
    val b = withB.select(col("bucket"), col("vec_id").as("b"), col("embedding").as("eb"))
    a.join(b, "bucket").where(col("a") < col("b"))
      .select(col("a"), col("b"), cosine(col("ea"), col("eb")).as("cos"))
      .where(col("cos") >= minCos)
  }
}
